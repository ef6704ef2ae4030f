"""Continuous queries: registered ``SELECT ... INTO`` statements re-run
on an interval — stock InfluxDB 1.x's downsampling loop, which the v0
reference era served externally (Kapacitor / the 1.x CQ engine).

Scheduling follows the stock rules (public docs, "continuous queries"):

- a CQ executes at every boundary of its interval = RESAMPLE EVERY if
  given, else the statement's GROUP BY time() width;
- each execution recomputes the window ``[boundary - FOR, boundary)``
  where FOR = RESAMPLE FOR if given, else the GROUP BY time width — so
  late data inside the resample window is folded in on the next tick,
  and nothing is backfilled beyond it;
- the recompute window is ANDed into the statement's WHERE, so each run
  scans only that slice (partition-pruned at the parquet scan), never
  the source's full history — the property that keeps the loop O(window)
  at 100 TB.

Runs write through ``run_into`` (PK-sorted chunk + upsert-on-read
semantics: influxql/planner.py run_into), so re-executions of the same
bucket are idempotent.  Every run is recorded in ``system.operations``
(job = 'continuous_query').

Definitions persist in the table store's backend JSON (same durability
as the manifest), so CQs survive restarts alongside the data.
"""

from __future__ import annotations

import time as _time
from dataclasses import dataclass

from influxdb_iox_spark.influxql.ast_nodes import (
    BinaryExpr,
    CreateContinuousQuery,
    Literal,
    VarRef,
)
from influxdb_iox_spark.influxql.parser import parse

_CQ_KEY = "_continuous_queries.json"


@dataclass(frozen=True)
class CQRun:
    name: str
    window_start_ns: int
    window_end_ns: int
    rows_written: int


class ContinuousQueryRegistry:
    """CQ definitions + the due-run loop for one Database."""

    def __init__(self, database):
        self.database = database

    # -- definition CRUD (persisted via the store backend) -------------------

    def _load(self) -> list[dict]:
        return self.database.store.backend.get_json(_CQ_KEY) or []

    def _save(self, entries: list[dict]) -> None:
        self.database.store.backend.put_json(_CQ_KEY, entries)

    def create(self, text: str) -> CreateContinuousQuery:
        """Register from the full ``CREATE CONTINUOUS QUERY ...`` text.
        The raw text is what persists — re-parsed on every run, so the
        stored form is engine-version independent."""
        stmt = parse(text)
        if not isinstance(stmt, CreateContinuousQuery):
            raise ValueError("expected CREATE CONTINUOUS QUERY text")
        entries = self._load()
        if any(e["name"] == stmt.name for e in entries):
            raise ValueError(f"continuous query {stmt.name!r} already exists")
        entries.append({"name": stmt.name, "db": stmt.db, "text": text,
                        "last_run_boundary_ns": None})
        self._save(entries)
        return stmt

    def drop(self, name: str) -> bool:
        entries = self._load()
        kept = [e for e in entries if e["name"] != name]
        if len(kept) == len(entries):
            return False
        self._save(kept)
        return True

    def list(self) -> list[dict]:
        return self._load()

    # -- scheduling -----------------------------------------------------------

    def run_due(self, catalog=None, now_ns: int | None = None) -> list[CQRun]:
        """Execute every CQ whose interval boundary has passed since its
        last run.  Call from the lifecycle sweep (check_for_work) or any
        cron-ish loop — idempotent within a boundary (a CQ runs at most
        once per interval boundary, and re-running a window upserts)."""
        from influxdb_iox_spark.influxql.planner import run_into
        from influxdb_iox_spark.influxql.v1_api import catalog_from_database

        now_ns = now_ns if now_ns is not None else _time.time_ns()
        runs: list[CQRun] = []
        entries = self._load()
        dirty = False
        for e in entries:
            stmt = parse(e["text"])
            every = stmt.resample_every_ns or stmt.select.group_by_time_ns
            recompute = stmt.resample_for_ns or stmt.select.group_by_time_ns
            boundary = now_ns - (now_ns % every)
            if e["last_run_boundary_ns"] is not None and (
                boundary <= e["last_run_boundary_ns"]
            ):
                continue
            lo, hi = boundary - recompute, boundary
            windowed = _with_time_window(stmt.select, lo, hi)
            cat = catalog if catalog is not None else catalog_from_database(
                self.database
            )
            t0 = _time.perf_counter_ns()
            n = run_into(windowed, cat, self.database, now_ns=now_ns)
            self.database.store.record_operation(
                job="continuous_query",
                table=stmt.select.into,
                partition_key=e["name"],
                chunk_ids=[],
                status="Success",
                wall_nanos=_time.perf_counter_ns() - t0,
                description=(
                    f"cq {e['name']}: window [{lo}, {hi}) -> {n} rows"
                ),
            )
            e["last_run_boundary_ns"] = boundary
            dirty = True
            runs.append(CQRun(e["name"], lo, hi, n))
        if dirty:
            self._save(entries)
        return runs


def _with_time_window(select, lo_ns: int, hi_ns: int):
    """Copy of the CQ's SELECT with ``time >= lo AND time < hi`` ANDed
    into WHERE — the recompute window the scheduler scans."""
    import copy

    s = copy.copy(select)
    rng = BinaryExpr(
        "AND",
        BinaryExpr(">=", VarRef("time"), Literal("int", lo_ns)),
        BinaryExpr("<", VarRef("time"), Literal("int", hi_ns)),
    )
    s.where = rng if s.where is None else BinaryExpr("AND", s.where, rng)
    return s
