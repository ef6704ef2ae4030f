"""Exactly-once versioned-swap persistence for mergeable cell tables.

Shared by every rollup family whose fold is NOT replay-convergent
(moment cells, sample cells — unlike the HLL rollups, where
re-inserting replayed values is a set-semantics no-op).  Layout:

  <dir>/<meta file>        static family config (written by the seeder)
  <dir>/cells/v=NNNN/      immutable cell tables, one per committed
                           version; ``_applied.json`` inside each
                           records every batch id folded into it
  <dir>/_txncas/           the index_txn guard (claims + the version
                           ledger that IS the commit)

A fold writes the NEXT version's directory, then commits — the guard's
put-if-absent version mint is the atomic swap.  A crash after the
directory write but before the mint leaves the current version
untouched; the replayed batch rebuilds v+1 from v and converges.  A
replayed ALREADY-COMMITTED batch is skipped by its id in the current
version's ``_applied.json``.  Exactly-once under at-least-once
foreachBatch, not merely at-least-once.
"""

from __future__ import annotations

import json
import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

APPLIED_FILE = "_applied.json"

#: Non-integer batch ids kept verbatim in the ledger tail; integer ids
#: beyond the tail are covered by the monotone high-water mark.
_LEDGER_TAIL = 256


def cells_dir(path: str, version: int) -> str:
    return os.path.join(path, "cells", f"v={version:04d}")


def seed_versioned_cells(
    path: str,
    cells: DataFrame,
    meta: dict,
    meta_file: str,
    writer: str,
) -> None:
    """Write the family meta and commit the seed cells as version 1.
    The meta write happens INSIDE the claimed section (round-16 review:
    written outside, two racing seeders could leave one seeder's meta
    over the other's cells — bucket_ns mismatch silently corrupting
    every later fold), and a second seed of an already-versioned table
    is refused outright."""
    from influxdb_iox_spark.pipeline.index_txn import guard_for_path

    os.makedirs(path, exist_ok=True)
    guard = guard_for_path(path)
    token = guard.begin(writer=writer)
    if token.base_version > 0:
        guard.abort(token)
        raise ValueError(
            f"{path} is already seeded (version {token.base_version}); "
            "fold batches with the family's update function instead"
        )
    with open(os.path.join(path, meta_file), "w") as f:
        json.dump(meta, f)
    token.mutating()
    target = cells_dir(path, token.base_version + 1)
    cells.write.mode("overwrite").parquet(target)
    with open(os.path.join(target, APPLIED_FILE), "w") as f:
        json.dump({"applied": [], "applied_max": None}, f)
    guard.commit(token)


def read_versioned_cells(
    spark: SparkSession, path: str, meta_file: str
) -> tuple[DataFrame, dict]:
    """(current-version cells, meta)."""
    from influxdb_iox_spark.pipeline.index_txn import guard_for_path

    with open(os.path.join(path, meta_file)) as f:
        meta = json.load(f)
    v = guard_for_path(path).current_version()
    return spark.read.parquet(cells_dir(path, v)), meta


def versioned_fold(
    spark: SparkSession,
    path: str,
    merge: Callable[[DataFrame], DataFrame],
    batch_id: int | str | None = None,
    writer: str = "cells:update",
    force: bool = False,
) -> bool:
    """Run one exactly-once fold: ``merge(existing_cells)`` produces the
    next version's cell table.  Returns False (no-op) when ``batch_id``
    was already folded into the current version; True when a new
    version was committed.  See the module docstring for the
    crash-safety argument."""
    from influxdb_iox_spark.pipeline.index_txn import (
        guard_for_path,
        maintenance_txn,
    )

    guard = guard_for_path(path)

    # A replayed batch must leave the version ledger UNTOUCHED, and
    # maintenance_txn commits (mints a version) on any clean exit — so
    # the skip path exits via a private exception, which clean-aborts
    # (nothing mutated: claim released, no version minted).
    class _AlreadyApplied(Exception):
        pass

    try:
        with maintenance_txn(
            path, guard=guard, writer=writer, force=force
        ) as txn:
            cur = cells_dir(path, txn.base_version)
            with open(os.path.join(cur, APPLIED_FILE)) as f:
                ledger = json.load(f)
            applied = ledger["applied"]
            applied_max = ledger.get("applied_max")
            # Replay detection is O(1), not an unbounded history scan
            # (round-16 review): integer batch ids are MONOTONE per
            # checkpoint (Structured Streaming's contract), so any int
            # id ≤ the high-water mark is a replay; the bounded tail
            # covers non-int ids and the ids still inside it.
            is_replay = batch_id is not None and (
                batch_id in applied
                or (
                    isinstance(batch_id, int)
                    and applied_max is not None
                    and batch_id <= applied_max
                )
            )
            if is_replay:
                raise _AlreadyApplied
            merged = merge(spark.read.parquet(cur))
            txn.mutating()
            target = cells_dir(path, txn.base_version + 1)
            merged.write.mode("overwrite").parquet(target)
            new_applied = applied + (
                [batch_id] if batch_id is not None else []
            )
            new_max = applied_max
            if isinstance(batch_id, int):
                new_max = (
                    batch_id if new_max is None else max(new_max, batch_id)
                )
            with open(os.path.join(target, APPLIED_FILE), "w") as f:
                json.dump(
                    {
                        "applied": new_applied[-_LEDGER_TAIL:],
                        "applied_max": new_max,
                    },
                    f,
                )
    except _AlreadyApplied:
        return False
    return True
