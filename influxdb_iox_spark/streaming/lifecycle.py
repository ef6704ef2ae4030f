"""Lifecycle policy: when to compact, persist-split, and evict.

The Spark twin of the reference's background policy
(/root/reference/lifecycle/src/policy.rs — maybe_compact_chunks :187,
maybe_persist_chunks :291, check_for_work :448) plus the late-arrival
bookkeeping of PersistenceWindows
(persistence_windows/src/persistence_windows.rs:24-74).

All decisions are driver-side manifest arithmetic (row counts, chunk
counts, time ranges) — no data is read to decide; Spark jobs run only when
a decision fires.  ``check_for_work`` is idempotent and safe to run on any
schedule (cron, foreachBatch hook, loop).
"""

from __future__ import annotations

import time as _time
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from influxdb_iox_spark.operators.overlap import group_potential_duplicates
from influxdb_iox_spark.plans.reorg import compact_chunks, persist_split
from influxdb_iox_spark.schema import IoxSchema
from influxdb_iox_spark.sources.store import TableStore

NS_PER_SECOND = 1_000_000_000


@dataclass
class LifecycleRules:
    """Thresholds (shape mirrors data_types database_rules lifecycle rules)."""

    # compact a group when it has at least this many overlapping chunks
    compact_min_chunks: int = 2
    # or when total rows across a group exceed this (merge small chunks)
    compact_max_group_rows: int = 10_000_000
    # never compact a group whose combined on-disk bytes exceed this —
    # bounds a single compaction job's I/O (byte twin of the row bound,
    # possible since the manifest records estimated_bytes per chunk)
    compact_max_group_bytes: int = 8 << 30
    # persist-split rows older than (max_seen_time - late_arrive_window)
    late_arrive_window_seconds: int = 300
    # do not persist a chunk younger than this (let writes settle)
    min_age_seconds: float = 0.0
    # soft byte limit on PENDING data per table (database_rules.rs:127
    # buffer_size_soft): when the bytes of unpersisted chunks already past
    # the late-arrival window exceed it, persistence ignores
    # min_age_seconds and drains eagerly.  Persisted chunks and chunks
    # still inside the window never count — the comparison is against
    # buffer pressure, not the table's lifetime size.
    buffer_size_soft: int | None = None


@dataclass
class LifecyclePolicy:
    spark: SparkSession
    store: TableStore
    schemas: dict[str, IoxSchema]
    rules: LifecycleRules = field(default_factory=LifecycleRules)
    #: table -> PersistenceWindows (streaming.persistence_windows).  When a
    #: table has an entry, the persist decision becomes SEQUENCE-EXACT:
    #: the split time is capped at the windows' max persistable timestamp,
    #: so data whose sequences are still inside the late-arrival window —
    #: e.g. from a lagging shard — defers, even if its data timestamps are
    #: old.  Tables without an entry keep the time-based decision
    #: (direct-write deployments have no sequences to track).
    windows: dict | None = None
    #: optional ContinuousQueryRegistry (influxql/cq.py): when set, the
    #: sweep also executes due continuous queries — the stock CQ loop
    #: rides the same background cadence as compaction/persistence.
    cqs: object | None = None

    def max_seen_time_ns(self, table: str) -> int | None:
        """PersistenceWindows equivalent: newest timestamp in the manifest."""
        schema = self.schemas[table]
        highs = [
            int(c.column_range(schema.time_column)[1])
            for c in self.store.manifest(table)
            if c.column_range(schema.time_column)
            and c.column_range(schema.time_column)[1] is not None
        ]
        return max(highs) if highs else None

    def maybe_compact(self, table: str) -> list:
        """Compact every overlapping group meeting the thresholds
        (policy.rs:187 maybe_compact_chunks).

        Groups form WITHIN each partition key (the reference's lifecycle is
        per-partition): compacting across keys would mint chunks with an
        unknown ("") partition key that partition-filtered scans and the
        metadata fast paths must then conservatively include forever.
        """
        schema = self.schemas[table]
        by_part: dict[str, list] = {}
        for c in self.store.manifest(table):
            by_part.setdefault(c.partition_key, []).append(c)
        done = []
        for chunks in by_part.values():
            for g in group_potential_duplicates(chunks, schema.primary_key):
                if len(g) < self.rules.compact_min_chunks:
                    continue
                members = [chunks[i] for i in g]
                if sum(c.row_count for c in members) > self.rules.compact_max_group_rows:
                    continue
                if (
                    sum(c.estimated_bytes for c in members)
                    > self.rules.compact_max_group_bytes
                ):
                    continue
                done.append(
                    compact_chunks(
                        self.spark, self.store, table, schema,
                        [m.chunk_id for m in members],
                    )
                )
        return done

    def maybe_persist(self, table: str, now_ns: int | None = None) -> list[tuple]:
        """Split-persist rows safely outside the late-arrival window
        (policy.rs:291 maybe_persist_chunks; split rule reorg.rs:146).

        One persist_split per PARTITION KEY, so outputs inherit their
        partition's key instead of collapsing to "" (see maybe_compact).
        Returns the list of (cold, hot) chunk-meta pairs (empty = no work).
        """
        schema = self.schemas[table]
        newest = self.max_seen_time_ns(table)
        if newest is None:
            return []
        split_time = newest - self.rules.late_arrive_window_seconds * NS_PER_SECOND
        w = (self.windows or {}).get(table)
        window_gate = 0.0
        if w is not None:
            # sequence-exact gates (persistence_windows.rs):
            # 1. DATA-time: the split IS the persistable window's max
            #    data time (max_persistable_timestamp) — the reference's
            #    flush boundary: everything at or below it has sat in
            #    the windows for >= late_arrival of ARRIVAL time, so its
            #    late twins have arrived; rows above it stay hot.  Using
            #    the windows' boundary (not the data-time heuristic
            #    newest - late_window) is what lets flush() be EXACT:
            #    every sequence in the persistable window really is on
            #    disk after the persist.
            # 2. ARRIVAL-time: only chunks whose ingest window has aged
            #    into persistable (created >= late_arrival ago) qualify —
            #    a lagging shard's JUST-ARRIVED chunk defers even when
            #    its data timestamps are ancient (a time-based split
            #    would wrongly persist it; the reference never persists
            #    the open/closed windows' rows).  This gate models window
            #    containment and is NOT overridable by buffer pressure.
            w.rotate()
            mp = w.max_persistable_timestamp()
            if mp is None:
                return []  # nothing has aged out of the windows yet
            split_time = mp
            window_gate = w.late_arrival
        # persistable-by-time candidates, BEFORE the age gate; chunks whose
        # persisted flag is set (cold persist-split outputs) are excluded —
        # they have already drained, so re-splitting them every sweep would
        # be wasted I/O and their bytes are not buffer pressure
        candidates = [
            c
            for c in self.store.manifest(table)
            if not c.persisted
            and c.column_range(schema.time_column)
            and c.column_range(schema.time_column)[0] is not None
            and int(c.column_range(schema.time_column)[0]) <= split_time
        ]
        # buffer_size_soft counts the PENDING (not-yet-persisted) bytes —
        # the candidates the age gate is currently holding back — never the
        # table's lifetime total, which grows without bound and would
        # permanently disable the settling window once crossed.
        min_age = self.rules.min_age_seconds
        if (
            self.rules.buffer_size_soft is not None
            and sum(c.estimated_bytes for c in candidates)
            > self.rules.buffer_size_soft
        ):
            min_age = 0.0
        by_part: dict[str, list] = {}
        held_back = []
        now = _time.time()
        # The skew zone: window age runs on the WINDOW's created_at,
        # which can lead a batch's chunk arrival by up to closed_window
        # seconds — so a chunk older than (late_arrival - closed_window)
        # may have its sequence ranges already folded into the
        # persistable window even though the arrival gate still holds
        # the chunk back.  Chunks younger than that are provably still
        # in open/closed windows (a batch always lands in a window at
        # most closed_window old) and cannot block the flush.
        skew_floor = (
            w.late_arrival - w.closed_window if w is not None else float("inf")
        )
        for c in candidates:
            if now - c.created_at >= max(min_age, window_gate):
                by_part.setdefault(c.partition_key, []).append(c)
            elif now - c.created_at >= skew_floor:
                held_back.append(c)
        out = []
        for chunks in by_part.values():
            out.append(
                persist_split(
                    self.spark, self.store, table, schema, split_time,
                    [c.chunk_id for c in chunks],
                )
            )
        if w is not None and out and not held_back:
            # everything at or below the persistable max time (== the
            # split) is now on disk: clear the persistable window and
            # truncate the closed windows' overlap (persistence_windows.rs
            # flush).  Exact because split_time == mp AND nothing below
            # the boundary was held back: window age runs on the WINDOW's
            # created_at, which can lead a late batch's chunk arrival by
            # up to closed_window seconds — in that skew the batch's
            # sequence ranges sit in the persistable window while its
            # chunk is still arrival-gated above, and flushing would
            # erase exactly the ranges a crash replay needs (review
            # finding).  ``held_back`` non-empty → defer the flush; the
            # next sweep persists the aged straggler and flushes then.
            # Conservative in between: minimum_unpersisted_sequence keeps
            # reporting the straggler's range, so replay can only start
            # earlier than strictly needed (idempotent through PK dedup),
            # never later.
            w.flush()
        return out

    def check_for_work(self, now_ns: int | None = None) -> dict[str, dict]:
        """One policy sweep over every table (policy.rs:448), plus due
        continuous queries when a registry is attached."""
        report: dict[str, dict] = {}
        for table in list(self.schemas):
            compacted = self.maybe_compact(table)
            persisted = self.maybe_persist(table)
            report[table] = {
                "compacted": [c.chunk_id for c in compacted],
                "persisted": bool(persisted),
            }
        if self.cqs is not None:
            report["__continuous_queries__"] = {
                "ran": [r.name for r in self.cqs.run_due(now_ns=now_ns)]
            }
        # retention enforcement rides the same sweep cadence (the stock
        # 1.x retention service's periodic check): only when a default
        # policy is declared, and duration 0/INF is keep-forever
        from influxdb_iox_spark.retention import (
            RetentionRegistry,
            enforce_retention,
        )

        duration = RetentionRegistry(
            self.store.base_dir
        ).default_duration_ns()
        if duration:
            import time as _t

            report["__retention__"] = enforce_retention(
                self.store, duration,
                now_ns if now_ns is not None else _t.time_ns(),
            )
        return report
