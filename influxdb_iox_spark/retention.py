"""Retention policies: registry + enforcement.

The v0 reference has no retention concept; stock InfluxDB 1.x (the
client surface our InfluxQL front-end targets) has named per-database
retention policies, enforced by a background service that deletes whole
shard GROUPS whose end time predates ``now - duration`` — cheap
metadata-granularity deletion, never row scanning.  This module is that
service's twin over our chunk store (chunks are the shard-group
analogue: time-bounded immutable units with min/max stats):

- ``RetentionRegistry`` persists per-database policies in a
  ``_retention.json`` sidecar under the store base dir (name ->
  duration_ns + default flag), fed by the InfluxQL CREATE/ALTER/DROP
  RETENTION POLICY DDL (parsed since round 12; previously
  accepted-and-inert) and read back by SHOW RETENTION POLICIES.
- ``enforce_retention`` applies the default policy's duration: every
  chunk whose time-range MAX is older than the cutoff is dropped whole
  (metadata-only, files reclaimed — the shard-group drop), and if any
  SURVIVING chunk still straddles the cutoff, one scan-time delete
  tombstone ``time < cutoff`` makes queries exact at the boundary
  without rewriting files (compaction folds it away physically later).
  duration 0 = keep forever (stock INF).

Scale: enforcement is a manifest walk — O(chunks) metadata, zero data
I/O except deferred file deletes.  Schedule it like the reference
schedules lifecycle checks (streaming/lifecycle.py's cadence); at 100 TB
the expensive part is the object-store deletes, which drop_chunks
already defers/batches.
"""

from __future__ import annotations

import json
import os

from influxdb_iox_spark.plans.predicate import DeletePredicate

RETENTION_FILE = "_retention.json"


class RetentionRegistry:
    """Per-database named retention policies, persisted as one JSON
    sidecar (the rules.json recipe).  Exactly one policy may be the
    default — the one enforcement applies (stock: writes without an RP
    target the default policy's data)."""

    def __init__(self, base_dir: str):
        self.path = os.path.join(base_dir, RETENTION_FILE)
        self._policies: dict[str, dict] = {}
        if os.path.isfile(self.path):
            with open(self.path) as f:
                self._policies = json.load(f)

    def _save(self) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._policies, f, indent=1)
        os.replace(tmp, self.path)

    def set_policy(
        self, name: str, duration_ns: int | None, default: bool = False
    ) -> None:
        """CREATE (idempotent upsert, like our other onboarding DDL).
        ``duration_ns`` None means "not specified" → keep forever (0)."""
        if default:
            for p in self._policies.values():
                p["default"] = False
        self._policies[name] = {
            "duration_ns": int(duration_ns or 0),
            # the first policy becomes default implicitly, like stock's
            # autogen — otherwise nothing would ever be enforceable
            "default": bool(default) or not self._policies,
        }
        self._save()

    def alter_policy(
        self, name: str, duration_ns: int | None, default: bool = False
    ) -> None:
        if name not in self._policies:
            raise KeyError(f"retention policy not found: {name}")
        if duration_ns is not None:
            self._policies[name]["duration_ns"] = int(duration_ns)
        if default:
            for p in self._policies.values():
                p["default"] = False
            self._policies[name]["default"] = True
        self._save()

    def drop_policy(self, name: str) -> None:
        if name not in self._policies:
            raise KeyError(f"retention policy not found: {name}")
        del self._policies[name]
        self._save()

    def policies(self) -> list[tuple[str, int, bool]]:
        """[(name, duration_ns, is_default)] sorted by name."""
        return sorted(
            (n, p["duration_ns"], p["default"])
            for n, p in self._policies.items()
        )

    def default_duration_ns(self) -> int | None:
        """Enforced duration (ns), or None when no policy is declared.
        0 = keep forever."""
        for p in self._policies.values():
            if p["default"]:
                return p["duration_ns"]
        return None


def enforce_retention(store, duration_ns: int, now_ns: int) -> dict:
    """One enforcement pass over every table of ``store``: drop chunks
    entirely older than ``now_ns - duration_ns``, tombstone the boundary
    in tables where a surviving chunk straddles it.  Returns counters
    (a system.operations-style summary).  ``duration_ns <= 0`` = keep
    forever → no-op."""
    if duration_ns <= 0:
        return {"cutoff_ns": None, "chunks_dropped": 0, "tables_tombstoned": 0}
    cutoff = now_ns - duration_ns
    dropped = 0
    stoned = 0
    for table in store.tables():
        expired = []
        straddle = False
        for c in store.manifest(table):
            t = c.stats.get("time")
            if not t or t[0] is None or t[1] is None:
                continue  # no time stats: never age out implicitly
            if int(t[1]) < cutoff:
                expired.append(c.chunk_id)
            elif int(t[0]) < cutoff:
                straddle = True
        if expired:
            store.drop_chunks(table, expired)
            dropped += len(expired)
        if straddle:
            store.delete_predicate(
                table, DeletePredicate(start=None, stop=cutoff)
            )
            stoned += 1
    return {
        "cutoff_ns": cutoff,
        "chunks_dropped": dropped,
        "tables_tombstoned": stoned,
    }
