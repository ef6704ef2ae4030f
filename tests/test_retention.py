"""Retention policies (retention.py): registry persistence, chunk-drop +
boundary-tombstone enforcement semantics (fake clock), and the InfluxQL
DDL → SHOW → enforce round trip."""

from __future__ import annotations

import pytest

from influxdb_iox_spark.retention import (
    RetentionRegistry,
    enforce_retention,
)
from influxdb_iox_spark.schema import InfluxColumnType, IoxSchema
from influxdb_iox_spark.sources.store import TableStore

S = 1_000_000_000  # ns per second
SCH = IoxSchema.build(["host"], {"v": InfluxColumnType.FIELD_FLOAT})


def test_registry_roundtrip(tmp_path):
    reg = RetentionRegistry(str(tmp_path))
    assert reg.policies() == [] and reg.default_duration_ns() is None
    reg.set_policy("rp", 3600 * S)
    # first policy becomes default implicitly (stock autogen behavior)
    assert reg.policies() == [("rp", 3600 * S, True)]
    reg.set_policy("keep", 0, default=False)
    assert reg.default_duration_ns() == 3600 * S
    reg.alter_policy("keep", None, default=True)
    assert reg.default_duration_ns() == 0
    assert [n for n, _, d in reg.policies() if d] == ["keep"]
    # survives a fresh instance (persisted sidecar)
    twin = RetentionRegistry(str(tmp_path))
    assert twin.policies() == reg.policies()
    twin.drop_policy("keep")
    assert twin.default_duration_ns() is None  # no default remains
    with pytest.raises(KeyError):
        twin.drop_policy("nope")
    with pytest.raises(KeyError):
        twin.alter_policy("nope", 5)


def _write(spark, store, lo_s: int, hi_s: int):
    store.write_chunk(
        spark.createDataFrame(
            [("a", 1.0, lo_s * S), ("b", 2.0, hi_s * S)],
            "host string, v double, time long",
        ),
        "cpu", SCH, partition_key=f"p{lo_s}",
    )


def test_enforce_drops_old_chunks_and_tombstones_boundary(spark, tmp_path):
    store = TableStore(str(tmp_path / "s"))
    _write(spark, store, 10, 20)     # entirely expired
    _write(spark, store, 30, 40)     # entirely expired
    _write(spark, store, 90, 110)    # straddles the cutoff (100)
    _write(spark, store, 150, 160)   # live
    now, duration = 200 * S, 100 * S
    out = enforce_retention(store, duration, now)
    assert out["cutoff_ns"] == 100 * S
    assert out["chunks_dropped"] == 2
    assert out["tables_tombstoned"] == 1
    # queries see EXACT retention: only rows with time >= cutoff remain
    # (the straddling chunk's 90s row dies, its 110s row survives)
    times = sorted(
        r.time for r in store.scan(spark, "cpu", SCH).collect()
    )
    assert times == [110 * S, 150 * S, 160 * S]
    # idempotent: a second pass at the same clock drops nothing new
    again = enforce_retention(store, duration, now)
    assert again["chunks_dropped"] == 0
    # keep-forever (0) and unset are no-ops
    assert enforce_retention(store, 0, now)["chunks_dropped"] == 0


def test_enforce_spares_chunks_without_time_stats(spark, tmp_path):
    store = TableStore(str(tmp_path / "s"))
    _write(spark, store, 10, 20)
    # blank out the stats: the chunk must never age out implicitly
    metas = store.manifest("cpu")
    rec = dict(
        chunk_id=metas[0].chunk_id + 1000, path=metas[0].path, table="cpu",
        partition_key="px", row_count=2,
    )
    store.backend.append_record("cpu", store._part_file("px"), rec)
    out = enforce_retention(store, 1 * S, 10_000 * S)
    assert out["chunks_dropped"] == 1  # only the stats-bearing chunk


def test_lifecycle_sweep_enforces_declared_policy(spark, tmp_path):
    """check_for_work applies the default retention policy on the same
    cadence as compaction/persist/CQs — and is a strict no-op when no
    policy is declared (the pre-round-12 behavior)."""
    from influxdb_iox_spark.streaming.lifecycle import LifecyclePolicy

    store = TableStore(str(tmp_path / "s"))
    _write(spark, store, 10, 20)
    _write(spark, store, 150, 160)
    pol = LifecyclePolicy(spark, store, {"cpu": SCH})
    report = pol.check_for_work(now_ns=200 * S)
    assert "__retention__" not in report  # no policy declared
    RetentionRegistry(store.base_dir).set_policy("keep100", 100 * S)
    report = pol.check_for_work(now_ns=200 * S)
    assert report["__retention__"]["chunks_dropped"] == 1
    times = sorted(r.time for r in store.scan(spark, "cpu", SCH).collect())
    assert times == [150 * S, 160 * S]


def test_ddl_show_enforce_roundtrip(spark, tmp_path):
    """CREATE RETENTION POLICY over the v1 envelope lands in the registry,
    SHOW RETENTION POLICIES reflects it, and enforcement applies it."""
    from influxdb_iox_spark.database import Database
    from influxdb_iox_spark.influxql.v1_api import (
        catalog_from_database,
        run_statements,
    )

    store = TableStore(str(tmp_path / "db"))
    db = Database("mydb", store, spark)
    _write(spark, store, 10, 20)
    db.register_table("cpu", SCH)

    def run(q, **kw):
        return run_statements(
            q, catalog_from_database(db), databases=["mydb"], database=db,
            **kw,
        )

    env = run(
        "CREATE RETENTION POLICY keep1h ON mydb DURATION 1h REPLICATION 1 "
        "DEFAULT"
    )
    assert "error" not in env["results"][0]
    env = run("SHOW RETENTION POLICIES ON mydb")
    vals = env["results"][0]["series"][0]["values"]
    assert ["keep1h", "1h0m0s", "168h0m0s", 1, True] in vals
    # ALTER updates; DROP of a missing name errors per-statement
    run("ALTER RETENTION POLICY keep1h ON mydb DURATION 2h")
    env = run("SHOW RETENTION POLICIES ON mydb")
    assert ["keep1h", "2h0m0s", "168h0m0s", 1, True] in (
        env["results"][0]["series"][0]["values"]
    )
    env = run("DROP RETENTION POLICY ghost ON mydb")
    assert "not found" in env["results"][0]["error"]

    reg = RetentionRegistry(store.base_dir)
    assert reg.default_duration_ns() == 2 * 3600 * S
    out = enforce_retention(
        store, reg.default_duration_ns(), now_ns=10_000 * S + 2 * 3600 * S
    )
    assert out["chunks_dropped"] == 1
    assert store.scan(spark, "cpu", SCH).count() == 0
