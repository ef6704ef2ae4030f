"""Continuous queries: CREATE/DROP/SHOW parsing, the persisted registry,
and the due-run scheduler (influxql/cq.py) — stock InfluxDB 1.x CQ
semantics (interval boundaries, RESAMPLE EVERY/FOR recompute windows,
no backfill) layered on the engine's idempotent INTO writeback."""

from __future__ import annotations

import pytest

from influxdb_iox_spark.database import Database
from influxdb_iox_spark.influxql.ast_nodes import (
    CreateContinuousQuery,
    DropContinuousQuery,
    ShowStatement,
)
from influxdb_iox_spark.influxql.cq import ContinuousQueryRegistry
from influxdb_iox_spark.influxql.parser import InfluxQLParseError, parse
from influxdb_iox_spark.schema import InfluxColumnType, IoxSchema
from influxdb_iox_spark.sources.store import TableStore

S = 10**9
H = 3600 * S

CQ_TEXT = (
    "CREATE CONTINUOUS QUERY cq1 ON db RESAMPLE FOR 2h BEGIN "
    "SELECT SUM(v) AS s INTO cpu_1h FROM cpu GROUP BY time(1h), host END"
)


# -- parser -------------------------------------------------------------------


def test_parse_create_cq():
    s = parse(CQ_TEXT)
    assert isinstance(s, CreateContinuousQuery)
    assert s.name == "cq1" and s.db == "db"
    assert s.resample_every_ns is None and s.resample_for_ns == 2 * H
    assert s.select.into == "cpu_1h"
    assert s.select.group_by_time_ns == H
    assert s.select.group_by_tags == ["host"]


def test_parse_create_cq_resample_every():
    s = parse(
        "CREATE CONTINUOUS QUERY c ON d RESAMPLE EVERY 30m BEGIN "
        "SELECT MEAN(v) INTO m2 FROM m1 GROUP BY time(1h) END"
    )
    assert s.resample_every_ns == 1800 * S and s.resample_for_ns is None


def test_parse_drop_and_show_cq():
    d = parse("DROP CONTINUOUS QUERY cq1 ON db")
    assert d == DropContinuousQuery("cq1", "db")
    s = parse("SHOW CONTINUOUS QUERIES")
    assert isinstance(s, ShowStatement) and s.what == "continuous queries"


def test_parse_create_cq_errors():
    for bad in (
        # no INTO
        "CREATE CONTINUOUS QUERY c ON d BEGIN SELECT mean(v) FROM m "
        "GROUP BY time(1h) END",
        # no GROUP BY time
        "CREATE CONTINUOUS QUERY c ON d BEGIN SELECT mean(v) INTO m2 "
        "FROM m END",
        # bare RESAMPLE
        "CREATE CONTINUOUS QUERY c ON d RESAMPLE BEGIN SELECT mean(v) "
        "INTO m2 FROM m GROUP BY time(1h) END",
        # trailing garbage
        "CREATE CONTINUOUS QUERY c ON d BEGIN SELECT mean(v) INTO m2 "
        "FROM m GROUP BY time(1h) END garbage",
    ):
        with pytest.raises(InfluxQLParseError):
            parse(bad)


# -- registry + scheduler -----------------------------------------------------


CPU = IoxSchema.build(["host"], {"v": InfluxColumnType.FIELD_FLOAT})


def _mkdb(spark, tmp_path, name="db"):
    store = TableStore(str(tmp_path / "cq_store"))
    return Database(name, store, spark)


def _write_points(spark, db, rows):
    df = spark.createDataFrame(rows, "host string, v double, time long")
    db.store.write_chunk(df, "cpu", CPU)
    db.register_table("cpu", CPU)


def test_registry_create_drop_persists(spark, tmp_path):
    db = _mkdb(spark, tmp_path)
    reg = ContinuousQueryRegistry(db)
    reg.create(CQ_TEXT)
    assert [c["name"] for c in reg.list()] == ["cq1"]
    with pytest.raises(ValueError):
        reg.create(CQ_TEXT)  # duplicate name
    # definitions survive a fresh registry over the same store
    reg2 = ContinuousQueryRegistry(db)
    assert [c["name"] for c in reg2.list()] == ["cq1"]
    assert reg2.drop("cq1") is True
    assert reg2.drop("cq1") is False
    assert reg2.list() == []


def test_cq_sweeps_converge_to_full_recompute(spark, tmp_path):
    """Two sweeps over growing source data (including a LATE point inside
    the RESAMPLE FOR window) converge the destination to the
    recompute-from-scratch twin over the swept buckets."""
    from influxdb_iox_spark.influxql import Measurement, execute
    from influxdb_iox_spark.influxql.v1_api import catalog_from_database

    db = _mkdb(spark, tmp_path)
    reg = ContinuousQueryRegistry(db)
    reg.create(CQ_TEXT)

    # batch 1: bucket 2h
    _write_points(
        spark, db, [("a", 1.0, 2 * H + 10 * S), ("a", 2.0, 2 * H + 20 * S)]
    )
    runs = reg.run_due(now_ns=3 * H + 600 * S)
    assert [(r.name, r.window_start_ns, r.window_end_ns) for r in runs] == [
        ("cq1", H, 3 * H)
    ]
    got = {
        (r["host"], r["time"]): r["s"]
        for r in db.table("cpu_1h").collect()
    }
    assert got == {("a", 2 * H): 3.0}

    # same boundary -> no re-run (at most once per interval boundary)
    assert reg.run_due(now_ns=3 * H + 1200 * S) == []

    # batch 2: bucket 3h + a LATE point for bucket 2h (inside FOR 2h)
    _write_points(
        spark, db, [("b", 10.0, 3 * H + 10 * S), ("a", 4.0, 2 * H + 30 * S)]
    )
    runs2 = reg.run_due(now_ns=4 * H + 60 * S)
    assert [(r.window_start_ns, r.window_end_ns) for r in runs2] == [
        (2 * H, 4 * H)
    ]

    # destination == full recompute over the swept buckets [2h, 4h)
    twin = execute(
        "SELECT SUM(v) AS s FROM cpu WHERE time >= 2h AND time < 4h "
        "GROUP BY time(1h), host",
        catalog_from_database(db),
    )
    want = {(r["host"], r["time"]): r["s"] for r in twin.collect()}
    got2 = {
        (r["host"], r["time"]): r["s"]
        for r in db.table("cpu_1h").collect()
    }
    assert got2 == want == {("a", 2 * H): 7.0, ("b", 3 * H): 10.0}

    # every run recorded in system.operations
    ops = [
        o
        for o in db.store.operations()
        if o["job"] == "continuous_query"
    ]
    assert len(ops) == 2 and all(o["status"] == "Success" for o in ops)


def test_cq_runs_from_lifecycle_sweep(spark, tmp_path):
    from influxdb_iox_spark.streaming.lifecycle import LifecyclePolicy

    db = _mkdb(spark, tmp_path)
    reg = ContinuousQueryRegistry(db)
    reg.create(CQ_TEXT)
    _write_points(spark, db, [("a", 5.0, 2 * H + 10 * S)])
    policy = LifecyclePolicy(
        spark=spark, store=db.store, schemas={"cpu": CPU}, cqs=reg
    )
    report = policy.check_for_work(now_ns=3 * H + 60 * S)
    assert report["__continuous_queries__"]["ran"] == ["cq1"]
    assert {
        (r["host"], r["time"]): r["s"] for r in db.table("cpu_1h").collect()
    } == {("a", 2 * H): 5.0}


def test_show_continuous_queries_envelope(spark, tmp_path):
    from influxdb_iox_spark.influxql.v1_api import (
        catalog_from_database,
        run_statements,
    )

    db = _mkdb(spark, tmp_path)
    env = run_statements(
        f"{CQ_TEXT}; SHOW CONTINUOUS QUERIES",
        catalog_from_database(db),
        databases=["db"],
        database=db,
    )
    assert "error" not in env["results"][0], env
    show = env["results"][1]["series"]
    assert show == [
        {"name": "db", "columns": ["name", "query"], "values": [["cq1", CQ_TEXT]]}
    ]
    # read_only (GET) rejects the DDL
    env2 = run_statements(
        "DROP CONTINUOUS QUERY cq1 ON db",
        catalog_from_database(db),
        database=db,
        read_only=True,
    )
    assert "POST" in env2["results"][0]["error"]
