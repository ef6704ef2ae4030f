"""Scenario-dual runner — the reference's core test pattern.

The reference materializes every logical dataset in MANY physical
arrangements and asserts each query answers identically across all of them
(query_tests/src/scenarios.rs; cross-scenario equality enforced by
runner.rs:60-71 ScenarioMismatch).  Here: the same logical rows are staged
as (a) one chunk, (b) two overlapping chunks with duplicate PKs, (c)
ingested via line protocol in three batches with a replayed tail, (d)
arrangement (b) after compaction, (e) arrangement (b) after persist-split
— and a battery of SQL + RPC queries must agree across all five.

The query battery ports the *shapes* of the reference's
pushdown-correctness suite (query_tests/cases/in/pushdown.sql 1-13 over the
``restaurant`` fixture, FIXTURES.md F3) and the duplicates golden
(cases/in/duplicates.sql over h2o, F5).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from influxdb_iox_spark.database import Database
from influxdb_iox_spark.operators.series import Aggregate, read_group
from influxdb_iox_spark.plans.predicate import Predicate
from influxdb_iox_spark.plans.reorg import compact_overlapping, persist_split
from influxdb_iox_spark.schema import InfluxColumnType, IoxSchema
from influxdb_iox_spark.sources.store import TableStore
from influxdb_iox_spark.streaming.ingest import LineProtocolIngest

RESTAURANT = IoxSchema.build(
    ["town"],
    {
        "count": InfluxColumnType.FIELD_INTEGER,
        "system": InfluxColumnType.FIELD_FLOAT,
    },
)

# FIXTURES.md F3 rows (scenarios.rs:274-298): (town, count, system, time)
ROWS = [
    ("andover", 40000, 5.0, 100),
    ("reading", 632, 5.0, 120),
    ("tewsbury", 471, 6.0, 110),
    ("lawrence", 372, 5.0, 190),
    ("lexington", 372, 7.0, 100),
    ("bedford", 189, 7.0, 110),
    ("reading", 130, 7.0, 130),
    ("andover", 471, 6.0, 110),
]


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "town string, count long, system double, time long"
    )


def _scenarios(spark, tmp_path):
    """name → Database with identical logical content, different physics."""
    out = {}

    # (a) single chunk
    s1 = TableStore(str(tmp_path / "one"))
    s1.write_chunk(_df(spark, ROWS), "restaurant", RESTAURANT)
    out["one_chunk"] = s1

    # (b) two overlapping chunks: second re-writes three PKs (upsert, same
    # values so logical content is unchanged) plus holds the tail rows
    s2 = TableStore(str(tmp_path / "two"))
    s2.write_chunk(_df(spark, ROWS[:5] ), "restaurant", RESTAURANT)
    s2.write_chunk(_df(spark, ROWS[2:]), "restaurant", RESTAURANT)
    out["two_overlapping"] = s2

    # (c) line-protocol ingest in three batches, last batch replays batch 2
    s3 = TableStore(str(tmp_path / "lp"))
    ing = LineProtocolIngest(s3, "restaurant", RESTAURANT)
    def lp(r):
        return f"restaurant,town={r[0]} count={r[1]}i,system={r[2]} {r[3]}"
    batches = [ROWS[:3], ROWS[3:6], ROWS[4:]]
    for batch in batches:
        lines_df = spark.createDataFrame([(lp(r),) for r in batch], "value string")
        ing.ingest_lines_df(lines_df)
    out["line_protocol"] = s3

    # (d) two overlapping chunks, then compacted
    s4 = TableStore(str(tmp_path / "compacted"))
    s4.write_chunk(_df(spark, ROWS[:5]), "restaurant", RESTAURANT)
    s4.write_chunk(_df(spark, ROWS[2:]), "restaurant", RESTAURANT)
    compact_overlapping(spark, s4, "restaurant", RESTAURANT)
    out["compacted"] = s4

    # (e) persist-split at time 115
    s5 = TableStore(str(tmp_path / "split"))
    s5.write_chunk(_df(spark, ROWS[:5]), "restaurant", RESTAURANT)
    s5.write_chunk(_df(spark, ROWS[2:]), "restaurant", RESTAURANT)
    persist_split(spark, s5, "restaurant", RESTAURANT, split_time_ns=115)
    out["split"] = s5

    dbs = {}
    for name, store in out.items():
        db = Database(name, store, spark)
        db.register_table("restaurant", RESTAURANT)
        dbs[name] = db
    return dbs


# The pushdown-correctness query shapes (pushdown.sql 1-13): predicates on
# one field, both fields, field+tag, field+time, disjunctions, negations.
SQL_BATTERY = [
    "SELECT * FROM restaurant",
    "SELECT * FROM restaurant WHERE count > 200",
    "SELECT * FROM restaurant WHERE count > 200 AND town != 'tewsbury'",
    "SELECT * FROM restaurant WHERE system = 5.0",
    "SELECT * FROM restaurant WHERE count > 200 AND count < 40000",
    "SELECT * FROM restaurant WHERE system > 4.0 AND system < 7.0",
    "SELECT * FROM restaurant WHERE count > 200 AND town = 'reading'",
    "SELECT * FROM restaurant WHERE system = 5.0 OR town = 'lawrence'",
    "SELECT * FROM restaurant WHERE (system = 5.0 OR town = 'lawrence') AND count < 40000",
    "SELECT * FROM restaurant WHERE count > 200 AND time > 120",
    "SELECT town, SUM(count) AS total FROM restaurant GROUP BY town",
    "SELECT MIN(system) AS mn, MAX(system) AS mx FROM restaurant WHERE time >= 100 AND time < 130",
    "SELECT COUNT(*) AS n FROM restaurant WHERE town LIKE '%ing%'",
]


@pytest.fixture(scope="module")
def dbs(spark, tmp_path_factory):
    return _scenarios(spark, tmp_path_factory.mktemp("scenarios"))


@pytest.mark.parametrize("qi", range(len(SQL_BATTERY)))
def test_sql_battery_cross_scenario(dbs, qi):
    sql = SQL_BATTERY[qi]
    results = {}
    for name, db in dbs.items():
        rows = db.query(sql).collect()
        results[name] = sorted(tuple(r) for r in rows)
    baseline = results["one_chunk"]
    for name, rows in results.items():
        assert rows == baseline, f"scenario {name} disagrees on {sql!r}"


def test_rpc_battery_cross_scenario(dbs):
    pred = Predicate().with_range(100, 125)
    results = {}
    for name, db in dbs.items():
        rg = read_group(db, "restaurant", Aggregate.SUM, ["town"], pred)
        results[name] = sorted(tuple(r) for r in rg.collect())
    baseline = results["one_chunk"]
    for name, rows in results.items():
        assert rows == baseline, f"scenario {name} disagrees on read_group"


# -- duplicates golden (cases/in/duplicates.sql shape, h2o F5 fixture) ------

H2O = IoxSchema.build(
    ["state", "city"],
    {
        "min_temp": InfluxColumnType.FIELD_FLOAT,
        "max_temp": InfluxColumnType.FIELD_FLOAT,
        "area": InfluxColumnType.FIELD_FLOAT,
    },
)


def test_duplicates_golden(spark, tmp_path):
    """Partial-field chunks must merge per-PK with last-non-null fields
    (the duplicates.sql scenario: same PK written with disjoint field
    subsets across chunks)."""
    sch = "state string, city string, min_temp double, max_temp double, area double, time long"
    store = TableStore(str(tmp_path / "dups"))
    c1 = spark.createDataFrame(
        [
            ("MA", "Boston", 70.4, None, None, 50),
            ("MA", "Bedford", 71.59, 78.75, 742.0, 150),
        ],
        sch,
    )
    c2 = spark.createDataFrame(
        [
            ("MA", "Boston", None, 82.67, None, 50),      # same PK, fills max_temp
            ("MA", "Bedford", 78.75, None, 750.0, 150),   # same PK, updates area
        ],
        sch,
    )
    store.write_chunk(c1, "h2o", H2O)
    store.write_chunk(c2, "h2o", H2O)
    db = Database("dups", store, spark)
    db.register_table("h2o", H2O)
    rows = {
        (r.state, r.city, r.time): (r.min_temp, r.max_temp, r.area)
        for r in db.table("h2o").collect()
    }
    assert rows == {
        ("MA", "Boston", 50): (70.4, 82.67, None),
        ("MA", "Bedford", 150): (78.75, 78.75, 750.0),
    }


# -- influxrpc read_group semantic cases across physical arrangements -------
# Ports the semantics (fixtures + expected aggregates) of
# query_tests/src/influxrpc/read_group.rs:146-545, with each case asserted
# across three physical arrangements of the same logical rows (the
# make_two_chunk_scenarios dual, scenarios.rs).

H2O_AGGS = IoxSchema.build(
    ["state", "city"],
    {"humidity": InfluxColumnType.FIELD_FLOAT, "temp": InfluxColumnType.FIELD_FLOAT},
)

# AnotherMeasurementForAggs (read_group.rs:146-171)
AGG_ROWS1 = [
    ("MA", "Cambridge", None, 80.0, 50),
    ("MA", "Cambridge", None, 81.0, 100),
    ("MA", "Cambridge", None, 82.0, 200),
    ("MA", "Boston", None, 70.0, 300),
]
AGG_ROWS2 = [
    ("MA", "Boston", None, 71.0, 400),
    ("CA", "LA", 10.0, 90.0, 500),
    ("CA", "LA", 11.0, 91.0, 600),
]


def _h2o_arrangements(spark, tmp_path, schema, ddl, rows1, rows2, table="h2o"):
    """Same logical rows as (a) one chunk, (b) two chunks, (c) compacted."""
    def df(rows):
        return spark.createDataFrame(rows, ddl)

    dbs = {}
    s1 = TableStore(str(tmp_path / "one"))
    s1.write_chunk(df(rows1 + rows2), table, schema)
    dbs["one_chunk"] = s1
    s2 = TableStore(str(tmp_path / "two"))
    s2.write_chunk(df(rows1), table, schema)
    s2.write_chunk(df(rows2), table, schema)
    dbs["two_chunks"] = s2
    s3 = TableStore(str(tmp_path / "compacted"))
    s3.write_chunk(df(rows1), table, schema)
    s3.write_chunk(df(rows2), table, schema)
    from influxdb_iox_spark.plans.reorg import compact_chunks

    compact_chunks(spark, s3, table, schema)
    dbs["compacted"] = s3
    out = {}
    for name, store in dbs.items():
        db = Database(name, store, spark)
        db.register_table(table, schema)
        out[name] = db
    return out


AGGS_DDL = "state string, city string, humidity double, temp double, time long"


def _boston_or_cambridge():
    return (
        Predicate()
        .with_range(100, 1000)
        .with_expr((F.col("city") == "Boston") | (F.col("city") == "Cambridge"))
    )


def _assert_dual(dbs, fn):
    results = {name: fn(db) for name, db in dbs.items()}
    baseline = results["one_chunk"]
    for name, got in results.items():
        assert got == baseline, f"arrangement {name} disagrees"
    return baseline


def test_read_group_sum_semantics(spark, tmp_path):
    """read_group.rs:174-208 test_grouped_series_set_plan_sum."""
    dbs = _h2o_arrangements(spark, tmp_path, H2O_AGGS, AGGS_DDL, AGG_ROWS1, AGG_ROWS2)

    def run(db):
        out = read_group(db, "h2o", Aggregate.SUM, ["state"], _boston_or_cambridge())
        return {(r.state, r.city): (r.humidity, r.temp) for r in out.collect()}

    got = _assert_dual(dbs, run)
    assert got == {
        ("MA", "Boston"): (None, 141.0),
        ("MA", "Cambridge"): (None, 163.0),
    }


def test_read_group_count_semantics(spark, tmp_path):
    """read_group.rs:211-243: COUNT of an absent field is 0, not NULL."""
    dbs = _h2o_arrangements(spark, tmp_path, H2O_AGGS, AGGS_DDL, AGG_ROWS1, AGG_ROWS2)

    def run(db):
        out = read_group(db, "h2o", Aggregate.COUNT, ["state"], _boston_or_cambridge())
        return {(r.state, r.city): (r.humidity, r.temp) for r in out.collect()}

    got = _assert_dual(dbs, run)
    assert got == {
        ("MA", "Boston"): (0, 2),
        ("MA", "Cambridge"): (0, 2),
    }


def test_read_group_mean_semantics(spark, tmp_path):
    """read_group.rs:245-293 test_grouped_series_set_plan_mean."""
    dbs = _h2o_arrangements(spark, tmp_path, H2O_AGGS, AGGS_DDL, AGG_ROWS1, AGG_ROWS2)

    def run(db):
        out = read_group(db, "h2o", Aggregate.MEAN, ["state"], _boston_or_cambridge())
        return {(r.state, r.city): (r.humidity, r.temp) for r in out.collect()}

    got = _assert_dual(dbs, run)
    assert got == {
        ("MA", "Boston"): (None, 70.5),
        ("MA", "Cambridge"): (None, 81.5),
    }


# MeasurementForSelectors / ForMin / ForMax (read_group.rs:276-449): four
# field TYPES (float, int, bool, string) under selector aggregates.
SEL_SCHEMA = IoxSchema.build(
    ["state", "city"],
    {
        "f": InfluxColumnType.FIELD_FLOAT,
        "i": InfluxColumnType.FIELD_INTEGER,
        "b": InfluxColumnType.FIELD_BOOLEAN,
        "s": InfluxColumnType.FIELD_STRING,
    },
)
SEL_DDL = "state string, city string, f double, i long, b boolean, s string, time long"


def _sel_rows(*rows):
    return [("MA", "Cambridge", *r) for r in rows]


def test_read_group_selector_first_last_typed(spark, tmp_path):
    """read_group.rs:296-348: first/last (value, time) across all four field
    types, with the time range excluding the boundary rows."""
    rows1 = _sel_rows((8.0, 8, True, "d", 1000))
    rows2 = _sel_rows(
        (7.0, 7, True, "c", 2000), (6.0, 6, False, "b", 3000), (5.0, 5, False, "a", 4000)
    )
    dbs = _h2o_arrangements(spark, tmp_path, SEL_SCHEMA, SEL_DDL, rows1, rows2)

    def run_first(db):
        out = read_group(
            db, "h2o", Aggregate.FIRST, ["state"], Predicate().with_range(1001, 4001)
        )
        r = out.collect()[0]
        return (r.b, r.b_time, r.f, r.f_time, r.i, r.i_time, r.s, r.s_time)

    assert _assert_dual(dbs, run_first) == (
        True, 2000, 7.0, 2000, 7, 2000, "c", 2000
    )

    def run_last(db):
        out = read_group(
            db, "h2o", Aggregate.LAST, ["state"], Predicate().with_range(100, 3999)
        )
        r = out.collect()[0]
        return (r.b, r.b_time, r.f, r.f_time, r.i, r.i_time, r.s, r.s_time)

    assert _assert_dual(dbs, run_last) == (
        False, 3000, 6.0, 3000, 6, 3000, "b", 3000
    )


def test_read_group_selector_min_typed(spark, tmp_path):
    """read_group.rs:369-410: per-type selector MIN picks each field's own
    (value, time) — booleans order false < true, strings lexicographic."""
    rows1 = _sel_rows((8.0, 8, False, "c", 1000), (7.0, 7, True, "a", 2000))
    rows2 = _sel_rows((6.0, 6, True, "z", 3000), (5.0, 5, False, "c", 4000))
    dbs = _h2o_arrangements(spark, tmp_path, SEL_SCHEMA, SEL_DDL, rows1, rows2)

    def run(db):
        out = read_group(
            db, "h2o", Aggregate.MIN, ["state"], Predicate().with_range(100, 3999)
        )
        r = out.collect()[0]
        return (r.b, r.b_time, r.f, r.f_time, r.i, r.i_time, r.s, r.s_time)

    assert _assert_dual(dbs, run) == (
        False, 1000, 6.0, 3000, 6, 3000, "a", 2000
    )


def test_read_group_selector_max_typed(spark, tmp_path):
    """read_group.rs:413-449 test_grouped_series_set_plan_max."""
    rows1 = _sel_rows(
        (8.0, 8, True, "c", 1000), (7.0, 7, False, "d", 2000), (6.0, 6, True, "a", 3000)
    )
    rows2 = _sel_rows((5.0, 5, False, "z", 4000))
    dbs = _h2o_arrangements(spark, tmp_path, SEL_SCHEMA, SEL_DDL, rows1, rows2)

    def run(db):
        out = read_group(
            db, "h2o", Aggregate.MAX, ["state"], Predicate().with_range(1001, 4001)
        )
        r = out.collect()[0]
        return (r.b, r.b_time, r.f, r.f_time, r.i, r.i_time, r.s, r.s_time)

    assert _assert_dual(dbs, run) == (
        True, 3000, 7.0, 2000, 7, 2000, "z", 4000
    )


def test_read_group_none_prefix_reorder(spark, tmp_path):
    """read_group.rs:452-545: agg=NONE with group ["city","state"] returns
    raw rows ordered city-first (group-key prefix reorder)."""
    rows1 = [
        ("MA", "Cambridge", None, 80.0, 50),
        ("MA", "Cambridge", None, 81.0, 100),
        ("MA", "Cambridge", None, 82.0, 200),
    ]
    rows2 = [
        ("MA", "Boston", None, 70.0, 300),
        ("MA", "Boston", None, 71.0, 400),
        ("CA", "LA", 10.0, 90.0, 500),
        ("CA", "LA", 11.0, 91.0, 600),
    ]
    dbs = _h2o_arrangements(spark, tmp_path, H2O_AGGS, AGGS_DDL, rows1, rows2)

    def run(db):
        out = read_group(db, "h2o", Aggregate.NONE, ["city", "state"])
        return [(r.city, r.state, r.humidity, r.temp, r.time) for r in out.collect()]

    got = _assert_dual(dbs, run)
    assert got == [
        ("Boston", "MA", None, 70.0, 300),
        ("Boston", "MA", None, 71.0, 400),
        ("Cambridge", "MA", None, 80.0, 50),
        ("Cambridge", "MA", None, 81.0, 100),
        ("Cambridge", "MA", None, 82.0, 200),
        ("LA", "CA", 10.0, 90.0, 500),
        ("LA", "CA", 11.0, 91.0, 600),
    ]


def _group_keys_rows():
    """MeasurementForGroupKeys (read_group.rs:435-460)."""
    rows1 = [
        ("MA", "Cambridge", None, 80.0, 50),
        ("MA", "Cambridge", None, 81.0, 100),
        ("MA", "Cambridge", None, 82.0, 200),
    ]
    rows2 = [
        ("MA", "Boston", None, 70.0, 300),
        ("MA", "Boston", None, 71.0, 400),
        ("CA", "LA", 10.0, 90.0, 500),
        ("CA", "LA", 11.0, 91.0, 600),
    ]
    return rows1, rows2


def test_read_group_sum_group_by_state_city(spark, tmp_path):
    """read_group.rs:462-486 test_grouped_series_set_plan_group_by_state_city:
    SUM with group ["state","city"] — summed fields (null humidity where the
    field never appears) plus the shared max(time) per group."""
    rows1, rows2 = _group_keys_rows()
    dbs = _h2o_arrangements(spark, tmp_path, H2O_AGGS, AGGS_DDL, rows1, rows2)

    def run(db):
        out = read_group(db, "h2o", Aggregate.SUM, ["state", "city"])
        return [(r.state, r.city, r.humidity, r.temp, r.time) for r in out.collect()]

    assert _assert_dual(dbs, run) == [
        ("CA", "LA", 21.0, 181.0, 600),
        ("MA", "Boston", None, 141.0, 400),
        ("MA", "Cambridge", None, 243.0, 200),
    ]


def test_read_group_sum_group_by_city_state(spark, tmp_path):
    """read_group.rs:489-514: same data, alternate group-key order — the
    output ordering flips to city-first."""
    rows1, rows2 = _group_keys_rows()
    dbs = _h2o_arrangements(spark, tmp_path, H2O_AGGS, AGGS_DDL, rows1, rows2)

    def run(db):
        out = read_group(db, "h2o", Aggregate.SUM, ["city", "state"])
        return [(r.city, r.state, r.humidity, r.temp, r.time) for r in out.collect()]

    assert _assert_dual(dbs, run) == [
        ("Boston", "MA", None, 141.0, 400),
        ("Cambridge", "MA", None, 243.0, 200),
        ("LA", "CA", 21.0, 181.0, 600),
    ]


# -- lifecycle-shape scenarios (scenarios.rs) -------------------------------


def test_all_chunks_dropped_keeps_table(spark, tmp_path):
    """OneMeasurementAllChunksDropped (scenarios.rs:682-706): dropping every
    chunk keeps the table in the catalog; scans and SQL see zero rows with
    the full schema, and metadata ops answer empty rather than erroring."""
    from influxdb_iox_spark.operators.metadata import table_names, tag_keys

    store = TableStore(str(tmp_path / "dropped"))
    df = spark.createDataFrame(
        [("MA", 70.4, 50)], "state string, temp double, time long"
    )
    schema = IoxSchema.build(["state"], {"temp": InfluxColumnType.FIELD_FLOAT})
    meta = store.write_chunk(df, "h2o", schema)
    store.drop_chunks("h2o", [meta.chunk_id])

    db = Database("dropped", store, spark)
    db.register_table("h2o", schema)
    assert "h2o" in db.table_names()
    scan = db.table("h2o")
    assert set(scan.columns) == {"state", "temp", "time"}
    assert scan.count() == 0
    assert db.query("SELECT COUNT(*) AS n FROM h2o").collect()[0].n == 0
    assert table_names(db) == []  # no data -> no measurement rows
    assert tag_keys(db, "h2o") == []


def test_multi_chunk_delete_scenario(spark, tmp_path):
    """Dropping one of three chunks must answer exactly like a store that
    never had it (the delete-shaped scenario dual)."""
    schema = IoxSchema.build(["state"], {"temp": InfluxColumnType.FIELD_FLOAT})
    ddl = "state string, temp double, time long"
    c1 = [("MA", 70.0, 100), ("MA", 71.0, 150)]
    c2 = [("CA", 80.0, 200), ("CA", 81.0, 250)]
    c3 = [("NY", 90.0, 300), ("NY", 91.0, 350)]

    dropped = TableStore(str(tmp_path / "with_delete"))
    metas = [
        dropped.write_chunk(spark.createDataFrame(c, ddl), "h2o", schema)
        for c in (c1, c2, c3)
    ]
    dropped.drop_chunks("h2o", [metas[1].chunk_id])

    fresh = TableStore(str(tmp_path / "never_had"))
    for c in (c1, c3):
        fresh.write_chunk(spark.createDataFrame(c, ddl), "h2o", schema)

    out = {}
    for name, store in (("dropped", dropped), ("fresh", fresh)):
        db = Database(name, store, spark)
        db.register_table("h2o", schema)
        out[name] = sorted(tuple(r) for r in db.table("h2o").collect())
    assert out["dropped"] == out["fresh"]
    assert len(out["dropped"]) == 4


def test_drop_tombstone_then_compact_equals_fresh(spark, tmp_path):
    """The delete dual must hold through the NEW tombstone machinery: drop
    (appended tombstone) → compact_manifest (fold to .base snapshot) must
    answer exactly like a store that never had the chunk — for scans, SQL,
    and metadata ops."""
    from influxdb_iox_spark.operators.metadata import tag_keys, tag_values

    schema = IoxSchema.build(["state"], {"temp": InfluxColumnType.FIELD_FLOAT})
    ddl = "state string, temp double, time long"
    c1 = [("MA", 70.0, 100)]
    c2 = [("CA", 80.0, 200)]
    c3 = [("NY", 90.0, 300)]

    dropped = TableStore(str(tmp_path / "tombstoned"))
    metas = [
        dropped.write_chunk(spark.createDataFrame(c, ddl), "h2o", schema)
        for c in (c1, c2, c3)
    ]
    dropped.drop_chunks("h2o", [metas[1].chunk_id])
    assert dropped.compact_manifest("h2o") >= 1

    fresh = TableStore(str(tmp_path / "fresh"))
    for c in (c1, c3):
        fresh.write_chunk(spark.createDataFrame(c, ddl), "h2o", schema)

    answers = {}
    for name, store in (("tombstoned", dropped), ("fresh", fresh)):
        db = Database(name, store, spark)
        db.register_table("h2o", schema)
        answers[name] = (
            sorted(tuple(r) for r in db.table("h2o").collect()),
            db.query("SELECT state, temp FROM h2o ORDER BY state").collect(),
            tag_keys(db, "h2o"),
            tag_values(db, "h2o", "state"),
        )
    assert answers["tombstoned"] == answers["fresh"]
    assert answers["tombstoned"][3] == ["MA", "NY"]


def test_gc_retired_under_query(spark, tmp_path):
    """Retirement under a live query (drop_chunks docstring contract): with
    ``defer_delete_seconds`` the dropped chunk's FILES survive the manifest
    removal, so a DataFrame planned BEFORE the drop still collects; only
    ``gc_retired`` past the grace period reclaims the directory, and scans
    planned after the drop never see the chunk either way."""
    import os

    schema = IoxSchema.build(["state"], {"temp": InfluxColumnType.FIELD_FLOAT})
    store = TableStore(str(tmp_path / "gc"))
    m1 = store.write_chunk(
        spark.createDataFrame([("MA", 70.0, 100)], "state string, temp double, time long"),
        "h2o", schema,
    )
    store.write_chunk(
        spark.createDataFrame([("CA", 80.0, 200)], "state string, temp double, time long"),
        "h2o", schema,
    )
    db = Database("gc", store, spark)
    db.register_table("h2o", schema)

    before_drop = db.table("h2o")  # lazy plan referencing both chunks
    store.drop_chunks("h2o", [m1.chunk_id], defer_delete_seconds=3600)

    chunk_dir = os.path.join(store.base_dir, m1.path)
    assert os.path.isdir(chunk_dir)  # parked, not deleted
    # the pre-drop plan still executes against the parked files
    assert sorted(r.state for r in before_drop.collect()) == ["CA", "MA"]
    # a post-drop plan sees only the surviving chunk
    db2 = Database("gc2", store, spark)
    db2.register_table("h2o", schema)
    assert [r.state for r in db2.table("h2o").collect()] == ["CA"]

    assert store.gc_retired("h2o", grace_seconds=3600) == 0  # inside grace
    assert os.path.isdir(chunk_dir)
    assert store.gc_retired("h2o", grace_seconds=0) == 1  # grace elapsed
    assert not os.path.isdir(chunk_dir)
    # post-gc: scans still answer identically to the post-drop view
    assert [r.state for r in db2.table("h2o").collect()] == ["CA"]


def test_partition_scoped_drop_leaves_siblings_untouched(spark, tmp_path):
    """Dropping chunks of one partition must not touch sibling partitions'
    manifest files, and partition-scoped reads agree with the full-table
    view afterwards."""
    schema = IoxSchema.build(["state"], {"temp": InfluxColumnType.FIELD_FLOAT})
    ddl = "state string, temp double, time long"
    store = TableStore(str(tmp_path / "parts"))
    pa = store.write_chunk(
        spark.createDataFrame([("MA", 70.0, 100)], ddl), "h2o", schema,
        partition_key="2020-01-01",
    )
    pb = store.write_chunk(
        spark.createDataFrame([("CA", 80.0, 200)], ddl), "h2o", schema,
        partition_key="2020-01-02",
    )
    import os

    sibling = os.path.join(
        store._manifest_dir("h2o"), store._part_file("2020-01-02")
    )
    mtime_before = os.stat(sibling).st_mtime_ns
    store.drop_chunks("h2o", [pa.chunk_id])
    assert os.stat(sibling).st_mtime_ns == mtime_before  # untouched file
    assert [c.chunk_id for c in store.manifest_partition("h2o", "2020-01-02")] == [
        pb.chunk_id
    ]
    assert store.manifest_partition("h2o", "2020-01-01") == []
    assert [c.chunk_id for c in store.manifest("h2o")] == [pb.chunk_id]


# -- read_window_aggregate semantic cases (read_window_aggregate.rs) --------


def test_read_window_aggregate_nanoseconds_semantics(spark, tmp_path):
    """read_window_aggregate.rs:121-154 test_read_window_aggregate_nanoseconds:
    200ns tumbling MEAN with a tag disjunction + half-open time range,
    stop-boundary reported as time — asserted across three arrangements."""
    from influxdb_iox_spark.operators.series import read_window_aggregate

    schema = IoxSchema.build(
        ["state", "city"], {"temp": InfluxColumnType.FIELD_FLOAT}
    )
    ddl = "state string, city string, temp double, time long"
    rows1 = [
        ("MA", "Boston", 70.0, 100), ("MA", "Boston", 71.0, 200),
        ("MA", "Boston", 72.0, 300), ("MA", "Boston", 73.0, 400),
        ("MA", "Boston", 74.0, 500), ("MA", "Cambridge", 80.0, 100),
        ("MA", "Cambridge", 81.0, 200),
    ]
    rows2 = [
        ("MA", "Cambridge", 82.0, 300), ("MA", "Cambridge", 83.0, 400),
        ("MA", "Cambridge", 84.0, 500), ("CA", "LA", 90.0, 100),
        ("CA", "LA", 91.0, 200), ("CA", "LA", 92.0, 300),
        ("CA", "LA", 93.0, 400), ("CA", "LA", 94.0, 500),
    ]
    dbs = _h2o_arrangements(spark, tmp_path, schema, ddl, rows1, rows2)
    pred = (
        Predicate()
        .with_range(100, 450)
        .with_expr((F.col("city") == "Boston") | (F.col("city") == "LA"))
    )

    def run(db):
        out = read_window_aggregate(db, "h2o", Aggregate.MEAN, 200, 0, pred)
        return [(r.city, r.state, r.time, r.temp) for r in out.collect()]

    got = _assert_dual(dbs, run)
    assert got == [
        ("Boston", "MA", 200, 70.0),
        ("Boston", "MA", 400, 71.5),
        ("Boston", "MA", 600, 73.0),
        ("LA", "CA", 200, 90.0),
        ("LA", "CA", 400, 91.5),
        ("LA", "CA", 600, 93.0),
    ]


def test_read_window_aggregate_months_2020_fixture(spark, tmp_path):
    """read_window_aggregate.rs:156-232 test_read_window_aggregate_months:
    data spanning March/April 2020 written across four partition keys (the
    multi-partition ingest arrangement) must window to calendar-month means
    with the stop boundary as time — same answer as a single chunk."""
    from influxdb_iox_spark.operators.series import read_window_aggregate_months

    schema = IoxSchema.build(
        ["state", "city"], {"temp": InfluxColumnType.FIELD_FLOAT}
    )
    lines = [
        "h2o,state=MA,city=Boston temp=70.0 1583020800000000000",
        "h2o,state=MA,city=Boston temp=71.0 1583107920000000000",
        "h2o,state=MA,city=Boston temp=72.0 1585699200000000000",
        "h2o,state=MA,city=Boston temp=73.0 1585785600000000000",
    ]
    apr1_ns = 1585699200 * 10**9
    may1_ns = 1588291200 * 10**9

    # arrangement 1: four day-partitioned chunks via line-protocol ingest
    s1 = TableStore(str(tmp_path / "parts"))
    ing = LineProtocolIngest(s1, "h2o", schema)
    ing.ingest_lines_df(spark.createDataFrame([(l,) for l in lines], "value string"))
    assert len({m.partition_key for m in s1.manifest("h2o")}) == 4
    # arrangement 2: one chunk
    s2 = TableStore(str(tmp_path / "one"))
    rows = [("MA", "Boston", 70.0, 1583020800000000000),
            ("MA", "Boston", 71.0, 1583107920000000000),
            ("MA", "Boston", 72.0, 1585699200000000000),
            ("MA", "Boston", 73.0, 1585785600000000000)]
    s2.write_chunk(
        spark.createDataFrame(rows, "state string, city string, temp double, time long"),
        "h2o", schema,
    )

    expected = [("Boston", "MA", apr1_ns, 70.5), ("Boston", "MA", may1_ns, 72.5)]
    for store in (s1, s2):
        db = Database("m", store, spark)
        db.register_table("h2o", schema)
        out = read_window_aggregate_months(db, "h2o", Aggregate.MEAN, 1)
        assert [(r.city, r.state, r.time, r.temp) for r in out.collect()] == expected


def test_read_window_aggregate_no_data(spark, tmp_path):
    """read_window_aggregate.rs:73-88: no data + no predicate -> empty
    result, not an error."""
    from influxdb_iox_spark.operators.series import read_window_aggregate

    schema = IoxSchema.build(["state"], {"temp": InfluxColumnType.FIELD_FLOAT})
    store = TableStore(str(tmp_path / "empty"))
    db = Database("empty", store, spark)
    db.register_table("h2o", schema)
    out = read_window_aggregate(db, "h2o", Aggregate.MEAN, 200)
    assert out.count() == 0


def test_read_group_field_restriction(spark, tmp_path):
    """read_group.rs:127-150 test_read_group_data_field_restriction: a
    predicate field restriction limits which field columns the grouped
    aggregate emits.  Ported twice: the reference's exact
    OneMeasurementForAggs rows (temp-only schema — restriction is a
    no-op on the output set), then the humidity-bearing schema where
    restricting to temp must DROP the humidity column."""
    # exact reference fixture (read_group.rs:82-99)
    one_schema = IoxSchema.build(
        ["state", "city"], {"temp": InfluxColumnType.FIELD_FLOAT}
    )
    one_ddl = "state string, city string, temp double, time long"
    rows1 = [("MA", "Boston", 70.4, 100), ("MA", "Boston", 72.4, 250)]
    rows2 = [("CA", "LA", 90.0, 200), ("CA", "LA", 90.0, 350)]
    dbs = _h2o_arrangements(spark, tmp_path, one_schema, one_ddl, rows1, rows2)

    def run(db):
        out = read_group(
            db, "h2o", Aggregate.SUM, ["state"], Predicate().fields("temp")
        )
        return [(r.state, r.city, r.temp, r.time) for r in out.collect()]

    assert _assert_dual(dbs, run) == [
        ("CA", "LA", 180.0, 350),
        ("MA", "Boston", 142.8, 250),
    ]

    # restriction drops unselected fields from the output schema
    dbs2 = _h2o_arrangements(
        spark, tmp_path / "h", H2O_AGGS, AGGS_DDL, AGG_ROWS1, AGG_ROWS2
    )

    def run2(db):
        out = read_group(
            db, "h2o", Aggregate.SUM, ["state"], Predicate().fields("temp")
        )
        assert "humidity" not in out.columns
        return [(r.state, r.city, r.temp) for r in out.collect()]

    assert _assert_dual(dbs2, run2) == [
        ("CA", "LA", 181.0),
        ("MA", "Boston", 141.0),
        ("MA", "Cambridge", 243.0),
    ]


def test_field_columns_many_fields_battery(spark, tmp_path):
    """field_columns.rs:52-116 over the TwoMeasurementsManyFields two-chunk
    fixture: empty database, unknown-table predicate, table+state
    predicate (fields across BOTH chunks with per-field last non-null
    timestamps), and the timestamp-narrowed variant keeping only
    other_temp@250."""
    from influxdb_iox_spark.operators.metadata import field_columns

    # :52 empty database -> no fields (and no error)
    empty = Database("nodata", TableStore(str(tmp_path / "nodata")), spark)
    h2o_schema = IoxSchema.build(
        ["state", "city"],
        {
            "temp": InfluxColumnType.FIELD_FLOAT,
            "other_temp": InfluxColumnType.FIELD_FLOAT,
            "moisture": InfluxColumnType.FIELD_FLOAT,
        },
    )
    empty.register_table("h2o", h2o_schema)
    assert field_columns(empty, "h2o") == []

    # TwoMeasurementsManyFields (scenarios.rs:343-360), two chunks
    store = TableStore(str(tmp_path / "many"))
    ddl = (
        "state string, city string, temp double, other_temp double, "
        "moisture double, time long"
    )
    store.write_chunk(
        spark.createDataFrame(
            [
                ("MA", "Boston", 70.4, None, None, 50),
                ("MA", "Boston", None, 70.4, None, 250),
                ("CA", "Boston", None, 72.4, None, 350),
            ],
            ddl,
        ),
        "h2o", h2o_schema,
    )
    store.write_chunk(
        spark.createDataFrame(
            [("MA", "Boston", 70.4, None, 43.0, 100000)], ddl
        ),
        "h2o", h2o_schema,
    )
    o2_schema = IoxSchema.build(
        ["state", "city"],
        {
            "temp": InfluxColumnType.FIELD_FLOAT,
            "reading": InfluxColumnType.FIELD_FLOAT,
        },
    )
    store.write_chunk(
        spark.createDataFrame(
            [("MA", "Boston", 53.4, 51.0, 50), ("CA", None, 79.0, None, 300)],
            "state string, city string, temp double, reading double, time long",
        ),
        "o2", o2_schema,
    )
    db = Database("many", store, spark)
    db.register_table("h2o", h2o_schema)
    db.register_table("o2", o2_schema)

    # :59 predicate names a table that doesn't exist -> empty FieldList
    assert (
        field_columns(
            db, "NoSuchTable", Predicate().with_expr(F.col("state") == "MA")
        )
        == []
    )

    # :69 table h2o + state=MA: moisture@100000, other_temp@250, temp@100000
    out = field_columns(db, "h2o", Predicate().with_expr(F.col("state") == "MA"))
    assert {f["name"]: f["last_timestamp"] for f in out} == {
        "moisture": 100000,
        "other_temp": 250,
        "temp": 100000,
    }

    # :100 + ts [200,300): only the other_temp@250 row survives
    out = field_columns(
        db,
        "h2o",
        Predicate().with_range(200, 300).with_expr(F.col("state") == "MA"),
    )
    assert {f["name"]: f["last_timestamp"] for f in out} == {"other_temp": 250}


def test_table_schema_battery(spark, tmp_path):
    """query_tests/src/table_schema.rs ported to the IoxSchema twin:
    columns come out in lexicographic name order with their Influx
    categories (list_schema_cpu_all_mub / disk_all / location_all), a
    selection preserves the CALLER's column order (cpu/disk_selection),
    and chunks written or compacted carry the primary-key sort key the
    RUB scenarios assert (sorted_by = tags + time)."""
    from influxdb_iox_spark.plans.reorg import compact_chunks
    from influxdb_iox_spark.schema import column_type

    cpu_s = IoxSchema.build(["region"], {"user": InfluxColumnType.FIELD_FLOAT})
    disk_s = IoxSchema.build(["region"], {"bytes": InfluxColumnType.FIELD_INTEGER})
    # list_schema_cpu_all_mub: lexicographic order + categories
    assert [f.name for f in cpu_s.struct.fields] == ["region", "time", "user"]
    assert [column_type(f).value for f in cpu_s.struct.fields] == [
        "tag", "timestamp", "field::float",
    ]
    assert [f.name for f in disk_s.struct.fields] == ["bytes", "region", "time"]

    # list_schema_location_all: unsigned field category (u64 maps to
    # LongType — the documented Spark divergence, schema.py _SPARK_TYPES)
    rest_s = IoxSchema.build(["town"], {"count": InfluxColumnType.FIELD_UINTEGER})
    assert [f.name for f in rest_s.struct.fields] == ["count", "time", "town"]
    assert column_type(rest_s.struct.fields[0]).value == "field::uinteger"

    # materialize to check selection order + sort keys
    store = TableStore(str(tmp_path / "ts"))
    store.write_chunk(
        spark.createDataFrame(
            [("west", 23.2, 100), ("east", 21.0, 150)],
            "region string, user double, time long",
        ),
        "cpu", cpu_s,
    )
    db = Database("m", store, spark)
    db.register_table("cpu", cpu_s)

    # list_schema_cpu_selection: Selection::Some(["user","region"]) comes
    # back in the REQUESTED (non-lexicographic) order
    sel = db.table("cpu").select("user", "region")
    assert sel.columns == ["user", "region"]
    sel2 = db.table("cpu").select("time", "user")
    assert sel2.columns == ["time", "user"]

    # RUB sort-key scenarios: written chunks are PK-sorted and say so
    [chunk] = store.manifest("cpu")
    assert chunk.sorted_by == ["region", "time"]
    # ... and compaction preserves the sort key
    store.write_chunk(
        spark.createDataFrame(
            [("north", 5.0, 200)], "region string, user double, time long"
        ),
        "cpu", cpu_s,
    )
    compact_chunks(spark, store, "cpu", cpu_s)
    [compacted] = store.manifest("cpu")
    assert compacted.sorted_by == ["region", "time"]
