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
