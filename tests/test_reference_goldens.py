"""Faithful ports of the reference's golden-value SQL tests.

Fixtures are the reference's exact line-protocol writes; expected values are
its exact golden tables:
- sql_deduplicate_1 (query_tests/src/sql.rs:666-693) over
  OneMeasurementThreeChunksWithDuplicates (scenarios.rs:461-540): 4 chunks,
  cross-chunk upserts, within-chunk duplicates → 18 dedup-merged rows.
- sql_select_all_different_tags_chunks + sql_select_non_keys
  (sql.rs:695-727) over OneMeasurementTwoChunksDifferentTagSet
  (scenarios.rs:420-455): chunks with different TAG sets merge by name.
"""

from __future__ import annotations

from influxdb_iox_spark.database import Database
from influxdb_iox_spark.schema import InfluxColumnType, IoxSchema
from influxdb_iox_spark.sources.store import TableStore
from influxdb_iox_spark.streaming.ingest import LineProtocolIngest

H2O_DUP = IoxSchema.build(
    ["state", "city"],
    {
        "min_temp": InfluxColumnType.FIELD_FLOAT,
        "max_temp": InfluxColumnType.FIELD_FLOAT,
        "area": InfluxColumnType.FIELD_UINTEGER,
    },
)

# scenarios.rs:461-540, verbatim line protocol (4 chunks)
CHUNKS = [
    [
        "h2o,state=MA,city=Boston min_temp=70.4 50",
        "h2o,state=MA,city=Bedford min_temp=71.59 150",
        "h2o,state=MA,city=Boston max_temp=75.4 250",
        "h2o,state=MA,city=Andover max_temp=69.2, 250",
    ],
    [
        "h2o,state=MA,city=Bedford max_temp=78.75,area=742u 150",
        "h2o,state=MA,city=Boston min_temp=65.4 250",
        "h2o,state=MA,city=Reading min_temp=53.4, 250",
        "h2o,state=CA,city=SF min_temp=79.0,max_temp=87.2,area=500u 300",
        "h2o,state=CA,city=SJ min_temp=78.5,max_temp=88.0 300",
        "h2o,state=CA,city=SJ min_temp=75.5,max_temp=84.08 350",
    ],
    [
        "h2o,state=MA,city=Bedford max_temp=80.75,area=742u 400",
        "h2o,state=MA,city=Boston min_temp=68.4 400",
        "h2o,state=MA,city=Bedford min_temp=65.22,area=750u 400",
        "h2o,state=MA,city=Boston min_temp=65.40,max_temp=82.67 400",
        "h2o,state=CA,city=SJ min_temp=77.0,max_temp=90.7 450",
        "h2o,state=CA,city=SJ min_temp=69.5,max_temp=88.2 500",
    ],
    [
        "h2o,state=MA,city=Bedford max_temp=88.75,area=742u 600",
        "h2o,state=MA,city=Boston min_temp=67.4 600",
        "h2o,state=MA,city=Reading min_temp=60.4, 600",
        "h2o,state=CA,city=SF min_temp=68.4,max_temp=85.7,area=500u 650",
        "h2o,state=CA,city=SJ min_temp=69.5,max_temp=89.2 650",
        "h2o,state=CA,city=SJ min_temp=75.5,max_temp=84.08 700",
    ],
]

# sql.rs:670-693 golden table: (time, state, city, min_temp, max_temp, area)
EXPECTED_DEDUP = [
    (50, "MA", "Boston", 70.4, None, None),
    (150, "MA", "Bedford", 71.59, 78.75, 742),
    (250, "MA", "Andover", None, 69.2, None),
    (250, "MA", "Boston", 65.4, 75.4, None),
    (250, "MA", "Reading", 53.4, None, None),
    (300, "CA", "SF", 79.0, 87.2, 500),
    (300, "CA", "SJ", 78.5, 88.0, None),
    (350, "CA", "SJ", 75.5, 84.08, None),
    (400, "MA", "Bedford", 65.22, 80.75, 750),
    (400, "MA", "Boston", 65.4, 82.67, None),
    (450, "CA", "SJ", 77.0, 90.7, None),
    (500, "CA", "SJ", 69.5, 88.2, None),
    (600, "MA", "Bedford", None, 88.75, 742),
    (600, "MA", "Boston", 67.4, None, None),
    (600, "MA", "Reading", 60.4, None, None),
    (650, "CA", "SF", 68.4, 85.7, 500),
    (650, "CA", "SJ", 69.5, 89.2, None),
    (700, "CA", "SJ", 75.5, 84.08, None),
]


def test_sql_deduplicate_1_golden(spark, tmp_path):
    store = TableStore(str(tmp_path))
    ing = LineProtocolIngest(store, "h2o", H2O_DUP)
    for chunk in CHUNKS:
        ing.ingest_lines_df(spark.createDataFrame([(l,) for l in chunk], "value string"))
    assert len(store.manifest("h2o")) == 4

    db = Database("db", store, spark)
    db.register_table("h2o", H2O_DUP)
    rows = db.query(
        "SELECT time, state, city, min_temp, max_temp, area FROM h2o "
        "ORDER BY time, state, city"
    ).collect()
    assert [tuple(r) for r in rows] == EXPECTED_DEDUP


H2O_TAGSETS = IoxSchema.build(
    ["state", "city"],
    {
        "temp": InfluxColumnType.FIELD_FLOAT,
        "other_temp": InfluxColumnType.FIELD_FLOAT,
        "reading": InfluxColumnType.FIELD_FLOAT,
    },
)


def _tagset_db(spark, tmp_path):
    store = TableStore(str(tmp_path))
    ing = LineProtocolIngest(store, "h2o", H2O_TAGSETS)
    for chunk in [
        ["h2o,state=MA temp=70.4 50", "h2o,state=MA other_temp=70.4 250"],
        ["h2o,city=Boston other_temp=72.4 350", "h2o,city=Boston temp=53.4,reading=51 50"],
    ]:
        ing.ingest_lines_df(spark.createDataFrame([(l,) for l in chunk], "value string"))
    db = Database("db", store, spark)
    db.register_table("h2o", H2O_TAGSETS)
    return db


def test_sql_select_all_different_tags_chunks_golden(spark, tmp_path):
    db = _tagset_db(spark, tmp_path)
    rows = db.query(
        "SELECT city, other_temp, reading, state, temp, time FROM h2o "
        "ORDER BY city NULLS FIRST, time"
    ).collect()
    # sql.rs:712-719 golden
    assert [tuple(r) for r in rows] == [
        (None, None, None, "MA", 70.4, 50),
        (None, 70.4, None, "MA", None, 250),
        ("Boston", None, 51.0, None, 53.4, 50),
        ("Boston", 72.4, None, None, None, 350),
    ]


def test_sql_select_non_keys_golden(spark, tmp_path):
    db = _tagset_db(spark, tmp_path)
    rows = sorted(
        (r.temp is not None, r.temp) for r in db.query("SELECT temp FROM h2o").collect()
    )
    # sql.rs:697-701 golden: two NULLs, 53.4, 70.4
    assert [t for _, t in rows] == [None, None, 53.4, 70.4]


# ---------------------------------------------------------------------------
# sql_predicate_pushdown_correctness_1..11 (query_tests/src/sql.rs:410-627)
# over TwoMeasurementsPredicatePushDown (scenarios.rs:274-294)
# ---------------------------------------------------------------------------

RESTAURANT = IoxSchema.build(
    ["town"],
    {
        "count": InfluxColumnType.FIELD_UINTEGER,
        "system": InfluxColumnType.FIELD_FLOAT,
    },
)
SCHOOL = RESTAURANT

PUSHDOWN_LINES = [
    "restaurant,town=andover count=40000u,system=5.0 100",
    "restaurant,town=reading count=632u,system=5.0 120",
    "restaurant,town=bedford count=189u,system=7.0 110",
    "restaurant,town=tewsbury count=471u,system=6.0 110",
    "restaurant,town=lexington count=372u,system=5.0 100",
    "restaurant,town=lawrence count=872u,system=6.0 110",
    "restaurant,town=reading count=632u,system=6.0 130",
    "school,town=reading count=17u,system=6.0 150",
    "school,town=andover count=25u,system=6.0 160",
]

_ALL = {
    (189, 7.0, 110, "bedford"),
    (372, 5.0, 100, "lexington"),
    (40000, 5.0, 100, "andover"),
    (471, 6.0, 110, "tewsbury"),
    (632, 5.0, 120, "reading"),
    (632, 6.0, 130, "reading"),
    (872, 6.0, 110, "lawrence"),
}


def _row(c, s, t, town):
    return (c, s, t, town)


# (where_clause, expected row set) — reference tests 1..11; test 11's
# to_timestamp(...130ns) predicate is written on the canonical ns-long time.
PUSHDOWN_CASES = [
    ("", _ALL),
    ("where count > 200", {r for r in _ALL if r[0] > 200}),
    (
        "where count > 200 and town != 'tewsbury'",
        {r for r in _ALL if r[0] > 200 and r[3] != "tewsbury"},
    ),
    (
        "where count > 200 and town != 'tewsbury' and (system =5 or town = 'lawrence')",
        {
            _row(372, 5.0, 100, "lexington"),
            _row(40000, 5.0, 100, "andover"),
            _row(632, 5.0, 120, "reading"),
            _row(872, 6.0, 110, "lawrence"),
        },
    ),
    (
        "where count > 200 and town != 'tewsbury' and (system =5 or town = 'lawrence') and count < 40000",
        {
            _row(372, 5.0, 100, "lexington"),
            _row(632, 5.0, 120, "reading"),
            _row(872, 6.0, 110, "lawrence"),
        },
    ),
    (
        "where count > 200  and count < 40000",
        {r for r in _ALL if 200 < r[0] < 40000},
    ),
    (
        "where system > 4.0 and system < 7.0",
        {r for r in _ALL if 4.0 < r[1] < 7.0},
    ),
    (
        "where system > 5.0 and system < 7.0",
        {r for r in _ALL if 5.0 < r[1] < 7.0},
    ),
    (
        "where system > 5.0 and town != 'tewsbury' and 7.0 > system",
        {_row(632, 6.0, 130, "reading"), _row(872, 6.0, 110, "lawrence")},
    ),
    (
        "where system > 5.0 and 'tewsbury' != town and system < 7.0 and (count = 632 or town = 'reading')",
        {_row(632, 6.0, 130, "reading")},
    ),
    (
        "where 5.0 < system and town != 'tewsbury' and system < 7.0 and (count = 632 or town = 'reading') and time > 130",
        set(),
    ),
]


def test_sql_predicate_pushdown_goldens(spark, tmp_path):
    store = TableStore(str(tmp_path / "pushdown"))
    lines_df = spark.createDataFrame([(l,) for l in PUSHDOWN_LINES], "value string")
    LineProtocolIngest(store, "restaurant", RESTAURANT).ingest_lines_df(lines_df)
    LineProtocolIngest(store, "school", SCHOOL).ingest_lines_df(lines_df)
    db = Database("db", store, spark)
    db.register_table("restaurant", RESTAURANT)
    db.register_table("school", SCHOOL)

    for where, want in PUSHDOWN_CASES:
        got = {
            (r["count"], r.system, r.time, r.town)
            for r in db.query(
                f"SELECT count, system, time, town FROM restaurant {where}"
            ).collect()
        }
        assert got == want, where

    # sql_select_from_school (sql.rs:166-180)
    school = {
        (r.town, r["count"], r.system, r.time)
        for r in db.query("SELECT town, count, system, time FROM school").collect()
    }
    assert school == {("reading", 17, 6.0, 150), ("andover", 25, 6.0, 160)}
