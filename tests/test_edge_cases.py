"""Edge cases from the reference corpus: empty tables (all_chunks_dropped),
read_group agg=NONE prefix reorder, window selector aggregates."""

from __future__ import annotations

from influxdb_iox_spark.database import Database
from influxdb_iox_spark.operators.series import (
    Aggregate,
    read_group,
    read_window_aggregate,
)
from influxdb_iox_spark.schema import InfluxColumnType, IoxSchema
from influxdb_iox_spark.sources.store import TableStore

CPU = IoxSchema.build(["region"], {"user": InfluxColumnType.FIELD_FLOAT})


def test_all_chunks_dropped_empty_table(spark, tmp_path):
    """A registered table with zero chunks answers queries with an empty,
    correctly-schemed result (cases/in/all_chunks_dropped.sql)."""
    store = TableStore(str(tmp_path))
    db = Database("db", store, spark)
    db.register_table("cpu", CPU)
    out = db.table("cpu")
    assert out.count() == 0
    assert out.columns == ["region", "time", "user"]
    assert db.query("SELECT count(*) AS n FROM cpu").first().n == 0


def _db(spark, tmp_path):
    store = TableStore(str(tmp_path))
    df = spark.createDataFrame(
        [
            ("west", 1.0, 100),
            ("west", 2.0, 200),
            ("east", 3.0, 150),
        ],
        "region string, user double, time long",
    )
    store.write_chunk(df, "cpu", CPU)
    db = Database("db", store, spark)
    db.register_table("cpu", CPU)
    return db


def test_read_group_none_degrades_to_sorted_filter(spark, tmp_path):
    db = _db(spark, tmp_path)
    out = read_group(db, "cpu", Aggregate.NONE, group_columns=["region"])
    rows = [tuple(r) for r in out.collect()]
    # all raw rows, sorted with the group column as prefix
    assert rows == [
        ("east", 3.0, 150),
        ("west", 1.0, 100),
        ("west", 2.0, 200),
    ]


def test_window_aggregate_last_selector(spark, tmp_path):
    db = _db(spark, tmp_path)
    out = read_window_aggregate(db, "cpu", Aggregate.LAST, every_ns=1000)
    row = {r.region: r for r in out.collect()}["west"]
    assert (row.user, row.user_time) == (2.0, 200)  # latest in-window value+time


def test_correctness_window_rotation_tiles_all_queries():
    """The driver's correctness checker caps at ~50 entries; queries() is
    rotated per round so consecutive windows tile the whole surface.  Pin
    the invariant: for ANY run of k = ceil(n/50) consecutive rounds >= 4,
    the union of the 50-entry windows covers every declared query (k was
    2 until round 7 crossed 100 queries; test_entry_rotation.py carries
    the full generalized battery — this is the edge-case smoke of it)."""
    import math

    import __spark_entry__ as E

    names = list(E.queries())
    n = len(names)
    # recompute the canonical (unrotated) order by undoing this round's shift
    r = E._round_number()
    shift = (50 * (r - 4)) % n if r >= 4 else 0
    canonical = names[n - shift:] + names[: n - shift] if shift else names

    def window(round_no):
        s = (50 * (round_no - 4)) % n if round_no >= 4 else 0
        rotated = canonical[s:] + canonical[:s]
        return set(rotated[:50])

    k = math.ceil(n / 50)
    for rnd in range(4, 12):
        union = set()
        for j in range(k):
            union |= window(rnd + j)
        assert union == set(canonical), (
            f"rounds {rnd}..{rnd + k - 1} miss {set(canonical) - union}"
        )
