"""PK-dedup semantics tests.

Modeled on the reference's dedup fixtures: duplicate rows across chunks with
partially-null fields must collapse to last-non-null per field
(query/src/provider/deduplicate.rs:28-60; query_tests/cases/in/duplicates.sql).
"""

from __future__ import annotations

from pyspark.sql import Row

from influxdb_iox_spark.operators.dedup import attach_chunk_order, deduplicate


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_last_non_null_wins_across_chunks(spark):
    # chunk 0 (earlier) and chunk 1 (later) share PK (region=west, time=100)
    c0 = spark.createDataFrame(
        [
            Row(region="west", user=23.2, system=1.0, time=100),
            Row(region="west", user=21.0, system=2.0, time=150),
        ]
    )
    c1 = spark.createDataFrame(
        [("west", None, 9.0, 100), ("east", 5.0, None, 100)],  # null user → keep 23.2
        "region string, user double, system double, time long",
    )
    out = deduplicate(attach_chunk_order([c0, c1]), ["region"], ["user", "system"])
    assert _rows(out, "region", "time", "user", "system") == [
        ("east", 100, 5.0, None),
        ("west", 100, 23.2, 9.0),
        ("west", 150, 21.0, 2.0),
    ]


def test_all_null_field_stays_null(spark):
    sch = "t string, f double, g double, time long"
    c0 = spark.createDataFrame([("a", None, 1.0, 1)], sch)
    c1 = spark.createDataFrame([("a", None, None, 1)], sch)
    out = deduplicate(attach_chunk_order([c0, c1]), ["t"], ["f", "g"])
    assert _rows(out, "t", "time", "f", "g") == [("a", 1, None, 1.0)]


def test_later_chunk_wins_on_conflict(spark):
    chunks = [
        spark.createDataFrame([Row(t="a", f=float(i), time=7)]) for i in range(5)
    ]
    out = deduplicate(attach_chunk_order(chunks), ["t"], ["f"])
    assert _rows(out, "t", "time", "f") == [("a", 7, 4.0)]


def test_schema_merge_union(spark):
    # chunks with different column subsets union by name with nulls
    c0 = spark.createDataFrame([Row(t="a", f=1.0, time=1)])
    c1 = spark.createDataFrame([Row(t="a", g=2.0, time=2)])
    out = deduplicate(attach_chunk_order([c0, c1]), ["t"], ["f", "g"])
    assert _rows(out, "t", "time", "f", "g") == [
        ("a", 1, 1.0, None),
        ("a", 2, None, 2.0),
    ]


def test_multiple_tags_pk(spark):
    c0 = spark.createDataFrame(
        [
            Row(state="MA", city="Boston", temp=70.4, time=50),
            Row(state="MA", city="Boston", temp=71.0, time=100),
        ]
    )
    c1 = spark.createDataFrame(
        [
            Row(state="MA", city="Boston", temp=72.0, time=100),  # dup PK → 72.0
            Row(state="CA", city="LA", temp=90.0, time=100),
        ]
    )
    out = deduplicate(attach_chunk_order([c0, c1]), ["state", "city"], ["temp"])
    assert _rows(out, "state", "city", "time", "temp") == [
        ("CA", "LA", 100, 90.0),
        ("MA", "Boston", 50, 70.4),
        ("MA", "Boston", 100, 72.0),
    ]
