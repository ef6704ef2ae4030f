"""Bucketized interval join (operators/interval_join): equi-join on the
covering time bucket — correct against a naive range join, half-open
ends, key scoping, left_semi dedup, the in-plan expansion guard, and the
plan-shape guarantee (never a nested-loop/cartesian join)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.errors import SparkRuntimeException

from influxdb_iox_spark.operators.interval_join import interval_join

B = 100  # bucket size for tests


def _points(spark):
    rows = [(k, t, f"p{k}{t}") for k in ("a", "b") for t in range(0, 1000, 37)]
    return spark.createDataFrame(rows, "k string, t long, pid string")


def _intervals(spark):
    rows = [
        ("a", 0, 150, "i1"),      # spans 2 buckets
        ("a", 149, 150, "i2"),    # 1-point-wide
        ("a", 700, 701, "i3"),
        ("b", 50, 450, "i4"),     # spans 5 buckets
        ("a", 300, 300, "i5"),    # empty half-open -> drops
        ("b", 990, 1100, "i6"),   # overhangs the data
    ]
    return spark.createDataFrame(rows, "k string, s long, e long, iid string")


def _naive(points, intervals, keys=True):
    p = [r.asDict() for r in points.collect()]
    iv = [r.asDict() for r in intervals.collect()]
    out = set()
    for a in p:
        for b in iv:
            if keys and a["k"] != b["k"]:
                continue
            if b["s"] <= a["t"] < b["e"]:
                out.add((a["pid"], b["iid"]))
    return out


def test_matches_naive_range_join(spark):
    got = {
        (r["pid"], r["iid"])
        for r in interval_join(
            _points(spark), _intervals(spark), "t", "s", "e",
            keys=["k"], bucket_ns=B,
        ).collect()
    }
    assert got == _naive(_points(spark), _intervals(spark))
    assert got  # non-degenerate


def test_half_open_ends(spark):
    pts = spark.createDataFrame([(100,), (199,), (200,)], "t long")
    iv = spark.createDataFrame([(100, 200)], "s long, e long")
    got = sorted(
        r["t"]
        for r in interval_join(pts, iv, "t", "s", "e", bucket_ns=B).collect()
    )
    assert got == [100, 199]  # start inclusive, end exclusive


def test_no_keys_and_multi_bucket_expansion(spark):
    # one interval spanning 7 buckets catches every point inside it once
    pts = spark.createDataFrame([(t,) for t in range(0, 700, 13)], "t long")
    iv = spark.createDataFrame([(5, 650)], "s long, e long")
    rows = interval_join(pts, iv, "t", "s", "e", bucket_ns=B).collect()
    want = [t for t in range(0, 700, 13) if 5 <= t < 650]
    assert sorted(r["t"] for r in rows) == want  # exactly once each


def test_left_semi_dedups_overlapping_intervals(spark):
    pts = spark.createDataFrame([(t,) for t in (10, 110, 510)], "t long")
    iv = spark.createDataFrame(
        [(0, 200), (50, 300)], "s long, e long"  # 110 falls in BOTH
    )
    rows = interval_join(
        pts, iv, "t", "s", "e", bucket_ns=B, how="left_semi"
    ).collect()
    assert sorted(r["t"] for r in rows) == [10, 110]


def test_expansion_guard_raises_in_plan(spark):
    pts = spark.createDataFrame([(5,)], "t long")
    iv = spark.createDataFrame([(0, 10_000_000)], "s long, e long")
    with pytest.raises(SparkRuntimeException, match="interval_join"):
        interval_join(
            pts, iv, "t", "s", "e", bucket_ns=1, max_expansion=100
        ).collect()


def test_plan_is_equi_join_never_nested_loop(spark):
    df = interval_join(
        _points(spark), _intervals(spark), "t", "s", "e",
        keys=["k"], bucket_ns=B,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
