"""InfluxQL SLIMIT/SOFFSET (operators/series.series_limit): lexicographic
series selection, offset windows, and the rank-over-distinct-keys plan
(rows never pass through a global window).  Cross-engine values are
pinned by the oracle-paired `rpc_series_limit` query."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from influxdb_iox_spark.operators.series import series_limit


def _df(spark):
    rows = [
        # (region, host, value) — series key (region, host)
        ("eu", "a", 1.0),
        ("eu", "a", 2.0),
        ("eu", "b", 3.0),
        ("us", "a", 4.0),
        ("us", "c", 5.0),
        ("us", "c", 6.0),
    ]
    return spark.createDataFrame(rows, "region string, host string, value double")


def test_slimit_takes_series_in_tag_order(spark):
    # series order: (eu,a) (eu,b) (us,a) (us,c)
    out = series_limit(_df(spark), ["region", "host"], n=2)
    got = sorted((r.region, r.host, r.value) for r in out.collect())
    assert got == [("eu", "a", 1.0), ("eu", "a", 2.0), ("eu", "b", 3.0)]


def test_soffset_shifts_the_series_window(spark):
    out = series_limit(_df(spark), ["region", "host"], n=2, offset=2)
    got = sorted({(r.region, r.host) for r in out.collect()})
    assert got == [("us", "a"), ("us", "c")]
    # offset past the end -> empty, not an error
    assert series_limit(_df(spark), ["region", "host"], n=5, offset=99).count() == 0
    with pytest.raises(ValueError):
        series_limit(_df(spark), ["region", "host"], n=0)


def test_slimit_null_tag_series_sorts_last(spark):
    # SQL engines order nulls LAST by default; Spark's asc() is
    # nulls-first — the operator pins nulls-last so a null-tag series
    # cannot reorder the window cross-engine
    rows = [("eu", None, 9.0), ("eu", "a", 1.0), ("eu", "b", 2.0)]
    df = spark.createDataFrame(rows, "region string, host string, value double")
    first_two = series_limit(df, ["region", "host"], n=2)
    assert sorted({r.host for r in first_two.collect() if r.host}) == ["a", "b"]
    last = series_limit(df, ["region", "host"], n=1, offset=2)
    assert [r.host for r in last.collect()] == [None]


def test_slimit_plan_ranks_keys_not_rows(spark):
    # the global (partition-less) window must sit above the DISTINCT
    # key aggregate, and the join back must be a broadcast semi join —
    # rows never enter a global sort/window
    plan = (
        series_limit(_df(spark), ["region", "host"], n=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "LeftSemi" in plan and "Broadcast" in plan
    assert "EvalPython" not in plan and "InPandas" not in plan
    w = plan.index("Window")
    agg = plan.index("HashAggregate")  # the distinct on keys
    assert w < agg, "window must consume the distinct key set, not raw rows"
