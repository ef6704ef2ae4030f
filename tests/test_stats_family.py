"""InfluxQL statistical aggregates (operators/stats.py): SPREAD / MODE /
STDDEV — determinism under ties and exactness under re-partitioning.

Cross-engine values are pinned by the oracle-paired `rpc_stats_family`
query (test_oracle_parity); these tests pin the semantics the oracle
can't express: the mode tie RULE, the partition-invariance of the
exact-sums stddev, and the plan shape.
"""

from __future__ import annotations

import math
import statistics

import pyspark.sql.functions as F

from influxdb_iox_spark.operators.stats import (
    mode_smallest,
    sample_stddev_micro,
    spread,
)


def test_mode_tie_breaks_to_smallest_value(spark):
    # 7 and 3 both appear twice in group "a": the SMALLEST must win,
    # regardless of insertion or hash-agg visit order.
    rows = [("a", 7), ("a", 3), ("a", 7), ("a", 3), ("a", 9), ("b", 5)]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {r.g: r.mode_value for r in mode_smallest(df, "v", ["g"]).collect()}
    assert got == {"a": 3, "b": 5}


def test_mode_rejects_non_numeric_values(spark):
    import pytest

    df = spark.createDataFrame([("a", "x")], "g string, v string")
    with pytest.raises(TypeError, match="numeric"):
        mode_smallest(df, "v", ["g"])


def test_mode_ignores_nulls(spark):
    rows = [("a", None), ("a", None), ("a", 1)]
    df = spark.createDataFrame(rows, "g string, v long")
    got = mode_smallest(df, "v", ["g"]).collect()
    assert [(r.g, r.mode_value) for r in got] == [("a", 1)]


def test_stddev_matches_python_statistics(spark):
    vals = [1.25, 2.5, 3.75, 10.0, -4.5]
    df = spark.createDataFrame([("a", v) for v in vals], "g string, v double")
    got = df.groupBy("g").agg(sample_stddev_micro("v").alias("s")).collect()[0].s
    micro = [round(v * 1e6) for v in vals]
    expect = round(statistics.stdev(micro))
    assert got == expect
    # and it is the micro-unit rendering of the float-domain stdev
    # micro-unit rounding can move the result by up to 0.5e-6
    assert math.isclose(got / 1e6, statistics.stdev(vals), abs_tol=1e-6)


def test_stddev_partition_invariant_and_n1_is_zero(spark):
    vals = [float(x) * 0.1 for x in range(1, 201)]
    df = spark.createDataFrame([("a", v) for v in vals], "g string, v double")
    agg = lambda d: d.groupBy("g").agg(sample_stddev_micro("v").alias("s")).collect()[0].s
    # exact integer sums commute: any partitioning gives the identical long
    assert agg(df.repartition(1)) == agg(df.repartition(32)) == agg(df)

    one = spark.createDataFrame([("a", 5.0)], "g string, v double")
    assert agg(one) == 0


def test_percentile_nearest_rank_returns_actual_values(spark):
    from influxdb_iox_spark.operators.stats import percentile_nearest_rank

    # 10 values 1..10: p50 -> rank ceil(0.5*10)=5 -> value 5 (NOT the
    # interpolated 5.5); p90 -> rank 9; p100 -> rank 10 (the max).
    df = spark.createDataFrame(
        [("a", float(i)) for i in range(1, 11)] + [("a", None)],
        "g string, v double",
    )
    r = percentile_nearest_rank(df, "v", ["g"], [50.0, 90.0, 100.0]).collect()[0]
    assert (r.p50, r.p90, r.p100) == (5.0, 9.0, 10.0)

    # single-element group: every percentile is that element
    one = spark.createDataFrame([("b", 7.5)], "g string, v double")
    r1 = percentile_nearest_rank(one, "v", ["g"], [1.0, 99.9]).collect()[0]
    assert (r1.p1, r1.p99_9) == (7.5, 7.5)

    import pytest

    with pytest.raises(ValueError):
        percentile_nearest_rank(df, "v", ["g"], [0.0])


def test_percentile_plan_shares_one_exchange(spark):
    from influxdb_iox_spark.operators.stats import percentile_nearest_rank

    df = spark.createDataFrame([("a", 1.0)], "g string, v double")
    plan = (
        percentile_nearest_rank(df, "v", ["g"], [50.0, 95.0])
        ._jdf.queryExecution().executedPlan().toString()
    )
    # row_number and the per-group count share the key partitioning; the
    # final aggregate reuses it -> exactly one hash exchange, no Python
    assert plan.count("Exchange hashpartitioning") <= 1
    assert "EvalPython" not in plan and "InPandas" not in plan


def test_spread_and_plan_single_aggregate(spark):
    df = spark.createDataFrame(
        [("a", 1.5), ("a", -2.5), ("a", 4.0)], "g string, v double"
    )
    def build():
        return df.groupBy("g").agg(
            spread("v").alias("spread"), sample_stddev_micro("v").alias("s")
        )

    assert build().collect()[0].spread == 6.5
    # plan asserted on a FRESH uncollected frame: a collected one prints
    # Final AND Initial plan sections, doubling every operator count
    plan = build()._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "InPandas" not in plan
    # one exchange: partial + final hash aggregate around a single shuffle
    assert plan.count("Exchange hashpartitioning") <= 1
