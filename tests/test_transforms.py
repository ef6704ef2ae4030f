"""operators/transforms.py — InfluxQL-family per-series transforms.

Hand-computed expected values on a tiny two-series frame; exactness
properties for the integer-unit policy."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from influxdb_iox_spark.operators import transforms as T


@pytest.fixture(scope="module")
def series_df(spark):
    rows = [
        # (series, t_us, value)
        ("a", 1_000_000, 1.0),
        ("a", 2_000_000, 3.0),
        ("a", 4_000_000, 2.0),
        ("a", 7_000_000, 6.0),
        ("b", 1_000_000, 10.0),
        ("b", 3_000_000, 10.5),
    ]
    return spark.createDataFrame(rows, ["s", "t", "v"])


def _w():
    return T.series_window(["s"], ["t"])


def _collect(series_df, *cols):
    return {
        (r.s, r.t): tuple(r[c] for c in [c.split(" AS ")[-1] for c in cols])
        for r in series_df.collect()
    }


def test_difference_and_elapsed(series_df):
    w = _w()
    out = series_df.select(
        "s",
        "t",
        T.difference(F.col("v"), w).alias("d"),
        T.non_negative_difference(F.col("v"), w).alias("nnd"),
        T.elapsed(F.col("t"), w).alias("e"),
    ).collect()
    got = {(r.s, r.t): (r.d, r.nnd, r.e) for r in out}
    assert got[("a", 1_000_000)] == (None, None, None)
    assert got[("a", 2_000_000)] == (2.0, 2.0, 1_000_000)
    assert got[("a", 4_000_000)] == (-1.0, None, 2_000_000)  # negative dropped
    assert got[("a", 7_000_000)] == (4.0, 4.0, 3_000_000)
    assert got[("b", 3_000_000)] == (0.5, 0.5, 2_000_000)


def test_cumulative_sum_and_moving_average(series_df):
    w = _w()
    micro = T.to_micro_units(F.col("v"))
    out = series_df.select(
        "s",
        "t",
        T.cumulative_sum(micro, w).alias("cs"),
        T.moving_average_sum(micro, w, 2).alias("ms"),
        T.moving_average_count(w, 2).alias("mc"),
    ).collect()
    got = {(r.s, r.t): (r.cs, r.ms, r.mc) for r in out}
    assert got[("a", 4_000_000)] == (6_000_000, 5_000_000, 2)
    assert got[("a", 7_000_000)] == (12_000_000, 8_000_000, 2)
    assert got[("b", 1_000_000)] == (10_000_000, 10_000_000, 1)  # warm-up


def test_derivative_per_second(series_df):
    w = _w()
    out = series_df.select(
        "s", "t", T.derivative(F.col("v"), F.col("t"), w, 1_000_000).alias("r")
    ).collect()
    got = {(r.s, r.t): r.r for r in out}
    assert got[("a", 2_000_000)] == pytest.approx(2.0)  # +2 over 1s
    assert got[("a", 4_000_000)] == pytest.approx(-0.5)  # -1 over 2s
    assert got[("b", 3_000_000)] == pytest.approx(0.25)


def test_weighted_ema_exact_and_warmup(series_df):
    w = _w()
    micro = T.to_micro_units(F.col("v"))
    num, den = T.weighted_ema_sums(micro, w, 3)  # weights 4,2,1
    out = series_df.select("s", "t", num.alias("n"), den.alias("d")).collect()
    got = {(r.s, r.t): (r.n, r.d) for r in out}
    # a@4s: 4*2.0 + 2*3.0 + 1*1.0 = 15.0 (micro), full weight 7
    assert got[("a", 4_000_000)] == (15_000_000, 7)
    # a@7s: 4*6.0 + 2*2.0 + 1*3.0 = 31.0
    assert got[("a", 7_000_000)] == (31_000_000, 7)
    # warm-up: first point has only its own weight
    assert got[("a", 1_000_000)] == (4_000_000, 4)
    assert got[("b", 3_000_000)] == (4 * 10_500_000 + 2 * 10_000_000, 6)


def test_weighted_ema_validates_n(series_df):
    w = _w()
    with pytest.raises(ValueError):
        T.weighted_ema_sums(F.col("v"), w, 0)
    with pytest.raises(ValueError):
        T.weighted_ema_sums(F.col("v"), w, 63)


def test_weighted_ema_wide_n_uses_decimal(spark):
    """n > 32 would overflow int64 for micro-unit magnitudes
    ((2^n-1)·|v| ≥ 2^63); the operator switches the numerator to
    decimal(38,0), exact for all int64 inputs."""
    from decimal import Decimal

    n = 40
    rows = [("s", i, 1_000_000_000) for i in range(1, n + 1)]  # |v|=1e9
    df = spark.createDataFrame(rows, "s string, t long, v long")
    w = _w()
    num, den = T.weighted_ema_sums(F.col("v"), w, n)
    out = df.select("t", num.alias("n"), den.alias("d")).orderBy("t").collect()
    assert "decimal(38,0)" in df.select(num.alias("n")).schema["n"].simpleString()
    # at the last row all n weights are live: sum = (2^n - 1) * 1e9 > 2^63
    expect = Decimal((2**n - 1) * 1_000_000_000)
    assert out[-1].n == expect
    assert out[-1].d == 2**n - 1
    assert int(expect) > 2**63  # the int64 path genuinely could not hold it


def test_trapezoidal_integral(spark, series_df):
    micro = series_df.withColumn("vm", T.to_micro_units(F.col("v")))
    out = T.trapezoidal_integral(micro, ["s"], "t", "vm")
    got = {r.s: (r.n_intervals, float(r.integral_num), r.integral) for r in out.collect()}
    # a: (1+3)/2*1 + (3+2)/2*2 + (2+6)/2*3 = 2 + 5 + 12 = 19 value*seconds
    assert got["a"][0] == 3
    assert got["a"][2] == pytest.approx(19.0)
    # b: (10+10.5)/2*2 = 20.5
    assert got["b"][2] == pytest.approx(20.5)
    # exact numerator: sum (v_i+v_{i-1})*dt in micro*us units
    assert got["a"][1] == pytest.approx(19.0 * 2e12)


def test_single_exchange_shared_by_all_frames(spark, series_df):
    """All transforms over one series window must share ONE
    hashpartitioning exchange."""
    import re

    w = _w()
    micro = T.to_micro_units(F.col("v"))
    df = series_df.select(
        "s",
        "t",
        T.difference(micro, w).alias("d"),
        T.cumulative_sum(micro, w).alias("cs"),
        T.moving_average_sum(micro, w, 3).alias("ms"),
        T.elapsed(F.col("t"), w).alias("e"),
        T.weighted_ema_sums(micro, w, 4)[0].alias("ewma"),
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"hashpartitioning", plan)) == 1, plan


def test_exponential_moving_average_recursive(spark, series_df):
    out = T.exponential_moving_average(
        series_df, ["s"], ["t"], "v", alpha=0.5
    )
    got = {(r.s, r.t): r.ema for r in out.collect()}
    # hand recursion, series a: 1, .5*3+.5*1=2, .5*2+.5*2=2, .5*6+.5*2=4
    assert got[("a", 1_000_000)] == pytest.approx(1.0)
    assert got[("a", 2_000_000)] == pytest.approx(2.0)
    assert got[("a", 4_000_000)] == pytest.approx(2.0)
    assert got[("a", 7_000_000)] == pytest.approx(4.0)
    # series b independent: 10, .5*10.5+.5*10
    assert got[("b", 3_000_000)] == pytest.approx(10.25)


def test_exponential_moving_average_validates_alpha(series_df):
    with pytest.raises(ValueError):
        T.exponential_moving_average(series_df, ["s"], ["t"], "v", alpha=0.0)
    with pytest.raises(ValueError):
        T.exponential_moving_average(series_df, ["s"], ["t"], "v", alpha=1.5)


def test_median_filter_despikes(spark):
    """Sliding median vs statistics.median over every truncated window:
    spikes vanish, edges use the shortened frame, and a second series
    never bleeds into the first."""
    import statistics

    from influxdb_iox_spark.operators.transforms import median_filter

    vals = [1.0, 2.0, 100.0, 3.0, 4.0, 5.0, -50.0, 6.0]
    other = [10.0, 20.0, 30.0]
    rows = [("a", t, v) for t, v in enumerate(vals)] + [
        ("b", t, v) for t, v in enumerate(other)
    ]
    df = spark.createDataFrame(rows, "k string, time long, value double")
    out = median_filter(df, ["k"], "time", "value", half_window=2).collect()
    got = {(r["k"], r["time"]): r["smoothed"] for r in out}
    for key, series in (("a", vals), ("b", other)):
        for t in range(len(series)):
            lo, hi = max(0, t - 2), min(len(series), t + 3)
            want = round(statistics.median(series[lo:hi]) * 1e6) / 1e6
            assert abs(got[(key, t)] - want) < 1e-9, (key, t)
    # the spikes are gone from the smoothed series
    assert max(got[("a", t)] for t in range(len(vals))) < 10.0
    assert min(got[("a", t)] for t in range(len(vals))) > -1.0

    import pytest

    with pytest.raises(ValueError):
        median_filter(df, ["k"], "time", "value", half_window=0)


def test_counter_increase_with_resets(spark):
    """PromQL reset rule: a drop restarts the counter at the sample's
    own value.  Hand series 0→5→2(reset)→7: contributions 5 (0→5),
    2 (restart at 2), 5 (2→7) = increase 12 with 1 reset; rate over
    the 3-second span = 4/s."""
    from influxdb_iox_spark.operators.transforms import counter_increase

    rows = [
        ("a", 0, 0.0), ("a", 1_000_000_000, 5.0),
        ("a", 2_000_000_000, 2.0), ("a", 3_000_000_000, 7.0),
        ("b", 0, 10.0),  # single sample: zero span, rate 0
    ]
    df = spark.createDataFrame(rows, "k string, time long, value double")
    got = {
        r["k"]: r
        for r in counter_increase(df, ["k"], "time", "value").collect()
    }
    assert got["a"]["n_samples"] == 4
    assert got["a"]["n_resets"] == 1
    assert abs(got["a"]["increase"] - 12.0) < 1e-9
    assert abs(got["a"]["rate_per_s"] - 4.0) < 1e-9
    assert got["b"]["increase"] == 0.0 and got["b"]["rate_per_s"] == 0.0


def test_median_filter_backtick_column_name(spark):
    """value columns whose names need backticks (spaces, dots) must work —
    the aggregate is built from F.col, not an interpolated SQL string
    (round-13 advice)."""
    from influxdb_iox_spark.operators.transforms import median_filter

    rows = [("a", t, float(v)) for t, v in enumerate([1, 2, 100, 3, 4])]
    df = spark.createDataFrame(rows, ["k", "time", "the value"])
    out = median_filter(df, ["k"], "time", "the value", half_window=1)
    got = [r["smoothed"] for r in out.orderBy("time").collect()]
    assert got == [1.5, 2.0, 3.0, 4.0, 3.5]
