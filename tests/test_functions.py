"""window_bounds + selector semantics against reference-sourced expected values."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from influxdb_iox_spark.functions.time import month_window_bounds, window_bounds, window_start
from influxdb_iox_spark.operators.selectors import (
    selector_first,
    selector_last,
    selector_max,
    selector_min,
)


def test_window_bounds_reference_values(spark):
    # Exact expected values from /root/reference/query/src/func/window.rs:95-117:
    # every=200, offset=50 → t=100 → 250; t=300 → 450.
    df = spark.createDataFrame([Row(time=100), Row(time=300)])
    out = df.select(window_bounds("time", every_ns=200, offset_ns=50).alias("b"))
    assert [r.b for r in out.collect()] == [250, 450]


def test_window_bounds_negative_time(spark):
    # floored modulus: t=-10, every=100, offset=0 → window (-100, 0] start=-100, bound=0
    df = spark.createDataFrame([Row(time=-10)])
    assert df.select(window_start("time", 100, 0).alias("s")).first().s == -100
    assert df.select(window_bounds("time", 100, 0).alias("b")).first().b == 0


def test_window_bounds_exact_boundary(spark):
    # t exactly on a start boundary belongs to the window it starts
    df = spark.createDataFrame([Row(time=200)])
    assert df.select(window_bounds("time", 100, 0).alias("b")).first().b == 300


def test_month_window_bounds(spark):
    # 2024-02-15T12:00:00Z in ns → end of Feb 2024 window = 2024-03-01T00:00:00Z
    t = 1707998400 * 1_000_000_000
    df = spark.createDataFrame([Row(time=t)])
    end_ns = df.select(month_window_bounds("time", 1).alias("b")).first().b
    assert end_ns == 1709251200 * 1_000_000_000


def test_selectors_basic(spark):
    rows = [
        Row(k="a", v=10.0, time=300),
        Row(k="a", v=5.0, time=100),
        Row(k="a", v=30.0, time=200),
        Row(k="a", v=None, time=50),  # nulls ignored
    ]
    df = spark.createDataFrame(rows)
    out = df.groupBy("k").agg(
        selector_first("v").alias("first"),
        selector_last("v").alias("last"),
        selector_min("v").alias("min"),
        selector_max("v").alias("max"),
    ).first()
    assert (out["first"]["value"], out["first"]["time"]) == (5.0, 100)
    assert (out["last"]["value"], out["last"]["time"]) == (10.0, 300)
    assert (out["min"]["value"], out["min"]["time"]) == (5.0, 100)
    assert (out["max"]["value"], out["max"]["time"]) == (30.0, 200)


def test_selector_tie_breaks_earliest_time(spark):
    # min/max pick the EARLIEST timestamp among equal values
    # (selectors.rs doc comments :104-116, :134-146)
    rows = [
        Row(k="a", v=7.0, time=200),
        Row(k="a", v=7.0, time=100),
        Row(k="a", v=1.0, time=300),
        Row(k="a", v=1.0, time=250),
    ]
    df = spark.createDataFrame(rows)
    out = df.groupBy("k").agg(
        selector_min("v").alias("mn"), selector_max("v").alias("mx")
    ).first()
    assert (out["mn"]["value"], out["mn"]["time"]) == (1.0, 250)
    assert (out["mx"]["value"], out["mx"]["time"]) == (7.0, 100)


def test_selector_all_null_group(spark):
    df = spark.createDataFrame([Row(k="a", v=None, time=1)], "k string, v double, time long")
    out = df.groupBy("k").agg(selector_last("v").alias("l")).first()
    assert out["l"]["value"] is None and out["l"]["time"] is None


def test_get_earliest_bounds_reference_cases(spark):
    """All 12 cases of the reference's TestWindow_GetEarliestBounds
    (query/src/func/window/internal.rs:386-566), ns and calendar-month,
    including the negative calendar offset."""
    from datetime import datetime, timezone

    from influxdb_iox_spark.functions.time import (
        month_window_bounds_struct,
        window_bounds_struct,
    )

    NS_SEC = 1_000_000_000
    NS_MIN = 60 * NS_SEC

    def iso(s):
        return int(
            datetime.fromisoformat(s.replace("Z", "+00:00"))
            .astimezone(timezone.utc)
            .timestamp()
        ) * NS_SEC

    ns_cases = [
        # (every, period, offset, t, want_start, want_stop)
        (5 * NS_MIN, 5 * NS_MIN, 0, 6 * NS_MIN, 5 * NS_MIN, 10 * NS_MIN),
        (5 * NS_MIN, 5 * NS_MIN, 30 * NS_SEC, 5 * NS_MIN, 30 * NS_SEC, 5 * NS_MIN + 30 * NS_SEC),
        (2 * NS_MIN, 1 * NS_MIN, 30 * NS_SEC, 3 * NS_MIN, 3 * NS_MIN + 30 * NS_SEC, 4 * NS_MIN + 30 * NS_SEC),
        (2 * NS_MIN, 1 * NS_MIN, 30 * NS_SEC, 2 * NS_MIN + 45 * NS_SEC, 3 * NS_MIN + 30 * NS_SEC, 4 * NS_MIN + 30 * NS_SEC),
        (1 * NS_MIN, 2 * NS_MIN, 30 * NS_SEC, 30 * NS_SEC, -30 * NS_SEC, 1 * NS_MIN + 30 * NS_SEC),
        (1 * NS_MIN, 3 * NS_MIN + 30 * NS_SEC, 30 * NS_SEC, 5 * NS_MIN + 45 * NS_SEC, 3 * NS_MIN, 6 * NS_MIN + 30 * NS_SEC),
        (1 * NS_MIN, 3 * NS_MIN + 30 * NS_SEC, 30 * NS_SEC, 5 * NS_MIN, 2 * NS_MIN, 5 * NS_MIN + 30 * NS_SEC),
        (5 * NS_SEC, 5 * NS_SEC, 2 * NS_SEC, 1 * NS_SEC, -3 * NS_SEC, 2 * NS_SEC),
        (5 * NS_SEC, 5 * NS_SEC, 2 * NS_SEC, 3 * NS_SEC, 2 * NS_SEC, 7 * NS_SEC),
    ]
    for every, period, offset, t, w_start, w_stop in ns_cases:
        df = spark.createDataFrame([Row(time=t)])
        b = df.select(
            window_bounds_struct("time", every, offset, period).alias("b")
        ).first().b
        assert (b.start, b.stop) == (w_start, w_stop), (every, period, offset, t)

    month_cases = [
        # (every_mo, period_mo, offset_mo, t_iso, want_start_iso, want_stop_iso)
        (5, 5, 0, "1970-01-01T00:00:00Z", "1970-01-01T00:00:00Z", "1970-06-01T00:00:00Z"),
        (5, 5, 2, "1970-02-01T00:00:00Z", "1969-10-01T00:00:00Z", "1970-03-01T00:00:00Z"),
        (5, 5, -2, "1970-02-01T00:00:00Z", "1969-11-01T00:00:00Z", "1970-04-01T00:00:00Z"),
    ]
    for every, period, offset, t, w_start, w_stop in month_cases:
        df = spark.createDataFrame([Row(time=iso(t))])
        b = df.select(
            month_window_bounds_struct("time", every, offset, period).alias("b")
        ).first().b
        assert (b.start, b.stop) == (iso(w_start), iso(w_stop)), (every, offset, t)


def test_month_window_day_clamp(spark):
    """Offset shifting from Jan 31 clamps to Feb 29 (2024 is a leap year),
    matching the reference's Add impl day normalization."""
    from influxdb_iox_spark.functions.time import month_window_bounds_struct

    t = int(
        __import__("datetime").datetime(2024, 1, 31, 12, tzinfo=__import__("datetime").timezone.utc).timestamp()
    ) * 1_000_000_000
    df = spark.createDataFrame([Row(time=t)])
    # offset -1: t' = t + 1 month = Feb 29 12:00 (clamped); trunc2(abs) of
    # 2024-02 -> 2024-01; stop = 2024-01 + 2mo - 1mo = 2024-02-01
    b = df.select(month_window_bounds_struct("time", 2, -1).alias("b")).first().b
    feb1 = int(
        __import__("datetime").datetime(2024, 2, 1, tzinfo=__import__("datetime").timezone.utc).timestamp()
    ) * 1_000_000_000
    assert b.stop == feb1
    assert b.start == int(
        __import__("datetime").datetime(2023, 12, 1, tzinfo=__import__("datetime").timezone.utc).timestamp()
    ) * 1_000_000_000
