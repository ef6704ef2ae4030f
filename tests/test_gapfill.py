"""Gap-fill operator semantics."""

from __future__ import annotations

from influxdb_iox_spark.operators.gapfill import fill_window_gaps


def _windowed(spark):
    # series 'a': buckets 10,40 present (gap at 20,30); series 'b': dense
    return spark.createDataFrame(
        [("a", 10, 1.0), ("a", 40, 4.0), ("b", 10, 9.0), ("b", 20, 8.0)],
        "series string, bucket long, v double",
    )


def test_fill_null(spark):
    out = fill_window_gaps(_windowed(spark), ["series"], "bucket", 10, strategy="null")
    rows = {(r.series, r.bucket): r.v for r in out.collect()}
    assert rows[("a", 20)] is None and rows[("a", 30)] is None
    assert rows[("a", 10)] == 1.0 and rows[("a", 40)] == 4.0
    assert ("b", 30) not in rows  # grid never extends beyond a series' range


def test_fill_previous(spark):
    out = fill_window_gaps(
        _windowed(spark), ["series"], "bucket", 10, strategy="previous"
    )
    rows = {(r.series, r.bucket): r.v for r in out.collect()}
    assert rows[("a", 20)] == 1.0 and rows[("a", 30)] == 1.0 and rows[("a", 40)] == 4.0


def test_fill_constant(spark):
    out = fill_window_gaps(
        _windowed(spark), ["series"], "bucket", 10, strategy="value", fill_value=0.0
    )
    rows = {(r.series, r.bucket): r.v for r in out.collect()}
    assert rows[("a", 20)] == 0.0 and rows[("a", 10)] == 1.0


def test_fill_linear_interpolates_interior_gaps(spark):
    from influxdb_iox_spark.operators.gapfill import fill_window_gaps

    df = spark.createDataFrame(
        [("a", 10, 1.0), ("a", 40, 7.0), ("a", 50, 9.0), ("b", 10, 5.0)],
        "k string, t long, v double",
    )
    out = fill_window_gaps(
        df, tag_columns=["k"], time_column="t", step=10, strategy="linear"
    )
    rows = {(r.k, r.t): r.v for r in out.collect()}
    # a: gap at 20/30 interpolates the 1.0 -> 7.0 line; observed stay exact
    assert rows[("a", 10)] == 1.0
    assert rows[("a", 20)] == 3.0
    assert rows[("a", 30)] == 5.0
    assert rows[("a", 40)] == 7.0
    assert rows[("a", 50)] == 9.0
    assert rows[("b", 10)] == 5.0
    assert len(rows) == 6


def test_observed_bucket_off_pinned_grid_survives(spark):
    """A tz() fall-back DST transition can floor an observed row to a local
    bucket below grid_start (or off the grid stride).  The grid join must
    keep such observed buckets, not silently drop them (full outer, not
    left)."""
    from influxdb_iox_spark.operators.gapfill import fill_window_gaps

    df = spark.createDataFrame(
        [("a", 95, 2.0), ("a", 110, 6.0)], "k string, t long, v double"
    )
    out = fill_window_gaps(
        df,
        tag_columns=["k"],
        time_column="t",
        step=10,
        strategy="previous",
        grid_start=100,
        grid_stop=120,
    )
    rows = {(r.k, r.t): r.v for r in out.collect()}
    # observed off-grid bucket 95 survives; grid buckets 100..120 all appear
    assert rows[("a", 95)] == 2.0
    assert rows[("a", 100)] == 2.0  # carried forward from 95
    assert rows[("a", 110)] == 6.0
    assert rows[("a", 120)] == 6.0
    assert len(rows) == 4
