"""Gap filling for windowed series — the TSDB ``fill()`` family.

Beyond the v0 reference surface (InfluxQL's ``fill(null/previous/value)``
lives above the storage engine there), but core to any time-series product:
after a window aggregate, missing buckets inside each series' observed range
must materialize, with values null / carried forward / constant.

Spark-first shape (no UDFs, no driver loops):
  1. per-series bucket grid = ``explode(sequence(min_bucket, max_bucket,
     step))`` — generated distributedly, proportional to series span
  2. left join the aggregated buckets onto the grid (co-partitioned on the
     series key)
  3. fill-previous = ``last(value, ignorenulls=True)`` over the series
     window ordered by bucket — one pass, codegen'd

At scale the window in step 3 partitions by series key (bounded state per
series), never globally.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def fill_window_gaps(
    windowed: DataFrame,
    tag_columns: list[str],
    time_column: str,
    step: int,
    value_columns: list[str] | None = None,
    strategy: str = "null",
    fill_value: float | None = None,
    grid_start: int | None = None,
    grid_stop: int | None = None,
) -> DataFrame:
    """Materialize missing buckets per series between its first and last
    observed bucket — or across a pinned grid.

    ``windowed`` is a window-aggregate result: (tags…, time bucket, values…),
    bucket spacing ``step`` (same unit as ``time_column``).  Strategies:
    ``null`` (emit row, values null), ``previous`` (carry forward last
    non-null), ``value`` (constant ``fill_value``), ``linear``
    (interpolate interior gaps between the neighboring observed buckets —
    InfluxQL ``fill(linear)``; leading/trailing buckets of a pinned grid
    have only one neighbor and stay null, stock behavior).

    ``grid_start`` / ``grid_stop``: inclusive first/last bucket values
    (already floored to the grid) pinning that side of every series' grid
    regardless of its observed extent — InfluxQL's fill-across-the-
    WHERE-range semantics.  A side left None uses the series' observed
    bound.  Series with zero rows in ``windowed`` never appear (stock
    only fills series that have at least one point in range).
    """
    if strategy not in ("null", "previous", "value", "linear"):
        raise ValueError(f"unknown fill strategy {strategy!r}")
    value_columns = value_columns or [
        c for c in windowed.columns if c not in (*tag_columns, time_column)
    ]

    bounds = windowed.groupBy(*tag_columns).agg(
        F.min(time_column).alias("__lo"), F.max(time_column).alias("__hi")
    )
    lo = (
        F.lit(grid_start).cast("long")
        if grid_start is not None
        else F.col("__lo")
    )
    hi = (
        F.lit(grid_stop).cast("long")
        if grid_stop is not None
        else F.col("__hi")
    )
    grid = bounds.select(
        *tag_columns,
        F.explode(F.sequence(lo, hi, F.lit(step))).alias(time_column),
    )
    # FULL outer, not left: with a pinned grid under tz(), a fall-back DST
    # transition can floor an observed row to a local bucket outside (or off
    # the stride of) [grid_start, grid_stop] — a left join would silently
    # drop that observed bucket.  Full outer keeps every grid bucket (values
    # null, to be filled) AND every observed bucket unconditionally; in the
    # aligned common case the two joins produce identical rows.
    joined = grid.join(windowed, on=[*tag_columns, time_column], how="full")

    if strategy == "null":
        return joined
    if strategy == "value":
        return joined.select(
            *tag_columns,
            time_column,
            *[
                F.coalesce(F.col(c), F.lit(fill_value)).alias(c)
                for c in value_columns
            ],
        )
    wp = (
        Window.partitionBy(*tag_columns)
        .orderBy(time_column)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    if strategy == "previous":
        return joined.select(
            *tag_columns,
            time_column,
            *[
                F.last(F.col(c), ignorenulls=True).over(wp).alias(c)
                for c in value_columns
            ],
        )
    # linear: interpolate between neighboring observed buckets
    wn = (
        Window.partitionBy(*tag_columns)
        .orderBy(time_column)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    t = F.col(time_column)

    def _lerp(c: str) -> Column:
        v = F.col(c)
        prev_v = F.last(v, ignorenulls=True).over(wp)
        prev_t = F.last(F.when(v.isNotNull(), t), ignorenulls=True).over(wp)
        next_v = F.first(v, ignorenulls=True).over(wn)
        next_t = F.first(F.when(v.isNotNull(), t), ignorenulls=True).over(wn)
        interp = prev_v + (next_v - prev_v) * (t - prev_t) / (next_t - prev_t)
        return F.when(v.isNotNull(), v).otherwise(
            F.when(prev_v.isNotNull() & next_v.isNotNull(), interp)
        ).alias(c)

    return joined.select(*tag_columns, time_column, *[_lerp(c) for c in value_columns])
