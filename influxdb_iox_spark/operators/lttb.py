"""LTTB visual downsampling — parallel fixed-anchor variant, exact.

Largest-Triangle-Three-Buckets (Steinarsson 2013, the downsampler
behind most time-series dashboards) keeps the first and last point,
splits the interior into equal-count buckets, and keeps from each
bucket the point forming the largest triangle with its neighbors.  The
ORIGINAL algorithm anchors each triangle on the point SELECTED from the
previous bucket — an inherently sequential scan.  This implementation
uses the standard parallel variant: the left anchor is the previous
bucket's AVERAGE (the same approximation LTTB itself already makes on
the right side, where it uses the NEXT bucket's average because the
next selection isn't known yet).  With both anchors fixed, every
bucket's argmax is independent — the whole operator is two windows and
one aggregate per series, no iteration, nothing driver-side.

Exactness (the property that makes this oracle-pairable): triangle
areas are compared as INTEGERS.  With the left anchor a = (Σx_a/n_a,
Σy_a/n_a) and right anchor c likewise, the area order within a bucket
is decided by

    N(b) = (Σx_a·n_c − Σx_c·n_a)·(y_b·n_a − Σy_a)
         − (Σx_a − x_b·n_a)·(Σy_c·n_a − Σy_a·n_c)

(2·Area·n_a²·n_c — the common positive denominator cancels inside one
bucket), computed in decimal(38,0) over µs-rebased times and µ-unit
values: |N| < ~1e30 at any realistic series length, and DuckDB's
HUGEINT reproduces it bit-for-bit.  Ties break to the EARLIEST point.

Bucketing: interior points are split with ``ntile`` over the time
order (both engines distribute remainders to the leading buckets, so
bucket membership is engine-identical); bucket 1's left anchor is the
actual first point and the last bucket's right anchor is the actual
last point, exactly like stock LTTB.  Series with ≤ n_out points pass
through unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def lttb_downsample(
    df: DataFrame,
    keys: list[str],
    time_col: str,
    value_col: str,
    n_out: int,
) -> DataFrame:
    """(keys..., time, value) — at most ``n_out`` points per series:
    first + last + one largest-triangle point per interior bucket."""
    if n_out < 3:
        raise ValueError("n_out must be >= 3")
    n_buckets = n_out - 2
    wo = Window.partitionBy(*keys).orderBy(time_col)
    wa = Window.partitionBy(*keys)
    vm = F.round(F.col(value_col).cast("double") * 1_000_000).cast("long")
    base = df.select(
        *keys,
        F.col(time_col).alias("__t"),
        vm.alias("__v"),
        F.row_number().over(
            Window.partitionBy(*keys).orderBy(time_col)
        ).alias("__rn"),
        F.count("*").over(wa).alias("__n"),
        F.min(F.col(time_col)).over(wa).alias("__t0"),
    )
    # short series pass through whole
    passthrough = base.filter(F.col("__n") <= n_out)
    long_series = base.filter(F.col("__n") > n_out)
    first_last = long_series.filter(
        (F.col("__rn") == 1) | (F.col("__rn") == F.col("__n"))
    )
    # µs-rebased x keeps products inside decimal(38,0)
    x = (F.col("__t") - F.col("__t0")).alias("__x")
    interior = long_series.filter(
        (F.col("__rn") > 1) & (F.col("__rn") < F.col("__n"))
    ).select(
        *keys,
        "__t",
        "__v",
        x,
        F.ntile(n_buckets).over(
            Window.partitionBy(*keys).orderBy("__rn")
        ).alias("__b"),
    )
    sums = interior.groupBy(*keys, "__b").agg(
        F.sum("__x").alias("sx"),
        F.sum("__v").alias("sy"),
        F.count("*").alias("cnt"),
    )
    # endpoint anchors: bucket 0 = the first point, bucket B+1 = the last
    ends = long_series.filter(
        (F.col("__rn") == 1) | (F.col("__rn") == F.col("__n"))
    ).select(
        *keys,
        F.when(F.col("__rn") == 1, F.lit(0))
        .otherwise(F.lit(n_buckets + 1))
        .alias("__b"),
        (F.col("__t") - F.col("__t0")).alias("sx"),
        F.col("__v").alias("sy"),
        F.lit(1).alias("cnt"),
    )
    anchors = sums.unionByName(ends)
    wb = Window.partitionBy(*keys).orderBy("__b")
    ctx = anchors.select(
        *keys,
        "__b",
        F.lag("sx").over(wb).alias("ax"),
        F.lag("sy").over(wb).alias("ay"),
        F.lag("cnt").over(wb).alias("an"),
        F.lead("sx").over(wb).alias("cx"),
        F.lead("sy").over(wb).alias("cy"),
        F.lead("cnt").over(wb).alias("cn"),
    ).filter((F.col("__b") >= 1) & (F.col("__b") <= n_buckets))
    j = interior.join(ctx, [*keys, "__b"])
    d = lambda c: F.col(c).cast(_DEC)
    n_score = (d("ax") * d("cn") - d("cx") * d("an")) * (
        d("__v") * d("an") - d("ay")
    ) - (d("ax") - d("__x") * d("an")) * (
        d("cy") * d("an") - d("ay") * d("cn")
    )
    picked = (
        j.withColumn("__s", F.abs(n_score))
        .withColumn(
            "__rk",
            F.row_number().over(
                Window.partitionBy(*keys, "__b").orderBy(
                    F.desc("__s"), F.asc("__t")
                )
            ),
        )
        .filter(F.col("__rk") == 1)
        .select(*keys, "__t", "__v")
    )
    out = (
        passthrough.select(*keys, "__t", "__v")
        .unionByName(first_last.select(*keys, "__t", "__v"))
        .unionByName(picked)
    )
    return out.select(
        *keys,
        F.col("__t").alias(time_col),
        (F.col("__v").cast("double") / 1_000_000).alias(value_col),
    )
