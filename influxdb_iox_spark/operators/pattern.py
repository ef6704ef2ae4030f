"""Time-series pattern similarity search: find the top-k windows, across
all series, most similar to a query pattern — the streaming-systems
similarity-search shape (cf. "Time Series Similarity Search for Streaming
Data in Distributed Systems", EDBT 2019; also the building block of
MASS/Matrix-Profile scans).  The v0 reference has no similarity operator
(its query menu is scan/aggregate — SURVEY §2), so this is a
beyond-reference operator in the engine's own domain.

Similarity = Pearson correlation between the query pattern and each
length-w window, computed from the five sufficient statistics

    w·Σxq − Σx·Σq
    ─────────────────────────────────────────────
    sqrt(w·Σx² − (Σx)²) · sqrt(w·Σq² − (Σq)²)

over INTEGER micro-unit values — every Σ is an exact int64/decimal sum
(order-free), and the handful of double ops after them (sub, mul, div,
sqrt — all IEEE correctly-rounded) run in one fixed spelling, so the
result is bit-identical across engines with no rounding tricks.  This is
the same exactness recipe as the int8 ANN scoring (z-normalized
Euclidean distance is a monotone transform of this correlation, so the
RANKING equals the znorm-distance ranking).

Plan shape: w−1 ``lead`` columns build each window in ONE pass over one
series-keyed window spec (single exchange, codegen), the dot products
are array folds over exact ints, and top-k is TakeOrderedAndProject —
bounded heaps, no global sort.  Cost is O(points · w) compute with NO
self-join; at 100 TB the scan parallelizes over series × time like every
other window operator in the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def pattern_topk(
    df: DataFrame,
    keys: list[str],
    time_col: str,
    value_micro_col: str,
    pattern_micro: list[int],
    k: int = 10,
) -> DataFrame:
    """Top-``k`` windows by correlation with ``pattern_micro`` (exact
    integer micro-units, length w ≥ 2).  Output: ``keys…, time`` (window
    start), ``corr_micro`` (round(corr·1e6), BIGINT) ordered by
    (corr_micro DESC, keys, time); zero-variance windows are skipped
    (correlation undefined)."""
    w = len(pattern_micro)
    if w < 2:
        raise ValueError("pattern needs at least 2 points")
    q = [int(v) for v in pattern_micro]
    sq = sum(q)
    sqq = sum(v * v for v in q)
    # order by (time, value): duplicate timestamps within a series would
    # otherwise make the window contents tie-order-nondeterministic —
    # divergent from the oracle AND run-to-run within Spark
    win = Window.partitionBy(*keys).orderBy(time_col, value_micro_col)
    vals = F.array(
        F.col(value_micro_col).cast("long"),
        *[
            F.lead(F.col(value_micro_col), i).over(win).cast("long")
            for i in range(1, w)
        ],
    )
    qarr = F.array(*[F.lit(v).cast("long") for v in q])
    stats = df.select(
        *[F.col(c) for c in keys],
        F.col(time_col).alias("time"),
        vals.alias("__x"),
    ).filter(~F.array_contains(F.transform("__x", F.isnull), True))
    zero = F.lit(0).cast("long")
    sx = F.aggregate("__x", zero, lambda a, x: a + x)
    sxx = F.aggregate("__x", zero, lambda a, x: a + x * x)
    sxq = F.aggregate(
        F.zip_with("__x", qarr, lambda x, v: x * v), zero, lambda a, x: a + x
    )
    # the COMBINATION of the stats overflows int64 for realistic
    # micro-unit magnitudes (vm ≤ 5.6e8 on the testdata → w·Σx² up to
    # ~2e19 > 2^63; found by the sf1 probe under ANSI overflow checks):
    # the folds stay long (per-element products and Σ over w fit), the
    # combination runs in decimal(38,0) — exact, the stats-family
    # recipe — and only the final value casts to double (both engines
    # round the same exact integer to the same double)
    dec = "decimal(38,0)"
    sx_d, sxx_d, sxq_d = sx.cast(dec), sxx.cast(dec), sxq.cast(dec)
    w_d = F.lit(w).cast(dec)
    num = (w_d * sxq_d - sx_d * F.lit(sq).cast(dec)).cast("double")
    varx = (w_d * sxx_d - sx_d * sx_d).cast("double")
    varq = float(w * sqq - sq * sq)
    if varq <= 0:
        raise ValueError("pattern has zero variance (constant values)")
    # try_divide, not when(cond, a/b): ANSI mode errors on double
    # division by zero, and subexpression elimination can hoist the
    # division OUT of a when() branch so the guard doesn't guard
    # (found by the sf1 probe — a constant window threw under ANSI
    # even inside when).  try_divide yields NULL for zero-variance
    # windows, which the isNotNull filter below drops; the value is
    # bit-identical to plain division everywhere else.
    corr = F.try_divide(num, F.sqrt(varx) * F.sqrt(F.lit(varq)))
    out = (
        stats.select(
            *[F.col(c) for c in keys],
            "time",
            F.round(corr * 1_000_000).cast("long").alias("corr_micro"),
        )
        .filter(F.col("corr_micro").isNotNull())
    )
    order = [F.col("corr_micro").desc(), *[F.col(c) for c in keys], F.col("time")]
    return out.orderBy(*order).limit(k)
