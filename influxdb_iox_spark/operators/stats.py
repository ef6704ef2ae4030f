"""InfluxQL statistical aggregate family: SPREAD / MODE / STDDEV.

The reference's query engine ships plain aggs + selectors
(query/src/group_by.rs:32-66, query/src/func/selectors.rs); the InfluxQL
surface it feeds also exposes SPREAD(), MODE(), STDDEV().  This module
re-expresses those Spark-first, with two extra disciplines the 100 TB
deployment needs:

- **Determinism under ties.** MODE ties break to the SMALLEST value —
  pinned explicitly via an ordered-struct ``max_by``, never left to hash
  -aggregate visit order (the same discipline as the selector tie-breaks
  in operators/selectors.py).
- **Exactness under re-partitioning.** STDDEV from floating-point
  streaming accumulators (Welford / sum-of-squares in double) depends on
  accumulation ORDER, so two runs with different partitionings disagree
  in the last bits.  ``sample_stddev_micro`` instead canonicalizes values
  to integer micro-units and keeps n, Σv, Σv² in decimal(38,0) — exact,
  order-free, identical on any cluster layout and any engine — then does
  ONE deterministic double division + sqrt at the end.

Plan shape: everything here is a single hash aggregate per group key
(mode adds a second, narrower aggregate over (group, bucket) counts —
both map-side combine, one exchange each).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "spread",
    "sample_stddev_micro",
    "mode_smallest",
    "percentile_nearest_rank",
]


def spread(value: Column | str) -> Column:
    """InfluxQL SPREAD(): max - min.  One IEEE subtraction over two
    exactly-selected input values — deterministic cross-engine."""
    v = F.col(value) if isinstance(value, str) else value
    return F.max(v) - F.min(v)


def sample_stddev_micro(value: Column | str) -> Column:
    """Sample standard deviation in integer micro-units, exact-sums form.

    The value is canonicalized to micro-units (``round(v*1e6)`` as long —
    exact while the micro value fits a double's 2^53 integer range, i.e.
    \\|v\\| ≤ ~9.0e9) and n, Σv, Σv² accumulate in decimal(38,0): integer
    addition commutes, so the result is independent of partition count,
    task order, and engine.  Variance = (n·Σv² − (Σv)²)/(n(n−1)) — the
    numerator and denominator are EXACT integers; the final division and
    correctly-rounded sqrt are the only float ops, so the rounded
    micro-unit result is hash-exact cross-engine.

    Domain: with \\|v\\| ≤ ~1e6 (micro ≤ 1e12) the decimal(38,0) terms stay
    under 1e38 up to ~1e13 rows per group.  The square is taken AFTER the
    decimal cast — vm² in int64 would wrap silently past \\|v\\| ≈ 3037.
    Groups with n < 2 return 0.
    """
    v = F.col(value) if isinstance(value, str) else value
    vm = F.round(v.cast("double") * 1e6, 0).cast("long")
    dec = "decimal(38,0)"
    vmd = vm.cast(dec)
    n = F.count(vm).cast(dec)
    s1 = F.sum(vmd)
    s2 = F.sum(vmd * vmd)
    num = (n * s2 - s1 * s1).cast("double")
    den = (n * (n - F.lit(1).cast(dec))).cast("double")
    return F.when(F.count(vm) < 2, F.lit(0).cast("long")).otherwise(
        F.round(F.sqrt(num / den), 0).cast("long")
    )


def percentile_nearest_rank(
    df: DataFrame,
    value: Column | str,
    by: list[str],
    percentiles: list[float],
) -> DataFrame:
    """InfluxQL PERCENTILE(field, N): the Nth-percentile FIELD VALUE by
    the nearest-rank method — an actual input value (rank ⌈p·n⌉ in value
    order), never an interpolation (that's the separate exact-interpolated
    surface, `percentiles_by_type`).  NULLs never rank.

    Output: the ``by`` columns plus one ``p<N>`` column per requested
    percentile (N rendered with ``_`` for the decimal point, e.g. 99.9 →
    ``p99_9``).

    Plan shape: ONE key-hash exchange shared by the row_number and the
    per-group count (same window partitioning), then one hash aggregate.
    The per-series sort is the semantics' own requirement (an order
    statistic), same as the reference's sorted-series pipeline; there is
    no global sort and no driver collect.  Rank ties (duplicate values)
    cannot change the answer — equal rank candidates carry equal values.
    """
    from pyspark.sql import Window

    for p in percentiles:
        if not 0 < p <= 100:
            raise ValueError(f"percentile must be in (0, 100], got {p}")
    v = F.col(value) if isinstance(value, str) else value
    keys = [F.col(c) for c in by]
    # windows reference the post-projection name: the input column may be
    # renamed away by the select below
    w_order = Window.partitionBy(*keys).orderBy(F.col("__pv").asc())
    w_all = Window.partitionBy(*keys)
    ranked = (
        df.filter(v.isNotNull())
        .select(*keys, v.alias("__pv"))
        .withColumn("__rn", F.row_number().over(w_order))
        .withColumn("__cnt", F.count("*").over(w_all))
    )
    aggs = []
    for p in percentiles:
        k = F.ceil(F.col("__cnt") * F.lit(p / 100.0))
        name = ("p%g" % p).replace(".", "_")
        aggs.append(
            F.max(F.when(F.col("__rn") == k, F.col("__pv"))).alias(name)
        )
    return ranked.groupBy(*keys).agg(*aggs)


def mode_smallest(
    df: DataFrame,
    value: Column | str,
    by: list[str],
    out_col: str = "mode_value",
) -> DataFrame:
    """InfluxQL MODE(): the most frequent value per group; ties pinned to
    the SMALLEST value (ordered-struct max_by — never visit order).

    Two hash aggregates: (group, value) counts, then one ordered-struct
    max per group — both with map-side partial aggregation, so the wide
    first exchange carries at most one row per distinct (group, value).
    NULL values never count (like every InfluxQL aggregate).

    Precondition: ``value`` must be NUMERIC — the smallest-wins tie-break
    rides the negated value inside the max_by struct, which has no
    meaning for strings.  Checked loudly rather than silently mis-ranking.
    """
    from pyspark.sql.types import NumericType

    v = F.col(value) if isinstance(value, str) else value
    counts = (
        df.filter(v.isNotNull())
        .groupBy(*[F.col(c) for c in by], v.alias("__mode_v"))
        .agg(F.count("*").alias("__mode_n"))
    )
    if not isinstance(counts.schema["__mode_v"].dataType, NumericType):
        raise TypeError(
            "mode_smallest requires a numeric value column; got "
            f"{counts.schema['__mode_v'].dataType.simpleString()}"
        )
    # integral negation wraps at Long.MIN_VALUE (ANSI off) and would
    # mis-rank that one tie; negate in decimal, which is exact for every
    # int64.  Fractional types negate symmetrically — keep them native.
    from pyspark.sql.types import FractionalType

    neg_v = (
        -F.col("__mode_v")
        if isinstance(counts.schema["__mode_v"].dataType, FractionalType)
        else -F.col("__mode_v").cast("decimal(20,0)")
    )
    pick = F.max_by(
        F.col("__mode_v"),
        F.struct(F.col("__mode_n"), neg_v.alias("__neg")),
    )
    return counts.groupBy(*[F.col(c) for c in by]).agg(pick.alias(out_col))
