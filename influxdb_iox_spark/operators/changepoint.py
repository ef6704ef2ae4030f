"""CUSUM mean-shift changepoint detection — the monitoring twin of the
seasonal-decomposition anomaly pass (operators/decompose.py).

The classic offline CUSUM estimator (Page 1954; the "cumulative sum
control chart" every ops stack reimplements): per series, center the
values on the series mean, take the running cumulative sum S_t, and

- the LOCATION of a single mean shift is argmax |S_t| (the cusum peak —
  where the running total of "above mean vs below mean" turns around);
- the STRENGTH is the cusum range max(S) − min(S), compared against
  k·σ·√n (the scale a no-shift random walk of n steps with noise σ
  would reach) — the standard bootstrap-free decision rule with ``k``
  as the confidence dial.

Exactness contract (the stats-family / anomaly-flags recipe): values
enter as 1e-6-rounded micro-unit integers vm, and every comparison runs
on INTEGERS — S_t is represented as D_t = n·P_t − t·T (P_t prefix sum,
T series total, both integer), which is n·1e6·S_t exactly, so the
argmax and the threshold test are decimal(38,0)/HUGEINT-exact in both
engines with zero float straddle.  The threshold k is taken as an exact
decimal fraction.  Only the REPORTED s_range is a double (one divide,
1e-6-rounded).

Spark shape: ONE series-keyed ordered window (prefix sum + row number)
feeding one series-keyed aggregate — the window's hash partitioning is
reused by the groupBy, so a single exchange total.  No Python, no
self-join, no global sort; scales by series count.

Magnitude bound (guarded like the anomaly flags): the threshold test's
integer sides are ≤ 4·k²·n⁵·M² for max |vm| = M, so decimal(38,0)
holds while M < 10^19/(2·k·n^2.5); overflow raises loudly via
assert_true instead of silently nulling (Spark non-ANSI) where DuckDB's
HUGEINT errors.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def cusum_changepoints(
    df: DataFrame,
    key_cols: list[str] | None = None,
    time_col: str = "time",
    value_col: str = "value",
    threshold: float | str = "1.63",
) -> DataFrame:
    """One row per series: (keys, n, cp_time, s_range, shifted).

    - ``cp_time`` — the time of the cusum peak argmax |S_t| (earliest
      on exact-integer ties): the single-changepoint location estimate.
    - ``s_range`` — max(S) − min(S) in value units (1e-6-rounded
      double; the only float in the output).
    - ``shifted`` — BIGINT 0/1: s_range > k·σ·√n with σ the series'
      sample standard deviation, evaluated integer-exactly.

    ``threshold`` is k as a decimal string (exact fraction; the default
    1.63 is the conventional ~95% point of the Kolmogorov range
    statistic).  Series shorter than 2 points report no row.
    """
    keys = list(key_cols or [])
    wo = Window.partitionBy(*keys).orderBy(time_col)
    wa = Window.partitionBy(*keys)
    k = Fraction(str(threshold))
    vm = F.round(F.col(value_col) * 1_000_000).cast("long")
    base = df.select(*keys, F.col(time_col), vm.alias("vm"))
    pre = base.select(
        *keys,
        F.col(time_col),
        F.col("vm"),
        F.sum("vm").over(wo.rowsBetween(Window.unboundedPreceding, 0)).alias("p"),
        F.row_number().over(wo).alias("t_idx"),
        F.count("*").over(wa).alias("n"),
        F.sum("vm").over(wa).alias("tot"),
        F.sum(F.col("vm").cast(_DEC) * F.col("vm").cast(_DEC)).over(wa).alias("q"),
    )
    # D_t = n·P_t − t·T  (== n·1e6·S_t, integer-exact)
    d = (
        F.col("n").cast(_DEC) * F.col("p").cast(_DEC)
        - F.col("t_idx").cast(_DEC) * F.col("tot").cast(_DEC)
    )
    scored = pre.filter(F.col("n") >= 2).select(
        *keys,
        F.col(time_col),
        F.col("n"),
        F.col("tot"),
        F.col("q"),
        d.alias("d"),
        F.abs(d).alias("absd"),
    )
    agg = scored.groupBy(*keys).agg(
        F.first("n").alias("n"),
        F.first("tot").alias("tot"),
        F.first("q").alias("q"),
        F.max("d").alias("dmax"),
        F.min("d").alias("dmin"),
        # max |D| with earliest-time tiebreak: min over (−|D|, time)
        F.min(F.struct((-F.col("absd")).alias("na"), F.col(time_col).alias("t"))
              ).alias("peak"),
    )
    n = F.col("n").cast(_DEC)
    # threshold test — S_range > k·σ·√n with S_range = rng/(n·1e6) and
    # σ = sqrt((nQ−T²)/(n(n−1)))/1e6 becomes, squared and cleared of
    # denominators:  rng²·(n−1)·k_den² > k_num²·n²·(n·Q − T²)
    # (all decimal(38,0))
    rng = F.col("dmax") - F.col("dmin")
    lhs = rng * rng * (n - F.lit(1).cast(_DEC)) * F.lit(
        k.denominator * k.denominator
    ).cast(_DEC)
    rhs = (
        F.lit(k.numerator * k.numerator).cast(_DEC)
        * n * n
        * (n * F.col("q")
           - F.col("tot").cast(_DEC) * F.col("tot").cast(_DEC))
    )
    shifted = F.when(
        lhs.isNull() | rhs.isNull(),
        F.assert_true(
            F.lit(False),
            F.lit(
                "cusum threshold test overflowed decimal(38,0): see the "
                "module's magnitude bound — rescale values first"
            ),
        ).cast("bigint"),
    ).otherwise((lhs > rhs).cast("bigint"))
    # s_range value-units = rng/(n·1e6); rounded to 1e-6 that is
    # round(rng/n)/1e6 — spelled as ONE double divide + round so both
    # engines execute the identical IEEE op sequence
    micro = F.round(rng.cast("double") / F.col("n").cast("double")) / 1_000_000.0
    return agg.select(
        *keys,
        F.col("n"),
        F.col("peak.t").alias("cp_" + time_col),
        micro.alias("s_range"),
        shifted.alias("shifted"),
    )
