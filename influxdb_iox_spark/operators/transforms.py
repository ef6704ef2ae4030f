"""Per-series transformation functions — the InfluxQL function family
(DIFFERENCE / DERIVATIVE / CUMULATIVE_SUM / MOVING_AVERAGE / ELAPSED /
INTEGRAL / EXPONENTIAL_MOVING_AVERAGE) as declarative window expressions.

The reference engine's influxrpc surface stops at windowed aggregates
(/root/reference/query/src/group_by.rs:32-66 lists its Aggregate enum);
these are the point-to-point transforms an InfluxDB-classic user reaches
for next, built Spark-first:

- Every transform is a window expression over ``PARTITION BY series-key
  ORDER BY (time, tiebreak)`` — at 100 TB each series transforms inside
  its own hash partition; there is never a global sort and the single
  hashpartitioning exchange is shared by all frames over the same key
  (plan-asserted in tests/test_pushdown_golden.py).
- Numeric policy: callers canonicalize values to exact integer units
  (``to_micro_units``) so running sums / weighted sums are exact int64 or
  decimal arithmetic — engine-independent, no FP accumulation-order
  hazard.  Only a final presentation division ever touches doubles.
- The EWMA here is the *truncated* form: an integer-weighted moving
  average over the last N points with weights 2^(N-1) … 2^0 (ratio 1/2),
  which is EXPONENTIAL_MOVING_AVERAGE with the infinite tail cut off.
  The recursive untruncated form is order-dependent per row and cannot
  be a window expression; the truncated form is, and its weighted sum
  stays exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec, functions as F


def series_window(keys: list[str], order: list[str]) -> WindowSpec:
    """The shared per-series ordered window every transform rides."""
    return Window.partitionBy(*keys).orderBy(*order)


def to_micro_units(col: Column) -> Column:
    """Canonicalize a double value column to exact integer micro-units."""
    return F.round(col * 1e6).cast("long")


def difference(col: Column, w: WindowSpec) -> Column:
    """InfluxQL DIFFERENCE: value minus the previous value (null first)."""
    return col - F.lag(col).over(w)


def non_negative_difference(col: Column, w: WindowSpec) -> Column:
    """DIFFERENCE with negative results suppressed (null, per InfluxQL
    NON_NEGATIVE_DIFFERENCE)."""
    d = difference(col, w)
    return F.when(d >= 0, d)


def cumulative_sum(col: Column, w: WindowSpec) -> Column:
    """InfluxQL CUMULATIVE_SUM: running sum from the series start."""
    return F.sum(col).over(w.rowsBetween(Window.unboundedPreceding, 0))


def moving_average_sum(col: Column, w: WindowSpec, n: int) -> Column:
    """Numerator of InfluxQL MOVING_AVERAGE(n): sum over the trailing
    n-row frame.  Pair with :func:`moving_average_count` and divide at
    presentation time to keep the running arithmetic exact."""
    return F.sum(col).over(w.rowsBetween(-(n - 1), 0))


def moving_average_count(w: WindowSpec, n: int) -> Column:
    return F.count(F.lit(1)).over(w.rowsBetween(-(n - 1), 0))


def elapsed(time_col: Column, w: WindowSpec) -> Column:
    """InfluxQL ELAPSED: time delta to the previous point (same unit as
    the time column; null first)."""
    return time_col - F.lag(time_col).over(w)


def derivative(
    col: Column, time_col: Column, w: WindowSpec, per_units: int
) -> Column:
    """InfluxQL DERIVATIVE: (Δvalue / Δtime) · per_units, where
    ``per_units`` is the reporting interval in the time column's unit
    (e.g. 1_000_000 for per-second over µs time).  Null on the first
    point; the one double division happens per emitted point."""
    dt = time_col - F.lag(time_col).over(w)
    return (col - F.lag(col).over(w)) * per_units / dt


def non_negative_derivative(
    col: Column, time_col: Column, w: WindowSpec, per_units: int
) -> Column:
    """DERIVATIVE with negative results suppressed (null), per InfluxQL
    NON_NEGATIVE_DERIVATIVE — the monotone-counter rate form."""
    d = derivative(col, time_col, w, per_units)
    return F.when(d >= 0, d)


def chande_momentum_oscillator(col: Column, w: WindowSpec, n: int) -> Column:
    """InfluxQL CHANDE_MOMENTUM_OSCILLATOR(field, n): over the trailing
    ``n`` consecutive differences, ``100·(Σup − Σdown)/(Σup + Σdown)``
    where up/down are the positive/|negative| diffs.  N-truncated — a pure
    window expression (codegen), unlike the recursive indicators in
    ``operators/technical.py``.  Emitted once ``n`` diffs exist; a
    flat window (Σup+Σdown = 0) yields 0.0 per the conventional CMO
    definition."""
    d = difference(col, w)
    frame = w.rowsBetween(-(n - 1), 0)
    su = F.sum(F.when(d > 0, d).otherwise(F.lit(0.0))).over(frame)
    sd = F.sum(F.when(d < 0, -d).otherwise(F.lit(0.0))).over(frame)
    have_n = F.count(d).over(frame) == n
    return F.when(
        have_n,
        F.when(su + sd == 0, F.lit(0.0)).otherwise(
            100.0 * (su - sd) / (su + sd)
        ),
    )


def kaufmans_efficiency_ratio(col: Column, w: WindowSpec, n: int) -> Column:
    """InfluxQL KAUFMANS_EFFICIENCY_RATIO(field, n): net move over the
    last ``n`` intervals divided by the total absolute move,
    ``|xᵢ − xᵢ₋ₙ| / Σ|Δx|``.  N-truncated window expression; emitted once
    ``n`` diffs exist; a flat window yields 0.0."""
    d = difference(col, w)
    frame = w.rowsBetween(-(n - 1), 0)
    vol = F.sum(F.abs(d)).over(frame)
    net = F.abs(col - F.lag(col, n).over(w))
    have_n = F.count(d).over(frame) == n
    return F.when(
        have_n,
        F.when(vol == 0, F.lit(0.0)).otherwise(net / vol),
    )


def weighted_ema_sums(
    col: Column, w: WindowSpec, n: int
) -> tuple[Column, Column]:
    """Truncated EXPONENTIAL_MOVING_AVERAGE over the last ``n`` points
    with integer weights 2^(n-1) … 1 (decay ratio 1/2).

    Returns ``(weighted_sum, weight_total)`` as exact integer columns —
    the weighted sum is a fixed linear combination of lag terms, so it
    stays inside whole-stage codegen and needs no per-row state.  Fewer
    than ``n`` preceding points → nulls drop out of the combination and
    ``weight_total`` shrinks to match (InfluxQL's warm-up behavior).

    Overflow contract: for ``n <= 32`` the sums are int64 and exactness
    requires ``(2^n - 1) * max|value| < 2^63`` — i.e. ``|value| <
    2^(63-n)`` (n=32 → |value| < 2^31; comfortably true for micro-unit
    encodings of small physical quantities, and an int64 overflow under
    ANSI mode raises rather than wrapping).  For ``n in [33, 62]`` the
    sum is computed in ``decimal(38,0)`` instead, which is exact for ALL
    int64 inputs (worst case (2^62-1)·2^63 ≈ 4.3e37 < 10^38) — callers
    get a decimal numerator at those widths.
    """
    if n < 1 or n > 62:
        raise ValueError("n must be in [1, 62]")
    use_decimal = n > 32
    terms = []
    weights = []
    for k in range(n):
        weight = 1 << (n - 1 - k)
        lagged = F.lag(col, k).over(w) if k else col
        if use_decimal:
            term_val = lagged.cast("decimal(38,0)") * F.lit(weight).cast(
                "decimal(38,0)"
            )
            zero = F.lit(0).cast("decimal(38,0)")
        else:
            term_val = lagged * F.lit(weight)
            zero = F.lit(0)
        terms.append(F.coalesce(term_val, zero))
        weights.append(
            F.when(lagged.isNotNull(), F.lit(weight)).otherwise(F.lit(0))
        )
    wsum = terms[0]
    wtot = weights[0]
    for t, g in zip(terms[1:], weights[1:]):
        wsum = wsum + t
        wtot = wtot + g
    return wsum, wtot


def exponential_moving_average(
    df: DataFrame,
    keys: list[str],
    order: list[str],
    value_col: str,
    alpha: float,
    out_col: str = "ema",
) -> DataFrame:
    """Untruncated recursive EWMA (InfluxQL EXPONENTIAL_MOVING_AVERAGE):
    yᵢ = α·xᵢ + (1-α)·yᵢ₋₁, seeded y₀ = x₀.

    The recursion makes every output depend on ALL previous inputs, so —
    unlike everything else in this module — it cannot be a window
    expression; this is the sanctioned Arrow-batched slow path: one
    ``applyInPandas`` per series (vectorized ``Series.ewm`` inside, no
    per-row Python).  Each series is one group, so the cost model is the
    same as the window transforms: a single hash shuffle on the series
    key, series-sized memory per task.  Prefer :func:`weighted_ema_sums`
    (exact, pure codegen) unless the untruncated tail matters.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    from pyspark.sql.types import DoubleType, StructField, StructType

    out_schema = StructType(
        list(df.schema.fields) + [StructField(out_col, DoubleType(), True)]
    )
    sort_cols = list(order)

    def ewm(pdf):
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        pdf[out_col] = (
            pdf[value_col].ewm(alpha=alpha, adjust=False).mean()
        )
        return pdf

    return df.groupBy(*keys).applyInPandas(ewm, out_schema)


def trapezoidal_integral(
    df: DataFrame,
    keys: list[str],
    time_col: str,
    value_col: str,
    order_tiebreak: list[str] | None = None,
    *,
    time_units_per_second: int = 1_000_000,
) -> DataFrame:
    """InfluxQL INTEGRAL(value, 1s): per-series trapezoid area
    ∑ (vᵢ+vᵢ₋₁)/2 · Δt, with per-term products in DECIMAL(20,0)×
    DECIMAL(20,0) (a term can exceed int64) and one exact decimal sum;
    the /2 and unit conversion are a single final double division.

    ``value_col`` must already be exact integer units (``to_micro_units``).
    Returns one row per series: keys…, n_intervals, integral_num (exact
    decimal ∑(vᵢ+vᵢ₋₁)·Δt), integral (double, value·seconds ÷ 10⁶ units).
    """
    order = [time_col] + list(order_tiebreak or [])
    w = series_window(keys, order)
    v = F.col(value_col)
    t = F.col(time_col)
    term = (v + F.lag(v).over(w)).cast("decimal(20,0)") * (
        t - F.lag(t).over(w)
    ).cast("decimal(20,0)")
    terms = df.select(*keys, term.alias("__term"))
    denom = float(2 * time_units_per_second * 1_000_000)
    return terms.groupBy(*keys).agg(
        F.count("__term").alias("n_intervals"),
        F.sum("__term").alias("integral_num"),
        (F.sum("__term").cast("double") / F.lit(denom)).alias("integral"),
    )


def median_filter(
    df: DataFrame,
    keys: list[str],
    time_col: str,
    value_col: str,
    half_window: int = 2,
    out_col: str = "smoothed",
) -> DataFrame:
    """Per-series sliding-median despike (the classic robust smoother a
    monitoring pipeline runs before rate/anomaly logic: a single wild
    point cannot drag a median the way it drags a mean).

    EXACT median over the centered ±``half_window`` ROWS frame via
    Spark's ``percentile(…, 0.5)`` as a window aggregate (true sorted
    median with linear interpolation on even counts — NOT
    approx_percentile), which is also DuckDB's ``quantile_cont(0.5)``
    semantics, so the twin oracles agree; outputs ride the repo's
    1e-6 float-rounding contract.  Series edges use the truncated
    window (median of what exists — no invented padding), matching the
    standard medfilt edge behavior.

    ONE series-keyed ordered window; the frame holds ≤ 2·half_window+1
    values per row, so memory is O(window), and the exchange is shared
    with any other same-key window transform (the series_transforms
    posture)."""
    if half_window < 1:
        raise ValueError("half_window must be >= 1")
    w = (
        Window.partitionBy(*keys)
        .orderBy(time_col)
        .rowsBetween(-half_window, half_window)
    )
    # F.percentile (not an F.expr f-string) so value_col is resolved as a
    # column reference — names needing backticks (spaces, dots, reserved
    # words) work like in every other operator here (round-13 advice).
    med = F.percentile(F.col(value_col), F.lit(0.5)).over(w)
    return df.select(
        *keys,
        F.col(time_col),
        F.col(value_col),
        (F.round(med * 1_000_000) / 1_000_000).alias(out_col),
    )


def counter_increase(
    df: DataFrame,
    keys: list[str],
    time_col: str,
    value_col: str,
    time_units_per_second: int = 1_000_000_000,
    order_tiebreak: list[str] | None = None,
) -> DataFrame:
    """PromQL-shaped counter semantics per series: ``increase`` = the
    total counter growth over the series with RESET handling — when a
    sample drops below its predecessor the counter is taken to have
    restarted from zero, so that sample contributes its own value
    instead of a negative delta (exactly Prometheus's
    increase()/rate() reset rule, minus PromQL's range extrapolation —
    this is the sum over actual samples, which is the honest exact
    form).  Also emits ``n_resets`` and ``rate`` = increase / observed
    time span (per second).

    Exactness: deltas are 1e-6-micro-unit integers summed exactly; the
    single divide producing ``rate`` is the only float op
    (1e-6-rounded).  One series-keyed ordered window feeding one
    series aggregate — the shared-exchange posture."""
    w = series_window(keys, [time_col] + list(order_tiebreak or []))
    vm = to_micro_units(F.col(value_col))
    prev = F.lag(vm).over(w)
    contrib = F.when(prev.isNull(), F.lit(0)).when(
        vm >= prev, vm - prev
    ).otherwise(vm)
    reset = F.when(prev.isNotNull() & (vm < prev), 1).otherwise(0)
    per_row = df.select(
        *keys,
        F.col(time_col).alias("__t"),
        contrib.alias("__c"),
        reset.alias("__r"),
    )
    span = (F.max("__t") - F.min("__t")).cast("double") / F.lit(
        float(time_units_per_second)
    )
    return per_row.groupBy(*keys).agg(
        F.count("*").alias("n_samples"),
        F.sum("__r").cast("long").alias("n_resets"),
        (F.round(F.sum("__c").cast("double")) / 1_000_000.0).alias("increase"),
        (
            F.round(
                F.when(
                    span > 0, F.sum("__c").cast("double") / 1_000_000.0 / span
                ).otherwise(F.lit(0.0))
                * 1_000_000
            )
            / 1_000_000
        ).alias("rate_per_s"),
    )
