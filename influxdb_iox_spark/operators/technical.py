"""Technical-analysis transforms: the stock InfluxQL 1.x family
(EXPONENTIAL_MOVING_AVERAGE, DOUBLE_/TRIPLE_EXPONENTIAL_MOVING_AVERAGE,
TRIPLE_EXPONENTIAL_DERIVATIVE, RELATIVE_STRENGTH_INDEX,
KAUFMANS_ADAPTIVE_MOVING_AVERAGE, HOLT_WINTERS[_WITH_FIT]).

The v0 reference has no InfluxQL layer at all (it serves storage RPCs to a
separate 1.x front-end — see /root/reference/src/influxdb_ioxd.rs and
generated_types/protos/influxdata/platform/storage), so this module targets
the publicly documented stock-1.8 language surface.  Where the stock docs
leave numeric details open (warm-up seeding, fit initialisation) the
contract implemented here is pinned in each docstring and enforced by
tests/test_technical.py against independent slow references.

Scale posture: every indicator here is an inherently SEQUENTIAL recurrence
per series — no engine can window-express it — but embarrassingly parallel
ACROSS series, which is the axis that grows at 100 TB.  The implementation
is one ``applyInPandas`` over the series key (a single hash exchange, same
cost model as the window transforms) with vectorized numpy inside; the only
per-point scalar loops are the recurrences themselves, run on C-contiguous
float64 arrays.  CHANDE_MOMENTUM_OSCILLATOR and KAUFMANS_EFFICIENCY_RATIO
are N-truncated (not recursive) and therefore live in
``operators/transforms.py`` as pure whole-stage-codegen window columns.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

__all__ = [
    "ema_scan",
    "rsi_scan",
    "kama_scan",
    "trix_scan",
    "apply_technical",
    "holt_winters_fit_predict",
    "apply_holt_winters",
    "use_fast_kernels",
]

#: Process-wide opt-in for the vectorized kernels (pandas-C ``ewm`` folds
#: and precomputed coefficients) instead of the pinned per-point Python
#: recurrences.  The fast path computes the SAME recurrences but through a
#: different sequence of IEEE operations, so results can drift in the last
#: ulp vs the pinned contract — fine for production analytics, wrong for
#: the bit-exact oracle gate (which never flips this).  Flip with
#: ``use_fast_kernels()`` or per-call via ``apply_technical(..., exact=)``.
_FAST_KERNELS = False


def use_fast_kernels(on: bool = True) -> None:
    """Opt in/out of the vectorized technical kernels process-wide."""
    global _FAST_KERNELS
    _FAST_KERNELS = bool(on)


# ---------------------------------------------------------------------------
# per-series numpy kernels (1-D float64 in → 1-D float64 out, NaN = no emit)
# ---------------------------------------------------------------------------


def _ewm_fold(x: np.ndarray, alpha: float, seed: float) -> np.ndarray:
    """Vectorized ``y[0]=seed; y[i]=(1-α)·y[i-1]+α·x[i]`` via pandas-C
    ``ewm(adjust=False)`` — the fast-path building block.  Same recurrence
    as the scalar fold, different IEEE operation grouping (pandas computes
    ``y + α·(x−y)``), hence last-ulp drift vs the pinned contract."""
    arr = np.asarray(x, dtype=np.float64).copy()
    if len(arr) == 0:
        return arr
    arr[0] = seed
    return (
        pd.Series(arr).ewm(alpha=alpha, adjust=False).mean().to_numpy()
    )


def ema_scan(
    x: np.ndarray, n: int, warmup: str = "exponential", exact: bool = True
) -> np.ndarray:
    """EXPONENTIAL_MOVING_AVERAGE(x, n): α = 2/(n+1).

    Contract (pinned): the recurrence is exactly
    ``y[i] = y[i-1]*(1-α) + α*x[i]`` in that operation order (bit-stable
    across IEEE-754 engines — the DuckDB twin spells the same fold).
    Warm-up:

    - ``'exponential'`` (default): seeded ``y[0] = x[0]``; emits from the
      first point.
    - ``'simple'``: seeded with the simple mean of the first ``n`` points;
      the first ``n-1`` outputs are NaN (withheld) and ``y[n-1]`` is that
      mean; the recurrence continues from there.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    out = np.full(len(x), np.nan)
    if len(x) == 0:
        return out
    alpha = 2.0 / (n + 1)
    if warmup == "simple":
        if len(x) < n:
            return out
        acc = float(np.mean(x[:n]))
        if not exact:
            out[n - 1 :] = _ewm_fold(x[n - 1 :], alpha, acc)
            return out
        out[n - 1] = acc
        start = n
    elif warmup == "exponential":
        if not exact:
            return _ewm_fold(x, alpha, float(x[0]))
        acc = float(x[0])
        out[0] = acc
        start = 1
    else:
        raise ValueError(f"unknown warmup type {warmup!r}")
    for i in range(start, len(x)):
        acc = acc * (1.0 - alpha) + alpha * float(x[i])
        out[i] = acc
    return out


def _ema_chain(
    x: np.ndarray, n: int, depth: int, warmup: str, exact: bool = True
) -> np.ndarray:
    """depth-fold EMA-of-EMA; NaN prefixes propagate (each stage only sees
    the points its input actually emitted)."""
    y = x
    for _ in range(depth):
        mask = ~np.isnan(y)
        stage = np.full(len(y), np.nan)
        stage[mask] = ema_scan(y[mask], n, warmup, exact)
        y = stage
    return y


def dema_scan(
    x: np.ndarray, n: int, warmup: str = "exponential", exact: bool = True
) -> np.ndarray:
    """DOUBLE_EXPONENTIAL_MOVING_AVERAGE: 2·EMA − EMA(EMA)."""
    e1 = _ema_chain(x, n, 1, warmup, exact)
    e2 = _ema_chain(x, n, 2, warmup, exact)
    return 2.0 * e1 - e2


def tema_scan(
    x: np.ndarray, n: int, warmup: str = "exponential", exact: bool = True
) -> np.ndarray:
    """TRIPLE_EXPONENTIAL_MOVING_AVERAGE: 3·EMA − 3·EMA² + EMA³."""
    e1 = _ema_chain(x, n, 1, warmup, exact)
    e2 = _ema_chain(x, n, 2, warmup, exact)
    e3 = _ema_chain(x, n, 3, warmup, exact)
    return 3.0 * e1 - 3.0 * e2 + e3


def trix_scan(
    x: np.ndarray, n: int, warmup: str = "exponential", exact: bool = True
) -> np.ndarray:
    """TRIPLE_EXPONENTIAL_DERIVATIVE: percentage rate of change of the
    triple-smoothed EMA — ``100·(t[i] − t[i-1]) / t[i-1]`` over consecutive
    EMITTED values of EMA³ (NaN warm-up gaps are skipped, first emitted
    value has no predecessor → NaN)."""
    t = _ema_chain(x, n, 3, warmup, exact)
    if not exact:
        out = np.full(len(x), np.nan)
        idx = np.flatnonzero(~np.isnan(t))
        if len(idx) >= 2:
            cur, prev = t[idx[1:]], t[idx[:-1]]
            with np.errstate(divide="ignore", invalid="ignore"):
                vals = np.where(
                    prev != 0.0, 100.0 * (cur - prev) / prev, np.nan
                )
            out[idx[1:]] = vals
        return out
    out = np.full(len(x), np.nan)
    prev = np.nan
    for i in range(len(t)):
        cur = t[i]
        if np.isnan(cur):
            continue
        if not np.isnan(prev) and prev != 0.0:
            out[i] = 100.0 * (cur - prev) / prev
        prev = cur
    return out


def rsi_scan(x: np.ndarray, n: int, exact: bool = True) -> np.ndarray:
    """RELATIVE_STRENGTH_INDEX(x, n), Wilder smoothing.

    Contract (pinned): gains/losses from consecutive diffs; the first
    average gain/loss is the simple mean of the first ``n`` diffs (emitted
    at index ``n``); thereafter ``ag = (ag·(n−1) + gain)/n`` (same for
    losses).  ``RSI = 100 − 100/(1 + ag/al)``; ``al == 0`` → 100 exactly.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    out = np.full(len(x), np.nan)
    if len(x) < n + 1:
        return out
    d = np.diff(x)
    gains = np.where(d > 0, d, 0.0)
    losses = np.where(d < 0, -d, 0.0)
    ag = float(np.mean(gains[:n]))
    al = float(np.mean(losses[:n]))
    if not exact:
        # Wilder smoothing IS an EMA with α = 1/n seeded by the simple
        # mean — two pandas-C folds, then a vectorized RSI formula
        ags = _ewm_fold(np.concatenate(([ag], gains[n:])), 1.0 / n, ag)
        als = _ewm_fold(np.concatenate(([al], losses[n:])), 1.0 / n, al)
        with np.errstate(divide="ignore", invalid="ignore"):
            out[n:] = np.where(
                als == 0.0, 100.0, 100.0 - 100.0 / (1.0 + ags / als)
            )
        return out
    out[n] = 100.0 if al == 0.0 else 100.0 - 100.0 / (1.0 + ag / al)
    for i in range(n + 1, len(x)):
        ag = (ag * (n - 1) + gains[i - 1]) / n
        al = (al * (n - 1) + losses[i - 1]) / n
        out[i] = 100.0 if al == 0.0 else 100.0 - 100.0 / (1.0 + ag / al)
    return out


def kama_scan(x: np.ndarray, n: int, exact: bool = True) -> np.ndarray:
    """KAUFMANS_ADAPTIVE_MOVING_AVERAGE(x, n).

    Contract (pinned): emitted from index ``n`` seeded ``prev = x[n-1]``;
    efficiency ratio ``er = |x[i] − x[i−n]| / Σ|Δx|`` over the last ``n``
    diffs (0 when the denominator is 0); smoothing constant
    ``sc = (er·(2/3 − 2/31) + 2/31)²`` (fast = 2/(2+1), slow = 2/(30+1));
    ``kama[i] = prev + sc·(x[i] − prev)``.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    out = np.full(len(x), np.nan)
    if len(x) < n + 1:
        return out
    fast, slow = 2.0 / 3.0, 2.0 / 31.0
    absd = np.abs(np.diff(x))
    if not exact:
        # data-dependent coefficient: precompute sc[i] vectorized (rolling
        # |Δ| sums via cumsum), leaving only the irreducible prev-fold loop
        c = np.concatenate(([0.0], np.cumsum(absd)))
        i = np.arange(n, len(x))
        vol = c[i] - c[i - n]
        with np.errstate(divide="ignore", invalid="ignore"):
            er = np.where(vol > 0, np.abs(x[i] - x[i - n]) / vol, 0.0)
        sc = (er * (fast - slow) + slow) ** 2
        prev = float(x[n - 1])
        for j in range(len(i)):
            prev = prev + sc[j] * (float(x[n + j]) - prev)
            out[n + j] = prev
        return out
    prev = float(x[n - 1])
    for i in range(n, len(x)):
        vol = float(np.sum(absd[i - n : i]))
        er = abs(float(x[i]) - float(x[i - n])) / vol if vol > 0 else 0.0
        sc = (er * (fast - slow) + slow) ** 2
        prev = prev + sc * (float(x[i]) - prev)
        out[i] = prev
    return out


_KERNELS = {
    "exponential_moving_average": lambda x, n, warmup, exact: ema_scan(
        x, n, warmup, exact
    ),
    "double_exponential_moving_average": lambda x, n, warmup, exact: dema_scan(
        x, n, warmup, exact
    ),
    "triple_exponential_moving_average": lambda x, n, warmup, exact: tema_scan(
        x, n, warmup, exact
    ),
    "triple_exponential_derivative": lambda x, n, warmup, exact: trix_scan(
        x, n, warmup, exact
    ),
    "relative_strength_index": lambda x, n, warmup, exact: rsi_scan(
        x, n, exact
    ),
    "kaufmans_adaptive_moving_average": lambda x, n, warmup, exact: kama_scan(
        x, n, exact
    ),
}


# ---------------------------------------------------------------------------
# DataFrame operators
# ---------------------------------------------------------------------------


def apply_technical(
    df: DataFrame,
    keys: list[str],
    time_col: str,
    specs: list[tuple[str, str, str, int, str, int]],
    exact: bool | None = None,
) -> DataFrame:
    """Compute recursive technical indicators per series in ONE
    ``applyInPandas`` pass (single hash exchange on the series key).

    ``specs``: list of ``(out_col, func, in_col, n, warmup, hold)`` where
    ``func`` is a key of ``_KERNELS`` and ``hold`` suppresses that many
    additional leading EMITTED values (stock HOLD_PERIOD; 0 = none).
    Each indicator runs over its input's non-null subsequence (a point
    missing this field does not break the recurrence for the points that
    have it).  Output schema: ``keys…, time, out_cols…`` (doubles; NaN →
    null = warm-up, which the planner filters per stock emit rules).
    Rows are sorted by time inside each series; the caller owns overall
    result ordering.

    ``exact``: True = the pinned per-point folds (bit-stable contract the
    oracles rely on); False = vectorized pandas-C/cumsum kernels (same
    recurrences, different IEEE grouping — last-ulp drift possible);
    None (default) = the process-wide ``use_fast_kernels`` setting.
    """
    if exact is None:
        exact = not _FAST_KERNELS
    for _, func, _, _, _, _ in specs:
        if func not in _KERNELS:
            raise ValueError(f"unknown technical function {func!r}")
    if not keys:
        # single global series: a constant grouping key keeps the same code
        # path (one group, one task — the sequential recurrence's floor)
        out = apply_technical(
            df.withColumn("__g", F.lit(0)), ["__g"], time_col, specs, exact
        )
        return out.drop("__g")
    key_fields = [df.schema[k] for k in keys]
    out_schema = StructType(
        [*key_fields, StructField("time", LongType(), False)]
        + [StructField(out, DoubleType(), True) for out, *_ in specs]
    )
    in_cols = sorted({s[2] for s in specs})

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(time_col, kind="mergesort")
        res = {k: pdf[k] for k in keys}
        res["time"] = pdf[time_col]
        arrays = {
            c: pdf[c].to_numpy(dtype=np.float64, na_value=np.nan)
            for c in in_cols
        }
        for out, func, in_col, n, warmup, hold in specs:
            x = arrays[in_col]
            mask = ~np.isnan(x)
            col = np.full(len(x), np.nan)
            col[mask] = _KERNELS[func](x[mask], n, warmup, exact)
            if hold > 0:
                emitted = np.flatnonzero(~np.isnan(col))
                col[emitted[:hold]] = np.nan
            res[out] = col
        return pd.DataFrame(res)

    return df.groupBy(*keys).applyInPandas(kernel, out_schema)


# ---------------------------------------------------------------------------
# Holt-Winters
# ---------------------------------------------------------------------------


def _hw_sse(
    params: np.ndarray, y: np.ndarray, m: int
) -> tuple[float, np.ndarray]:
    """Additive Holt-Winters one-step-ahead fit; returns (SSE, fitted).

    Initialisation (pinned contract): level = y[0]; trend = the average
    first-difference over the first season (or y[1]−y[0] when m < 2);
    seasonal[i] = y[i] − mean(first season).  Parameters are clipped to
    [0, 1] before use so the Nelder-Mead search space is unconstrained.
    """
    a, b, g = np.clip(params, 0.0, 1.0)
    n = len(y)
    fitted = np.empty(n)
    seasonal = m >= 2 and n >= m
    if seasonal:
        season_mean = float(np.mean(y[:m]))
        s = (y[:m] - season_mean).astype(float).copy()
        trend = float(np.mean(np.diff(y[:m]))) if m >= 2 else 0.0
    else:
        s = np.zeros(1)
        trend = float(y[1] - y[0]) if n >= 2 else 0.0
    level = float(y[0])
    for i in range(n):
        si = s[i % m] if seasonal else 0.0
        fitted[i] = level + trend + si
        if i == 0:
            continue
        obs = float(y[i])
        new_level = a * (obs - si) + (1 - a) * (level + trend)
        trend = b * (new_level - level) + (1 - b) * trend
        if seasonal:
            s[i % m] = g * (obs - new_level) + (1 - g) * si
        level = new_level
    err = y - fitted
    return float(np.dot(err, err)), fitted


def _nelder_mead(fn, x0: np.ndarray, iters: int = 200) -> np.ndarray:
    """Deterministic derivative-free simplex minimizer (standard
    reflection/expansion/contraction/shrink coefficients 1, 2, 0.5, 0.5);
    enough for the 3-parameter Holt-Winters SSE surface and dependency-free
    (no scipy in the runtime)."""
    d = len(x0)
    simplex = [x0.astype(float)]
    for i in range(d):
        p = x0.astype(float).copy()
        p[i] = p[i] + 0.25 if p[i] <= 0.75 else p[i] - 0.25
        simplex.append(p)
    vals = [fn(p) for p in simplex]
    for _ in range(iters):
        order = np.argsort(vals)
        simplex = [simplex[i] for i in order]
        vals = [vals[i] for i in order]
        centroid = np.mean(simplex[:-1], axis=0)
        refl = centroid + (centroid - simplex[-1])
        fr = fn(refl)
        if fr < vals[0]:
            exp = centroid + 2.0 * (centroid - simplex[-1])
            fe = fn(exp)
            simplex[-1], vals[-1] = (
                (exp, fe) if fe < fr else (refl, fr)
            )
        elif fr < vals[-2]:
            simplex[-1], vals[-1] = refl, fr
        else:
            contr = centroid + 0.5 * (simplex[-1] - centroid)
            fc = fn(contr)
            if fc < vals[-1]:
                simplex[-1], vals[-1] = contr, fc
            else:
                best = simplex[0]
                simplex = [best] + [
                    best + 0.5 * (p - best) for p in simplex[1:]
                ]
                vals = [vals[0]] + [fn(p) for p in simplex[1:]]
    return np.clip(simplex[int(np.argmin(vals))], 0.0, 1.0)


def holt_winters_fit_predict(
    y: np.ndarray,
    n_predict: int,
    season_len: int,
    params: tuple[float, float, float] | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Fit additive Holt-Winters (Holt's linear when ``season_len < 2``) by
    minimizing one-step-ahead SSE over (α, β, γ) with the built-in
    Nelder-Mead, then forecast ``n_predict`` steps.  Returns
    ``(fitted, predicted)``.  Deterministic: fixed start point
    (0.5, 0.1, 0.1), fixed iteration budget.

    ``params`` pins (α, β, γ) and skips the fit entirely — the recursion
    then has a closed, SQL-expressible form (a coupled level/trend fold),
    which is what the fixed-parameter InfluxQL extension and its
    recursive-CTE oracle exercise."""
    y = np.asarray(y, dtype=float)
    if len(y) < 2:
        raise ValueError("holt_winters needs at least 2 points")
    m = season_len if season_len >= 2 and len(y) >= season_len else 0

    def objective(p: np.ndarray) -> float:
        return _hw_sse(p, y, m)[0]

    if params is not None:
        best = np.clip(np.asarray(params, dtype=float), 0.0, 1.0)
    else:
        best = _nelder_mead(objective, np.array([0.5, 0.1, 0.1]))
    _, fitted = _hw_sse(best, y, m)

    # re-run the recursion to capture final state for forecasting
    a, b, g = best
    seasonal = m >= 2
    if seasonal:
        season_mean = float(np.mean(y[:m]))
        s = (y[:m] - season_mean).astype(float).copy()
        trend = float(np.mean(np.diff(y[:m])))
    else:
        s = np.zeros(1)
        trend = float(y[1] - y[0])
    level = float(y[0])
    for i in range(1, len(y)):
        si = s[i % m] if seasonal else 0.0
        obs = float(y[i])
        new_level = a * (obs - si) + (1 - a) * (level + trend)
        trend = b * (new_level - level) + (1 - b) * trend
        if seasonal:
            s[i % m] = g * (obs - new_level) + (1 - g) * si
        level = new_level
    preds = np.empty(n_predict)
    for h in range(1, n_predict + 1):
        si = s[(len(y) + h - 1) % m] if seasonal else 0.0
        preds[h - 1] = level + h * trend + si
    return fitted, preds


def apply_holt_winters(
    df: DataFrame,
    keys: list[str],
    time_col: str,
    value_col: str,
    n_predict: int,
    season_len: int,
    interval_ns: int,
    with_fit: bool,
    out_col: str = "holt_winters",
    params: tuple[float, float, float] | None = None,
) -> DataFrame:
    """HOLT_WINTERS[(…)_WITH_FIT] over a bucketed aggregate series: per
    series, fit on the observed buckets and emit ``n_predict`` forecast
    rows continuing the time grid (plus the fitted values over the input
    range for the _WITH_FIT form).  One ``applyInPandas`` per statement —
    the same single-exchange cost model as the other recursions; the fit
    is O(iters · points) numpy per series.  ``params`` pins (α, β, γ)
    and skips the Nelder-Mead fit (see holt_winters_fit_predict)."""
    if not keys:
        out = apply_holt_winters(
            df.withColumn("__g", F.lit(0)),
            ["__g"],
            time_col,
            value_col,
            n_predict,
            season_len,
            interval_ns,
            with_fit,
            out_col,
            params,
        )
        return out.drop("__g")
    key_fields = [df.schema[k] for k in keys]
    out_schema = StructType(
        [
            *key_fields,
            StructField("time", LongType(), False),
            StructField(out_col, DoubleType(), True),
        ]
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(time_col, kind="mergesort")
        pdf = pdf[pdf[value_col].notna()]
        times = pdf[time_col].to_numpy(dtype=np.int64)
        y = pdf[value_col].to_numpy(dtype=np.float64)
        if len(y) < 2:
            empty = {k: pdf[k].iloc[:0] for k in keys}
            empty["time"] = times[:0]
            empty[out_col] = y[:0]
            return pd.DataFrame(empty)
        fitted, preds = holt_winters_fit_predict(
            y, n_predict, season_len, params
        )
        pred_times = times[-1] + interval_ns * np.arange(
            1, n_predict + 1, dtype=np.int64
        )
        if with_fit:
            out_times = np.concatenate([times, pred_times])
            out_vals = np.concatenate([fitted, preds])
        else:
            out_times, out_vals = pred_times, preds
        first = {k: [pdf[k].iloc[0]] * len(out_times) for k in keys}
        return pd.DataFrame({**first, "time": out_times, out_col: out_vals})

    return df.groupBy(*keys).applyInPandas(kernel, out_schema)
