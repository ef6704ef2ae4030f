"""Technical-analysis family: kernel contracts (pure numpy, no Spark)
and InfluxQL planner lowering (EXPONENTIAL_MOVING_AVERAGE and friends,
HOLT_WINTERS, CHANDE_MOMENTUM_OSCILLATOR / KAUFMANS_EFFICIENCY_RATIO as
window transforms).

The stock docs pin the surface but not every numeric detail; the
contracts under test are the ones pinned in operators/technical.py."""

from __future__ import annotations

import math

import numpy as np
import pytest

from influxdb_iox_spark.influxql import Measurement, execute
from influxdb_iox_spark.influxql.planner import InfluxQLPlanError
from influxdb_iox_spark.operators.technical import (
    apply_technical,
    dema_scan,
    ema_scan,
    holt_winters_fit_predict,
    kama_scan,
    rsi_scan,
    tema_scan,
    trix_scan,
)

S = 10**9
H = 3600 * S


# -- kernels (no Spark) ------------------------------------------------------


def _ema_ref(x, n, warmup="exponential"):
    a = 2.0 / (n + 1)
    out = [math.nan] * len(x)
    if warmup == "simple":
        if len(x) < n:
            return out
        acc = sum(x[:n]) / n
        out[n - 1] = acc
        start = n
    else:
        acc = x[0]
        out[0] = acc
        start = 1
    for i in range(start, len(x)):
        acc = acc * (1 - a) + a * x[i]
        out[i] = acc
    return out


def test_ema_exponential_matches_fold():
    rng = np.random.default_rng(3)
    x = rng.uniform(-50, 50, 200)
    got = ema_scan(x, 10)
    ref = _ema_ref(list(x), 10)
    assert np.array_equal(got, np.array(ref))  # bit-identical, pinned


def test_ema_simple_warmup():
    x = np.array([2.0, 4.0, 6.0, 8.0])
    got = ema_scan(x, 3, "simple")
    assert np.isnan(got[0]) and np.isnan(got[1])
    assert got[2] == 4.0  # mean of first 3
    a = 2.0 / 4
    assert got[3] == 4.0 * (1 - a) + a * 8.0


def test_ema_rejects_unknown_warmup():
    with pytest.raises(ValueError):
        ema_scan(np.array([1.0]), 2, "linear")


def test_dema_tema_constant_series():
    x = np.full(50, 7.0)
    assert np.allclose(dema_scan(x, 5), 7.0)
    assert np.allclose(tema_scan(x, 5), 7.0)


def test_trix_constant_growth():
    # exponential series: EMA chains converge to the same growth rate,
    # so TRIX (pct change of EMA^3) converges to the per-step pct change
    x = 100.0 * np.power(1.01, np.arange(300))
    t = trix_scan(x, 8)
    assert np.isnan(t[0])
    assert abs(t[-1] - 1.0) < 1e-6  # 1% per step → TRIX → 1.0


def test_rsi_monotone_up_is_100():
    x = np.arange(30, dtype=float)
    r = rsi_scan(x, 14)
    assert np.isnan(r[13]) and r[14] == 100.0 and r[-1] == 100.0


def test_rsi_hand_case():
    # n=2: diffs (+1, -1, +1); seed ag=al=0.5 at i=2 → RSI 50
    x = np.array([1.0, 2.0, 1.0, 2.0])
    r = rsi_scan(x, 2)
    assert np.isnan(r[0]) and np.isnan(r[1])
    assert r[2] == 50.0
    # i=3: ag=(0.5*1+1)/2=0.75, al=(0.5*1+0)/2=0.25 → 100-100/(1+3)=75
    assert r[3] == 75.0


def test_kama_pinned_contract():
    x = np.array([1.0, 2.0, 3.0, 4.0, 10.0])
    n = 2
    got = kama_scan(x, n)
    assert np.isnan(got[0]) and np.isnan(got[1])
    fast, slow = 2.0 / 3.0, 2.0 / 31.0
    prev = x[1]
    for i in (2, 3, 4):
        vol = abs(x[i] - x[i - 1]) + abs(x[i - 1] - x[i - 2])
        er = abs(x[i] - x[i - 2]) / vol if vol else 0.0
        sc = (er * (fast - slow) + slow) ** 2
        prev = prev + sc * (x[i] - prev)
        assert got[i] == pytest.approx(prev, rel=0, abs=0)


def test_holt_winters_linear_trend():
    y = 3.0 + 2.0 * np.arange(40)
    fitted, preds = holt_winters_fit_predict(y, 5, 0)
    # Holt's linear on a perfect line: forecasts continue the line
    expect = 3.0 + 2.0 * (40 + np.arange(5))
    assert np.allclose(preds, expect, rtol=1e-3)
    assert np.allclose(fitted[5:], y[5:], rtol=1e-2)


def test_holt_winters_seasonal():
    # strict period-4 pattern on a flat level
    base = np.array([10.0, 20.0, 15.0, 5.0])
    y = np.tile(base, 10)
    _, preds = holt_winters_fit_predict(y, 4, 4)
    assert np.allclose(preds, base, rtol=0.05)


# -- Spark operator + planner ------------------------------------------------


@pytest.fixture(scope="module")
def catalog(spark):
    rows = []
    for host, seed in (("a", 1.0), ("b", 100.0)):
        v = seed
        for i in range(12):
            v = v * 1.1 + (1.0 if i % 3 == 0 else -0.5)
            rows.append((host, float(v), i * H))
    df = spark.createDataFrame(rows, "host string, v double, time long")
    return {"cpu": Measurement(df=df, tags=("host",), fields=("v",))}


def _vals(df, col="exponential_moving_average"):
    return {
        (r["host"], r["time"]): r[col] for r in df.collect()
    }


def test_planner_ema_raw(catalog):
    out = execute(
        "SELECT exponential_moving_average(v, 4) FROM cpu GROUP BY host",
        catalog,
    )
    rows = out.collect()
    assert {r["host"] for r in rows} == {"a", "b"}
    by_host = {}
    for r in sorted(rows, key=lambda r: (r["host"], r["time"])):
        by_host.setdefault(r["host"], []).append(
            r["exponential_moving_average"]
        )
    # per-series fold replicated independently
    src = {
        h: [
            v
            for _, v, _ in sorted(
                (
                    (r.host, r.v, r.time)
                    for r in catalog["cpu"].df.collect()
                    if r.host == h
                ),
                key=lambda t: t[2],
            )
        ]
        for h in ("a", "b")
    }
    for h in ("a", "b"):
        assert by_host[h] == pytest.approx(_ema_ref(src[h], 4), abs=0)


def test_planner_ema_warmup_and_hold(catalog):
    out = execute(
        "SELECT exponential_moving_average(v, 4, 2, 'simple') "
        "FROM cpu WHERE host = 'a' GROUP BY host",
        catalog,
    )
    rows = sorted(out.collect(), key=lambda r: r["time"])
    src = [
        r.v
        for r in sorted(
            catalog["cpu"].df.filter("host = 'a'").collect(),
            key=lambda r: r.time,
        )
    ]
    ref = [x for x in _ema_ref(src, 4, "simple") if not math.isnan(x)]
    got = [r["exponential_moving_average"] for r in rows]
    assert got == pytest.approx(ref[2:], abs=0)  # hold=2 drops 2 emitted


def test_planner_ema_of_aggregate(catalog):
    out = execute(
        "SELECT exponential_moving_average(mean(v), 3) FROM cpu "
        "WHERE time >= 0 AND time < 12h GROUP BY time(2h), host",
        catalog,
    )
    rows = sorted(out.collect(), key=lambda r: (r["host"], r["time"]))
    assert len(rows) == 12  # 6 buckets × 2 hosts
    # twin: bucket means then the fold
    raw = catalog["cpu"].df.collect()
    for host in ("a", "b"):
        means = []
        for b in range(6):
            xs = [
                r.v
                for r in raw
                if r.host == host and b * 2 * H <= r.time < (b + 1) * 2 * H
            ]
            means.append(sum(xs) / len(xs))
        ref = _ema_ref(means, 3)
        got = [r["exponential_moving_average"] for r in rows if r.host == host]
        assert got == pytest.approx(ref, abs=0)


def test_planner_cmo_and_ker_window_transforms(catalog):
    out = execute(
        "SELECT chande_momentum_oscillator(v, 3), "
        "kaufmans_efficiency_ratio(v, 3) FROM cpu "
        "WHERE host = 'a' GROUP BY host",
        catalog,
    )
    rows = sorted(out.collect(), key=lambda r: r["time"])
    src = [
        r.v
        for r in sorted(
            catalog["cpu"].df.filter("host = 'a'").collect(),
            key=lambda r: r.time,
        )
    ]
    d = np.diff(src)
    # first emit needs 3 diffs → row index 3; planner drops warm-up rows
    assert len(rows) == len(src) - 3
    for k, r in enumerate(rows):
        i = k + 3
        win = d[i - 3 : i]
        su = float(np.sum(win[win > 0]))
        sd = float(-np.sum(win[win < 0]))
        cmo = 0.0 if su + sd == 0 else 100.0 * (su - sd) / (su + sd)
        vol = float(np.sum(np.abs(win)))
        ker = 0.0 if vol == 0 else abs(src[i] - src[i - 3]) / vol
        assert r["chande_momentum_oscillator"] == pytest.approx(cmo)
        assert r["kaufmans_efficiency_ratio"] == pytest.approx(ker)


def test_planner_holt_winters(catalog):
    out = execute(
        "SELECT holt_winters(mean(v), 4, 0) FROM cpu "
        "WHERE time >= 0 AND time < 12h GROUP BY time(2h), host",
        catalog,
    )
    rows = sorted(out.collect(), key=lambda r: (r["host"], r["time"]))
    assert len(rows) == 8  # 4 forecasts × 2 hosts
    for r in rows:
        assert r["time"] >= 12 * H  # strictly beyond the observed grid
        assert r["holt_winters"] is not None


def test_planner_holt_winters_with_fit(catalog):
    out = execute(
        "SELECT holt_winters_with_fit(mean(v), 2, 0) FROM cpu "
        "WHERE time >= 0 AND time < 12h AND host = 'a' "
        "GROUP BY time(2h), host",
        catalog,
    )
    rows = sorted(out.collect(), key=lambda r: r["time"])
    assert len(rows) == 8  # 6 fitted + 2 forecast
    assert sum(1 for r in rows if r["time"] >= 12 * H) == 2


def test_fast_kernels_match_exact():
    """The opt-in vectorized kernels compute the same recurrences as the
    pinned folds — equal to ~1e-12 relative (different IEEE grouping, so
    not required bit-exact; the oracle gate keeps exact=True)."""
    from influxdb_iox_spark.operators.technical import (
        dema_scan,
        tema_scan,
    )

    rng = np.random.RandomState(7)
    x = np.cumsum(rng.randn(500)) + 50.0
    cases = [
        (ema_scan, (x, 9, "exponential")),
        (ema_scan, (x, 9, "simple")),
        (dema_scan, (x, 7, "exponential")),
        (tema_scan, (x, 7, "simple")),
        (trix_scan, (x, 5, "exponential")),
        (rsi_scan, (x, 14)),
        (kama_scan, (x, 10)),
    ]
    for fn, args in cases:
        slow = fn(*args, exact=True)
        fast = fn(*args, exact=False)
        assert np.array_equal(np.isnan(slow), np.isnan(fast)), fn.__name__
        m = ~np.isnan(slow)
        np.testing.assert_allclose(
            fast[m], slow[m], rtol=1e-9, atol=1e-9, err_msg=fn.__name__
        )


def test_fast_kernels_rsi_zero_loss_branch():
    # monotone increasing series: al == 0 everywhere -> RSI pinned at 100
    x = np.arange(30, dtype=float)
    fast = rsi_scan(x, 5, exact=False)
    assert np.all(fast[5:] == 100.0) and np.all(np.isnan(fast[:5]))


def test_apply_technical_fast_opt_in(catalog, spark):
    """use_fast_kernels flips the default path; results stay within float
    tolerance of the exact plan output."""
    from influxdb_iox_spark.operators.technical import use_fast_kernels

    df = catalog["cpu"].df
    specs = [("ema", "exponential_moving_average", "v", 4, "exponential", 0)]
    exact_rows = {
        (r["host"], r["time"]): r["ema"]
        for r in apply_technical(df, ["host"], "time", specs).collect()
    }
    use_fast_kernels(True)
    try:
        fast_rows = {
            (r["host"], r["time"]): r["ema"]
            for r in apply_technical(df, ["host"], "time", specs).collect()
        }
    finally:
        use_fast_kernels(False)
    assert exact_rows.keys() == fast_rows.keys()
    for k, v in exact_rows.items():
        f = fast_rows[k]
        assert (v is None) == (f is None)
        if v is not None:
            assert f == pytest.approx(v, rel=1e-9)


def test_holt_winters_pinned_params_skips_fit():
    # pinned (α, β): the recursion is the closed Holt's-linear fold —
    # replay it by hand and require bit-exact agreement (this is the
    # contract the recursive-CTE driver oracle relies on)
    y = np.array([4.0, 7.0, 5.0, 9.0, 11.0, 8.0])
    a, b = 0.5, 0.25
    level, trend = y[0], y[1] - y[0]
    for obs in y[1:]:
        nl = a * (obs - 0.0) + (1 - a) * (level + trend)
        trend = b * (nl - level) + (1 - b) * trend
        level = nl
    expect = np.array([level + h * trend for h in range(1, 4)])
    _, preds = holt_winters_fit_predict(y, 3, 0, params=(a, b, 0.0))
    assert np.array_equal(preds, expect)


def test_planner_holt_winters_pinned(catalog):
    out = execute(
        "SELECT holt_winters(mean(v), 3, 0, 0.5, 0.25) FROM cpu "
        "WHERE time >= 0 AND time < 12h GROUP BY time(2h), host",
        catalog,
    )
    rows = out.collect()
    assert len(rows) == 6  # 3 forecasts × 2 hosts
    # pinned run is reproducible and differs from the fitted run in general
    again = execute(
        "SELECT holt_winters(mean(v), 3, 0, 0.5, 0.25) FROM cpu "
        "WHERE time >= 0 AND time < 12h GROUP BY time(2h), host",
        catalog,
    ).collect()
    key = lambda r: (r["host"], r["time"])
    assert sorted(map(key, rows)) == sorted(map(key, again))
    assert {r["holt_winters"] for r in rows} == {
        r["holt_winters"] for r in again
    }


def test_planner_holt_winters_pinned_seasonal(catalog):
    # seasonal pinned form (γ supplied) plans and emits forecasts
    out = execute(
        "SELECT holt_winters(mean(v), 2, 3, 0.5, 0.25, 0.5) FROM cpu "
        "WHERE time >= 0 AND time < 12h GROUP BY time(2h), host",
        catalog,
    )
    assert len(out.collect()) == 4


def test_planner_holt_winters_pinned_errors(catalog):
    base = (
        "FROM cpu WHERE time >= 0 AND time < 12h GROUP BY time(2h), host"
    )
    with pytest.raises(InfluxQLPlanError):  # alpha without beta
        execute(f"SELECT holt_winters(mean(v), 3, 0, 0.5) {base}", catalog)
    with pytest.raises(InfluxQLPlanError):  # out of [0, 1]
        execute(
            f"SELECT holt_winters(mean(v), 3, 0, 1.5, 0.2) {base}", catalog
        )
    with pytest.raises(InfluxQLPlanError):  # non-literal factor
        execute(
            f"SELECT holt_winters(mean(v), 3, 0, v, 0.2) {base}", catalog
        )


def test_planner_technical_errors(catalog):
    with pytest.raises(InfluxQLPlanError):
        execute("SELECT holt_winters(mean(v), 4, 0) FROM cpu", catalog)
    with pytest.raises(InfluxQLPlanError):
        execute(
            "SELECT exponential_moving_average(v, 4), difference(v) "
            "FROM cpu",
            catalog,
        )
    with pytest.raises(InfluxQLPlanError):
        execute(
            "SELECT exponential_moving_average(v, 4) FROM cpu "
            "GROUP BY time(1h)",
            catalog,
        )
    with pytest.raises(InfluxQLPlanError):
        execute(
            "SELECT exponential_moving_average(v, 4, 0, 'cubic') FROM cpu",
            catalog,
        )
    with pytest.raises(InfluxQLPlanError):
        execute("SELECT relative_strength_index(v) FROM cpu", catalog)


def test_apply_technical_null_inputs_skip(spark):
    # interior nulls: the recurrence runs over the non-null subsequence
    rows = [
        ("a", 1.0, 0),
        ("a", None, S),
        ("a", 2.0, 2 * S),
        ("a", 3.0, 3 * S),
    ]
    df = spark.createDataFrame(rows, "host string, v double, time long")
    out = apply_technical(
        df, ["host"], "time",
        [("ema", "exponential_moving_average", "v", 2, "exponential", 0)],
    )
    got = {r["time"]: r["ema"] for r in out.collect()}
    assert got[S] is None
    ref = _ema_ref([1.0, 2.0, 3.0], 2)
    assert got[0] == ref[0] and got[2 * S] == ref[1] and got[3 * S] == ref[2]


def test_planner_scalar_math_around_technical(catalog):
    out = execute(
        "SELECT abs(exponential_moving_average(v, 4)) * 2 AS e2 "
        "FROM cpu WHERE host = 'a' GROUP BY host",
        catalog,
    )
    rows = sorted(out.collect(), key=lambda r: r["time"])
    src = [
        r.v
        for r in sorted(
            catalog["cpu"].df.filter("host = 'a'").collect(),
            key=lambda r: r.time,
        )
    ]
    ref = [abs(x) * 2 for x in _ema_ref(src, 4)]
    assert [r["e2"] for r in rows] == pytest.approx(ref, abs=0)


def test_planner_two_technicals_share_one_pass(catalog):
    out = execute(
        "SELECT exponential_moving_average(mean(v), 3) AS e, "
        "relative_strength_index(mean(v), 2) AS r FROM cpu "
        "WHERE time >= 0 AND time < 12h GROUP BY time(2h), host",
        catalog,
    )
    rows = out.collect()
    assert {c for c in out.columns} == {"host", "time", "e", "r"}
    assert len(rows) == 12  # e emits from bucket 0; null r rows survive
    # raw-field mixing is rejected with a clean planner error
    with pytest.raises(InfluxQLPlanError):
        execute(
            "SELECT v + exponential_moving_average(v, 4) FROM cpu", catalog
        )
    with pytest.raises(InfluxQLPlanError):
        execute(
            "SELECT mean(v), exponential_moving_average(mean(v), 3) "
            "FROM cpu GROUP BY time(2h)",
            catalog,
        )
