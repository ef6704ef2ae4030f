"""CUSUM changepoint detection vs a numpy reference."""

from __future__ import annotations

import math

import numpy as np
import pytest

from influxdb_iox_spark.operators.changepoint import cusum_changepoints


def _ref(values, k=1.63):
    v = np.asarray(values, dtype="float64")
    n = len(v)
    s = np.cumsum(v - v.mean())
    cp = int(np.argmax(np.abs(np.round(s * 1e6))))  # earliest max |S|
    srange = s.max() - s.min()
    sigma = v.std(ddof=1)
    return cp, srange, bool(srange > k * sigma * math.sqrt(n))


def _run(spark, series: dict[str, list[float]], threshold="1.63"):
    rows = [
        (key, t, float(x))
        for key, vals in series.items()
        for t, x in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "k string, time long, value double")
    out = cusum_changepoints(
        df, key_cols=["k"], threshold=threshold
    ).collect()
    return {r["k"]: r for r in out}


def test_clean_mean_shift_is_found(spark):
    vals = [1.0] * 20 + [5.0] * 20
    got = _run(spark, {"a": vals})["a"]
    cp, srange, shifted = _ref(vals)
    assert got["cp_time"] == cp
    assert got["shifted"] == 1 and shifted
    assert abs(got["s_range"] - srange) < 2e-6
    assert got["n"] == 40


def test_no_shift_flat_series(spark):
    vals = [3.0, 3.0, 3.0, 3.0, 3.0]
    got = _run(spark, {"a": vals})["a"]
    assert got["shifted"] == 0
    assert got["s_range"] == 0.0


def test_noise_without_shift_not_flagged(spark):
    rng = np.random.default_rng(5)
    vals = list(np.round(rng.normal(10, 1, 200), 3))
    got = _run(spark, {"a": vals})["a"]
    cp, srange, shifted = _ref(vals)
    assert got["cp_time"] == cp
    assert got["shifted"] == int(shifted)
    assert abs(got["s_range"] - srange) < 2e-6


def test_multiple_series_and_short_series(spark):
    series = {
        "up": [0.0] * 10 + [4.0] * 10,
        "down": [7.0] * 15 + [1.0] * 5,
        "single": [42.0],  # n < 2 -> no row
    }
    got = _run(spark, series)
    assert "single" not in got
    for key in ("up", "down"):
        cp, srange, shifted = _ref(series[key])
        assert got[key]["cp_time"] == cp, key
        assert got[key]["shifted"] == int(shifted), key


def test_threshold_dial(spark):
    vals = [1.0] * 6 + [1.6] * 6  # small shift
    strict = _run(spark, {"a": vals}, threshold="5.0")["a"]
    loose = _run(spark, {"a": vals}, threshold="0.5")["a"]
    assert strict["shifted"] == 0
    assert loose["shifted"] == 1


def test_randomized_match_reference(spark):
    rng = np.random.default_rng(11)
    for trial in range(4):
        n = int(rng.integers(5, 60))
        base = rng.normal(0, 1, n)
        if trial % 2:
            base[n // 2:] += rng.uniform(1, 4)
        vals = list(np.round(base, 3))
        got = _run(spark, {"a": vals})["a"]
        cp, srange, shifted = _ref(vals)
        assert got["cp_time"] == cp, (trial, vals)
        assert got["shifted"] == int(shifted), (trial, vals)
        assert abs(got["s_range"] - srange) < 2e-6, (trial, vals)
