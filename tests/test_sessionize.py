"""Gap-based sessionization + exact heavy hitters (operators/sessionize):
boundary semantics (closed threshold), tie robustness, per-series
isolation, and the frequent-items gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from influxdb_iox_spark.operators.sessionize import (
    heavy_hitters,
    session_stats,
    sessionize,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, t long")


def test_sessionize_boundaries(spark):
    # gaps: 5, 10 (== gap -> SAME session), 11 (> gap -> new), 1
    df = _df(spark, [("a", 0), ("a", 5), ("a", 15), ("a", 26), ("a", 27)])
    got = {
        (r["t"]): r["session_id"]
        for r in sessionize(df, ["k"], "t", gap=10).collect()
    }
    assert got == {0: 0, 5: 0, 15: 0, 26: 1, 27: 1}


def test_sessionize_series_isolation_and_stats(spark):
    df = _df(
        spark,
        [("a", 0), ("a", 100), ("b", 0), ("b", 1), ("b", 2), ("b", 200)],
    )
    out = {
        (r["k"], r["session_id"]): (
            r["n_events"], r["session_start"], r["session_end"], r["duration"]
        )
        for r in session_stats(df, ["k"], "t", gap=10).collect()
    }
    assert out == {
        ("a", 0): (1, 0, 0, 0),
        ("a", 1): (1, 100, 100, 0),
        ("b", 0): (3, 0, 2, 2),
        ("b", 1): (1, 200, 200, 0),
    }


def test_sessionize_tied_timestamps_deterministic(spark):
    """Two rows at the SAME time right after a session break: the RANGE
    boundary-sum frame puts both in the new session regardless of their
    (nondeterministic) order within the tie."""
    df = _df(spark, [("a", 0), ("a", 100), ("a", 100), ("a", 101)])
    for _ in range(3):
        got = sorted(
            (r["t"], r["session_id"])
            for r in sessionize(
                df.repartition(4), ["k"], "t", gap=10
            ).collect()
        )
        assert got == [(0, 0), (100, 1), (100, 1), (101, 1)]


def test_sessionize_validation(spark):
    with pytest.raises(ValueError):
        sessionize(_df(spark, [("a", 0)]), ["k"], "t", gap=0)


def test_heavy_hitters_exact_gate(spark):
    rows = [("x",)] * 30 + [("y",)] * 20 + [("z",)] * 19
    df = spark.createDataFrame(rows, "k string")
    got = {
        r["k"]: r["n"]
        for r in heavy_hitters(df, ["k"], min_count=20).collect()
    }
    assert got == {"x": 30, "y": 20}  # z at 19 excluded; thresholds closed
    with pytest.raises(ValueError):
        heavy_hitters(df, ["k"], min_count=0)
