"""Parallel LTTB downsampling (operators/lttb): endpoint retention,
per-bucket spike capture, pass-through for short series, determinism,
and series isolation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from influxdb_iox_spark.operators.lttb import lttb_downsample


def _series(spark, vals, key="a", t0=0, step=10):
    rows = [(key, t0 + i * step, float(v)) for i, v in enumerate(vals)]
    return spark.createDataFrame(rows, "k string, t long, v double")


def test_endpoints_and_spikes_survive(spark):
    # flat line with one huge spike per third; n_out=5 -> 3 buckets
    vals = [0.0] * 30
    vals[4] = 100.0   # bucket 1
    vals[15] = -50.0  # bucket 2
    vals[24] = 80.0   # bucket 3
    df = _series(spark, vals)
    got = sorted(
        (r["t"], r["v"])
        for r in lttb_downsample(df, ["k"], "t", "v", n_out=5).collect()
    )
    assert len(got) == 5
    ts = [t for t, _ in got]
    assert ts[0] == 0 and ts[-1] == 290  # endpoints always kept
    assert (40, 100.0) in got and (150, -50.0) in got and (240, 80.0) in got


def test_short_series_pass_through(spark):
    df = _series(spark, [1.0, 2.0, 3.0, 4.0])
    got = lttb_downsample(df, ["k"], "t", "v", n_out=5).collect()
    assert len(got) == 4  # n <= n_out: unchanged


def test_deterministic_under_repartition(spark):
    import random

    rng = random.Random(7)
    vals = [rng.uniform(-5, 5) for _ in range(200)]
    df = _series(spark, vals)
    runs = [
        sorted(
            (r["t"], r["v"])
            for r in lttb_downsample(
                df.repartition(p), ["k"], "t", "v", n_out=20
            ).collect()
        )
        for p in (2, 7)
    ]
    assert runs[0] == runs[1]
    assert len(runs[0]) == 20


def test_series_isolation(spark):
    a = _series(spark, [float(i % 7) for i in range(50)], key="a")
    b = _series(spark, [float(-(i % 5)) for i in range(50)], key="b")
    out = lttb_downsample(a.unionByName(b), ["k"], "t", "v", n_out=6)
    per = {
        r["k"]: r["n"]
        for r in out.groupBy("k").agg(F.count("*").alias("n")).collect()
    }
    assert per == {"a": 6, "b": 6}


def test_validation(spark):
    with pytest.raises(ValueError):
        lttb_downsample(_series(spark, [1.0]), ["k"], "t", "v", n_out=2)
