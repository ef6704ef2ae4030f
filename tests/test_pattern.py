"""Series pattern similarity search (operators/pattern.py): hand-computed
correlations, self-match, zero-variance skip, single-exchange plan."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from influxdb_iox_spark.operators.pattern import pattern_topk


@pytest.fixture(scope="module")
def series(spark):
    rows = []
    # series a: a rising ramp then a plateau; series b: the ramp scaled
    # and shifted (correlation with the ramp pattern = exactly 1)
    for i, v in enumerate([1, 2, 3, 4, 4, 4, 4, 4]):
        rows.append(("a", i * 100, v * 1000))
    for i, v in enumerate([10, 30, 50, 70]):
        rows.append(("b", i * 100, v * 1000))
    # series c: constant (zero variance -> no window emitted)
    for i in range(4):
        rows.append(("c", i * 100, 5000))
    return spark.createDataFrame(rows, "k string, time long, vm long")


def _corr(xs, q):
    w = len(q)
    sx, sq = sum(xs), sum(q)
    sxx, sqq = sum(v * v for v in xs), sum(v * v for v in q)
    sxq = sum(a * b for a, b in zip(xs, q))
    return (w * sxq - sx * sq) / (
        math.sqrt(w * sxx - sx * sx) * math.sqrt(w * sqq - sq * sq)
    )


def test_correlation_values_and_ranking(series):
    q = [1000, 2000, 3000, 4000]
    out = pattern_topk(series, ["k"], "time", "vm", q, k=10).collect()
    got = {(r.k, r.time): r.corr_micro for r in out}
    # self-match is exactly 1
    assert got[("a", 0)] == 1_000_000
    # affine transform of the pattern is also exactly 1
    assert got[("b", 0)] == 1_000_000
    # hand-computed interior window of series a: [2,3,4,4]
    expect = _corr([2000, 3000, 4000, 4000], q)
    assert got[("a", 100)] == round(expect * 1_000_000)
    # constant series never appears (zero variance), nor do constant
    # windows of series a ([4,4,4,4])
    assert not any(k == "c" for k, _ in got)
    assert ("a", 400) not in got
    # ordering: corr desc then key then time
    ms = [r.corr_micro for r in out]
    assert ms == sorted(ms, reverse=True)


def test_pattern_validation(series):
    with pytest.raises(ValueError, match="at least 2"):
        pattern_topk(series, ["k"], "time", "vm", [1], k=5)


def test_single_exchange_plan(series):
    q = [1000, 2000, 3000, 4000]
    df = pattern_topk(series, ["k"], "time", "vm", q, k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # one window exchange feeds everything; top-k is TakeOrdered
    assert plan.count("Exchange") <= 1 + plan.count("Initial Plan")
    assert "TakeOrderedAndProject" in plan
