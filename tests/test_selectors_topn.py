"""TOP/BOTTOM n-point selectors (operators/selectors.py) and int8
embedding quantization (pipeline/similarity.py).

The oracle-paired queries (rpc_top_values / emb_quantize_audit in
__spark_entry__.py, checked by test_oracle_parity) pin cross-engine
values; these tests pin semantics (InfluxQL tie rules, exact
reconstruction arithmetic) and the plan shape (WindowGroupLimit top-k
pushdown, zero Python).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from influxdb_iox_spark.operators.selectors import selector_bottom, selector_top
from influxdb_iox_spark.pipeline.similarity import quantize_embeddings


def _series(spark):
    rows = [
        # (host, time, value)
        ("a", 1, 10.0),
        ("a", 2, 30.0),
        ("a", 3, 20.0),
        ("a", 4, 30.0),  # value tie with t=2 -> earlier time ranks first
        ("a", 5, None),  # ignored
        ("b", 1, 5.0),
    ]
    return spark.createDataFrame(rows, "host string, time long, value double")


def test_top_values_and_influxql_tie_rule(spark):
    out = selector_top(_series(spark), 2, "value", by=["host"], time="time")
    got = {(r.host, r.rank): (r.value, r.time) for r in out.collect()}
    # ties on value=30.0 break by EARLIER timestamp (InfluxQL rule)
    assert got[("a", 1)] == (30.0, 2)
    assert got[("a", 2)] == (30.0, 4)
    assert got[("b", 1)] == (5.0, 1)
    assert len(got) == 3


def test_bottom_skips_nulls_and_orders_ascending(spark):
    out = selector_bottom(_series(spark), 2, "value", by=["host"], time="time")
    a = sorted((r.rank, r.value) for r in out.collect() if r.host == "a")
    assert a == [(1, 10.0), (2, 20.0)]  # the NULL row never ranks


def test_topn_plan_uses_window_group_limit(spark):
    # rank<=n over row_number must compile to WindowGroupLimit (bounded
    # per-group heap, map-side AND reduce-side) — the reason this is a
    # top-k and not a full per-series sort at 100 TB.
    df = selector_top(_series(spark), 2, "value", by=["host"], time="time")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert "EvalPython" not in plan and "InPandas" not in plan


def test_quantize_matches_numpy_reference(spark):
    # the reference rounding is the library's own _round_half_up (exact
    # BigDecimal HALF_UP semantics) — a local floor(x+0.5) twin diverges
    # where x+0.5 itself rounds
    from influxdb_iox_spark.pipeline.similarity import _round_half_up as _half_up

    vecs = [
        (1, [1.0, -2.0, 0.5, 127.0]),
        (2, [0.25, 0.25, -0.25, 0.0]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    got = {r.vec_id: r.asDict() for r in quantize_embeddings(df).collect()}
    for vid, emb in vecs:
        xs = [float(x) for x in emb]
        scale = max(abs(x) for x in xs) / 127.0
        codes = [_half_up(x / scale) for x in xs]
        errs = [_half_up(abs(x - q * scale) * 1e6) for x, q in zip(xs, codes)]
        r = got[vid]
        assert r["dim"] == len(xs)
        assert r["scale_micro"] == _half_up(scale * 1e6)
        assert r["sum_abs_err_micro"] == sum(errs)
        assert r["max_q"] == max(codes) and r["min_q"] == min(codes)
        assert -127 <= r["min_q"] and r["max_q"] <= 127


def test_quantize_zero_vector_has_zero_codes_no_division(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    r = quantize_embeddings(df).collect()[0]
    assert (r.scale_micro, r.sum_abs_err_micro, r.max_q, r.min_q) == (0, 0, 0, 0)


def test_quantized_topk_matches_python_reference(spark):
    from influxdb_iox_spark.pipeline.similarity import (
        _round_half_up,
        quantized_cosine_topk,
    )

    vecs = [
        (0, [1.0, 2.0, -3.0, 0.5]),
        (1, [1.1, 2.1, -2.9, 0.4]),   # near the query
        (2, [-1.0, -2.0, 3.0, -0.5]), # anti-parallel
        (3, [0.0, 0.0, 0.0, 0.0]),    # zero norm -> score 0
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    qv = vecs[0][1]
    got = [(r.vec_id, r.dot_q, r.qcos_micro) for r in
           quantized_cosine_topk(df, qv, k=4).collect()]

    qsc = max(abs(x) for x in qv) / 127.0
    qc = [_round_half_up(x / qsc) for x in qv]
    qq = sum(c * c for c in qc)
    exp = []
    for vid, emb in vecs:
        xs = [float(x) for x in emb]
        sc = max(abs(x) for x in xs) / 127.0
        c = [0 if sc == 0 else _round_half_up(x / sc) for x in xs]
        dot = sum(a * b for a, b in zip(c, qc))
        vv = sum(a * a for a in c)
        score = 0.0 if vv == 0 else dot / math.sqrt(float(vv * qq))
        exp.append((vid, dot, _round_half_up(score * 1e6)))
    exp.sort(key=lambda t: (-t[2], t[0]))
    assert got == exp
    assert got[0][0] in (0, 1) and got[-1][0] == 2  # anti-parallel ranks last


def test_quantized_topk_zero_query_vector_scores_zero(spark):
    # qq == 0 must short-circuit to score 0 — without the guard the
    # division yields 0/0 = NaN, silently cast to 0 only on the Spark side
    from influxdb_iox_spark.pipeline.similarity import quantized_cosine_topk

    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [3.0, 4.0])], "vec_id long, embedding array<float>"
    )
    rows = quantized_cosine_topk(df, [0.0, 0.0], k=2).collect()
    assert [(r.vec_id, r.qcos_micro) for r in rows] == [(1, 0), (2, 0)]


def test_top_rejects_preexisting_rank_column(spark):
    import pytest

    df = _series(spark).withColumn("rank", F.lit(1))
    with pytest.raises(ValueError, match="rank"):
        selector_top(df, 2, "value", by=["host"], time="time")


def test_quantized_topk_recall_vs_exact(spark):
    # int8 quantization of 64-dim float32 should barely perturb ranking:
    # demand >= 18/20 overlap with the exact cosine top-20 on real data.
    from influxdb_iox_spark.pipeline.similarity import (
        cosine_topk,
        quantized_cosine_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first().embedding]
    exact = {r.vec_id for r in cosine_topk(emb, qv, k=20).collect()}
    quant = {r.vec_id for r in quantized_cosine_topk(emb, qv, k=20).collect()}
    assert len(exact & quant) >= 18


def test_quantized_topk_plan_takeordered_no_python(spark):
    from influxdb_iox_spark.pipeline.similarity import quantized_cosine_topk

    df = spark.createDataFrame(
        [(1, [1.0, 2.0])], "vec_id long, embedding array<float>"
    )
    plan = (
        quantized_cosine_topk(df, [1.0, 2.0], k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "EvalPython" not in plan and "InPandas" not in plan
    assert "Exchange" not in plan  # per-partition heaps + driver merge


def test_quantize_plan_is_jvm_side_no_shuffle(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0])], "vec_id long, embedding array<float>"
    )
    plan = quantize_embeddings(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "InPandas" not in plan
    assert "Exchange" not in plan  # pure projection, zero shuffles
