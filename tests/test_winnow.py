"""Winnowing fingerprints (pipeline/text.py) — the SIGMOD'03 local
fingerprinting scheme: k-gram hashes, sliding-window-of-w minima.

The oracle-paired queries (doc_winnow_fingerprints / _similar_pairs in
__spark_entry__.py, checked by test_oracle_parity) pin cross-engine
values; these tests pin the paper's guarantees and the plan shape.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from influxdb_iox_spark.pipeline.text import (
    winnow_fingerprints,
    winnow_similar_pairs,
)

K, W = 5, 4


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shared_run_guarantees_shared_fingerprint(spark):
    # the paper's theorem: a shared token run of length >= w + k - 1
    # yields at least one shared fingerprint, wherever it sits
    shared = " ".join(f"run{i}" for i in range(W + K - 1))
    a = "alpha beta gamma delta " * 5 + shared
    b = shared + " omega psi chi phi " * 5
    fps = winnow_fingerprints(_docs(spark, [(1, a), (2, b)]), k=K, w=W)
    got = {
        (r.doc_id, r.fingerprint) for r in fps.collect()
    }
    a_fps = {f for d, f in got if d == 1}
    b_fps = {f for d, f in got if d == 2}
    assert a_fps & b_fps, "guaranteed shared fingerprint missing"


def test_disjoint_docs_share_nothing(spark):
    a = " ".join(f"a{i}" for i in range(40))
    b = " ".join(f"b{i}" for i in range(40))
    fps = winnow_fingerprints(_docs(spark, [(1, a), (2, b)]), k=K, w=W)
    rows = fps.collect()
    a_fps = {r.fingerprint for r in rows if r.doc_id == 1}
    b_fps = {r.fingerprint for r in rows if r.doc_id == 2}
    assert not (a_fps & b_fps)


def test_short_doc_contributes_min_of_all_hashes(spark):
    # fewer than w gram hashes -> exactly one fingerprint (the documented
    # partial-window choice: the frame clips at the partition edge)
    text = " ".join(f"t{i}" for i in range(K + 1))  # 2 grams < w
    fps = winnow_fingerprints(_docs(spark, [(1, text)]), k=K, w=W)
    assert fps.count() == 1


def test_sub_k_and_empty_docs_vanish(spark):
    fps = winnow_fingerprints(
        _docs(spark, [(1, "only four tokens here"), (2, ""), (3, None)]),
        k=K,
        w=W,
    )
    assert fps.count() == 0


def test_shift_invariance_of_shared_span(spark):
    # the same long span prefixed by different boilerplate keeps MOST
    # fingerprints identical — the local property global md5 lacks
    span = " ".join(f"s{i}" for i in range(60))
    fps = winnow_fingerprints(
        _docs(spark, [(1, span), (2, "noise words in front " + span)]),
        k=K,
        w=W,
    )
    rows = fps.collect()
    a = {r.fingerprint for r in rows if r.doc_id == 1}
    b = {r.fingerprint for r in rows if r.doc_id == 2}
    assert len(a & b) / len(a) > 0.7


def test_similar_pairs_and_df_cut(spark):
    span = " ".join(f"z{i}" for i in range(30))
    docs = _docs(
        spark,
        [(1, span + " one tail"), (2, span + " two tails"), (3, "unrelated " * 20)],
    )
    pairs = winnow_similar_pairs(docs, k=K, w=W, min_shared=2, max_df=50)
    got = [(r.a, r.b) for r in pairs.collect()]
    assert got == [(1, 2)]
    # a df-cut of 1 removes every fingerprint present in both docs
    none = winnow_similar_pairs(docs, k=K, w=W, min_shared=1, max_df=1)
    assert none.count() == 0


def test_plan_is_jvm_side(spark):
    # pure codegen expressions + window + hash aggregates: no Python
    # evaluation anywhere in the plan
    docs = _docs(spark, [(1, "a b c d e f g h i j")])
    for df in (
        winnow_fingerprints(docs, k=K, w=W),
        winnow_similar_pairs(docs, k=K, w=W),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan and "InPandas" not in plan


# -- top_terms (tf-idf family, same module) -------------------------------


def test_top_terms_rare_term_outranks_common(spark):
    from influxdb_iox_spark.pipeline.text import top_terms

    docs = _docs(
        spark,
        [
            (1, "common common common rare"),
            (2, "common filler words here"),
            (3, "common other text lines"),
        ],
    )
    out = top_terms(docs, k=2).collect()
    d1 = sorted(
        (r.rank, r.term) for r in out if r.doc_id == 1
    )
    # 'rare' (df=1) outranks 'common' (df=3) despite tf 1 vs 3:
    # idf (3-1+0.5)/(1+0.5) = 1.67 vs (3-3+0.5)/(3+0.5) = 0.143*3
    assert d1[0] == (1, "rare")
    assert d1[1] == (2, "common")


def test_top_terms_deterministic_tiebreak_and_k(spark):
    from influxdb_iox_spark.pipeline.text import top_terms

    docs = _docs(spark, [(1, "b a c"), (2, "z y x w v u t")])
    out = top_terms(docs, k=3)
    rows = sorted((r.doc_id, r.rank, r.term) for r in out.collect())
    # equal tf/df everywhere in doc 1 -> alphabetical rank order
    assert [t for d, _, t in rows if d == 1] == ["a", "b", "c"]
    assert len([1 for d, *_ in rows if d == 2]) == 3  # k caps the fan-out


def test_top_terms_plan_is_jvm_side(spark):
    from influxdb_iox_spark.pipeline.text import top_terms

    docs = _docs(spark, [(1, "a b c")])
    plan = top_terms(docs)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "InPandas" not in plan
