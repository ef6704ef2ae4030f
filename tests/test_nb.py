"""Multinomial Naive Bayes classifier (pipeline/nb.py): hand-computed
log-likelihoods on a tiny corpus, smoothing/unseen-word paths, prior
semantics, empty-doc exclusion."""

from __future__ import annotations

import math

import pytest

from influxdb_iox_spark.pipeline.nb import score_nb, train_nb

SCHEMA = "doc_id long, text string, label string"


@pytest.fixture(scope="module")
def model(spark):
    ref = spark.createDataFrame(
        [(0, "x x y", "a"), (2, "y z", "b")],
        SCHEMA,
    )
    return train_nb(ref)


def test_train_counts(model):
    wc, ls, v = model
    assert v == 3  # {x, y, z}
    counts = {(r.label, r.w): r.c for r in wc.collect()}
    assert counts == {("a", "x"): 2, ("a", "y"): 1, ("b", "y"): 1, ("b", "z"): 1}
    stats = {r.label: (r.n_docs, r.n_tokens) for r in ls.collect()}
    assert stats == {"a": (1, 3), "b": (1, 2)}


def _scores(spark, model, text):
    wc, ls, v = model
    docs = spark.createDataFrame([(9, text, None)], SCHEMA).select(
        "doc_id", "text"
    )
    return {
        r.label: r.nb_score
        for r in score_nb(docs, wc, ls, v).collect()
    }


def test_hand_computed_scores(spark, model):
    # doc "x z": label a -> ln(1/2) + ln((2+1)/(3+3)) + ln((0+1)/(3+3))
    #            label b -> ln(1/2) + ln((0+1)/(2+3)) + ln((1+1)/(2+3))
    got = _scores(spark, model, "x z")
    want_a = math.log(0.5) + math.log(3 / 6) + math.log(1 / 6)
    want_b = math.log(0.5) + math.log(1 / 5) + math.log(2 / 5)
    assert got["a"] == pytest.approx(want_a, abs=2e-6)
    assert got["b"] == pytest.approx(want_b, abs=2e-6)
    # "x x" is a-ish, "z z" is b-ish (classification via max score)
    assert max(_scores(spark, model, "x x").items(), key=lambda kv: kv[1])[0] == "a"
    assert max(_scores(spark, model, "z z").items(), key=lambda kv: kv[1])[0] == "b"


def test_unseen_word_scores_by_smoothing_only(spark, model):
    # "qqq" appears in no label: pure smoothing mass both sides
    got = _scores(spark, model, "qqq")
    assert got["a"] == pytest.approx(math.log(0.5) + math.log(1 / 6), abs=2e-6)
    assert got["b"] == pytest.approx(math.log(0.5) + math.log(1 / 5), abs=2e-6)


def test_every_doc_gets_every_label(spark, model):
    wc, ls, v = model
    docs = spark.createDataFrame(
        [(1, "x", None), (3, "z y", None), (5, "   ", None)], SCHEMA
    ).select("doc_id", "text")
    rows = score_nb(docs, wc, ls, v).collect()
    got = {(r.doc_id, r.label) for r in rows}
    assert got == {(1, "a"), (1, "b"), (3, "a"), (3, "b")}  # empty doc absent


def test_empty_training_rejected(spark, model):
    wc, ls, _ = model
    docs = spark.createDataFrame([(1, "x", None)], SCHEMA).select("doc_id", "text")
    with pytest.raises(ValueError, match="vocabulary"):
        score_nb(docs, wc, ls, 0)


def test_nb_persistence_roundtrip(spark, model, tmp_path):
    from influxdb_iox_spark.pipeline.nb import load_nb, save_nb

    wc, ls, v = model
    save_nb(wc, ls, v, str(tmp_path / "nb"))
    wc2, ls2, v2 = load_nb(spark, str(tmp_path / "nb"))
    assert v2 == v
    docs = spark.createDataFrame([(7, "x z", None)], SCHEMA).select(
        "doc_id", "text"
    )
    a = sorted((r.label, r.nb_score) for r in score_nb(docs, wc, ls, v).collect())
    b = sorted((r.label, r.nb_score) for r in score_nb(docs, wc2, ls2, v2).collect())
    assert a == b


def test_priors_weigh_imbalanced_labels(spark):
    # 3 docs of label a vs 1 of b, same token content: priors decide
    ref = spark.createDataFrame(
        [(0, "m", "a"), (2, "m", "a"), (4, "m", "a"), (6, "m", "b")],
        SCHEMA,
    )
    wc, ls, v = train_nb(ref)
    docs = spark.createDataFrame([(9, "m", None)], SCHEMA).select("doc_id", "text")
    got = {r.label: r.nb_score for r in score_nb(docs, wc, ls, v).collect()}
    # same conditional p(m|l)=(3+1)/(3+1) vs (1+1)/(1+1)=1 each... compute:
    want_a = math.log(3 / 4) + math.log((3 + 1) / (3 + 1))
    want_b = math.log(1 / 4) + math.log((1 + 1) / (1 + 1))
    assert got["a"] == pytest.approx(want_a, abs=2e-6)
    assert got["b"] == pytest.approx(want_b, abs=2e-6)
    assert got["a"] > got["b"]
