"""Bigram stupid-backoff LM scoring (pipeline/lm.py): hand-computed
probabilities on a tiny corpus, OOV/backoff paths, persistence round-trip."""

from __future__ import annotations

import math

import pytest

from influxdb_iox_spark.pipeline.lm import (
    ALPHA,
    load_lm,
    save_lm,
    score_documents,
    train_bigram_lm,
)

SCHEMA = "doc_id long, text string"


@pytest.fixture(scope="module")
def model(spark):
    ref = spark.createDataFrame(
        [(0, "the cat sat"), (2, "the cat ran")], SCHEMA
    )
    return train_bigram_lm(ref)


def test_train_counts(model):
    bi, uni, total = model
    assert total == 6
    u = {r.w: r.c1 for r in uni.collect()}
    assert u == {"the": 2, "cat": 2, "sat": 1, "ran": 1}
    b = {(r.w1, r.w2): (r.c2, r.c1) for r in bi.collect()}
    assert b == {
        ("the", "cat"): (2, 2),
        ("cat", "sat"): (1, 2),
        ("cat", "ran"): (1, 2),
    }


def _score(spark, model, text):
    bi, uni, total = model
    docs = spark.createDataFrame([(1, text)], SCHEMA)
    rows = score_documents(docs, bi, uni, total).collect()
    return rows[0] if rows else None


def test_score_hand_computed(spark, model):
    # all paths seen: p(the)=2/6, p(cat|the)=2/2, p(sat|cat)=1/2
    r = _score(spark, model, "the cat sat")
    expect = (math.log(2 / 6) + math.log(1.0) + math.log(0.5)) / 3
    assert r.n_tokens == 3
    assert r.lm_score == pytest.approx(expect, abs=1e-6)
    # OOV first token + unseen-bigram backoff:
    # p1(dog)=0.4/6 (OOV), p(the|dog)=0.4*(2/6), p(cat|the)=1
    r = _score(spark, model, "dog the cat")
    expect = (
        math.log(ALPHA / 6) + math.log(ALPHA * 2 / 6) + math.log(1.0)
    ) / 3
    assert r.lm_score == pytest.approx(expect, abs=1e-6)
    # double-backoff: unseen bigram onto an OOV unigram -> 0.4 * 0.4/N
    r = _score(spark, model, "the dog")
    expect = (math.log(2 / 6) + math.log(ALPHA * ALPHA / 6)) / 2
    assert r.lm_score == pytest.approx(expect, abs=1e-6)


def test_reference_docs_score_higher_than_garbage(spark, model):
    good = _score(spark, model, "the cat sat")
    bad = _score(spark, model, "zxq wvu ponm")
    assert good.lm_score > bad.lm_score


def test_empty_doc_absent(spark, model):
    bi, uni, total = model
    docs = spark.createDataFrame([(1, "   "), (2, "the cat")], SCHEMA)
    rows = score_documents(docs, bi, uni, total).collect()
    assert [r.doc_id for r in rows] == [2]


def test_salted_scores_identical(spark, model):
    """salt_hot_keys only re-keys the shuffle — every doc row still meets
    exactly one model row, so scores must be bit-identical with and
    without salting (including OOV/backoff paths and NULL-prev rows)."""
    bi, uni, total = model
    docs = spark.createDataFrame(
        [(1, "the cat sat"), (3, "dog the cat the the"),
         (5, "zxq the wvu"), (7, "cat sat ran the cat")],
        SCHEMA,
    )
    plain = {
        r.doc_id: (r.n_tokens, r.lm_score)
        for r in score_documents(docs, bi, uni, total).collect()
    }
    for s in (1, 2, 4):
        salted = {
            r.doc_id: (r.n_tokens, r.lm_score)
            for r in score_documents(
                docs, bi, uni, total, salt_hot_keys=s
            ).collect()
        }
        assert salted == plain, s
    # salting survives a forced shuffle join (the plan it exists for)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        salted = {
            r.doc_id: (r.n_tokens, r.lm_score)
            for r in score_documents(
                docs, bi, uni, total, salt_hot_keys=3
            ).collect()
        }
        assert salted == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_lm_persistence_roundtrip(spark, model, tmp_path):
    bi, uni, total = model
    save_lm(bi, uni, total, str(tmp_path / "lm"))
    bi2, uni2, total2 = load_lm(spark, str(tmp_path / "lm"))
    assert total2 == total
    docs = spark.createDataFrame([(7, "the cat sat")], SCHEMA)
    a = score_documents(docs, bi, uni, total).collect()[0]
    b = score_documents(docs, bi2, uni2, total2).collect()[0]
    assert a.lm_score == b.lm_score


def test_perplexity_buckets(spark, model):
    bi, uni, total = model
    docs = spark.createDataFrame(
        [(1, "the cat sat"), (3, "the cat ran"), (5, "dog the cat"),
         (7, "zxq wvu ponm"), (9, "the cat sat ran"), (11, "cat sat")],
        SCHEMA,
    )
    from influxdb_iox_spark.pipeline.lm import perplexity_buckets

    scored = score_documents(docs, bi, uni, total)
    out = {r.doc_id: r.bucket for r in perplexity_buckets(scored, 3).collect()}
    assert set(out.values()) <= {1, 2, 3}
    # garbage lands in the worst band, the reference-like docs in the best
    assert out[7] == 3
    assert out[1] == 1
    # monotone: better score never gets a worse bucket
    by_score = {
        r.doc_id: r.lm_score for r in scored.collect()
    }
    for a in out:
        for b in out:
            if by_score[a] > by_score[b]:
                assert out[a] <= out[b]
