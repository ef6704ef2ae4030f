"""DSIR importance weighting + Gumbel resampling (pipeline/dsir.py).

Log-weights are checked against a pure-Python oracle (same md5
bucketing, Laplace smoothing, ln-ratio dot product); the resample is
checked for determinism, seed sensitivity, and that it actually tilts
toward high-weight documents.
"""

from __future__ import annotations

import hashlib
import math
import re

import pytest

from influxdb_iox_spark.pipeline.dsir import (
    bucket_totals,
    dsir_bucket_models,
    dsir_log_weights,
    dsir_resample,
    hashed_ngram_counts,
)

B = 64  # small bucket space so collisions are exercised


def _toks(text):
    return [t for t in re.split(r"[^0-9a-z]+", text.lower()) if t]


def _grams(text):
    t = _toks(text)
    return t + [f"{a} {b}" for a, b in zip(t, t[1:])]


def _bucket(g):
    return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B


def _brute_weights(docs, target_ids, buckets=B):
    from collections import Counter

    feats = {i: Counter(_bucket(g) for g in _grams(t)) for i, t in docs.items()}
    tgt, raw = Counter(), Counter()
    for i, c in feats.items():
        raw.update(c)
        if i in target_ids:
            tgt.update(c)
    T, R = sum(tgt.values()), sum(raw.values())
    out = {}
    for i, c in feats.items():
        if not c:
            continue
        w = sum(
            n
            * (
                math.log(tgt[b] + 1)
                - math.log(T + buckets)
                - math.log(raw[b] + 1)
                + math.log(R + buckets)
            )
            for b, n in c.items()
        )
        out[i] = (sum(c.values()), round(w * 1e6) / 1e6)
    return out


DOCS = {
    1: "the cat sat on the mat",
    2: "the cat sat on the mat again and again",
    3: "quantum flux capacitor overload; tachyon emitter required",
    4: "stock prices fell sharply as markets digested the cat news",
    5: "",
}
TARGET = {1, 2}


@pytest.fixture(scope="module")
def weights(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in DOCS.items()], "doc_id long, text string"
    )
    feats = hashed_ngram_counts(df, buckets=B)
    tgt = bucket_totals(feats.filter(feats.doc_id.isin(list(TARGET))))
    raw = bucket_totals(feats)
    return dsir_log_weights(feats, tgt, raw, buckets=B)


def test_weights_match_brute_force(spark, weights):
    got = {r.doc_id: (r.n_feats, r.dsir_logw) for r in weights.collect()}
    want = _brute_weights(DOCS, TARGET)
    assert set(got) == set(want)  # empty doc 5 excluded by both
    for i in want:
        assert got[i][0] == want[i][0]
        assert got[i][1] == pytest.approx(want[i][1], abs=2e-6)


def test_target_like_docs_score_higher(weights):
    w = {r.doc_id: r.dsir_logw / r.n_feats for r in weights.collect()}
    # Per-feature weight: target members above the off-distribution doc.
    assert min(w[1], w[2]) > w[3]


def test_resample_deterministic(spark, weights):
    a = [r.doc_id for r in dsir_resample(weights, k=2, seed=7).collect()]
    b = [r.doc_id for r in dsir_resample(weights, k=2, seed=7).collect()]
    assert a == b and len(a) == 2


def test_resample_seed_sensitive_on_equal_weights(spark):
    # 30 identical docs have identical weights, so the draw is decided
    # purely by the seeded Gumbel keys: different seeds must pick
    # different subsets (a fixed top-k would always pick the same).
    df = spark.createDataFrame(
        [(i, "same text every time") for i in range(30)],
        "doc_id long, text string",
    )
    feats = hashed_ngram_counts(df, buckets=B)
    tot = bucket_totals(feats)
    w = dsir_log_weights(feats, tot, tot, buckets=B).cache()
    seen = {
        tuple(sorted(r.doc_id for r in dsir_resample(w, k=3, seed=s).collect()))
        for s in range(6)
    }
    assert len(seen) > 1


def test_resample_tilts_toward_high_weight(spark):
    # 40 docs: half look like the target, half don't; across many seeds
    # the target-like half must win most draws.
    docs = {}
    for i in range(20):
        docs[i] = "the cat sat on the mat " * 3
        docs[100 + i] = f"unrelated gibberish {i} flux zorp {i * 7} blat"
    df = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "doc_id long, text string"
    )
    feats = hashed_ngram_counts(df, buckets=256)
    tgt = bucket_totals(feats.filter(feats.doc_id < 20))
    raw = bucket_totals(feats)
    w = dsir_log_weights(feats, tgt, raw, buckets=256).cache()
    hits = total = 0
    for s in range(5):
        picks = [r.doc_id for r in dsir_resample(w, k=8, seed=s).collect()]
        hits += sum(1 for p in picks if p < 20)
        total += len(picks)
    assert hits / total > 0.7


def test_bucket_models_one_pass_equivalence(spark):
    """dsir_bucket_models (single checkpointed aggregate) must return
    EXACTLY the rows of the two-pass bucket_totals formulation — same
    buckets present/absent, same integer counts — and the weights built
    from it must be bit-identical to the two-pass weights."""
    df = spark.createDataFrame(
        [(i, t) for i, t in DOCS.items()], "doc_id long, text string"
    )
    feats = hashed_ngram_counts(df, buckets=B)
    tgt_ids = df.filter(df.doc_id.isin(list(TARGET))).select("doc_id")

    tgt2 = bucket_totals(feats.join(tgt_ids, "doc_id"))
    raw2 = bucket_totals(feats)
    tgt1, raw1 = dsir_bucket_models(feats, tgt_ids)

    as_set = lambda d: {(r.bucket, r.cnt) for r in d.collect()}
    assert as_set(tgt1) == as_set(tgt2)
    assert as_set(raw1) == as_set(raw2)
    # absent-bucket contract: a bucket with no target features is absent,
    # not zero (doc 3 is pure off-target text, so such buckets exist here)
    assert len(as_set(tgt1)) < len(as_set(raw1))

    w1 = dsir_log_weights(feats, tgt1, raw1, buckets=B)
    w2 = dsir_log_weights(feats, tgt2, raw2, buckets=B)
    rows = lambda d: sorted(
        (r.doc_id, r.n_feats, r.dsir_logw) for r in d.collect()
    )
    assert rows(w1) == rows(w2)


def test_validation(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    feats = hashed_ngram_counts(df, buckets=B)
    with pytest.raises(ValueError):
        hashed_ngram_counts(df, buckets=1)
    with pytest.raises(ValueError):
        dsir_log_weights(
            feats, bucket_totals(feats.filter("doc_id < 0")),
            bucket_totals(feats), buckets=B,
        )
    with pytest.raises(ValueError):
        dsir_resample(feats, k=0)
