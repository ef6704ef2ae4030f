"""Similarity-search tests on the shipped embeddings table: brute-force
exactness, LSH and IVF recall against the exact baseline."""

from __future__ import annotations

import numpy as np
import pytest

from influxdb_iox_spark.pipeline.similarity import (
    ann_ivf_topk,
    ann_lsh_topk,
    cosine_topk,
    embedding_near_dup_pairs,
    train_ivf_centroids,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def query_and_exact(emb):
    rows = emb.collect()
    by_id = {r.vec_id: np.array(r.embedding, dtype="float64") for r in rows}
    q = by_id[0]
    sims = {
        i: float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q)))
        for i, v in by_id.items()
    }
    exact = sorted(sims, key=lambda i: (-sims[i], i))
    return list(by_id[0]), exact, sims


def test_cosine_topk_matches_numpy(emb, query_and_exact):
    qv, exact, sims = query_and_exact
    got = cosine_topk(emb, qv, k=10).collect()
    assert [r.vec_id for r in got] == exact[:10]
    for r in got:
        assert r.cosine_sim == pytest.approx(sims[r.vec_id], abs=1e-9)


def test_ann_lsh_recall(emb, query_and_exact):
    qv, exact, _ = query_and_exact
    # nbits sized to corpus: 2^6 buckets over 500 vectors (~8/bucket)
    got = {r.vec_id for r in ann_lsh_topk(emb, qv, k=10, nbits=6).collect()}
    recall = len(got & set(exact[:10])) / 10
    assert recall >= 0.4  # approximate path; exact re-rank inside probed buckets
    assert 0 in got  # the query vector itself always collides with itself


def test_ann_ivf_recall(emb, query_and_exact):
    qv, exact, _ = query_and_exact
    cent = train_ivf_centroids(emb, n_centroids=8, sample_rows=500, iters=5)
    got = {r.vec_id for r in ann_ivf_topk(emb, qv, cent, k=10, nprobe=4).collect()}
    recall = len(got & set(exact[:10])) / 10
    assert recall >= 0.7


def test_embedding_near_dup_self(spark, emb):
    # plant a near-duplicate of vec 0
    import pyspark.sql.functions as F

    v0 = emb.filter(F.col("vec_id") == 0).first().embedding
    dup = spark.createDataFrame(
        [(100000, [x * 1.0001 for x in v0], 0)], emb.schema
    )
    with_dup = emb.unionByName(dup)
    pairs = embedding_near_dup_pairs(with_dup, threshold=0.999, nbits=8).collect()
    assert any({r.a, r.b} == {0, 100000} for r in pairs)
