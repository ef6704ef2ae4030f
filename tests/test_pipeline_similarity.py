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


def test_semantic_dedup_soundness_and_planted_recall(spark):
    """semantic_dedup drops a doc only when an earlier same-cluster doc
    really is ≥ threshold (soundness, checked against numpy brute force),
    and planted exact-duplicate vectors are always caught (identical
    vectors share a cluster by construction)."""
    import numpy as np

    from influxdb_iox_spark.pipeline.similarity import (
        semantic_dedup,
        semantic_dedup_pairs,
    )

    rng = np.random.default_rng(7)
    base = rng.normal(size=(40, 16))
    rows = [(i, [float(x) for x in base[i]]) for i in range(40)]
    # plant duplicates: 100=copy of 3, 101=copy of 7 with tiny noise
    rows.append((100, [float(x) for x in base[3]]))
    rows.append((101, [float(x) for x in base[7] + rng.normal(scale=1e-4, size=16)]))
    df = spark.createDataFrame(rows, "doc_id long, embedding array<double>")

    pairs = semantic_dedup_pairs(
        df, n_clusters=4, threshold=0.99, sample_rows=100, seed=1
    ).collect()
    by_id = {i: np.array(v) for i, v in rows}
    for r in pairs:
        a, b = by_id[r.keep_id], by_id[r.drop_id]
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert r.keep_id < r.drop_id
        assert cos >= 0.99 - 1e-9
        assert r.cosine_sim == pytest.approx(cos, abs=1e-9)
    dropped = {r.drop_id for r in pairs}
    assert {100, 101} <= dropped

    survivors = semantic_dedup(
        df, n_clusters=4, threshold=0.99, sample_rows=100, seed=1
    )
    ids = {r.doc_id for r in survivors.collect()}
    assert ids == {i for i, _ in rows} - dropped
    assert 3 in ids and 7 in ids  # canonical min-ids survive
    assert set(survivors.columns) == {"doc_id", "embedding"}


def test_semantic_dedup_hot_cluster_guard(spark):
    """Clusters above max_cluster_size are excluded from pairing (their
    members all survive) and the observability twin reports exactly the
    skipped clusters."""
    import numpy as np

    from influxdb_iox_spark.pipeline.similarity import (
        semantic_dedup_pairs,
        semantic_hot_clusters,
    )

    rng = np.random.default_rng(11)
    hub = rng.normal(size=16)
    rows = [(i, [float(x) for x in hub + rng.normal(scale=1e-3, size=16)])
            for i in range(30)]                      # one degenerate cluster
    rows += [(100 + i, [float(x) for x in rng.normal(size=16)]) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, embedding array<double>")

    uncapped = semantic_dedup_pairs(
        df, n_clusters=4, threshold=0.99, sample_rows=100, seed=2
    ).count()
    assert uncapped >= 29  # the hub cluster collapses to one keeper

    capped = semantic_dedup_pairs(
        df, n_clusters=4, threshold=0.99, sample_rows=100, seed=2,
        max_cluster_size=10,
    )
    dropped = {r.drop_id for r in capped.collect()}
    assert not ({i for i in range(30)} & dropped)  # hub members all survive

    hot = semantic_hot_clusters(
        df, n_clusters=4, sample_rows=100, seed=2, max_cluster_size=10
    ).collect()
    assert len(hot) == 1 and hot[0].n_docs == 30


# -- product quantization ------------------------------------------------------


def test_pq_train_shapes_and_determinism(emb):
    from influxdb_iox_spark.pipeline.similarity import train_pq_codebooks

    b1 = train_pq_codebooks(emb, m=8, k=16, sample_rows=200, seed=7)
    b2 = train_pq_codebooks(emb, m=8, k=16, sample_rows=200, seed=7)
    assert b1.shape == (8, 16, 8)
    assert np.array_equal(b1, b2)  # seeded sample + fixed iters
    with pytest.raises(ValueError):
        train_pq_codebooks(emb, m=7)  # 64 % 7 != 0


def test_pq_codewords_encode_to_themselves(emb):
    """With the deterministic codebook (vec_id<16 subvectors), each
    codeword vector's code in every subspace is its own id — distance 0
    beats everything, and ties break to the smallest code id."""
    from influxdb_iox_spark.pipeline.similarity import (
        pq_encode,
        quantize_codebooks_milli,
    )

    rows = emb.filter("vec_id < 16").orderBy("vec_id").collect()
    base = np.array([r.embedding for r in rows], dtype="float64")
    cb = np.stack([base[:, j * 8 : (j + 1) * 8] for j in range(8)])
    cb_int = quantize_codebooks_milli(cb)
    got = {
        r.vec_id: list(r.pq_codes)
        for r in pq_encode(emb.filter("vec_id < 16"), cb_int).collect()
    }
    for vid, codes in got.items():
        assert codes == [vid] * 8, (vid, codes)


def test_pq_adc_recall_with_trained_codebooks(emb, query_and_exact):
    """Trained PQ (m=8, k=16 -> 32x compression) keeps useful recall vs
    the exact MILLI-L2 ranking it approximates (ADC approximates L2, not
    cosine — compare against the right baseline)."""
    from influxdb_iox_spark.pipeline.similarity import (
        pq_adc_topk,
        pq_encode,
        quantize_codebooks_milli,
        train_pq_codebooks,
    )

    qv, _, _ = query_and_exact
    from influxdb_iox_spark.pipeline.similarity import _milli_np

    rows = emb.collect()
    ints = {
        r.vec_id: _milli_np(np.array(r.embedding)).astype("float64")
        for r in rows
    }
    qi = _milli_np(np.array(qv)).astype("float64")
    l2 = {i: float(((v - qi) ** 2).sum()) for i, v in ints.items()}
    exact10 = set(sorted(l2, key=lambda i: (l2[i], i))[:10])
    cb_int = quantize_codebooks_milli(
        train_pq_codebooks(emb, m=8, k=16, sample_rows=500, seed=3)
    )
    got = {
        r.vec_id
        for r in pq_adc_topk(pq_encode(emb, cb_int), qv, cb_int, 10).collect()
    }
    assert len(got & exact10) / 10 >= 0.3  # k=16/subspace is coarse


def test_pq_adc_is_exact_table_lookup(emb):
    """adist from the JVM fold equals the numpy LUT sum for every vector
    (integer-exact path, no approximation beyond quantization itself)."""
    from influxdb_iox_spark.pipeline.similarity import (
        pq_adc_topk,
        pq_encode,
        quantize_codebooks_milli,
    )

    rows = emb.filter("vec_id < 16").orderBy("vec_id").collect()
    base = np.array([r.embedding for r in rows], dtype="float64")
    cb = np.stack([base[:, j * 8 : (j + 1) * 8] for j in range(8)])
    cb_int = quantize_codebooks_milli(cb)
    qv = list(base[0])
    codes_df = pq_encode(emb, cb_int)
    codes = {r.vec_id: list(r.pq_codes) for r in codes_df.collect()}
    from influxdb_iox_spark.pipeline.similarity import _milli_np

    qi = _milli_np(qv)
    lut = np.stack(
        [
            ((qi[j * 8 : (j + 1) * 8][None, :] - cb_int[j]) ** 2).sum(axis=1)
            for j in range(8)
        ]
    )
    expect = {
        vid: int(sum(lut[j][c] for j, c in enumerate(cs)))
        for vid, cs in codes.items()
    }
    got = {
        r.vec_id: r.adist
        for r in pq_adc_topk(codes_df, qv, cb_int, k_out=500).collect()
    }
    assert got == {v: expect[v] for v in got}
    assert len(got) == len(expect)


def test_distributed_kmeans_trains_usable_centroids(emb, query_and_exact):
    """The full-corpus trainer (one shuffle per Lloyd iteration, k*d rows
    to the driver) produces centroids at least as good for IVF recall as
    the driver-sample trainer's bar."""
    from influxdb_iox_spark.pipeline.similarity import (
        train_ivf_centroids_distributed,
    )

    cent = train_ivf_centroids_distributed(emb, n_centroids=8, iters=5)
    assert cent.shape == (8, 64)
    qv, exact, _ = query_and_exact
    got = {r.vec_id for r in ann_ivf_topk(emb, qv, cent, k=10, nprobe=3).collect()}
    recall = len(got & set(exact[:10])) / 10
    assert recall >= 0.5


def test_milli_canonicalization_is_half_away_from_zero():
    """The PQ integer canonicalization must round .5 ties AWAY from zero
    — the rule Spark's F.round and DuckDB's round() share; np.rint
    (half-to-even) would diverge from the SQL oracle exactly on the tie
    values the integer path exists to make safe."""
    from influxdb_iox_spark.pipeline.similarity import _milli_np

    got = _milli_np([0.0625, -0.0625, 0.0635, 0.0615, 0.0])
    assert list(got) == [63, -63, 64, 62, 0]
