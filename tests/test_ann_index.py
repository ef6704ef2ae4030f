"""Persisted ANN index: partition pruning must reach the scan; recall vs
exact baseline."""

from __future__ import annotations

import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from influxdb_iox_spark.pipeline.ann_index import (
    build_ivf_index,
    build_lsh_index,
    query_ivf_index,
    query_lsh_index,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def exact(emb):
    rows = emb.collect()
    by_id = {r.vec_id: np.array(r.embedding, dtype="float64") for r in rows}
    q = by_id[0]
    sims = {i: float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q))) for i, v in by_id.items()}
    return list(by_id[0]), sorted(sims, key=lambda i: (-sims[i], i))


def test_lsh_index_prunes_partitions(spark, emb, exact, tmp_path):
    qv, order = exact
    path = str(tmp_path / "lsh_idx")
    build_lsh_index(emb, path, dim=64, nbits=6)
    out = query_lsh_index(spark, path, qv, k=10)
    plan = out._jdf.queryExecution().explainString(
        out._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    m = re.search(r"PartitionFilters: \[([^\]]*)", plan)
    assert m and "lsh_bucket" in m.group(1)  # pruning reaches the scan
    got = {r.vec_id for r in out.collect()}
    assert 0 in got
    assert len(got & set(order[:10])) / 10 >= 0.4


def test_ivf_index_recall(spark, emb, exact, tmp_path):
    qv, order = exact
    path = str(tmp_path / "ivf_idx")
    build_ivf_index(emb, path, n_centroids=8, sample_rows=500)
    got = {r.vec_id for r in query_ivf_index(spark, path, qv, k=10, nprobe=4).collect()}
    assert len(got & set(order[:10])) / 10 >= 0.7


def test_ivf_index_incremental_append(spark, emb, exact, tmp_path):
    """New vectors append into their bucket partitions without a rebuild
    (append_to_ann_index, frozen centroids) and are immediately
    queryable: an appended copy of the query vector must win top-1."""
    from influxdb_iox_spark.pipeline.ann_index import append_to_ann_index

    qv, _ = exact
    path = str(tmp_path / "ivf_idx2")
    build_ivf_index(emb, path, n_centroids=8, sample_rows=500)
    newv = emb.limit(5).withColumn("vec_id", F.col("vec_id") + 1_000_000)
    append_to_ann_index(spark, path, newv)
    total = spark.read.parquet(path).count()
    assert total == emb.count() + 5
    got = [
        r.vec_id
        for r in query_ivf_index(spark, path, qv, k=2, nprobe=4).collect()
    ]
    # vec 0's appended twin (id 1_000_000) ties it at cosine 1.0
    assert set(got) == {0, 1_000_000}


def test_append_lsh_and_ivfpq(spark, emb, exact, tmp_path):
    from influxdb_iox_spark.pipeline.ann_index import (
        append_to_ann_index,
        build_ivfpq_index,
        query_ivfpq_index,
    )

    qv, _ = exact
    newv = emb.limit(3).withColumn("vec_id", F.col("vec_id") + 1_000_000)

    lsh = str(tmp_path / "lsh")
    build_lsh_index(emb, lsh, dim=64, nbits=6)
    append_to_ann_index(spark, lsh, newv)
    assert spark.read.parquet(lsh).count() == emb.count() + 3
    got = {r.vec_id for r in query_lsh_index(spark, lsh, qv, k=5).collect()}
    assert 1_000_000 in got  # the appended twin of vec 0 is findable

    pq = str(tmp_path / "pq")
    build_ivfpq_index(emb, pq, n_centroids=8, m=8, k_codes=8, sample_rows=500)
    append_to_ann_index(spark, pq, newv)
    assert spark.read.parquet(pq).count() == emb.count() + 3
    got = {
        r.vec_id
        for r in query_ivfpq_index(
            spark, pq, qv, k=5, nprobe=4, rerank=30
        ).collect()
    }
    assert 1_000_000 in got


def test_ivfpq_index_funnel(spark, emb, exact, tmp_path):
    """probe -> ADC -> exact re-rank: partition-pruned read, recall holds,
    re-ranked scores are EXACT cosine."""
    from influxdb_iox_spark.pipeline.ann_index import (
        build_ivfpq_index,
        query_ivfpq_index,
    )

    qv, order = exact
    path = str(tmp_path / "ivfpq_idx")
    build_ivfpq_index(emb, path, n_centroids=8, m=8, k_codes=16,
                      sample_rows=500)
    # ADC-only ranking (no vectors touched)
    adc = query_ivfpq_index(spark, path, qv, k=10, nprobe=4)
    rows = adc.collect()
    assert [r.adist for r in rows] == sorted(r.adist for r in rows)
    # funnel with exact re-rank of the top-50 ADC candidates
    got = {
        r.vec_id
        for r in query_ivfpq_index(
            spark, path, qv, k=10, nprobe=4, rerank=50
        ).collect()
    }
    assert len(got & set(order[:10])) / 10 >= 0.6
    # partition pruning: probed read touches <= nprobe of 8 lists
    probed = query_ivfpq_index(spark, path, qv, k=10, nprobe=2, rerank=20)
    plan = probed._jdf.queryExecution().toString()
    assert "ivf_list" in plan


def test_ivfpq_codes_only_layout(spark, emb, exact, tmp_path):
    """keep_vectors=False stores only (id, codes): 32x smaller; ADC works,
    re-rank refuses loudly."""
    import pytest

    from influxdb_iox_spark.pipeline.ann_index import (
        build_ivfpq_index,
        query_ivfpq_index,
    )

    qv, _ = exact
    path = str(tmp_path / "ivfpq_codes")
    build_ivfpq_index(emb, path, n_centroids=8, sample_rows=500,
                      keep_vectors=False)
    cols = set(spark.read.parquet(path).columns)
    assert cols == {"vec_id", "pq_codes", "ivf_list"}
    assert query_ivfpq_index(spark, path, qv, k=5, nprobe=8).count() == 5
    with pytest.raises(ValueError, match="keep_vectors"):
        query_ivfpq_index(spark, path, qv, k=5, nprobe=2, rerank=20)


def test_delete_from_ann_index(spark, emb, exact, tmp_path):
    """Takedown twin of delete_from_bm25: vector-guided partition-scoped
    removal, empties cleared, absent ids a no-op, queries stop finding
    deleted vectors."""
    import os

    from influxdb_iox_spark.pipeline.ann_index import (
        build_ivfpq_index,
        delete_from_ann_index,
        query_ivfpq_index,
    )

    qv, _ = exact
    path = str(tmp_path / "pq")
    build_ivfpq_index(emb, path, n_centroids=8, m=8, k_codes=8, sample_rows=500)
    total = spark.read.parquet(path).count()

    # vec 0 (the query vector itself) must currently be findable
    got = {
        r.vec_id
        for r in query_ivfpq_index(spark, path, qv, k=3, nprobe=8, rerank=30).collect()
    }
    assert 0 in got
    n = delete_from_ann_index(spark, path, emb.filter(F.col("vec_id") == 0))
    assert n == 1
    assert spark.read.parquet(path).count() == total - 1
    got = {
        r.vec_id
        for r in query_ivfpq_index(spark, path, qv, k=3, nprobe=8, rerank=30).collect()
    }
    assert 0 not in got
    # absent id: no-op
    ghost = emb.filter(F.col("vec_id") == 1).withColumn(
        "vec_id", F.col("vec_id") + 5_000_000
    )
    assert delete_from_ann_index(spark, path, ghost) == 0
    assert spark.read.parquet(path).count() == total - 1

    # Empty an entire list: delete every member of one ivf_list — its
    # partition dir must disappear (the dynamic-overwrite gotcha).
    full = spark.read.parquet(path)
    one_list = full.groupBy("ivf_list").count().orderBy("count").first()
    victims = full.filter(F.col("ivf_list") == one_list["ivf_list"]).select(
        "vec_id"
    )
    n = delete_from_ann_index(
        spark, path, emb.join(victims, "vec_id")
    )
    assert n == one_list["count"]
    assert not os.path.isdir(
        os.path.join(path, f"ivf_list={one_list['ivf_list']}")
    )


def test_upsert_is_replay_idempotent(spark, emb, tmp_path):
    from influxdb_iox_spark.pipeline.ann_index import (
        build_ivf_index,
        upsert_into_ann_index,
    )

    path = str(tmp_path / "ivf_up")
    build_ivf_index(emb, path, n_centroids=8, sample_rows=500)
    total = spark.read.parquet(path).count()
    batch = emb.limit(4).withColumn("vec_id", F.col("vec_id") + 2_000_000)
    upsert_into_ann_index(spark, path, batch)
    assert spark.read.parquet(path).count() == total + 4
    # replay the SAME batch: still exactly one copy of each id
    upsert_into_ann_index(spark, path, batch)
    after = spark.read.parquet(path)
    assert after.count() == total + 4
    assert after.groupBy("vec_id").count().filter("count > 1").count() == 0
