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


def test_ivf_index_incremental_append(spark, emb, tmp_path):
    """New vectors append into their bucket partitions without a rebuild."""
    import json, os
    from influxdb_iox_spark.pipeline.similarity import ivf_assign

    path = str(tmp_path / "ivf_idx2")
    build_ivf_index(emb, path, n_centroids=8, sample_rows=500)
    with open(os.path.join(path, "_ann_meta.json")) as f:
        cent = json.load(f)["centroids"]
    newv = emb.limit(5).withColumn("vec_id", F.col("vec_id") + 1_000_000)
    ivf_assign(newv, np.asarray(cent)).write.mode("append").partitionBy(
        "ivf_list"
    ).parquet(path)
    total = spark.read.parquet(path).count()
    assert total == emb.count() + 5
