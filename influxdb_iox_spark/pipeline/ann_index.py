"""Persisted ANN indexes: bucket-partitioned parquet for pruned search.

The scale path for similarity search: sign/assign every vector ONCE at build
time and write parquet **partitioned by bucket**.  A query then reads only
its probe buckets — Spark partition pruning turns a corpus scan into an
O(buckets-probed) directory read, the columnar analogue of an inverted ANN
index.  Exact re-rank inside the probed buckets keeps returned scores exact.

Build is a one-pass distributed job (the signing UDFs are Arrow-batched
numpy); the index is just parquet, so it inherits object-store placement,
schema evolution, and incremental append (new vectors append new files into
their bucket partitions).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from influxdb_iox_spark.pipeline.similarity import (
    _hyperplanes,
    cosine_topk,
    hyperplane_signatures,
    ivf_assign,
    train_ivf_centroids,
)


def build_lsh_index(
    df: DataFrame,
    path: str,
    dim: int,
    nbits: int = 16,
    seed: int = 42,
    vec_col: str = "embedding",
) -> None:
    signed = hyperplane_signatures(df, dim, nbits, seed, vec_col)
    signed.write.mode("overwrite").partitionBy("lsh_bucket").parquet(path)
    with open(os.path.join(path, "_ann_meta.json"), "w") as f:
        json.dump({"kind": "lsh", "dim": dim, "nbits": nbits, "seed": seed}, f)


def query_lsh_index(
    spark: SparkSession,
    path: str,
    query_vec: list[float],
    k: int = 10,
    multiprobe_bits: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k via partition-pruned bucket reads + exact re-rank."""
    import numpy as np

    with open(os.path.join(path, "_ann_meta.json")) as f:
        meta = json.load(f)
    planes = _hyperplanes(meta["dim"], meta["nbits"], meta["seed"])
    qsig = int(
        sum(
            (1 << i)
            for i, v in enumerate(planes @ np.asarray(query_vec, dtype="float64"))
            if v > 0
        )
    )
    probes = {qsig} | (
        {qsig ^ (1 << b) for b in range(meta["nbits"])} if multiprobe_bits else set()
    )
    df = spark.read.parquet(path)
    cand = df.filter(F.col("lsh_bucket").isin([int(p) for p in probes]))
    return cosine_topk(cand, query_vec, k, vec_col, id_col)


def build_ivf_index(
    df: DataFrame,
    path: str,
    n_centroids: int = 16,
    sample_rows: int = 10_000,
    seed: int = 42,
    vec_col: str = "embedding",
) -> None:
    cent = train_ivf_centroids(df, n_centroids, sample_rows, seed=seed, vec_col=vec_col)
    assigned = ivf_assign(df, cent, vec_col)
    assigned.write.mode("overwrite").partitionBy("ivf_list").parquet(path)
    with open(os.path.join(path, "_ann_meta.json"), "w") as f:
        json.dump({"kind": "ivf", "centroids": [list(map(float, c)) for c in cent]}, f)


def query_ivf_index(
    spark: SparkSession,
    path: str,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    import numpy as np

    with open(os.path.join(path, "_ann_meta.json")) as f:
        meta = json.load(f)
    cent = np.asarray(meta["centroids"], dtype="float64")
    q = np.asarray(query_vec, dtype="float64")
    order = np.argsort(((cent - q) ** 2).sum(axis=1))[:nprobe]
    df = spark.read.parquet(path)
    cand = df.filter(F.col("ivf_list").isin([int(i) for i in order]))
    return cosine_topk(cand, query_vec, k, vec_col, id_col)
