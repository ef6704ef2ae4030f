"""Streaming vector ingest (streaming/vector_ingest.py): batches fold
into a persisted IVF index through a real Structured Streaming source;
appended vectors are immediately queryable; restarts resume from the
checkpoint without duplicating rows."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from influxdb_iox_spark.pipeline.ann_index import (
    build_ivf_index,
    query_ivf_index,
)
from influxdb_iox_spark.streaming.vector_ingest import VectorIngest

SF = "/root/testdata/sf0.001"
SCHEMA = "vec_id long, embedding array<float>"


def _write_batch(spark, src_dir, df):
    df.selectExpr(
        "vec_id", "to_json(embedding) AS embedding_json"
    ).coalesce(1).write.mode("append").json(src_dir)


def _read_stream(spark, src_dir):
    return (
        spark.readStream.schema("vec_id long, embedding_json string")
        .option("maxFilesPerTrigger", 1)
        .json(src_dir)
        .select(
            "vec_id",
            F.from_json("embedding_json", "array<float>").alias("embedding"),
        )
    )


def test_streaming_vector_ingest(spark, tmp_path):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    seed = emb.filter(F.col("vec_id") >= 50)
    idx = str(tmp_path / "ivf")
    build_ivf_index(seed, idx, n_centroids=8, sample_rows=500)
    base = spark.read.parquet(idx).count()

    src = str(tmp_path / "src")
    os.makedirs(src)
    b1 = emb.filter(F.col("vec_id") < 25)
    b2 = emb.filter((F.col("vec_id") >= 25) & (F.col("vec_id") < 50))
    _write_batch(spark, src, b1)
    _write_batch(spark, src, b2)

    ing = VectorIngest(spark, idx)
    q = ing.start(_read_stream(spark, src), str(tmp_path / "ckpt"))
    q.awaitTermination()
    assert ing.rows_total == 50
    after = spark.read.parquet(idx)
    assert after.count() == base + 50
    assert after.groupBy("vec_id").count().filter("count > 1").count() == 0

    # the streamed-in vector 0 is findable with its own embedding
    qv = [float(x) for x in emb.filter("vec_id = 0").first().embedding]
    got = [r.vec_id for r in query_ivf_index(spark, idx, qv, k=1, nprobe=8).collect()]
    assert got == [0]

    # restart on the same checkpoint: nothing new, no duplicates
    ing2 = VectorIngest(spark, idx)
    q = ing2.start(_read_stream(spark, src), str(tmp_path / "ckpt"))
    q.awaitTermination()
    assert ing2.rows_total == 0
    assert spark.read.parquet(idx).count() == base + 50
