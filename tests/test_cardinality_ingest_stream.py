"""Streaming cardinality-rollup maintenance (streaming/cardinality_ingest):
micro-batches fold into a persisted HLL rollup through a real Structured
Streaming source; estimates match a from-scratch rebuild; restarts
resume from the checkpoint; replays converge."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from influxdb_iox_spark.pipeline.cardinality import (
    build_cardinality_rollup,
    estimate_cardinality,
    load_rollup,
    save_rollup,
)
from influxdb_iox_spark.streaming.cardinality_ingest import CardinalityIngest


def _rows(spark, n, offset=0):
    return spark.range(offset, offset + n).select(
        (F.col("id") % 3).alias("g"),
        ((F.col("id") * 2654435761) % 400).alias("v"),
    )


def test_streaming_cardinality_ingest(spark, tmp_path):
    rollup_dir = str(tmp_path / "hll")
    seed = _rows(spark, 2_000)
    save_rollup(
        build_cardinality_rollup(seed, ["g"], "v"), rollup_dir, ["g"], "v"
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    b1 = _rows(spark, 1_500, offset=2_000)
    b2 = _rows(spark, 1_500, offset=3_500)
    b1.coalesce(1).write.mode("append").json(src)
    b2.coalesce(1).write.mode("append").json(src)

    stream = (
        spark.readStream.schema("g long, v long")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    ing = CardinalityIngest(spark, rollup_dir)
    q = ing.start(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert ing.rows_total == 3_000

    cells, _ = load_rollup(spark, rollup_dir)
    got = {
        r["g"]: r["estimate"]
        for r in estimate_cardinality(cells, ["g"]).collect()
    }
    # union-folded sketch STATE is not bit-identical to a single-pass
    # sketch (DataSketches unions may land in a different internal
    # mode), so compare against EXACT distincts within the error bound
    everything = seed.unionByName(b1).unionByName(b2)
    exact = {
        r["g"]: r["n"]
        for r in everything.groupBy("g")
        .agg(F.countDistinct("v").alias("n"))
        .collect()
    }
    for g, n in exact.items():
        assert abs(got[g] - n) / n < 0.05, (g, got[g], n)
    want = got

    # restart on the same checkpoint: nothing re-folds, estimates stable
    ing2 = CardinalityIngest(spark, rollup_dir)
    q2 = ing2.start(_read := (
        spark.readStream.schema("g long, v long")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    ), str(tmp_path / "ckpt"))
    q2.awaitTermination(120)
    assert ing2.rows_total == 0
    cells2, _ = load_rollup(spark, rollup_dir)
    got2 = {
        r["g"]: r["estimate"]
        for r in estimate_cardinality(cells2, ["g"]).collect()
    }
    assert got2 == want
