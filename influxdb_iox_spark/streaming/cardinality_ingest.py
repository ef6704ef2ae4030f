"""Continuous cardinality-rollup maintenance — the sketch twin of
``streaming/vector_ingest.py``.

A 100 TB events firehose keeps its "distinct users per (key, bucket)"
dashboard live by folding each micro-batch's HLL sketches into the
persisted rollup (``pipeline/cardinality.update_rollup``): per-batch
cost is one hash aggregate over the batch plus a rewrite of the small
cells table; queries keep answering from sketch unions, never raw data.

Exactly-once posture: foreachBatch is at-least-once under retries, and
the HLL fold converges on replay — re-inserting the same values into a
sketch is a set-semantics no-op, so a replayed identical batch leaves
every estimate unchanged (pinned in test_cardinality.py's replay case).
A SIGKILLed run's writer claim self-succeeds on restart via the stable
writer name (``pipeline/index_txn`` named-writer rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from influxdb_iox_spark.pipeline.cardinality import update_rollup


class CardinalityIngest:
    """``start(stream_df)`` runs one foreachBatch query folding each
    batch into the HLL rollup at ``rollup_dir`` (which must already
    exist — seeded by ``save_rollup``, possibly from an empty frame)."""

    def __init__(self, spark: SparkSession, rollup_dir: str) -> None:
        self.spark = spark
        self.rollup_dir = rollup_dir
        self.batches_seen = 0
        self.rows_total = 0

    def accept_batch(self, batch_df: DataFrame, batch_id: int) -> int:
        n = batch_df.count()
        if n:
            update_rollup(
                self.spark, self.rollup_dir, batch_df,
                writer="stream:cardinality-ingest",
            )
        self.batches_seen += 1
        self.rows_total += n
        return n

    def start(self, stream_df: DataFrame, checkpoint_dir: str, once=True):
        writer = stream_df.writeStream.foreachBatch(
            lambda b, i: self.accept_batch(b, i) and None
        ).option("checkpointLocation", checkpoint_dir)
        if once:
            writer = writer.trigger(availableNow=True)
        return writer.start()
