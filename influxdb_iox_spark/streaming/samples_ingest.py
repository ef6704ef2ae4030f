"""Continuous sample-cell maintenance — the quantile twin of
``streaming/moments_ingest.py`` (same exactly-once argument: the
per-cell exact count ``n`` is not replay-convergent, so folds are
keyed by Structured Streaming's ``batch_id`` through the shared
versioned-swap machinery in ``pipeline/versioned_fold``)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from influxdb_iox_spark.pipeline.samples import update_sample_cells


class SamplesIngest:
    """``start(stream_df)`` runs one foreachBatch query folding each
    batch into the sample-cell table at ``cells_dir`` (seeded by
    ``save_sample_cells``, possibly from an empty frame)."""

    def __init__(self, spark: SparkSession, cells_dir: str) -> None:
        self.spark = spark
        self.cells_dir = cells_dir
        self.batches_seen = 0
        self.batches_skipped = 0
        self.rows_total = 0

    def accept_batch(self, batch_df: DataFrame, batch_id: int) -> int:
        n = batch_df.count()
        if n:
            folded = update_sample_cells(
                self.spark,
                self.cells_dir,
                batch_df,
                batch_id=int(batch_id),
                writer="stream:samples-ingest",
            )
            if not folded:
                self.batches_skipped += 1
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
