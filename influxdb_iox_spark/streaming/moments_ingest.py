"""Continuous moment-cell maintenance — the exact-stats twin of
``streaming/cardinality_ingest.py``.

A 100 TB events firehose keeps its "mean/σ per (key, bucket)" dashboard
live by folding each micro-batch's cells into the persisted table:
per-batch cost is one hash aggregate over the batch plus a rewrite of
the small cell table into the NEXT version directory; queries keep
answering from cells, never raw data.

Exactly-once posture — STRONGER than the HLL twin's, because it has to
be: foreachBatch is at-least-once under retries, and a moment fold is
NOT replay-convergent (re-summing a replayed batch double-counts,
where re-inserting into an HLL is a set-semantics no-op).  The fold is
therefore keyed by Structured Streaming's ``batch_id``: a batch
already recorded in the current version's ``_applied.json`` is skipped
outright, and the versioned-swap layout (``pipeline/moments``) makes
the skip decision and the fold one atomic unit — the guard's
put-if-absent version mint commits both or neither.  A SIGKILL between
the new version's directory write and its mint leaves the old version
current; the replayed batch rebuilds and converges.  Pinned by the
replay case in test_moments.py.

A SIGKILLed run's writer claim self-succeeds on restart via the stable
writer name (``pipeline/index_txn`` named-writer rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from influxdb_iox_spark.pipeline.moments import update_moment_cells


class MomentsIngest:
    """``start(stream_df)`` runs one foreachBatch query folding each
    batch into the moment-cell table at ``cells_dir`` (which must
    already exist — seeded by ``save_moment_cells``, possibly from an
    empty frame)."""

    def __init__(self, spark: SparkSession, cells_dir: str) -> None:
        self.spark = spark
        self.cells_dir = cells_dir
        self.batches_seen = 0
        self.batches_skipped = 0
        self.rows_total = 0

    def accept_batch(self, batch_df: DataFrame, batch_id: int) -> int:
        n = batch_df.count()
        if n:
            folded = update_moment_cells(
                self.spark,
                self.cells_dir,
                batch_df,
                batch_id=int(batch_id),
                writer="stream:moments-ingest",
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
