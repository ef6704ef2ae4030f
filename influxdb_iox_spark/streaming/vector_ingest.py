"""Continuous embedding ingest with incremental ANN indexing — the
vector twin of ``streaming/corpus_ingest.py``.

A training pipeline's embedding side streams too (fresh shards get
embedded and must become searchable without an index rebuild).  This
composes the tested parts: a Structured Streaming source of (id,
vector) rows → per-micro-batch ``upsert_into_ann_index`` against a
persisted LSH / IVF / IVF-PQ layout (``pipeline/ann_index.py``).

Exactly-once posture: foreachBatch is at-least-once under retries, and
the upsert is an idempotent replay by construction — it deletes the
batch's ids from the buckets the batch's own vectors hash/assign to,
then appends, so a replayed identical batch converges to one copy
(pinned by ``test_ann_index.py::test_upsert_is_replay_idempotent``).
Index parameters stay frozen (the append contract): the trainer runs
once up front on a seed corpus; drift-driven retrains are a rebuild,
not a streaming concern.

At scale: per micro-batch cost is one assignment projection over the
batch plus a rewrite of ONLY the partitions the batch touches; nothing
driver-side grows with corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from influxdb_iox_spark.pipeline.ann_index import upsert_into_ann_index


class VectorIngest:
    """Streaming index maintenance: ``start(stream_df)`` runs one
    foreachBatch query folding each batch into the ANN index at
    ``index_dir`` (which must already exist — built by one of the
    ``build_*_index`` trainers on a seed corpus)."""

    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
    ) -> None:
        self.spark = spark
        self.index_dir = index_dir
        self.vec_col = vec_col
        self.id_col = id_col
        self.batches_seen = 0
        self.rows_total = 0

    def accept_batch(self, batch_df: DataFrame, batch_id: int) -> int:
        n = batch_df.count()
        if n:
            # Stable writer identity: ONE streaming query owns this
            # index (the documented single-logical-writer contract), so
            # a restart after a mid-batch SIGKILL self-succeeds its own
            # claim instead of stalling out the guard's TTL; the
            # replayed batch converges (upsert is replay-idempotent).
            upsert_into_ann_index(
                self.spark, self.index_dir, batch_df,
                vec_col=self.vec_col, id_col=self.id_col,
                writer="stream:vector-ingest",
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
