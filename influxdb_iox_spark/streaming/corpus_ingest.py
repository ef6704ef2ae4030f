"""Continuous corpus ingest with incremental dedup — the streaming accept
step a 100 TB training-data pipeline runs per arriving shard.

Composes the already-tested parts: a Structured Streaming source of
documents → per-micro-batch ``dedup_against_index`` (digest the batch,
LEFT ANTI join against the bucket-partitioned fingerprint index — digests
shuffle, never text) → accepted documents append to the corpus sink AND
their fingerprints append into the index's hash buckets, so the NEXT
batch (or the next restart) sees them.

Exactly-once posture: foreachBatch is at-least-once under retries, and
both effects are idempotent replays — the corpus append is keyed by
content digest downstream (a replayed batch re-accepts the same rows;
readers dedup on digest, the same PK-upsert story as chunk ingest), and
``append_to_index`` re-appending a digest is harmless because
``dedup_against_index`` keys on digest existence, not count.  Checkpoint
location pins source offsets like every other stream in streaming/.

At scale: per micro-batch cost is one digest projection + one anti-join
whose index side is bucket-pruned parquet (pipeline/dedup_index.py's
layout); nothing driver-side grows with corpus size.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from influxdb_iox_spark.pipeline.dedup_index import (
    append_to_index,
    build_exact_index,
    dedup_against_index,
)


class CorpusDedupIngest:
    """Streaming accept step: ``start(stream_df)`` runs one
    foreachBatch query writing accepted docs to ``corpus_dir`` (parquet
    append) and fingerprints into the index at ``index_dir``."""

    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        corpus_dir: str,
        n_buckets: int = 64,
        text_col: str = "text",
        id_col: str = "doc_id",
        search_index_dir: str | None = None,
    ) -> None:
        """``search_index_dir``: optionally maintain a BM25 index over
        the accepted corpus (pipeline/search.py) — each batch's accepted
        docs fold in via ``update_bm25``, whose replacement-by-id
        semantics make a crash-replayed batch a no-op, so the search
        index stays exactly consistent with the accepted corpus."""
        self.spark = spark
        self.index_dir = index_dir
        self.corpus_dir = corpus_dir
        self.n_buckets = n_buckets
        self.text_col = text_col
        self.id_col = id_col
        self.search_index_dir = search_index_dir
        self.batches_seen = 0
        self.accepted_total = 0
        if search_index_dir is not None and not os.path.exists(
            os.path.join(search_index_dir, "_bm25_meta.json")
        ):
            from influxdb_iox_spark.pipeline.search import (
                build_bm25_index,
                save_bm25,
            )

            empty = spark.createDataFrame(
                [], f"{id_col} long, {text_col} string"
            )
            save_bm25(
                *build_bm25_index(empty, id_col=id_col, text_col=text_col),
                search_index_dir,
            )
        if not os.path.exists(os.path.join(index_dir, "_dedup_meta.json")):
            # empty seed index (schema-complete, zero rows) so the first
            # batch's anti-join has a real right side
            empty = spark.createDataFrame(
                [], f"{text_col} string, {id_col} long"
            )
            build_exact_index(
                empty, index_dir, n_buckets=n_buckets,
                text_col=text_col, id_col=id_col,
            )

    def accept_batch(self, batch_df: DataFrame, batch_id: int) -> int:
        """One micro-batch: returns the number of accepted documents.

        ORDER MATTERS for crash-replay idempotence: the corpus append
        runs BEFORE the fingerprint append.  A crash between the two
        replays the batch with the docs already in the corpus but not in
        the index — the replay re-accepts and re-appends them (duplicate
        corpus rows keyed by the same digest, deduped by any downstream
        digest read, and a duplicate fingerprint row is collapsed by the
        index's min-id fold).  The reverse order would let a replayed
        batch find its own digests in the index and silently DROP the
        documents that never reached the corpus."""
        accepted = dedup_against_index(
            self.spark, self.index_dir, batch_df,
            text_col=self.text_col, id_col=self.id_col,
        ).localCheckpoint(eager=True)  # one compute, two sinks below
        n = accepted.count()
        if n:
            accepted.write.mode("append").parquet(self.corpus_dir)
            # Stable writer identities (one streaming query owns each
            # index): a restart after a mid-batch SIGKILL self-succeeds
            # its own claim instead of stalling out the guard's TTL,
            # and the replayed batch converges (both folds are
            # replay-idempotent).
            append_to_index(
                self.spark, self.index_dir, accepted,
                text_col=self.text_col, id_col=self.id_col,
                writer="stream:corpus-ingest",
            )
            if self.search_index_dir is not None:
                from influxdb_iox_spark.pipeline.search import update_bm25

                # Replacement-by-id: a replayed batch re-updates the
                # same ids with identical content — a no-op, matching
                # the corpus/fingerprint idempotence above.
                update_bm25(
                    self.spark, self.search_index_dir, accepted,
                    id_col=self.id_col, text_col=self.text_col,
                    writer="stream:corpus-ingest",
                )
        self.batches_seen += 1
        self.accepted_total += n
        return n

    def start(self, stream_df: DataFrame, checkpoint_dir: str, once=True):
        """Attach to a streaming DataFrame of documents.  ``once`` uses
        availableNow (drain-and-stop, the test/bulk mode); False runs
        continuously."""
        writer = stream_df.writeStream.foreachBatch(
            lambda b, i: self.accept_batch(b, i) and None
        ).option("checkpointLocation", checkpoint_dir)
        if once:
            writer = writer.trigger(availableNow=True)
        return writer.start()
