"""Streaming corpus ingest: the continuous dedup accept step
(streaming/corpus_ingest.py) over a real Structured Streaming source —
cross-batch duplicates rejected via the persisted fingerprint index,
accepted docs land in the corpus sink, restarts resume from the
checkpoint."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from influxdb_iox_spark.streaming.corpus_ingest import CorpusDedupIngest

SCHEMA = "doc_id long, text string"


def _write_batch(spark, src_dir, rows, name):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).json(src_dir)  # file source picks up new files per trigger


def _read_stream(spark, src_dir):
    return (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src_dir)
    )


def test_streaming_dedup_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    ing = CorpusDedupIngest(
        spark,
        index_dir=str(tmp_path / "idx"),
        corpus_dir=str(tmp_path / "corpus"),
        n_buckets=4,
    )
    # batch 1: two distinct docs + one intra-batch dup (keeps min id)
    _write_batch(
        spark, src,
        [(1, "alpha text"), (2, "beta text"), (3, "alpha text")],
        "b1",
    )
    q = ing.start(_read_stream(spark, src), str(tmp_path / "ckpt"))
    q.awaitTermination()
    got1 = {
        r.doc_id
        for r in spark.read.parquet(str(tmp_path / "corpus")).collect()
    }
    assert got1 == {1, 2}

    # batch 2 (separate run, same checkpoint): one cross-batch dup of
    # batch 1, one cross-batch dup of itself, one genuinely new doc
    _write_batch(
        spark, src,
        [(10, "alpha text"), (11, "gamma text"), (12, "gamma text")],
        "b2",
    )
    q = ing.start(_read_stream(spark, src), str(tmp_path / "ckpt"))
    q.awaitTermination()
    corpus = spark.read.parquet(str(tmp_path / "corpus"))
    got = {r.doc_id for r in corpus.collect()}
    assert got == {1, 2, 11}  # 10 and 12 rejected
    # texts in the corpus are unique
    assert corpus.select("text").distinct().count() == corpus.count()
    assert ing.accepted_total == 3


def test_streaming_restart_does_not_reprocess(spark, tmp_path):
    """Replaying start() with an exhausted checkpoint is a no-op: the
    file-source offsets are pinned, so no batch re-runs and the corpus
    is unchanged (idempotent restart, the crash-recovery posture)."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    ing = CorpusDedupIngest(
        spark,
        index_dir=str(tmp_path / "idx"),
        corpus_dir=str(tmp_path / "corpus"),
        n_buckets=4,
    )
    _write_batch(spark, src, [(1, "only doc")], "b1")
    q = ing.start(_read_stream(spark, src), str(tmp_path / "ckpt"))
    q.awaitTermination()
    first = ing.batches_seen
    q = ing.start(_read_stream(spark, src), str(tmp_path / "ckpt"))
    q.awaitTermination()
    assert ing.batches_seen == first  # nothing new to process
    assert spark.read.parquet(str(tmp_path / "corpus")).count() == 1


def test_seed_index_created_and_reused(spark, tmp_path):
    idx = str(tmp_path / "idx")
    CorpusDedupIngest(spark, idx, str(tmp_path / "c1"), n_buckets=8)
    with open(os.path.join(idx, "_dedup_meta.json")) as f:
        assert json.load(f)["n_buckets"] == 8
    # second construction must NOT rebuild (would wipe the index)
    ing = CorpusDedupIngest(spark, idx, str(tmp_path / "c2"), n_buckets=8)
    ing.accept_batch(
        spark.createDataFrame([(5, "doc z")], SCHEMA), 0
    )
    again = CorpusDedupIngest(spark, idx, str(tmp_path / "c3"), n_buckets=8)
    n = again.accept_batch(
        spark.createDataFrame([(6, "doc z")], SCHEMA), 0
    )
    assert n == 0  # the index persisted across constructions


def test_streaming_maintains_bm25_search_index(spark, tmp_path):
    """End-to-end: the accept step also folds accepted docs into a BM25
    index (update_bm25's replacement-by-id semantics).  After two
    micro-batches with cross-batch duplicates, the maintained index must
    answer queries exactly like a fresh rebuild over the accepted
    corpus."""
    from influxdb_iox_spark.pipeline.search import (
        bm25_topk,
        build_bm25_index,
        load_bm25,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    ing = CorpusDedupIngest(
        spark,
        index_dir=str(tmp_path / "idx"),
        corpus_dir=str(tmp_path / "corpus"),
        n_buckets=4,
        search_index_dir=str(tmp_path / "search"),
    )
    _write_batch(
        spark, src,
        [(1, "the quick brown fox"), (2, "lazy dog sleeps")], "b1",
    )
    _write_batch(
        spark, src,
        [(3, "the quick brown fox"),   # cross-batch dup: rejected
         (4, "another dog barks loudly")],
        "b2",
    )
    q = ing.start(_read_stream(spark, src), str(tmp_path / "ckpt"))
    q.awaitTermination()
    assert ing.accepted_total == 3

    p, d, m = load_bm25(spark, str(tmp_path / "search"))
    accepted = spark.read.parquet(str(tmp_path / "corpus"))
    fp, fd, fm = build_bm25_index(accepted)
    assert {k: m[k] for k in ("n_docs", "total_len")} == fm
    got = {
        r.doc_id: r.bm25 for r in bm25_topk(p, d, m, ["dog"], k=10).collect()
    }
    want = {
        r.doc_id: r.bm25
        for r in bm25_topk(fp, fd, fm, ["dog"], k=10).collect()
    }
    assert got == want and set(got) == {2, 4}
