"""Corpus-prep operators: shard packing, contamination scan, deterministic
stratified sampling (pipeline/corpus.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from influxdb_iox_spark.pipeline.corpus import (
    contamination_check,
    deterministic_sample,
    pack_shards,
)


def test_pack_shards_matches_naive_cumsum(spark):
    """The distributed prefix-sum must equal the single-window formula, and
    documents are never split across shards."""
    rows = [(i, (i * 37) % 900 + 100) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long").repartition(8)
    out = pack_shards(df, "n_tokens", "doc_id", shard_tokens=2000).collect()
    got = {r.doc_id: r.shard_id for r in out}

    cum = 0
    want = {}
    for i, tok in sorted(rows):
        want[i] = cum // 2000
        cum += tok
    assert got == want
    # shards are contiguous in doc order and budget-bounded (except where a
    # single doc overflows, impossible here since max doc < budget)
    by_shard: dict[int, int] = {}
    for i, tok in sorted(rows):
        by_shard[want[i]] = by_shard.get(want[i], 0) + tok
    full_shards = {s: t for s, t in by_shard.items() if s < max(by_shard)}
    assert all(t >= 2000 - 999 for t in full_shards.values())


def test_pack_shards_no_global_single_task_window(spark):
    """The plan must not contain a partition-less window (the single-task
    running-total trap)."""
    df = spark.createDataFrame(
        [(i, 10) for i in range(100)], "doc_id long, n_tokens long"
    )
    out = pack_shards(df, "n_tokens", "doc_id", shard_tokens=100)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_contamination_check(spark):
    eval_df = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog today")],
        "doc_id long, text string",
    )
    train_df = spark.createDataFrame(
        [
            # contains the eval 8-gram run -> contaminated
            (1, "prefix words the quick brown fox jumps over the lazy dog today suffix"),
            # unrelated -> clean
            (2, "completely different content with no overlap whatsoever in any gram"),
        ],
        "doc_id long, text string",
    )
    out = {r.train_id: r.n_shared_shingles for r in contamination_check(
        train_df, eval_df, shingle_n=8).collect()}
    assert 1 in out and out[1] >= 1
    assert 2 not in out


def test_deterministic_sample_reproducible_and_monotone(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de") for i in range(1000)],
        "doc_id long, lang string",
    )
    a = {r.doc_id for r in deterministic_sample(df, {"en": 0.4, "de": 0.0}).collect()}
    b = {r.doc_id for r in deterministic_sample(df, {"en": 0.4, "de": 0.0}).collect()}
    assert a == b  # reproducible
    assert all(i % 2 == 0 for i in a)  # de rate 0 -> only en
    assert 100 < len(a) < 300  # ~40% of 500
    # rate monotonicity: a higher rate keeps a superset of a lower rate
    c = {r.doc_id for r in deterministic_sample(df, {"en": 0.8, "de": 0.0}).collect()}
    assert a <= c
    # growing the corpus keeps prior selections (pure per-row predicate)
    grown = df.union(
        spark.createDataFrame(
            [(i, "en") for i in range(1000, 1200)], "doc_id long, lang string"
        )
    )
    g = {r.doc_id for r in deterministic_sample(grown, {"en": 0.4, "de": 0.0}).collect()}
    assert a == {i for i in g if i < 1000}
