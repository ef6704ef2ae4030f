"""Corpus-preparation operators for training-data pipelines.

Beyond the reference surface (which has no document pipeline); designed for
the 100 TB corpus case alongside pipeline/dedup.py:

- ``pack_shards``: assign documents to fixed-token-budget shards in a stable
  global order — the classic "pack the corpus into ~N-token training shards"
  step.  A naive ``SUM() OVER (ORDER BY …)`` running total collapses the
  whole table into ONE task; this implementation computes per-partition
  running sums and broadcasts the tiny prefix-offset table instead, so the
  only global step is a range repartition.
- ``contamination_check``: n-gram overlap between a training corpus and an
  eval/benchmark set — exact (shingle equi-join on the n-gram string), the
  standard train/test leakage scan.  The join shuffles on the shingle, i.e.
  the inverted-index bound, same shape as ngram_jaccard_pairs.
- ``deterministic_sample``: per-stratum sampling by a cryptographic hash of
  the id — reproducible across engines and runs (unlike ``df.sampleBy``),
  so a sampled corpus can be re-derived bit-for-bit from the raw corpus.
  Keeps a row iff md5(id)'s leading 32 bits, as a fraction of 2^32, fall
  below the stratum's rate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def pack_shards(
    df: DataFrame,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    shard_tokens: int = 100_000,
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign each row a ``shard_id`` so that consecutive documents (in
    ``id_col`` order) fill shards of ~``shard_tokens`` tokens.

    shard_id = floor((running_total - row_tokens) / shard_tokens): a shard
    boundary falls wherever the running total crosses a multiple of the
    budget, so every shard except possibly the last holds >= shard_tokens
    only if a single document overflows it (documents are never split).

    Scale: rows are range-partitioned by id; the running sum is computed
    per partition (window within partition, no global single-task window)
    and per-partition totals — one tiny driver collect, O(partitions) —
    become broadcast prefix offsets.
    """
    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    part = df.repartitionByRange(n_parts, F.col(id_col)).withColumn(
        "__pid", F.spark_partition_id()
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = part.withColumn(
        "__local", F.sum(F.col(token_col).cast("long")).over(w)
    )
    # Pin ONE row-to-partition assignment before the two consumers (the
    # totals collect below and the returned join): repartitionByRange
    # samples its boundaries per job, so without materialization the
    # offsets could be computed for a DIFFERENT assignment than the one in
    # effect when the result executes — boundary rows would add the wrong
    # prefix.  localCheckpoint, not cache() (see SCALE.md).
    local = local.localCheckpoint(eager=True)
    # per-partition totals -> prefix offsets (tiny: one row per partition)
    totals = (
        local.groupBy("__pid").agg(F.max("__local").alias("__t")).collect()
    )
    sums = {r["__pid"]: r["__t"] for r in totals}
    prefix, acc = {}, 0
    for pid in sorted(sums):
        prefix[pid] = acc
        acc += sums[pid]
    offsets = df.sparkSession.createDataFrame(
        [(pid, off) for pid, off in prefix.items()], "__pid int, __prefix long"
    )
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(
            "shard_id",
            F.floor(
                (F.col("__local") + F.col("__prefix") - F.col(token_col))
                / F.lit(shard_tokens)
            ),
        )
        .drop("__pid", "__local", "__prefix")
    )


def contamination_check(
    train_df: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 8,
) -> DataFrame:
    """Training documents sharing at least one ``shingle_n``-gram with any
    eval document: (train id, n_shared_shingles, n_eval_docs) per
    contaminated training doc.

    Exact (no sketching): both sides explode to distinct word n-grams and
    equi-join on the gram.  At 100 TB the join shuffles on the gram string
    — the inverted-index bound — and the eval side is typically small
    enough that Spark broadcasts it after aggregation.
    """
    from influxdb_iox_spark.pipeline.dedup import shingles

    tr = train_df.select(
        F.col(id_col).alias("train_id"),
        F.explode(shingles(F.col(text_col), shingle_n)).alias("gram"),
    )
    ev = eval_df.select(
        F.col(id_col).alias("eval_id"),
        F.explode(shingles(F.col(text_col), shingle_n)).alias("gram"),
    )
    return (
        tr.join(ev, "gram")
        .groupBy("train_id")
        .agg(
            F.count("*").alias("n_shared_shingles"),
            F.count_distinct("eval_id").alias("n_eval_docs"),
        )
        # no ORDER BY here: a global sort of a corpus-sized result is the
        # caller's choice, not the operator's
    )


def deterministic_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Reproducible per-stratum sampling: keep a row iff the leading 32 bits
    of md5(id) — a uniform [0, 1) fraction — fall below its stratum's rate.

    md5 (not Spark's hash/xxhash64) so the SAME sample is derivable in any
    engine; the selection is a pure column predicate (no RNG state, no
    sampleBy), so re-running over a grown corpus keeps previously-selected
    rows selected.
    """
    frac = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(float(2**32))
    )
    rate = F.lit(float(default_rate))
    for k, v in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == k, F.lit(float(v))).otherwise(rate)
    return df.filter(frac < rate)
