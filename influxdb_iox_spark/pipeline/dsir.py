"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023).

Given a small *target* corpus (high-quality text you want more of) and
the big *raw* corpus you are filtering, DSIR selects raw documents whose
hashed n-gram feature distribution looks like the target:

1. every document is reduced to a bag of hashed n-gram features
   (unigrams + bigrams → ``buckets`` hash buckets);
2. two bucket-level unigram models are fit — one on the target, one on
   the raw corpus — with Laplace smoothing;
3. each raw document's importance log-weight is its feature counts
   dotted with the buckets' log-probability ratios,
   ``Σ_b cnt_b · (ln p_target(b) − ln p_raw(b))``;
4. resampling draws k documents via Gumbel top-k over the log-weights —
   a *sample* from the importance distribution, not a deterministic
   top-k (which would collapse onto near-duplicates of the target).

Spark shape, and why it scales where token-keyed scoring can't:

- hashing makes the join key space FIXED (``buckets`` ids, uniform by
  construction) — the bucket-count tables are ≤ ``buckets`` rows no
  matter how big either corpus is, so both model joins are broadcasts
  forever, and there is no hot-key skew to salt (contrast lm.py's
  stopword-headed token keys);
- feature extraction is explode + one hash aggregate per corpus;
- scoring is one broadcast join + one per-doc sum — a single doc-keyed
  aggregate, no window, no Python;
- Gumbel keys are a pure function of (seed, id) — the md5 recipe of
  ``corpus.shuffle_into_shards`` — so the resample is deterministic,
  resumable, and engine-reproducible.

Bucketing and ln both follow the repo's cross-engine contracts: buckets
come from md5 (portable to the DuckDB oracle), counts stay integers
end-to-end, and the reported log-weight is rounded to 1e-6 (ln is not
IEEE-correctly-rounded; the micro-rounded value is the contract, same
as pipeline/lm.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from influxdb_iox_spark.pipeline.text import word_tokens


def _bucket(col):
    """Engine-portable uniform bucket id for a feature string:
    first 8 hex chars of md5 as an int (the shuffle_into_shards
    recipe — DuckDB spells it ('0x' || substr(md5(g),1,8))::BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def hashed_ngram_counts(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 10_000,
    bigrams: bool = True,
) -> DataFrame:
    """(id, bucket, cnt): hashed unigram (+ bigram) bag-of-features.

    Tokens are the corpus-wide word tokenizer (lower, split on
    non-alphanumeric runs); bigrams are space-joined token pairs, so a
    bigram can never collide with a unigram's text by construction of
    the tokenizer (tokens contain no spaces).  Empty documents emit
    nothing.
    """
    if buckets < 2:
        raise ValueError("buckets must be >= 2")
    # Feature extraction fans out ~2 rows per word; widen narrow scans
    # so the explode + partial aggregate parallelize (the
    # pipeline/dedup.minhash guard — no-op on real many-split corpora).
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        df = df.repartition(sc.defaultParallelism, F.col(id_col))
    toks = df.select(
        F.col(id_col), word_tokens(F.col(text_col)).alias("t")
    ).filter(F.size("t") > 0)
    # Bigrams via zip_with over shifted slices — NEVER index-lambdas over
    # sequence(): Catalyst inlines the token chain into the lambda body
    # and the extraction goes quadratic in document length (the
    # text.gram_structs lesson, measured 90 s vs ~1 s at sf0.1).
    gram_col = F.col("t")
    if bigrams:
        tail = F.greatest(F.size("t") - 1, F.lit(0))
        gram_col = F.concat(
            F.col("t"),
            F.zip_with(
                F.slice("t", 1, tail),
                F.slice("t", 2, tail),
                lambda a, b: F.concat(a, F.lit(" "), b),
            ),
        )
    grams = toks.select(id_col, F.explode(gram_col).alias("g"))
    return grams.select(
        id_col, F.pmod(_bucket(F.col("g")), F.lit(buckets)).alias("bucket")
    ).groupBy(id_col, "bucket").agg(F.count("*").alias("cnt"))


def bucket_totals(feats: DataFrame) -> DataFrame:
    """(bucket, cnt): corpus-level feature counts — the sufficient
    statistics of one hashed unigram model (≤ buckets rows)."""
    return feats.groupBy("bucket").agg(F.sum("cnt").alias("cnt"))


def dsir_bucket_models(
    feats: DataFrame,
    target_ids: DataFrame,
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """(target_counts, raw_counts) — BOTH unigram models from ONE pass.

    ``bucket_totals(feats.join(target_ids))`` + ``bucket_totals(feats)``
    aggregate the feature frame twice, and a consumer that also derives
    the model totals from the returned frames (``dsir_log_weights``'s
    in-plan ``tots`` cross) replays each aggregation again — four passes
    over the feature frame for ≤ ``buckets`` rows of sufficient
    statistics.  Here the target membership rides as a broadcast-join
    marker and one ``(bucket, t_cnt, r_cnt)`` aggregate is
    ``localCheckpoint``-ed (KB-sized: ≤ buckets rows of three numbers),
    so every downstream consumer — both model broadcasts AND the totals
    — reads the materialized statistics instead of re-aggregating.

    Exact-equivalence contract: ``target_ids`` must be DISTINCT ids (the
    inner-join formulation would double-count duplicated ids; the marker
    formulation never does).  Counts are integer sums end-to-end, and a
    bucket with no target-document features is ABSENT from
    ``target_counts`` (conditional sum → NULL → filtered), exactly as
    the inner join leaves it absent — so downstream Laplace smoothing
    sees identical inputs and the scores are bit-identical.
    """
    marked = feats.join(
        F.broadcast(
            target_ids.select(F.col(id_col)).withColumn("__in_t", F.lit(1))
        ),
        id_col,
        "left",
    )
    # eager=False (round-17): the first consumer — one of the model
    # broadcast builds inside the scoring query's own action —
    # materializes the blocks as a side effect; the other broadcast and
    # the totals aggregate read them.  Removes a synchronous pre-job
    # from every scoring query (same shape, fewer scheduling barriers).
    model = (
        marked.groupBy("bucket")
        .agg(
            F.sum("cnt").alias("__r_cnt"),
            F.sum(
                F.when(F.col("__in_t").isNotNull(), F.col("cnt"))
            ).alias("__t_cnt"),
        )
        .localCheckpoint(eager=False)
    )
    target = model.filter(F.col("__t_cnt").isNotNull()).select(
        "bucket", F.col("__t_cnt").alias("cnt")
    )
    raw = model.select("bucket", F.col("__r_cnt").alias("cnt"))
    return target, raw


def dsir_log_weights(
    doc_feats: DataFrame,
    target_counts: DataFrame,
    raw_counts: DataFrame,
    buckets: int,
    id_col: str = "doc_id",
    validate: bool = True,
) -> DataFrame:
    """(id, n_feats, dsir_logw) — importance log-weight per document.

    ``dsir_logw = Σ_b cnt_b · (ln(t_b+1) − ln(T+B) − ln(r_b+1) + ln(R+B))``
    with integer Laplace-smoothed counts.  The model totals T/R ride
    INSIDE the plan as a broadcast 1-row cross of two aggregates — no
    driver collect sits in the scoring path, so the whole weighting is
    one lazy DataFrame.  Both count tables are ≤ ``buckets`` rows, so
    Spark broadcasts them regardless of corpus size.  Output rounded to
    1e-6 per the repo's ln contract.

    ``validate=True`` (default) spends one tiny action up front to
    reject an empty target/raw model with a clear error instead of a
    silent all-null score column; pipelines that already guarantee
    non-empty models can skip it.
    """
    tots = (
        target_counts.agg(F.sum("cnt").alias("__t"))
        .crossJoin(raw_counts.agg(F.sum("cnt").alias("__r")))
    )
    if validate:
        trow = tots.collect()[0]
        if (trow["__t"] or 0) <= 0 or (trow["__r"] or 0) <= 0:
            raise ValueError("target and raw models must both be non-empty")
    joined = (
        doc_feats.join(
            F.broadcast(target_counts.withColumnRenamed("cnt", "t_cnt")),
            "bucket",
            "left",
        )
        .join(
            F.broadcast(raw_counts.withColumnRenamed("cnt", "r_cnt")),
            "bucket",
            "left",
        )
        .crossJoin(F.broadcast(tots))
        .select(
            id_col,
            "cnt",
            (
                F.log(F.coalesce("t_cnt", F.lit(0)) + F.lit(1))
                - F.log((F.col("__t") + F.lit(buckets)).cast("double"))
                - F.log(F.coalesce("r_cnt", F.lit(0)) + F.lit(1))
                + F.log((F.col("__r") + F.lit(buckets)).cast("double"))
            ).alias("lr"),
        )
    )
    return joined.groupBy(id_col).agg(
        F.sum("cnt").alias("n_feats"),
        (
            F.round(F.sum(F.col("cnt") * F.col("lr")) * 1_000_000)
            / 1_000_000
        ).alias("dsir_logw"),
    )


def dsir_resample(
    weights: DataFrame,
    k: int,
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """Gumbel top-k resampling: k documents drawn WITHOUT replacement
    from the softmax of the importance log-weights — the exact
    reservoir-free distributed formulation (Vieira 2014): key =
    logw + Gumbel(0,1), take the k largest.

    The Gumbel noise is a pure function of (seed, id) via the md5
    recipe (u = (h32 + 0.5) / 2^32, g = −ln(−ln u)), so the draw is
    deterministic across runs, cluster layouts, and engines — the same
    reproducibility contract as shuffle_into_shards.  Selection is one
    TakeOrderedAndProject-shaped top-k (rank over a single ordered
    window is avoided: filter by the k-th key via a bounded sort).
    """
    from influxdb_iox_spark.pipeline.randkeys import gumbel_key

    if k < 1:
        raise ValueError("k must be >= 1")
    keyed = weights.withColumn(
        "__gkey", gumbel_key(seed, F.col(id_col), F.col("dsir_logw"))
    )
    # orderBy + limit compiles to TakeOrderedAndProject: bounded heaps
    # map-side and one k-row gather — never a global sort.
    return (
        keyed.orderBy(F.desc("__gkey"), id_col)
        .limit(k)
        .drop("__gkey")
    )
