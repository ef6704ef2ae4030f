"""N-gram language-model quality scoring — the CCNet-style filter: score
every document by a bigram LM trained on a reference ("high quality")
corpus, then gate or bucket on the score (Wenzek et al., "CCNet:
Extracting High Quality Monolingual Datasets from Web Crawl Data", 2020 —
their KenLM 5-gram perplexity; this is the same shape with a bigram
stupid-backoff model that Spark expresses exactly).

Model (pinned contract — the stock "stupid backoff" of Brants et al. 2007
with α = 0.4, simplified to bigrams):

- p(w | prev) = c(prev,w)/c(prev)          when the bigram was seen
-             = 0.4 · p₁(w)                otherwise
- p₁(w)       = c(w)/N                     when the unigram was seen
-             = 0.4 / N                    otherwise (OOV)
- the first token of a document scores p₁(w)
- score(doc)  = (Σ ln p) / T over its T tokens (empty docs are absent)

Everything is counts and divisions over integers until the final ``ln``:
both engines see bit-identical probabilities, and the per-token ln plus
the sum order contribute ≤ ~1e-13 relative drift, absorbed by the
1e-6 rounding of the reported score (the cosine-query tolerance class —
ln, unlike sqrt, is not IEEE-correctly-rounded, so bit-exactness is not
claimed; the micro-rounded value is).

Scale: training is two hash aggregates over exploded tokens (the corpus
n-gram shape); counts persist as plain parquet and SCORING is two
shuffle joins keyed by token — no model object, no driver state, no
Python.  At 100 TB the bigram table is the big side and both joins key
on it; the stopword-headed hot keys are handled by the opt-in
``salt_hot_keys`` split in ``score_documents`` (score-identical, pinned
by test; measured split in SCALE.md §LM-skew).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from influxdb_iox_spark.pipeline.text import word_tokens

ALPHA = 0.4


def train_bigram_lm(
    ref_docs: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame, int]:
    """(bigrams, unigrams, total_tokens) from the reference corpus.

    ``bigrams``: (w1, w2, c2, c1) — the context count rides along so
    scoring never joins unigrams twice.  ``unigrams``: (w, c1)."""
    toks = ref_docs.select(word_tokens(F.col(text_col)).alias("t")).filter(
        F.size("t") > 0
    )
    # uni feeds THREE consumers (the total collect below, the bigram
    # frame's context join, and the caller's unigram model side), each
    # of which would otherwise replay the corpus tokenize+explode+agg —
    # the round-16 audit plan showed the reference corpus scanned 3×.
    # One eager localCheckpoint of the vocabulary-sized frame runs the
    # tokenize once; the pairs leg below keeps its own single pass.
    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c1"))
        .localCheckpoint(eager=True)
    )
    total = uni.agg(F.sum("c1")).collect()[0][0] or 0
    pairs = toks.select(
        F.explode(
            F.zip_with(
                F.slice("t", 1, F.greatest(F.size("t") - 1, F.lit(0))),
                F.slice("t", 2, F.greatest(F.size("t") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    bi = (
        pairs.groupBy("w1", "w2")
        .agg(F.count("*").alias("c2"))
        .join(uni.select(F.col("w").alias("w1"), "c1"), "w1")
    )
    return bi, uni, int(total)


def save_lm(bi: DataFrame, uni: DataFrame, total: int, path: str) -> None:
    """Persist the model as parquet + a meta sidecar (the index recipe)."""
    import json
    import os

    bi.write.mode("overwrite").parquet(os.path.join(path, "bigrams"))
    uni.write.mode("overwrite").parquet(os.path.join(path, "unigrams"))
    with open(os.path.join(path, "_lm_meta.json"), "w") as f:
        json.dump({"kind": "bigram_sb", "alpha": ALPHA, "total": total}, f)


def load_lm(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame, int]:
    import json
    import os

    with open(os.path.join(path, "_lm_meta.json")) as f:
        meta = json.load(f)
    return (
        spark.read.parquet(os.path.join(path, "bigrams")),
        spark.read.parquet(os.path.join(path, "unigrams")),
        int(meta["total"]),
    )


def score_documents(
    docs: DataFrame,
    bigrams: DataFrame,
    unigrams: DataFrame,
    total_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt_hot_keys: int = 0,
) -> DataFrame:
    """(id, n_tokens, lm_score) per non-empty document; lm_score = mean
    ln-probability under the pinned stupid-backoff contract, rounded to
    1e-6 (see module docstring for why the rounding is part of the
    contract).  Higher = more reference-like.  An empty reference model
    (zero tokens) is an error — every probability would be ∞/NaN.

    ``salt_hot_keys=N`` (opt-in, for corpus scale where the model exceeds
    the broadcast threshold and the joins shuffle): the N
    highest-count model tokens — the stopword-headed keys that
    concentrate a natural corpus's token mass onto a handful of shuffle
    partitions — are split across N sub-keys.  Doc-side rows keyed by a
    hot token take a deterministic per-row salt; model-side hot rows are
    replicated once per salt value, so every doc row still meets exactly
    one model row and the scores are IDENTICAL with or without salting
    (pinned by test_lm.py).  Cost: ≤ N·N extra model rows."""
    if total_tokens <= 0:
        raise ValueError("reference corpus has no tokens")
    n = float(total_tokens)
    st = (
        docs.select(F.col(id_col), word_tokens(F.col(text_col)).alias("t"))
        .filter(F.size("t") > 0)
        .select(F.col(id_col), F.posexplode("t").alias("pos", "w"))
        .withColumn(
            "prev",
            F.lag("w").over(Window.partitionBy(id_col).orderBy("pos")),
        )
    )
    bi_side = bigrams.select(
        F.col("w1").alias("prev"), F.col("w2").alias("w"),
        "c2", F.col("c1").alias("c1p"),
    )
    uni_side = unigrams.select("w", F.col("c1").alias("c1w"))
    bi_keys, uni_keys = ["prev", "w"], ["w"]
    if salt_hot_keys > 0:
        s = salt_hot_keys
        # driver-bounded: exactly N short strings
        hot = F.array(*[
            F.lit(r.w)
            for r in unigrams.orderBy(F.desc("c1"), "w").limit(s).collect()
        ])
        salts = F.sequence(F.lit(0), F.lit(s - 1))
        one = F.array(F.lit(0))
        st = st.withColumn(
            "salt_p",
            F.when(
                F.array_contains(hot, F.col("prev")),
                F.pmod(F.hash(F.col(id_col), F.col("pos")), F.lit(s)),
            ).otherwise(F.lit(0)),
        ).withColumn(
            "salt_w",
            F.when(
                F.array_contains(hot, F.col("w")),
                F.pmod(F.hash(F.col(id_col), F.col("pos"), F.lit(1)), F.lit(s)),
            ).otherwise(F.lit(0)),
        )
        bi_side = bi_side.withColumn(
            "salt_p",
            F.explode(
                F.when(F.array_contains(hot, F.col("prev")), salts)
                .otherwise(one)
            ),
        )
        uni_side = uni_side.withColumn(
            "salt_w",
            F.explode(
                F.when(F.array_contains(hot, F.col("w")), salts)
                .otherwise(one)
            ),
        )
        bi_keys, uni_keys = ["prev", "w", "salt_p"], ["w", "salt_w"]
    joined = st.join(bi_side, bi_keys, "left").join(
        uni_side, uni_keys, "left"
    )
    p1 = F.when(
        F.col("c1w").isNotNull(), F.col("c1w").cast("double") / F.lit(n)
    ).otherwise(F.lit(ALPHA) / F.lit(n))
    p = (
        F.when(F.col("prev").isNull(), p1)
        .when(
            F.col("c2").isNotNull(),
            F.col("c2").cast("double") / F.col("c1p").cast("double"),
        )
        .otherwise(F.lit(ALPHA) * p1)
    )
    return (
        joined.select(F.col(id_col), F.log(p).alias("lp"))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            (
                F.round(F.sum("lp") / F.count("*") * 1_000_000) / 1_000_000
            ).alias("lm_score"),
        )
    )


def perplexity_buckets(
    scored: DataFrame,
    n_buckets: int = 3,
    score_col: str = "lm_score",
) -> DataFrame:
    """CCNet's head/middle/tail split: cut the score distribution into
    ``n_buckets`` quantile bands (bucket 1 = most reference-like; CCNet
    keeps 'head' for training, the rest for curriculum/ablation).

    Scale shape: EXACT percentile cutoffs via one distributed aggregate,
    then a comparison projection — never a global ``ntile`` window (a
    total order is one partition: the classic 100 TB bottleneck).
    Thresholds are inclusive upward (score ≥ cutoff → the better
    bucket), so ties land deterministically; bucket populations are
    equal up to ties, which is CCNet's own threshold semantics."""
    fracs = [1 - i / n_buckets for i in range(1, n_buckets)]
    arr = ", ".join(repr(f) for f in fracs)
    cuts = scored.agg(
        F.expr(f"percentile({score_col}, array({arr}))")
    ).first()[0]
    if cuts is None:  # empty input: no cutoffs, everything is bucket 1
        return scored.withColumn("bucket", F.lit(1))
    bucket = F.lit(1)
    for c in cuts:
        bucket = bucket + F.when(
            F.col(score_col) < F.lit(float(c)), 1
        ).otherwise(0)
    return scored.withColumn("bucket", bucket)
