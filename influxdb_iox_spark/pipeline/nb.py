"""Multinomial Naive Bayes document classifier — the counts-based
quality/language filter of the LLM-data-pipeline toolbox (GPT-3's
quality filter is a linear classifier over text features; multinomial
NB is its closed-form counts twin: train = two hash aggregates, score =
one token-keyed join — no gradients, no Python, no model broadcast, and
integer-exact until the final ``ln``).

Model (pinned contract — multinomial NB, Laplace smoothing α = 1):

- p(label)      = docs(label) / docs_total            (non-empty docs)
- p(w | label)  = (c(w, label) + 1) / (tokens(label) + V)
  with V = |distinct training vocabulary| (all labels pooled)
- score(doc, l) = ln p(l) + Σ over the doc's tokens of ln p(w | l),
  reported 1e-6-rounded.  Every probability is a ratio of integers —
  bit-identical cross-engine (the pipeline/lm.py contract class); only
  the final ln and sum order carry ≤ ~1e-13 relative drift, absorbed by
  the rounding.  Unseen words score via the smoothing mass
  1/(tokens(l)+V); empty documents are absent from training priors and
  from the output alike.
- EVERY (doc, label) pair is emitted, labels in sorted order.  Argmax is
  left to the caller: tie policy stays the caller's, and a correctness
  gate can hash every score instead of trusting a float argmax straddle.

Scale: training is two hash aggregates over exploded tokens (the corpus
n-gram shape).  Scoring joins the token stream ONCE against the
label-pivoted count table — L count columns ride the join (L = #labels,
small), so cost does not multiply by L the way a tokens×labels cross
join would — then one hash aggregate per document.  The pivoted count
table is a join side like any other at 100 TB; its key distribution is
the LM module's (stopword-headed keys — reuse that salting recipe if
the skew-join split shows up).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from influxdb_iox_spark.pipeline.text import word_tokens


def train_nb(
    ref_docs: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame, int]:
    """(word_counts, label_stats, vocab_size) from a labeled corpus.

    ``word_counts``: (label, w, c).  ``label_stats``: (label, n_docs,
    n_tokens) over non-empty documents.  ``vocab_size``: distinct
    training vocabulary across all labels (the Laplace V)."""
    # ONE tokenize pass for the whole model (round-16 optimization —
    # the previous shape re-tokenized the corpus three times: word
    # counts, label stats, and the eager vocabulary count each replayed
    # the explode).  posexplode marks each non-empty document exactly
    # once (pos == 0), so the single (label, w) aggregate carries both
    # the tf counts and a document-marker sum whose per-label total is
    # n_docs; n_tokens is the per-label sum of tf.  Empty documents
    # vanish at the explode (empty array → no rows), preserving the
    # documented non-empty-documents semantics.  The aggregate is
    # vocabulary-sized, so the checkpoint is tiny; blocks are keyed to
    # this RDD object (repeated invocations recompute — no cross-run
    # result reuse).
    agg = (
        ref_docs.select(
            F.col(label_col).alias("label"),
            word_tokens(F.col(text_col)).alias("t"),
        )
        .select("label", F.posexplode("t").alias("pos", "w"))
        .groupBy("label", "w")
        .agg(
            F.count("*").alias("c"),
            F.sum(F.when(F.col("pos") == 0, 1).otherwise(0)).alias("__d0"),
        )
        .localCheckpoint(eager=True)
    )
    word_counts = agg.select("label", "w", "c")
    label_stats = agg.groupBy("label").agg(
        F.sum("__d0").alias("n_docs"),
        F.sum("c").alias("n_tokens"),
    )
    vocab_size = agg.select("w").distinct().count()
    return word_counts, label_stats, int(vocab_size)


def save_nb(
    word_counts: DataFrame,
    label_stats: DataFrame,
    vocab_size: int,
    path: str,
) -> None:
    """Persist the model as parquet + a meta sidecar (the lm.py recipe).
    Train once, save, score many — scoring from a LOADED model reads two
    small parquet tables instead of re-running the training aggregates
    through lazy lineage on every action."""
    import json
    import os

    word_counts.write.mode("overwrite").parquet(
        os.path.join(path, "word_counts")
    )
    label_stats.write.mode("overwrite").parquet(
        os.path.join(path, "label_stats")
    )
    with open(os.path.join(path, "_nb_meta.json"), "w") as f:
        json.dump({"kind": "multinomial_nb", "alpha": 1, "vocab_size": vocab_size}, f)


def load_nb(spark, path: str) -> tuple[DataFrame, DataFrame, int]:
    import json
    import os

    with open(os.path.join(path, "_nb_meta.json")) as f:
        meta = json.load(f)
    return (
        spark.read.parquet(os.path.join(path, "word_counts")),
        spark.read.parquet(os.path.join(path, "label_stats")),
        int(meta["vocab_size"]),
    )


def score_nb(
    docs: DataFrame,
    word_counts: DataFrame,
    label_stats: DataFrame,
    vocab_size: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, label, nb_score) for every non-empty document × every
    training label; ``nb_score`` is the 1e-6-rounded joint
    log-likelihood (see module docstring for the pinned contract)."""
    if vocab_size <= 0:
        raise ValueError("empty training vocabulary")
    # driver-bounded: one row per label
    stats = sorted(label_stats.collect(), key=lambda r: r.label)
    if not stats:
        raise ValueError("no training labels")
    labels = [r.label for r in stats]
    total_docs = sum(r.n_docs for r in stats)
    # pivot to one row per vocab word with L count columns (positional
    # aliases: label strings are data, not safe column names)
    pivoted = (
        word_counts.groupBy("w")
        .pivot("label", labels)
        .agg(F.first("c"))
        .select(
            "w",
            *[F.col(f"`{l}`").alias(f"__c_{i}") for i, l in enumerate(labels)],
        )
    )
    st = (
        docs.select(F.col(id_col), word_tokens(F.col(text_col)).alias("t"))
        .filter(F.size("t") > 0)
        .select(F.col(id_col), F.explode("t").alias("w"))
    )
    joined = st.join(pivoted, "w", "left")
    aggs = []
    for i, r in enumerate(stats):
        denom = float(r.n_tokens + vocab_size)
        aggs.append(
            F.sum(
                F.log(
                    (F.coalesce(F.col(f"__c_{i}"), F.lit(0)) + F.lit(1))
                    .cast("double")
                    / F.lit(denom)
                )
            ).alias(f"__s_{i}")
        )
    per_doc = joined.groupBy(id_col).agg(*aggs)
    pairs = [
        F.struct(
            F.lit(r.label).alias("label"),
            (
                F.round(
                    (
                        F.col(f"__s_{i}")
                        + F.log(
                            F.lit(float(r.n_docs)) / F.lit(float(total_docs))
                        )
                    )
                    * 1_000_000
                )
                / 1_000_000
            ).alias("nb_score"),
        )
        for i, r in enumerate(stats)
    ]
    return per_doc.select(
        F.col(id_col), F.explode(F.array(*pairs)).alias("p")
    ).select(id_col, "p.label", "p.nb_score")
