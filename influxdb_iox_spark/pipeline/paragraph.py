"""Segment-level exact deduplication (paragraph / fixed word-window).

Training-corpus pipelines remove *repeated spans* at a granularity finer
than whole documents: boilerplate paragraphs, license headers, navigation
chrome, templated sentences (CCNet's paragraph hashing; RefinedWeb's
repeated-span removal).  This module implements that as three composable
DataFrame transforms:

  segment_documents   doc rows -> (id, seg_idx, segment) rows
  first_occurrences   keep each distinct segment's first (id, seg_idx)
  dedup_segments      end-to-end: segment -> first-occurrence -> reassemble

Two segmentation modes:
  - ``delimiter=...``        split on a literal delimiter (paragraphs via
                             "\\n\\n", lines via "\\n", sentences via ". ")
  - ``words_per_segment=N``  fixed N-word windows — the fallback for text
                             with no structural delimiters, and the form a
                             sharded 100 TB corpus can apply uniformly.

Scale design:
- Segmentation is pure whole-stage-codegen column work (split / sequence /
  slice / array_join) — zero Python per row.
- First-occurrence-wins is ONE hash aggregate on md5(segment), a 128-bit
  near-unique shuffle key that distributes evenly at any corpus size
  (min-struct aggregate carrying the text via any_value — no window, no
  sort, no join-back).
- Reassembly is one groupBy on the document id with an in-group
  array_sort — no global sort.

The reference engine has no text pipeline; this is part of the
beyond-reference LLM-data surface (SURVEY §6).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F


def segment_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    delimiter: str | None = None,
    words_per_segment: int | None = None,
) -> DataFrame:
    """Explode documents into ``(id_col, seg_idx, segment)`` rows.

    Exactly one of ``delimiter`` / ``words_per_segment`` must be given.
    Empty / whitespace-only segments are dropped (their indexes are not
    reused: ``seg_idx`` is the position in the original split, so
    reassembly preserves relative order).
    """
    if (delimiter is None) == (words_per_segment is None):
        raise ValueError("pass exactly one of delimiter / words_per_segment")
    if delimiter is not None:
        segs = F.split(F.col(text_col), re.escape(delimiter), -1)
        out = df.select(
            F.col(id_col), F.posexplode(segs).alias("seg_idx", "segment")
        )
        return out.filter(F.trim(F.col("segment")) != "")
    w = int(words_per_segment)
    if w <= 0:
        raise ValueError("words_per_segment must be positive")
    # Two-step projection + explode-an-index-sequence, NEVER an
    # index-lambda over sequence() (round-17 fix): the previous
    # ``transform(sequence(...), i -> array_join(slice(toks, ...)))``
    # inlined the token split into the lambda body, re-splitting the
    # document once PER SEGMENT — O(words²/w), the text.gram_structs
    # trap this repo's own verify recipe warns about.  Materializing
    # the token array as its own attribute (referenced twice, so
    # CollapseProject keeps it) and slicing AFTER the explode keeps
    # segmentation linear and fully codegen.
    toks = F.split(F.col(text_col), " ", -1)
    base = df.select(F.col(id_col), toks.alias("__t")).select(
        F.col(id_col),
        F.col("__t"),
        F.ceil(F.size("__t") / F.lit(w)).cast("int").alias("__n"),
    )
    ex = base.select(
        F.col(id_col),
        F.col("__t"),
        F.posexplode(
            F.sequence(
                F.lit(0), F.greatest(F.col("__n"), F.lit(1)) - F.lit(1)
            )
        ).alias("seg_idx", "__i"),
    )
    out = ex.select(
        F.col(id_col),
        F.col("seg_idx"),
        F.array_join(
            F.slice(F.col("__t"), F.col("__i") * w + 1, F.lit(w)), " "
        ).alias("segment"),
    )
    return out.filter(F.trim(F.col("segment")) != "")


def first_occurrences(
    segments: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Keep, for each distinct segment text, its first occurrence —
    ordered by ``(id_col, seg_idx)`` — as ``(id_col, seg_idx, segment)``.

    ONE hash aggregate on the segment digest: the min-struct carries the
    winning position and ``any_value(segment)`` carries the text (every
    row in a digest group shares it), so no join-back is needed.  Hot
    segments (a boilerplate paragraph repeated a billion times) cost one
    map-side-combined group, not a skewed sort; the digest keeps the
    shuffle key 16 bytes regardless of paragraph length.
    """
    with_h = segments.withColumn("__h", F.md5(F.col("segment")))
    winners = with_h.groupBy("__h").agg(
        F.min(F.struct(F.col(id_col), F.col("seg_idx"))).alias("__w"),
        F.any_value(F.col("segment")).alias("segment"),
    )
    return winners.select(
        F.col(f"__w.{id_col}").alias(id_col),
        F.col("__w.seg_idx").alias("seg_idx"),
        F.col("segment"),
    )


def reassemble_segments(
    kept: DataFrame, id_col: str = "doc_id", sep: str = " "
) -> DataFrame:
    """Rebuild one row per document from surviving ``(id, seg_idx,
    segment)`` rows: ``(id_col, segments_kept, text)`` with segments in
    original relative order.  One groupBy on the document id with an
    in-group array_sort — no global sort."""
    return kept.groupBy(id_col).agg(
        F.count("*").alias("segments_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("seg_idx", "segment"))
                ),
                lambda s: s["segment"],
            ),
            sep,
        ).alias("text"),
    )


def dedup_segments(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    delimiter: str | None = None,
    words_per_segment: int | None = None,
) -> DataFrame:
    """Corpus-wide segment dedup: returns one row per surviving document —
    ``(id_col, n_segments, segments_kept, text)`` where ``text`` is the
    document reassembled from only its first-occurrence segments (original
    relative order, joined by the delimiter or a single space).

    Documents whose every segment already appeared earlier vanish from the
    output (fully-boilerplate pages), matching the filtering pipelines
    apply before training.
    """
    sep = delimiter if delimiter is not None else " "
    segs = segment_documents(
        df,
        text_col,
        id_col,
        delimiter=delimiter,
        words_per_segment=words_per_segment,
    )
    totals = segs.groupBy(id_col).agg(F.count("*").alias("n_segments"))
    kept = first_occurrences(segs, id_col)
    rebuilt = reassemble_segments(kept, id_col, sep).withColumnRenamed(
        "text", text_col
    )
    return rebuilt.join(totals, on=id_col).select(
        id_col, "n_segments", "segments_kept", text_col
    )
