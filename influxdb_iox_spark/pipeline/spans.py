"""Exact duplicate-substring span detection (corpus-level ExactSubstr).

The strongest form of training-data deduplication removes *substrings*
that occur more than once across the corpus, not just whole near-dup
documents (Lee et al. 2022, "Deduplicating Training Data Makes Language
Models Better" — their ExactSubstr tool builds a giant suffix array).
A suffix array is a single-machine construction; the distributed
re-expression here reaches the same spans through windows:

- every position ``p`` of every document emits its length-``k``
  character window ``text[p : p+k]``;
- a window whose exact string occurs ≥ ``min_count`` times anywhere in
  the corpus (other documents OR a repeat inside the same one) is a
  *duplicated window*;
- per document, overlapping/adjacent duplicated windows merge into
  maximal half-open spans ``[start, end)`` — exactly the regions a
  suffix-array scan with threshold ``k`` would flag, because a
  duplicated substring of length L ≥ k contains L−k+1 duplicated
  windows that chain into one island.

Spark shape (no suffix array, no all-pairs):

1. window emission is one generate-and-explode projection per doc
   (``transform(sequence(...))`` — codegen, no Python);
2. duplicate detection is ONE hash aggregate keyed by the window and
   ONE join back (both on the same key, so they share a shuffle under
   AQE); hot windows (boilerplate repeated millions of times) are
   exactly the skew AQE's skew-join split handles — and since only the
   *count* survives the aggregate, no collect_list ever materializes a
   hot window's occurrence list on one row;
3. island merge is the classic gaps-and-islands window pass, keyed by
   document — one doc-keyed exchange shared by both window functions.

At 100 TB: stride-1 emission is ~bytes×1 rows of (key, doc, pos) —
the honest cost of exact-substring semantics (the suffix array pays the
same ×8 in RAM).  ``stride > 1`` keeps ~1/stride of the windows via
**content-defined sampling**: a window is emitted iff the hash of its
opening 8 chars ≡ 0 (mod stride), so the *same substring content*
selects the same windows at any byte offset — unlike offset-strided
sampling, which silently misses every duplicate pair whose alignments
disagree mod stride.  Cost of sampling: span edges coarsen by the gap
to the nearest selected anchor (~stride chars expected), and a
duplicated region so short it contains no selected anchor is missed —
the usual winnowing trade.  ``key="hash"`` shuffles an 8-byte xxhash64 instead of the
k-char string (collision odds ~n²/2⁶⁵ — at 10¹² windows that is ~3%
chance of ONE false duplicated window corpus-wide, which the span
merge then inflates by at most k chars); the gate uses the exact
string so the DuckDB oracle is engine-portable.

Offsets are in the engine's native string units — JVM UTF-16 code
units — which equal Unicode codepoints (and DuckDB's length/substring
units) for all BMP text including CJK; only astral-plane characters
(emoji) shift offsets between engines, and never within Spark itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def window_occurrences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 40,
    stride: int = 1,
    key: str = "text",
) -> DataFrame:
    """(id, pos, win) for length-``k`` windows.

    ``stride=1`` emits every position.  ``stride>1`` keeps ~1/stride of
    them by a content-defined rule — window at ``p`` is emitted iff
    ``xxhash64(text[p:p+8]) % stride == 0`` — so identical content
    selects identical windows regardless of byte offset (offset-strided
    sampling would miss duplicates whose alignments differ mod stride).

    ``win`` is the window's join key: the exact substring when
    ``key="text"`` (engine-portable, collision-free), its xxhash64 when
    ``key="hash"`` (8-byte shuffle rows for corpus scale).  Documents
    shorter than ``k`` emit nothing (they cannot contain a duplicated
    substring of length ``k``).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if stride < 1:
        raise ValueError("stride must be >= 1")
    if key not in ("text", "hash"):
        raise ValueError("key must be 'text' or 'hash'")
    # Window emission fans out ~1 row per character: Spark sizes scan
    # partitions by INPUT bytes and cannot see that, so a compact corpus
    # file explodes inside too few tasks (measured: the whole sf1
    # pipeline on 2 tasks; 110 s → 11 s after re-keying).  Same guard as
    # pipeline/dedup.minhash: widen only when the scan is narrower than
    # the cluster — a real corpus with thousands of input splits never
    # pays this shuffle.
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        df = df.repartition(sc.defaultParallelism, F.col(id_col))
    # Explode a plain int sequence, THEN cut the substring with the
    # three-arg codegen substring — never substring inside a transform()
    # lambda: higher-order functions run interpreted, and the lambda
    # formulation measured 24 s where this one measures 0.4 s for the
    # same 15M windows at sf1 (the text.gram_structs lesson again).
    out = (
        df.filter(F.length(text_col) >= k)
        .select(
            F.col(id_col),
            F.col(text_col),
            F.explode(
                F.sequence(F.lit(0), F.length(text_col) - k)
            ).alias("pos"),
        )
        .select(
            F.col(id_col),
            F.col("pos").cast("long").alias("pos"),
            F.expr(f"substring({text_col}, pos + 1, {k})").alias("win"),
        )
    )
    if stride > 1:
        anchor = F.substring(F.col("win"), 1, min(k, 8))
        out = out.filter(F.pmod(F.xxhash64(anchor), F.lit(stride)) == 0)
    if key == "hash":
        out = out.withColumn("win", F.xxhash64("win"))
    return out


def duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 40,
    stride: int = 1,
    min_count: int = 2,
    key: str = "text",
) -> DataFrame:
    """Maximal duplicated-substring spans per document.

    Returns (id, span_start, span_end) with half-open character offsets,
    one row per maximal region covered by windows whose exact content
    occurs ≥ ``min_count`` times in the corpus (across documents or
    repeated within one).  These are the regions ExactSubstr dedup would
    cut; feed them to :func:`duplicate_span_stats` for per-doc fractions
    or to a removal rewrite.
    """
    if min_count < 2:
        raise ValueError("min_count must be >= 2 (1 marks everything)")
    wins = window_occurrences(
        df, id_col=id_col, text_col=text_col, k=k, stride=stride, key=key
    )
    # Occurrence counts as ONE window function over the win-keyed
    # exchange instead of a count aggregate + join back (round-16
    # optimization): the join shape evaluated the per-character window
    # fan-out TWICE (once under the aggregate, once as the join's left
    # side) and paid two exchanges; this shape evaluates it once and
    # shuffles it once (measured 2.20 s → 0.71 s at sf0.1, identical
    # rows).  Scale note: a window content occurring k times now lands
    # its k rows in one window-function group, which AQE cannot split
    # the way it splits a skewed join partition — but the join shape
    # emitted those same k rows through the join anyway, so the
    # per-task ceiling only moves for corpora with a single
    # pathological boilerplate window; `stride`/`key="hash"` are the
    # documented knobs there.
    dup = wins.withColumn(
        "__n", F.count("*").over(Window.partitionBy("win"))
    ).filter(F.col("__n") >= min_count)
    # Gaps-and-islands: a window starting at pos extends the current
    # island iff pos <= running max of (pos + k) over earlier windows.
    w_doc = Window.partitionBy(id_col).orderBy("pos")
    run_end = F.max(F.col("pos") + F.lit(k)).over(
        w_doc.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = dup.select(
        F.col(id_col),
        "pos",
        F.when(F.col("pos") > F.coalesce(run_end, F.lit(-1)), 1)
        .otherwise(0)
        .alias("__new"),
    ).withColumn(
        "__island",
        F.sum("__new").over(
            w_doc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return islands.groupBy(id_col, "__island").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + F.lit(k)).alias("span_end"),
    ).select(id_col, "span_start", "span_end")


def duplicate_span_stats(
    df: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document duplicated-character totals from merged spans:
    (id, n_chars, dup_chars, dup_frac).  Documents with no spans report
    zero (left join), so the output is a full-corpus quality column.
    dup_frac is exact micro-units-over-length done in one double divide
    (both engines correctly-rounded on the same integers)."""
    agg = spans.groupBy(id_col).agg(
        F.sum(F.col("span_end") - F.col("span_start")).alias("dup_chars")
    )
    return (
        df.select(F.col(id_col), F.length(text_col).cast("long").alias("n_chars"))
        .join(agg, id_col, "left")
        .select(
            id_col,
            "n_chars",
            F.coalesce("dup_chars", F.lit(0)).cast("long").alias("dup_chars"),
            (
                F.coalesce("dup_chars", F.lit(0)).cast("double")
                / F.col("n_chars").cast("double")
            ).alias("dup_frac"),
        )
    )


def remove_duplicate_spans(
    df: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_first: bool = True,
) -> DataFrame:
    """Rewrite each document with its duplicated spans cut out (the
    ExactSubstr removal step).  ``keep_first`` retains the corpus-wide
    FIRST occurrence of each span's full text (ordered by id, then
    position) so one copy survives — without it every copy of a
    duplicated region is removed, like the reference tool's default.

    The splice is per-document: collect that doc's spans into one array
    (bounded by the doc's own length / k) and fold the keep-regions via
    aggregate() — codegen, no Python.  Documents without spans pass
    through untouched.
    """
    marked = spans
    if keep_first:
        first = Window.partitionBy("__span_md5").orderBy(id_col, "span_start")
        # The "same span" identity for keep-first is the md5 of the
        # span's full text (the repo-wide md5-identity convention, same
        # as exact dedup) — grouping by the digest instead of the raw
        # substring means the ranking exchange and its sort buffers
        # carry 32-char digests, not arbitrarily long span bytes.
        # Partitioning by the raw span_text OOM'd a 48 g heap at the
        # 500k-doc scale probe; recomputing the text via a join against
        # the docs keeps this function self-contained.
        marked = (
            spans.join(df.select(id_col, text_col), id_col)
            .withColumn(
                "__span_md5",
                F.md5(
                    F.expr(
                        f"substring({text_col}, span_start + 1, "
                        f"span_end - span_start)"
                    )
                ),
            )
            .select(id_col, "span_start", "span_end", "__span_md5")
            .withColumn("__rk", F.row_number().over(first))
            .filter(F.col("__rk") > 1)
            .select(id_col, "span_start", "span_end")
        )
    per_doc = marked.groupBy(id_col).agg(
        F.sort_array(
            F.collect_list(F.struct("span_start", "span_end"))
        ).alias("__spans")
    )
    # Fold keep-regions: walk spans left→right, appending the text
    # between the previous span's end and this span's start.
    splice = (
        "aggregate(__spans, struct(0L AS cur, '' AS acc), "
        "(s, sp) -> struct(CAST(sp.span_end AS LONG) AS cur, "
        f"concat(s.acc, substring({text_col}, s.cur + 1, "
        "sp.span_start - s.cur)) AS acc), "
        f"s -> concat(s.acc, substring({text_col}, s.cur + 1, "
        f"length({text_col}) - s.cur)))"
    )
    return (
        df.join(per_doc, id_col, "left")
        .withColumn(
            text_col,
            F.when(F.col("__spans").isNull(), F.col(text_col)).otherwise(
                F.expr(splice)
            ),
        )
        .drop("__spans")
    )
