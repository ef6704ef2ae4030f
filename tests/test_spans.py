"""Exact duplicate-substring span detection (pipeline/spans.py).

Checked against a brute-force pure-Python oracle: enumerate every
length-k window, count exact occurrences corpus-wide, merge overlapping
duplicated windows into maximal spans.
"""

from __future__ import annotations

import pytest

from influxdb_iox_spark.pipeline.spans import (
    duplicate_span_stats,
    duplicate_spans,
    remove_duplicate_spans,
    window_occurrences,
)


def _brute_spans(docs: dict[int, str], k: int, min_count: int = 2):
    from collections import Counter

    counts: Counter[str] = Counter()
    for t in docs.values():
        for p in range(len(t) - k + 1):
            counts[t[p : p + k]] += 1
    spans: dict[int, list[tuple[int, int]]] = {}
    for i, t in docs.items():
        cur: list[tuple[int, int]] = []
        for p in range(len(t) - k + 1):
            if counts[t[p : p + k]] >= min_count:
                if cur and p <= cur[-1][1]:
                    cur[-1] = (cur[-1][0], p + k)
                else:
                    cur.append((p, p + k))
        if cur:
            spans[i] = cur
    return spans


def _spark_spans(spark, docs: dict[int, str], k: int, **kw):
    df = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "doc_id long, text string"
    )
    rows = duplicate_spans(df, k=k, **kw).collect()
    out: dict[int, list[tuple[int, int]]] = {}
    for r in sorted(rows, key=lambda r: (r.doc_id, r.span_start)):
        out.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    return out


DOCS = {
    1: "the quick brown fox jumps over the lazy dog near the river bank",
    2: "something else entirely; the quick brown fox jumps over a fence",
    3: "no shared content in this one at all, purely unique characters xyz",
    # Within-doc repetition: the same 20-char phrase twice.
    4: "ABCDEFGHIJKLMNOPQRST---padding---ABCDEFGHIJKLMNOPQRST",
    5: "shor",  # shorter than k: must emit nothing
}


def test_matches_brute_force_cross_and_within_doc(spark):
    k = 16
    assert _spark_spans(spark, DOCS, k) == _brute_spans(DOCS, k)


def test_hash_key_agrees_with_text_key(spark):
    k = 16
    assert _spark_spans(spark, DOCS, k, key="hash") == _spark_spans(
        spark, DOCS, k, key="text"
    )


def test_adjacent_windows_merge_into_one_maximal_span(spark):
    # One shared 30-char region -> 30-16+1 duplicated windows -> ONE span.
    shared = "0123456789abcdefghijklmnopqrs!"
    docs = {1: "xx" + shared + "yy", 2: "zzzz" + shared + "qq"}
    got = _spark_spans(spark, docs, 16)
    assert got == {1: [(2, 2 + 30)], 2: [(4, 4 + 30)]}


def test_content_defined_stride_is_alignment_invariant(spark):
    # The shared region sits at DIFFERENT offsets (2 vs 4, not congruent
    # mod 3): offset-strided sampling would emit disjoint window phases
    # and find nothing; content-defined sampling selects the same
    # windows of the shared content in both docs.
    shared = "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJ"
    docs = {1: "xx" + shared + "yy", 2: "zzzz" + shared + "qq"}
    got = _spark_spans(spark, docs, 16, stride=3)
    for i, true_start in ((1, 2), (2, 4)):
        assert len(got.get(i, [])) == 1, f"doc {i}: {got}"
        (s, e) = got[i][0]
        # Edges coarsen by at most the gap to the nearest selected
        # anchor; the span must stay inside the true region and cover
        # most of it.
        assert true_start <= s <= true_start + 8
        assert true_start + len(shared) - 8 <= e <= true_start + len(shared)


def test_stats_and_removal(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in DOCS.items()], "doc_id long, text string"
    )
    spans = duplicate_spans(df, k=16)
    stats = {
        r.doc_id: (r.n_chars, r.dup_chars, r.dup_frac)
        for r in duplicate_span_stats(df, spans).collect()
    }
    assert set(stats) == set(DOCS)
    assert stats[3][1] == 0 and stats[3][2] == 0.0
    assert stats[5][1] == 0
    brute = _brute_spans(DOCS, 16)
    for i, sp in brute.items():
        assert stats[i][1] == sum(e - s for s, e in sp)

    # Removal with keep_first: the first occurrence (by doc_id) survives.
    out = {
        r.doc_id: r.text
        for r in remove_duplicate_spans(df, spans).collect()
    }
    assert out[3] == DOCS[3] and out[5] == DOCS[5]
    shared = "the quick brown fox jumps over"
    assert shared in out[1]          # first occurrence kept
    assert shared not in out[2]      # later copy cut
    # Without keep_first every copy goes.
    out_all = {
        r.doc_id: r.text
        for r in remove_duplicate_spans(df, spans, keep_first=False).collect()
    }
    assert shared not in out_all[1] and shared not in out_all[2]


def test_validation(spark):
    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    with pytest.raises(ValueError):
        duplicate_spans(df, k=0)
    with pytest.raises(ValueError):
        duplicate_spans(df, k=4, min_count=1)
    with pytest.raises(ValueError):
        window_occurrences(df, k=4, stride=0)
    with pytest.raises(ValueError):
        window_occurrences(df, k=4, key="nope")


def test_randomized_corpora_match_brute_force(spark):
    """Seeded-random sweep (hypothesis-style, batched to keep Spark round
    trips bounded): dense-duplicate corpora over a 3-char alphabet with
    k=8 exercise within-doc repeats, overlap chains, and edge merges far
    harder than the hand fixtures."""
    import random

    for seed in (0, 1, 2, 3, 4, 5):
        rng = random.Random(seed)
        docs = {
            i: "".join(rng.choice("ab ") for _ in range(rng.randrange(0, 60)))
            for i in range(1, rng.randrange(4, 12))
        }
        k = rng.choice([4, 8])
        assert _spark_spans(spark, docs, k) == _brute_spans(docs, k), (
            f"seed={seed} k={k} docs={docs}"
        )
