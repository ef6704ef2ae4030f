"""Segment-level (paragraph / word-window) exact dedup.

Covers both segmentation modes, first-occurrence-wins ordering across and
within documents, whole-document vanishing, and reassembly order."""

from __future__ import annotations

import pytest

from influxdb_iox_spark.pipeline.paragraph import (
    dedup_segments,
    first_occurrences,
    segment_documents,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_delimiter_segmentation(spark):
    df = _docs(spark, [(1, "alpha\n\nbeta\n\n\n\ngamma")])
    segs = segment_documents(df, delimiter="\n\n").collect()
    # the empty middle segment is dropped but indexes are preserved
    assert [(r.seg_idx, r.segment) for r in sorted(segs)] == [
        (0, "alpha"),
        (1, "beta"),
        (3, "gamma"),
    ]


def test_word_window_segmentation(spark):
    df = _docs(spark, [(1, "a b c d e"), (2, "x")])
    segs = segment_documents(df, words_per_segment=2)
    got = {(r.doc_id, r.seg_idx): r.segment for r in segs.collect()}
    assert got == {
        (1, 0): "a b",
        (1, 1): "c d",
        (1, 2): "e",
        (2, 0): "x",
    }


def test_segmentation_mode_validation(spark):
    df = _docs(spark, [(1, "a")])
    with pytest.raises(ValueError):
        segment_documents(df)
    with pytest.raises(ValueError):
        segment_documents(df, delimiter="\n", words_per_segment=3)
    with pytest.raises(ValueError):
        segment_documents(df, words_per_segment=0)


def test_first_occurrence_across_docs(spark):
    df = _docs(
        spark,
        [
            (1, "intro\n\nshared boilerplate\n\nbody one"),
            (2, "shared boilerplate\n\nbody two"),
        ],
    )
    segs = segment_documents(df, delimiter="\n\n")
    kept = first_occurrences(segs).collect()
    by_seg = {r.segment: (r.doc_id, r.seg_idx) for r in kept}
    # doc 1 saw the boilerplate first (lower doc id)
    assert by_seg["shared boilerplate"] == (1, 1)
    assert by_seg["body two"] == (2, 1)
    assert len(kept) == 4


def test_first_occurrence_within_doc(spark):
    df = _docs(spark, [(7, "dup\n\nmiddle\n\ndup")])
    kept = first_occurrences(segment_documents(df, delimiter="\n\n"))
    assert sorted((r.seg_idx, r.segment) for r in kept.collect()) == [
        (0, "dup"),
        (1, "middle"),
    ]


def test_dedup_segments_reassembly_and_vanish(spark):
    df = _docs(
        spark,
        [
            (1, "license header\n\nreal content"),
            (2, "license header\n\nother content"),
            (3, "license header"),  # fully boilerplate -> vanishes
        ],
    )
    out = {
        r.doc_id: r
        for r in dedup_segments(df, delimiter="\n\n").collect()
    }
    assert set(out) == {1, 2}
    assert out[1].text == "license header\n\nreal content"
    assert (out[1].n_segments, out[1].segments_kept) == (2, 2)
    assert out[2].text == "other content"
    assert (out[2].n_segments, out[2].segments_kept) == (2, 1)


def test_dedup_segments_word_window_order(spark):
    # surviving segments rejoin in original order even when an interior
    # window is removed
    df = _docs(
        spark,
        [
            (1, "a b c d"),
            (2, "z z a b e f"),  # "a b" removed (doc 1 owns it)
        ],
    )
    out = {
        r.doc_id: r.text
        for r in dedup_segments(df, words_per_segment=2).collect()
    }
    assert out[1] == "a b c d"
    assert out[2] == "z z e f"


def test_dedup_segments_codegen_only(spark):
    """The segmentation + dedup plan must stay JVM-side: no Python eval
    nodes (BatchEvalPython / ArrowEvalPython / mapInPandas)."""
    df = _docs(spark, [(1, "a b c d"), (2, "a b x y")])
    plan = dedup_segments(df, words_per_segment=2)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "InPandas" not in plan
