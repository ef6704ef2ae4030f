"""Incremental segment (repeated-span) index: build → scrub → append.

Scenario mirrors a continuous-ingest pipeline: batch 1 seeds the index,
batch 2 arrives with boilerplate from batch 1 plus new content, batch 3
must also see batch 2's accepted segments."""

from __future__ import annotations

import pytest

from influxdb_iox_spark.pipeline.dedup_index import (
    append_segments_to_index,
    build_segment_index,
    ingest_segments_batch,
    scrub_against_segment_index,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.fixture()
def seeded(spark, tmp_path):
    path = str(tmp_path / "segidx")
    batch1 = _docs(
        spark,
        [
            (1, "license header text\n\nunique body one"),
            (2, "other content here\n\nunique body two"),
        ],
    )
    build_segment_index(batch1, path, n_buckets=4, delimiter="\n\n")
    return path


def test_scrub_removes_indexed_and_intra_batch_spans(spark, seeded):
    batch2 = _docs(
        spark,
        [
            (10, "license header text\n\nfresh paragraph"),
            (11, "fresh paragraph\n\nanother fresh one"),
            (12, "license header text\n\nunique body two"),  # all boilerplate
        ],
    )
    out = {
        r.doc_id: r
        for r in scrub_against_segment_index(spark, seeded, batch2).collect()
    }
    # doc 10 keeps only its fresh paragraph
    assert out[10].text == "fresh paragraph"
    assert (out[10].n_segments, out[10].segments_kept) == (2, 1)
    # doc 11's "fresh paragraph" lost intra-batch to doc 10 (lower id)
    assert out[11].text == "another fresh one"
    # doc 12 was pure boilerplate and vanished
    assert 12 not in out


def test_append_makes_batch_segments_visible(spark, seeded):
    batch2 = _docs(spark, [(10, "brand new span\n\nlicense header text")])
    accepted = ingest_segments_batch(spark, seeded, batch2)
    assert accepted.collect()[0].text == "brand new span"
    # batch 3 repeating batch-2 content is now boilerplate too
    batch3 = _docs(spark, [(20, "brand new span\n\nstill newer span")])
    out = scrub_against_segment_index(spark, seeded, batch3).collect()
    assert out[0].text == "still newer span"


def test_word_window_mode_round_trips_through_meta(spark, tmp_path):
    path = str(tmp_path / "segidx_w")
    build_segment_index(
        _docs(spark, [(1, "a b c d")]), path, n_buckets=2, words_per_segment=2
    )
    # meta carries words_per_segment: batch segments identically
    out = scrub_against_segment_index(
        spark, path, _docs(spark, [(2, "a b x y")])
    ).collect()
    assert out[0].text == "x y"
    assert (out[0].n_segments, out[0].segments_kept) == (2, 1)


def test_index_scan_reads_digests_only(spark, seeded):
    """The anti-join must read segment_hash from the index — never the
    canonical columns, and the index stores no text at all."""
    batch = _docs(spark, [(10, "whatever\n\nlicense header text")])
    df = scrub_against_segment_index(spark, seeded, batch)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
    # the index side's scan projects only the digest
    import re

    idx_scans = [
        s
        for s in re.findall(r"FileScan parquet \[[^\]]*\][^\n]*", plan)
        if "segment_hash" in s
    ]
    assert idx_scans and all("canonical_id" not in s for s in idx_scans)


def test_append_never_rewrites_existing_files(spark, seeded, tmp_path):
    import glob

    before = set(glob.glob(f"{seeded}/**/*.parquet", recursive=True))
    append_segments_to_index(
        spark, seeded, _docs(spark, [(30, "totally new span")])
    )
    after = set(glob.glob(f"{seeded}/**/*.parquet", recursive=True))
    assert before <= after and len(after) > len(before)
