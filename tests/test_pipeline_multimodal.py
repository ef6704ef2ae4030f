"""Multimodal plumbing tests: schema, Arrow batch shapes, metadata-only
projection, fake decoders, real-decoder stub."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from influxdb_iox_spark.pipeline.multimodal import (
    decode_images,
    docs_to_media,
    filter_by_metadata,
    sample_video_frames,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    return docs_to_media(docs).cache()


def test_media_schema(media):
    assert dict(media.dtypes)["blob"] == "binary"
    assert media.count() == 50


def test_decode_images_fake(media):
    out = decode_images(media, decoder="fake", embed_dim=16)
    rows = out.collect()
    assert len(rows) == 50
    r = rows[0]
    assert 16 <= r.width < 80 and 16 <= r.height < 80
    assert len(r.embedding) == 16
    # deterministic: same blob → same embedding
    again = decode_images(media, decoder="fake", embed_dim=16).collect()
    assert {x.media_id: x.embedding for x in again} == {
        x.media_id: x.embedding for x in rows
    }


def test_decode_images_real_stub(media):
    with pytest.raises(Exception) as ei:
        decode_images(media.limit(1), decoder="real").collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_sample_video_frames(media):
    frames = sample_video_frames(media.limit(3), every_ms=500)
    rows = frames.collect()
    assert all(r.ts_ms % 500 == 0 for r in rows)
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.media_id, []).append(r.frame_idx)
    for idxs in per_doc.values():
        assert sorted(idxs) == list(range(len(idxs)))


def test_metadata_only_projection_skips_blob(media, spark, tmp_path):
    # write to parquet, re-read, and check blob is pruned from the scan
    p = str(tmp_path / "media")
    media.write.parquet(p)
    df = spark.read.parquet(p)
    plan = filter_by_metadata(df, min_width=100)._jdf.queryExecution().executedPlan().toString()
    assert "blob" not in plan.split("ReadSchema")[-1]
