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


def test_extract_audio_features(media):
    from influxdb_iox_spark.pipeline.multimodal import extract_audio_features

    out = extract_audio_features(media.limit(5), embed_dim=8)
    rows = out.collect()
    assert len(rows) == 5
    for r in rows:
        assert r.n_samples > 0
        assert 0.0 < r.rms < 1.0 and 0.0 < r.peak <= 1.0
        assert 0 <= r.zero_crossings < r.n_samples
        assert len(r.embedding) == 8
        norm = sum(x * x for x in r.embedding) ** 0.5
        assert abs(norm - 1.0) < 1e-5
    # deterministic across runs (fake decoder is content-keyed)
    again = {r.media_id: r.rms for r in extract_audio_features(
        media.limit(5), embed_dim=8
    ).collect()}
    assert again == {r.media_id: r.rms for r in rows}


def test_extract_audio_chunks(media):
    from influxdb_iox_spark.pipeline.multimodal import extract_audio_features

    whole = {r.media_id: r for r in extract_audio_features(media.limit(3)).collect()}
    chunked = extract_audio_features(media.limit(3), chunk_ms=250).collect()
    per_clip = {}
    for r in chunked:
        per_clip.setdefault(r.media_id, []).append(r)
    for mid, rs in per_clip.items():
        idxs = sorted(r.chunk_idx for r in rs)
        assert idxs == list(range(len(rs)))  # dense chunk indices
        # chunk samples partition the clip exactly
        assert sum(r.n_samples for r in rs) == whole[mid].n_samples


def test_extract_audio_real_stub(media):
    from influxdb_iox_spark.pipeline.multimodal import extract_audio_features

    with pytest.raises(Exception) as ei:
        extract_audio_features(media.limit(1), decoder="real").collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )
