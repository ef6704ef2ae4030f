"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing — schema, partitioning, Arrow batch shapes, UDF
signatures — is real and tested; the codec calls are STUBS (this container
has no image/audio libraries).  ``decoder="fake"`` produces deterministic
synthetic outputs derived from the bytes' md5, so pipelines are testable
end-to-end; ``decoder="real"`` raises NotImplementedError at the exact spot
a PIL/ffmpeg call belongs.

Design: heavy per-item work runs in ``mapInPandas`` so a 100 TB media corpus
streams through executors in Arrow batches; metadata-only operations (filter
by width, sample by duration) are plain column expressions against the
``meta`` struct and never touch the blob — with Parquet columnar reads the
blob column isn't even fetched unless projected.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("blob", BinaryType(), True),
        StructField(
            "meta",
            StructType(
                [
                    StructField("mime", StringType(), True),
                    StructField("width", IntegerType(), True),
                    StructField("height", IntegerType(), True),
                    StructField("n_channels", IntegerType(), True),
                    StructField("duration_ms", LongType(), True),
                    StructField("sample_rate", IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("embedding", ArrayType(FloatType()), True),
    ]
)


def _fake_decode(blob: bytes) -> tuple[int, int, int]:
    """Deterministic (width, height, channels) from content hash."""
    d = hashlib.md5(blob).digest()
    return 16 + d[0] % 64, 16 + d[1] % 64, 1 + d[2] % 4


def _fake_embed(blob: bytes, dim: int) -> list[float]:
    """Deterministic unit-norm embedding from content hash."""
    out = []
    h = hashlib.md5(blob).digest()
    i = 0
    while len(out) < dim:
        h = hashlib.md5(h + bytes([i % 256])).digest()
        out.extend(b / 255.0 - 0.5 for b in h)
        i += 1
    v = out[:dim]
    norm = sum(x * x for x in v) ** 0.5 or 1.0
    return [float(x / norm) for x in v]


def decode_images(
    df: DataFrame, decoder: str = "fake", embed_dim: int = 64
) -> DataFrame:
    """blob → (media_id, width, height, embedding): the decode +
    feature-extract stage.

    Arrow-batched ``mapInPandas``; each batch decodes independently, so
    executor memory holds one batch of blobs, not the corpus.  Swap the
    marked stub for PIL/torchvision to make it real — the plumbing
    (schema, batching, null handling) does not change.
    """

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, ws, hs, embs = [], [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["blob"]):
                ids.append(mid)
                if blob is None:
                    ws.append(None), hs.append(None), embs.append(None)
                    continue
                if decoder == "fake":
                    w, h, _ = _fake_decode(bytes(blob))
                    emb = _fake_embed(bytes(blob), embed_dim)
                else:
                    # REAL DECODER GOES HERE: PIL.Image.open(io.BytesIO(blob))
                    raise NotImplementedError(
                        "real image decoding requires PIL/torchvision (not in container)"
                    )
                ws.append(w), hs.append(h), embs.append(emb)
            yield pd.DataFrame(
                {"media_id": ids, "width": ws, "height": hs, "embedding": embs}
            )

    return df.select("media_id", "blob").mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def sample_video_frames(
    df: DataFrame, every_ms: int = 1000, decoder: str = "fake"
) -> DataFrame:
    """video blob → one row per sampled frame (media_id, frame_idx, ts_ms,
    frame blob).  Frame count derives from meta.duration_ms — metadata-only
    until the decode stage; the fake decoder emits md5-derived frame bytes."""
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_idx", IntegerType(), False),
            StructField("ts_ms", LongType(), False),
            StructField("frame", BinaryType(), True),
        ]
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "ts_ms": [], "frame": []}
            for mid, blob, dur in zip(pdf["media_id"], pdf["blob"], pdf["duration_ms"]):
                if blob is None or dur is None:
                    continue
                n = max(1, int(dur) // every_ms)
                for i in range(n):
                    if decoder == "fake":
                        frame = hashlib.md5(bytes(blob) + i.to_bytes(4, "big")).digest()
                    else:
                        # REAL DECODER GOES HERE: ffmpeg seek + decode
                        raise NotImplementedError(
                            "real video decoding requires ffmpeg (not in container)"
                        )
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["ts_ms"].append(i * every_ms)
                    rows["frame"].append(frame)
            yield pd.DataFrame(rows)

    flat = df.select(
        "media_id", "blob", F.col("meta.duration_ms").alias("duration_ms")
    )
    return flat.mapInPandas(run, out_schema)


def filter_by_metadata(df: DataFrame, min_width: int = 0, kinds: list[str] | None = None) -> DataFrame:
    """Metadata-only selection — never reads the blob column (verify with
    .explain: ReadSchema excludes ``blob``)."""
    out = df
    if kinds:
        out = out.filter(F.col("kind").isin(kinds))
    if min_width:
        out = out.filter(F.col("meta.width") >= min_width)
    return out.select("media_id", "kind", "meta")


def docs_to_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Adapter: fabricate a media table from the documents table (text bytes
    as blob) so multimodal plumbing is exercisable on the shipped testdata."""
    blob = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("kind"),
        blob.alias("blob"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.length(F.col(text_col)).cast("int").alias("width"),
            F.lit(32).cast("int").alias("height"),
            F.lit(3).cast("int").alias("n_channels"),
            (F.length(F.col(text_col)) * 10).cast("long").alias("duration_ms"),
            F.lit(16000).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_samples", LongType(), True),
        StructField("rms", FloatType(), True),
        StructField("peak", FloatType(), True),
        StructField("zero_crossings", LongType(), True),
        StructField("embedding", ArrayType(FloatType()), True),
    ]
)


def extract_audio_features(
    df: DataFrame,
    decoder: str = "fake",
    embed_dim: int = 32,
    chunk_ms: int = 0,
    sample_rate: int = 16_000,
) -> DataFrame:
    """audio blob → per-clip (or per-chunk) waveform features: sample
    count, RMS level, peak, zero-crossing count, and a content
    embedding — the audio leg of the image/video decode family (same
    Arrow-batched ``mapInPandas`` plumbing; swap the marked stub for
    soundfile/torchaudio to make it real, the schema/batching/null
    handling do not change).

    ``chunk_ms > 0`` fans each clip out to one row per fixed-duration
    chunk (media_id keeps a ``chunk_idx`` column in that mode, and
    chunk boundaries come from meta.duration_ms — metadata-only until
    the decode), matching ``sample_video_frames``'s frame-sampling
    shape for the VAD / diarization-style pipelines that consume
    windows, not whole files.

    The fake decoder derives a deterministic int16 waveform from the
    content hash (md5-keystream), so every feature is reproducible and
    unit-testable without audio libraries."""
    out_schema = AUDIO_FEATURES_SCHEMA
    if chunk_ms > 0:
        out_schema = StructType(
            [AUDIO_FEATURES_SCHEMA[0],
             StructField("chunk_idx", IntegerType(), False)]
            + list(AUDIO_FEATURES_SCHEMA[1:])
        )

    def _fake_waveform(blob: bytes, n: int) -> "list[int]":
        out = []
        h = hashlib.md5(blob).digest()
        i = 0
        while len(out) < n:
            h = hashlib.md5(h + bytes([i % 256])).digest()
            out.extend(
                int.from_bytes(h[j : j + 2], "big", signed=True)
                for j in range(0, 16, 2)
            )
            i += 1
        return out[:n]

    def _features(wave: "list[int]"):
        n = len(wave)
        if n == 0:
            return 0, 0.0, 0.0, 0
        scale = 32768.0
        rms = (sum((s / scale) ** 2 for s in wave) / n) ** 0.5
        peak = max(abs(s) for s in wave) / scale
        zc = sum(
            1 for a, b in zip(wave, wave[1:]) if (a >= 0) != (b >= 0)
        )
        return n, float(rms), float(peak), zc

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows: dict = {f.name: [] for f in out_schema.fields}
            for mid, blob, dur in zip(
                pdf["media_id"], pdf["blob"], pdf["duration_ms"]
            ):
                if blob is None or dur is None:
                    continue
                if decoder != "fake":
                    # REAL DECODER GOES HERE: soundfile.read(io.BytesIO(blob))
                    raise NotImplementedError(
                        "real audio decoding requires soundfile/torchaudio "
                        "(not in container)"
                    )
                total = max(1, int(dur) * sample_rate // 1000)
                wave = _fake_waveform(bytes(blob), total)
                if chunk_ms > 0:
                    step = max(1, chunk_ms * sample_rate // 1000)
                    chunks = [
                        (ci, wave[o : o + step])
                        for ci, o in enumerate(range(0, total, step))
                    ]
                else:
                    chunks = [(None, wave)]
                for ci, w in chunks:
                    n, rms, peak, zc = _features(w)
                    emb = _fake_embed(
                        bytes(blob) + (ci or 0).to_bytes(4, "big"), embed_dim
                    )
                    rows["media_id"].append(mid)
                    if chunk_ms > 0:
                        rows["chunk_idx"].append(ci)
                    rows["n_samples"].append(n)
                    rows["rms"].append(rms)
                    rows["peak"].append(peak)
                    rows["zero_crossings"].append(zc)
                    rows["embedding"].append(emb)
            yield pd.DataFrame(rows)

    flat = df.select(
        "media_id", "blob", F.col("meta.duration_ms").alias("duration_ms")
    )
    return flat.mapInPandas(run, out_schema)
