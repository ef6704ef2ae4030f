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
