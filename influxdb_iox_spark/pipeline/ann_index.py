"""Persisted ANN indexes: bucket-partitioned parquet for pruned search.

The scale path for similarity search: sign/assign every vector ONCE at build
time and write parquet **partitioned by bucket**.  A query then reads only
its probe buckets — Spark partition pruning turns a corpus scan into an
O(buckets-probed) directory read, the columnar analogue of an inverted ANN
index.  Exact re-rank inside the probed buckets keeps returned scores exact.

Build is a one-pass distributed job (the signing UDFs are Arrow-batched
numpy); the index is just parquet, so it inherits object-store placement,
schema evolution, and incremental append (new vectors append new files into
their bucket partitions).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from influxdb_iox_spark.pipeline.index_txn import maintenance_txn
from influxdb_iox_spark.pipeline.similarity import (
    _hyperplanes,
    cosine_topk,
    hyperplane_signatures,
    ivf_assign,
    train_ivf_centroids,
)


def build_lsh_index(
    df: DataFrame,
    path: str,
    dim: int,
    nbits: int = 16,
    seed: int = 42,
    vec_col: str = "embedding",
) -> None:
    signed = hyperplane_signatures(df, dim, nbits, seed, vec_col)
    signed.write.mode("overwrite").partitionBy("lsh_bucket").parquet(path)
    with open(os.path.join(path, "_ann_meta.json"), "w") as f:
        json.dump({"kind": "lsh", "dim": dim, "nbits": nbits, "seed": seed}, f)


def query_lsh_index(
    spark: SparkSession,
    path: str,
    query_vec: list[float],
    k: int = 10,
    multiprobe_bits: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k via partition-pruned bucket reads + exact re-rank."""
    import numpy as np

    with open(os.path.join(path, "_ann_meta.json")) as f:
        meta = json.load(f)
    planes = _hyperplanes(meta["dim"], meta["nbits"], meta["seed"])
    qsig = int(
        sum(
            (1 << i)
            for i, v in enumerate(planes @ np.asarray(query_vec, dtype="float64"))
            if v > 0
        )
    )
    probes = {qsig} | (
        {qsig ^ (1 << b) for b in range(meta["nbits"])} if multiprobe_bits else set()
    )
    df = spark.read.parquet(path)
    cand = df.filter(F.col("lsh_bucket").isin([int(p) for p in probes]))
    return cosine_topk(cand, query_vec, k, vec_col, id_col)


def build_ivf_index(
    df: DataFrame,
    path: str,
    n_centroids: int = 16,
    sample_rows: int = 10_000,
    seed: int = 42,
    vec_col: str = "embedding",
) -> None:
    cent = train_ivf_centroids(df, n_centroids, sample_rows, seed=seed, vec_col=vec_col)
    assigned = ivf_assign(df, cent, vec_col)
    assigned.write.mode("overwrite").partitionBy("ivf_list").parquet(path)
    with open(os.path.join(path, "_ann_meta.json"), "w") as f:
        json.dump({"kind": "ivf", "centroids": [list(map(float, c)) for c in cent]}, f)


def query_ivf_index(
    spark: SparkSession,
    path: str,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    import numpy as np

    with open(os.path.join(path, "_ann_meta.json")) as f:
        meta = json.load(f)
    cent = np.asarray(meta["centroids"], dtype="float64")
    q = np.asarray(query_vec, dtype="float64")
    order = np.argsort(((cent - q) ** 2).sum(axis=1))[:nprobe]
    df = spark.read.parquet(path)
    cand = df.filter(F.col("ivf_list").isin([int(i) for i in order]))
    return cosine_topk(cand, query_vec, k, vec_col, id_col)


# ---------------------------------------------------------------------------
# IVF-PQ: the standard billion-scale composite (FAISS IndexIVFPQ shape)
# ---------------------------------------------------------------------------


def build_ivfpq_index(
    df: DataFrame,
    path: str,
    n_centroids: int = 16,
    m: int = 8,
    k_codes: int = 16,
    sample_rows: int = 10_000,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    keep_vectors: bool = True,
) -> None:
    """One build pass: IVF-assign every vector to its coarse list AND
    PQ-encode it, then write parquet partitioned by list.  At 100 TB the
    codes column is 32× smaller than float32 vectors; with
    ``keep_vectors=False`` only (id, codes) persist — the pure
    memory-bandwidth ADC layout — at the cost of approximate (ADC-ranked)
    results; True keeps the floats for exact in-bucket re-rank."""
    from influxdb_iox_spark.pipeline.similarity import (
        pq_encode,
        quantize_codebooks_milli,
        train_pq_codebooks,
    )

    cent = train_ivf_centroids(
        df, n_centroids, sample_rows, seed=seed, vec_col=vec_col
    )
    books_int = quantize_codebooks_milli(
        train_pq_codebooks(
            df, m=m, k=k_codes, sample_rows=sample_rows,
            seed=seed, vec_col=vec_col,
        )
    )
    indexed = pq_encode(
        ivf_assign(df, cent, vec_col), books_int, vec_col, id_col
    )
    cols = [id_col, "ivf_list", "pq_codes"] + (
        [vec_col] if keep_vectors else []
    )
    indexed.select(*cols).write.mode("overwrite").partitionBy(
        "ivf_list"
    ).parquet(path)
    with open(os.path.join(path, "_ann_meta.json"), "w") as f:
        json.dump(
            {
                "kind": "ivfpq",
                "centroids": [list(map(float, c)) for c in cent],
                "codebooks_int": [
                    [list(map(int, cw)) for cw in book] for book in books_int
                ],
                "m": m,
                "k_codes": k_codes,
                "keep_vectors": keep_vectors,
            },
            f,
        )


def query_ivfpq_index(
    spark: SparkSession,
    path: str,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    rerank: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Probe the ``nprobe`` nearest lists (partition-pruned read), rank
    candidates by PQ asymmetric distance (m integer lookup-adds per code,
    JVM-side), and — when the index kept its vectors and ``rerank`` is
    set — exact-cosine re-rank the best ``rerank`` ADC candidates down to
    ``k``.  The three-stage funnel is the standard recall/cost dial:
    probes bound I/O, ADC bounds compute, re-rank restores exact scores.
    Without re-rank, returns (id, adist) ascending."""
    import numpy as np

    from influxdb_iox_spark.pipeline.similarity import pq_adc_topk

    with open(os.path.join(path, "_ann_meta.json")) as f:
        meta = json.load(f)
    cent = np.asarray(meta["centroids"], dtype="float64")
    books_int = np.asarray(meta["codebooks_int"], dtype="int64")
    q = np.asarray(query_vec, dtype="float64")
    order = np.argsort(((cent - q) ** 2).sum(axis=1))[:nprobe]
    cand = spark.read.parquet(path).filter(
        F.col("ivf_list").isin([int(i) for i in order])
    )
    if rerank is None:
        return pq_adc_topk(cand, query_vec, books_int, k, id_col)
    if not meta["keep_vectors"]:
        raise ValueError(
            "rerank needs stored vectors; index was built keep_vectors=False"
        )
    short = pq_adc_topk(cand, query_vec, books_int, rerank, id_col)
    return cosine_topk(
        cand.join(F.broadcast(short.select(id_col)), id_col, "left_semi"),
        query_vec,
        k,
        vec_col,
        id_col,
    )


def append_to_ann_index(
    spark: SparkSession,
    path: str,
    new_df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    guard=None,
    force: bool = False,
    writer: str | None = None,
) -> None:
    """Fold new vectors into a persisted index — the append the module
    docstring promises, for all three layouts.

    New vectors are signed/assigned/encoded with the index's FROZEN
    parameters (planes, centroids, codebooks from the meta sidecar) and
    land as NEW FILES inside their bucket partitions (parquet append —
    no existing file is touched, so concurrent queries keep reading a
    consistent prefix; the object-store PUT-is-atomic story).  Queries
    see the new vectors immediately: probing is by partition value, not
    by a file manifest.

    The dial this deliberately does NOT touch: parameters never retrain
    on append, so a drifting vector distribution slowly degrades recall
    (new mass lands in few lists) — the standard IVF trade; rebuild
    when list-size skew says so.  Ids are the caller's contract, as in
    ``build_*`` (append-only upstream dedup; this layout has no
    replace-by-id because a vector's list assignment is content-keyed
    and immutable).

    Serialized through the index's writer claim (``pipeline.index_txn``)
    so concurrent maintenance runs apply one-after-the-other instead of
    interleaving partition writes.  ``writer=`` names a SINGLE logical owner — two live processes must never share a name (a quiet dead incarnation is self-succeeded after the liveness grace)."""
    with maintenance_txn(path, guard=guard, force=force, writer=writer) as txn:
        _append_locked(spark, path, new_df, vec_col, id_col, txn)


def _append_locked(spark, path, new_df, vec_col, id_col, txn) -> None:
    import numpy as np

    from influxdb_iox_spark.pipeline.similarity import pq_encode

    with open(os.path.join(path, "_ann_meta.json")) as f:
        meta = json.load(f)
    kind = meta["kind"]
    if kind == "lsh":
        signed = hyperplane_signatures(
            new_df, meta["dim"], meta["nbits"], meta["seed"], vec_col
        )
        txn.mutating()
        signed.write.mode("append").partitionBy("lsh_bucket").parquet(path)
        return
    cent = [np.asarray(c, dtype="float64") for c in meta["centroids"]]
    assigned = ivf_assign(new_df, cent, vec_col)
    if kind == "ivf":
        txn.mutating()
        assigned.write.mode("append").partitionBy("ivf_list").parquet(path)
        return
    if kind != "ivfpq":
        raise ValueError(f"unknown index kind {kind!r}")
    books_int = np.asarray(meta["codebooks_int"], dtype="int64")
    encoded = pq_encode(assigned, books_int, vec_col, id_col)
    cols = [id_col, "ivf_list", "pq_codes"] + (
        [vec_col] if meta["keep_vectors"] else []
    )
    txn.mutating()
    encoded.select(*cols).write.mode("append").partitionBy(
        "ivf_list"
    ).parquet(path)


def delete_from_ann_index(
    spark: SparkSession,
    path: str,
    docs: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    guard=None,
    force: bool = False,
    writer: str | None = None,
) -> int:
    """Remove vectors from a persisted index — the takedown twin of
    ``search.delete_from_bm25`` (poisoned/contaminated embeddings,
    right-to-be-forgotten).  Returns the number of rows removed.

    The vector COLUMN locates the partitions to rewrite: a vector's
    rows live exactly in the bucket its own content signs/assigns to
    (frozen parameters from the meta sidecar), so only those partitions
    are read, anti-joined by id, and rewritten — never the whole index.
    Same content-keyed contract as every maintainer here: pass the
    vectors as indexed.  A partition the deletion empties is cleared
    explicitly (dynamic partition overwrite writes nothing for it —
    the delete_from_bm25 gotcha, handled the same way).  Deleting an
    absent id is a no-op; serialized through the index's writer claim
    (``pipeline.index_txn``).  ``writer=`` names a SINGLE logical owner — two live processes must never share a name (a quiet dead incarnation is self-succeeded after the liveness grace).
    """
    with maintenance_txn(path, guard=guard, force=force, writer=writer) as txn:
        return _delete_locked(spark, path, docs, vec_col, id_col, txn)


def _delete_locked(spark, path, docs, vec_col, id_col, txn) -> int:
    import json as _json
    import os as _os

    import numpy as np

    with open(_os.path.join(path, "_ann_meta.json")) as f:
        meta = _json.load(f)
    kind = meta["kind"]
    if kind == "lsh":
        part_col = "lsh_bucket"
        assigned = hyperplane_signatures(
            docs, meta["dim"], meta["nbits"], meta["seed"], vec_col
        )
    elif kind in ("ivf", "ivfpq"):
        part_col = "ivf_list"
        cent = [np.asarray(c, dtype="float64") for c in meta["centroids"]]
        assigned = ivf_assign(docs, cent, vec_col)
    else:
        raise ValueError(f"unknown index kind {kind!r}")
    touched = [
        r[part_col]
        for r in assigned.select(part_col).distinct().collect()
    ]
    if not touched:
        return 0
    del_ids = assigned.select(id_col).distinct()
    old = spark.read.parquet(path).filter(F.col(part_col).isin(touched))
    n_before = old.count()
    merged = old.join(F.broadcast(del_ids), id_col, "left_anti").localCheckpoint(
        eager=True
    )
    n_removed = n_before - merged.count()
    txn.mutating()
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy(part_col).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    survived = {
        r[part_col] for r in merged.select(part_col).distinct().collect()
    }
    jvm = spark._jvm
    for b in set(touched) - survived:
        jpath = jvm.org.apache.hadoop.fs.Path(
            _os.path.join(path, f"{part_col}={b}")
        )
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        fs.delete(jpath, True)
    return n_removed


def upsert_into_ann_index(
    spark: SparkSession,
    path: str,
    new_df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    guard=None,
    force: bool = False,
    writer: str | None = None,
) -> None:
    """Replay-idempotent fold of a vector batch: delete-then-append,
    both partition-scoped to the batch's own buckets (a replayed
    identical batch deletes its first copy and lands the same rows —
    a no-op in effect), matching ``search.update_bm25``'s
    replacement-by-id contract.  This is the foreachBatch-safe write
    for streaming vector ingest; plain ``append_to_ann_index`` remains
    the cheaper bulk path when the caller guarantees at-most-once.

    The delete and the append run under ONE writer claim, so another
    maintainer can never slot between the two halves.  ``writer=`` names a SINGLE logical owner — two live processes must never share a name (a quiet dead incarnation is self-succeeded after the liveness grace)."""
    with maintenance_txn(path, guard=guard, force=force, writer=writer) as txn:
        _delete_locked(spark, path, new_df, vec_col, id_col, txn)
        _append_locked(spark, path, new_df, vec_col, id_col, txn)
