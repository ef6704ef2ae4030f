"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine — a single projection + top-k, fully
distributed, exact.  Scale paths: (a) random-hyperplane LSH bucketing —
candidates share a signature bucket, turning scan cost into a bucket lookup;
(b) IVF — k-means coarse quantizer (trained on a driver-side sample),
queries probe only the nearest ``nprobe`` partitions.  Both scale paths
re-rank candidates with the exact metric, so recall degrades gracefully and
tunably, never correctness of returned scores.

Dot products over array<float> columns use ``F.zip_with`` +
``F.aggregate`` with a DOUBLE accumulator — JVM-side, no Python in the row
path.  The batched matmul paths (LSH signing, IVF assignment) use one
Arrow-batched pandas_udf each (numpy BLAS beats per-element codegen for
64-dim×N matmuls).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import IntegerType, LongType


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double precision (float32 inputs widen exactly)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact brute-force cosine top-k against a literal query vector.

    The scan computes one fused projection per row (codegen), then a top-k
    (TakeOrderedAndProject — per-partition heaps + driver merge of k rows,
    NOT a global sort).  This is the exact baseline every ANN path re-ranks
    against.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = cosine(F.col(vec_col), q).alias("cosine_sim")
    return (
        df.select(F.col(id_col), sim)
        .orderBy(F.desc("cosine_sim"), F.col(id_col))
        .limit(k)
    )


def cosine_threshold(
    df: DataFrame,
    query_vec: list[float],
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """All vectors with cosine >= threshold vs a literal query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = cosine(F.col(vec_col), q).alias("cosine_sim")
    return df.select(F.col(id_col), sim).filter(F.col("cosine_sim") >= threshold)


# ---------------------------------------------------------------------------
# LSH (random hyperplanes)
# ---------------------------------------------------------------------------


def _hyperplanes(dim: int, nbits: int, seed: int):
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((nbits, dim)).astype("float64")


def hyperplane_signatures(
    df: DataFrame,
    dim: int,
    nbits: int = 16,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Append an LSH bucket id: sign-bit signature under ``nbits`` seeded
    random hyperplanes.  One Arrow-batched numpy matmul per batch."""
    planes = _hyperplanes(dim, nbits, seed)

    @F.pandas_udf(LongType())
    def sign_bits(vecs):
        import numpy as np
        import pandas as pd

        if len(vecs) == 0:
            return pd.Series([], dtype="int64")
        m = np.stack(vecs.to_numpy()).astype("float64")  # (n, dim)
        proj = m @ planes.T  # (n, nbits)
        bits = (proj > 0).astype(np.uint64)
        weights = (np.uint64(1) << np.arange(nbits, dtype=np.uint64))
        return pd.Series((bits @ weights).astype("int64"))

    return df.withColumn("lsh_bucket", sign_bits(F.col(vec_col)))


def ann_lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    dim: int | None = None,
    nbits: int = 16,
    seed: int = 42,
    multiprobe_bits: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: search only buckets within ``multiprobe_bits``
    bit-flips of the query's bucket, re-rank with exact cosine.

    At scale the signed table is precomputed and partitioned by bucket, so a
    query touches 1 + nbits·multiprobe partitions instead of the corpus.
    """
    import numpy as np

    dim = dim or len(query_vec)
    planes = _hyperplanes(dim, nbits, seed)
    qsig = int(
        sum(
            (1 << i)
            for i, v in enumerate(planes @ np.asarray(query_vec, dtype="float64"))
            if v > 0
        )
    )
    probes = {qsig}
    if multiprobe_bits >= 1:
        probes |= {qsig ^ (1 << b) for b in range(nbits)}
    signed = hyperplane_signatures(df, dim, nbits, seed, vec_col)
    cand = signed.filter(F.col("lsh_bucket").isin(list(probes)))
    return cosine_topk(cand, query_vec, k, vec_col, id_col)


# ---------------------------------------------------------------------------
# IVF (inverted-file with k-means coarse quantizer)
# ---------------------------------------------------------------------------


def train_ivf_centroids(
    df: DataFrame,
    n_centroids: int = 16,
    sample_rows: int = 10_000,
    iters: int = 10,
    seed: int = 42,
    vec_col: str = "embedding",
):
    """Lloyd's k-means on a driver-side sample (numpy).  Returns (n_c, dim)
    float64 centroids.  The sample bound keeps driver memory O(sample·dim)
    regardless of corpus size; centroids broadcast implicitly as UDF
    constants.

    The sample is drawn with ``df.sample`` (seeded, uniform across ALL
    partitions) — a ``limit`` would take the first partitions only, which
    on sorted/partitioned corpora trains centroids on a biased slice.
    """
    import numpy as np

    n = df.count()
    fraction = min(1.0, (sample_rows * 1.2) / max(n, 1))
    sample = (
        df.select(vec_col)
        .sample(withReplacement=False, fraction=fraction, seed=seed)
        .limit(sample_rows)
        .collect()
    )
    x = np.stack([r[0] for r in sample]).astype("float64")
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        d = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                cent[c] = x[m].mean(axis=0)
    return cent


def ivf_assign(df: DataFrame, centroids, vec_col: str = "embedding") -> DataFrame:
    """Append nearest-centroid id (Arrow-batched argmin matmul)."""
    import numpy as np

    cent = np.asarray(centroids, dtype="float64")
    cent_sq = (cent**2).sum(axis=1)

    @F.pandas_udf(IntegerType())
    def nearest(vecs):
        import pandas as pd

        if len(vecs) == 0:
            return pd.Series([], dtype="int32")
        m = np.stack(vecs.to_numpy()).astype("float64")
        d = (m**2).sum(axis=1)[:, None] - 2 * (m @ cent.T) + cent_sq[None, :]
        return pd.Series(d.argmin(axis=1).astype("int32"))

    return df.withColumn("ivf_list", nearest(F.col(vec_col)))


def ann_ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    centroids,
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF search: probe the ``nprobe`` nearest inverted lists, exact
    re-rank within them.  With the corpus written partitioned by
    ``ivf_list``, partition pruning turns this into an nprobe-partition
    scan."""
    import numpy as np

    cent = np.asarray(centroids, dtype="float64")
    q = np.asarray(query_vec, dtype="float64")
    order = np.argsort(((cent - q) ** 2).sum(axis=1))[:nprobe]
    assigned = ivf_assign(df, cent, vec_col)
    cand = assigned.filter(F.col("ivf_list").isin([int(i) for i in order]))
    return cosine_topk(cand, query_vec, k, vec_col, id_col)


# ---------------------------------------------------------------------------
# Embedding near-duplicate pairs
# ---------------------------------------------------------------------------


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    dim: int = 64,
    nbits: int = 12,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Near-duplicate (a, b, cosine) pairs via LSH-bucketed self-join.

    Vectors with cosine ≥ threshold collide in the same hyperplane bucket
    with high probability; the bucket join bounds the candidate set, exact
    cosine verifies.  (Recall is tunable via nbits — fewer bits = bigger
    buckets = higher recall, more compute.)
    """
    signed = hyperplane_signatures(df, dim, nbits, seed, vec_col).select(
        F.col(id_col), F.col(vec_col), F.col("lsh_bucket")
    )
    l = signed.select(
        F.col(id_col).alias("a"), F.col(vec_col).alias("va"), F.col("lsh_bucket")
    )
    r = signed.select(
        F.col(id_col).alias("b"), F.col(vec_col).alias("vb"), F.col("lsh_bucket")
    )
    return (
        l.join(r, on=["lsh_bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", cosine(F.col("va"), F.col("vb")).alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
        .distinct()
    )


# ---------------------------------------------------------------------------
# Semantic dedup (cluster → intra-cluster prune)
# ---------------------------------------------------------------------------


def semantic_dedup_pairs(
    df: DataFrame,
    n_clusters: int = 16,
    threshold: float = 0.95,
    sample_rows: int = 10_000,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "doc_id",
    max_cluster_size: int | None = None,
) -> DataFrame:
    """(drop_id, keep_id, cosine_sim): for each document that has an
    EARLIER (lower-id) same-cluster document with cosine ≥ threshold, the
    single best such predecessor.

    The SemDeDup recipe (Abbas et al. 2023, "SemDeDup: Data-efficient
    learning at web-scale through semantic deduplication" — public
    arXiv:2303.09540): k-means-cluster the embeddings, then compare pairs
    only WITHIN a cluster, turning the quadratic all-pairs problem into
    k independent quadratic-in-cluster-size problems.  Spark shape: one
    Arrow-batched centroid argmin per row, then a self-join keyed on the
    cluster id — the shuffle moves each vector once, and the join blows
    up only within a cluster (expected size n/k; at 10^10 docs pick
    n_clusters so clusters hold ~10^5 vectors, and split any hot cluster
    with a second-level clustering — same mitigation as LSH hot-bucket
    capping).  Drop policy is deterministic: min-id survives; ties in
    cosine break toward the smallest keeper id.

    Cross-cluster near-duplicates are missed by design (the paper
    accepts this recall loss for the k× compute reduction); callers
    needing exact recall at small scale should use
    ``embedding_near_dup_pairs`` / ``cosine_threshold`` instead.
    """
    cent = train_ivf_centroids(
        df, n_clusters, sample_rows, seed=seed, vec_col=vec_col
    )
    assigned = ivf_assign(df, cent, vec_col).select(
        F.col(id_col), F.col(vec_col), F.col("ivf_list")
    )
    if max_cluster_size is not None and max_cluster_size > 0:
        # Hot-cluster guard (the LSH hot-bucket cap's twin): a degenerate
        # cluster would make its self-join quadratic and pin one executor.
        # Oversized clusters are excluded via a broadcast anti-join —
        # observe what was skipped with semantic_hot_clusters, and re-run
        # those members through a second-level clustering if their dedup
        # matters.
        hot = (
            assigned.groupBy("ivf_list")
            .agg(F.count("*").alias("__n"))
            .filter(F.col("__n") > max_cluster_size)
            .select("ivf_list")
        )
        assigned = assigned.join(F.broadcast(hot), "ivf_list", "left_anti")
    a = assigned.select(
        F.col(id_col).alias("keep_id"),
        F.col(vec_col).alias("__va"),
        F.col("ivf_list"),
    )
    b = assigned.select(
        F.col(id_col).alias("drop_id"),
        F.col(vec_col).alias("__vb"),
        F.col("ivf_list"),
    )
    pairs = (
        a.join(b, on="ivf_list")
        .filter(F.col("keep_id") < F.col("drop_id"))
        .select(
            "drop_id",
            "keep_id",
            cosine(F.col("__va"), F.col("__vb")).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )
    # one row per dropped doc: its most-similar earlier keeper
    return (
        pairs.groupBy("drop_id")
        .agg(
            F.max_by(
                F.struct("keep_id", "cosine_sim"),
                F.struct(F.col("cosine_sim"), -F.col("keep_id")),
            ).alias("best")
        )
        .select(
            "drop_id",
            F.col("best.keep_id").alias("keep_id"),
            F.col("best.cosine_sim").alias("cosine_sim"),
        )
    )


def semantic_dedup(
    df: DataFrame,
    n_clusters: int = 16,
    threshold: float = 0.95,
    sample_rows: int = 10_000,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "doc_id",
) -> DataFrame:
    """Survivors of semantic dedup: documents with NO earlier same-cluster
    document at cosine ≥ threshold keep all their columns (left anti join
    on the dropped set — one additional id-keyed shuffle)."""
    dropped = semantic_dedup_pairs(
        df, n_clusters, threshold, sample_rows, seed, vec_col, id_col
    ).select(F.col("drop_id").alias(id_col))
    return df.join(dropped, on=id_col, how="left_anti")


def semantic_hot_clusters(
    df: DataFrame,
    n_clusters: int = 16,
    sample_rows: int = 10_000,
    seed: int = 42,
    vec_col: str = "embedding",
    max_cluster_size: int = 100_000,
) -> DataFrame:
    """Observability twin of semantic_dedup's hot-cluster guard:
    (ivf_list, n_docs) for every cluster the cap would exclude — same
    centroid training and assignment, so the report can never disagree
    with the guard."""
    cent = train_ivf_centroids(df, n_clusters, sample_rows, seed=seed, vec_col=vec_col)
    return (
        ivf_assign(df, cent, vec_col)
        .groupBy("ivf_list")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") > max_cluster_size)
        .orderBy(F.desc("n_docs"))
    )


def _round_half_up(x: float) -> int:
    """Spark's round(double): HALF_UP on the exact binary expansion
    (BigDecimal semantics) — ``decimal.Decimal(float)`` is that exact
    expansion, so this matches Spark and DuckDB bit-for-bit at any
    magnitude (``floor(x+0.5)`` does not: the +0.5 can itself round)."""
    import decimal

    return int(
        decimal.Decimal(x).quantize(decimal.Decimal(1), rounding=decimal.ROUND_HALF_UP)
    )


def _with_scale(df: DataFrame, bits: int, vec_col: str, id_col: str) -> DataFrame:
    """Materialize the per-vector quantization scale (max|x| / qmax) as a
    REAL column next to the vector.  Shared by :func:`quantize_embeddings`
    (storage half) and :func:`quantized_cosine_topk` (compute half) so the
    two can never disagree on codes.  The scale lives in a PRIOR select so
    downstream lambdas reference a plain attribute — Catalyst inlines
    referenced EXPRESSIONS into lambda bodies, which would re-derive
    max|x| per element (the O(dim²) trap SCALE.md documents)."""
    qmax = float(2 ** (bits - 1) - 1)
    v = F.col(vec_col)
    return df.select(
        F.col(id_col),
        v.alias("_v"),
        (
            F.array_max(F.transform(v, lambda x: F.abs(x.cast("double")))) / qmax
        ).alias("_scale"),
    )


def _code(x: Column, sc: Column) -> Column:
    """Quantization code for one element given the per-vector scale:
    round(x/scale) HALF_UP (identical in Spark and DuckDB); an all-zero
    vector has scale 0 and codes 0 — no division."""
    return F.when(sc == 0.0, F.lit(0.0)).otherwise(
        F.round(x.cast("double") / sc, 0)
    )


def quantized_cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    bits: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k by int8-quantized cosine — the compute-side half of the
    quantized embedding store (:func:`quantize_embeddings` is the storage
    side).  With symmetric per-vector quantization v ≈ codes_v·scale_v the
    scales CANCEL in cosine: cos(q,v) ≈ dot(cq,cv) / (|cq|·|cv|) — so the
    hot loop is integer dot products over int8 codes (4× less memory
    traffic than float32; SIMD int8 dot on real hardware), and the stored
    float vectors are never touched.

    Exactness contract: dot and squared norms are exact int64 (64-dim
    int8: |dot| ≤ 64·127² ≈ 1.0e6; vv·qq ≤ 1.1e12 ≪ 2^63); the single
    double division + correctly-rounded sqrt are IEEE-deterministic, so
    ``qcos_micro`` is hash-exact cross-engine.  Zero-norm vectors score 0
    by definition (no division).

    Plan shape: two narrow projections (scale, then codes — materialized
    as real columns so Catalyst can't inline the max-abs expression into
    the per-element lambda, the O(dim²) trap), then TakeOrderedAndProject:
    per-partition k-heaps + driver merge, no global sort, no shuffle, no
    Python.

    Returns (id, dot_q, qcos_micro) ordered by (qcos_micro desc, id).
    """
    qmax = 2 ** (bits - 1) - 1
    qscale = max(abs(float(x)) for x in query_vec) / float(qmax)
    qcodes = [
        0 if qscale == 0.0 else _round_half_up(float(x) / qscale) for x in query_vec
    ]
    qq = sum(c * c for c in qcodes)

    sc = F.col("_scale")
    with_codes = _with_scale(df, bits, vec_col, id_col).select(
        F.col(id_col),
        F.transform("_v", lambda x: _code(x, sc).cast("long")).alias("_codes"),
    )

    qlit = F.array(*[F.lit(int(c)).cast("long") for c in qcodes])
    dot_q = F.aggregate(
        F.zip_with(F.col("_codes"), qlit, lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    vv = F.aggregate(
        F.col("_codes"), F.lit(0).cast("long"), lambda acc, x: acc + x * x
    )
    scored = with_codes.select(F.col(id_col), dot_q.alias("dot_q"), vv.alias("_vv"))
    if qq == 0:
        # zero-norm QUERY: every score is 0 by definition — without this
        # the division yields 0/0 = NaN, which round+cast would silently
        # turn into 0 while the SQL oracle raises on CAST(NaN)
        score = F.lit(0.0)
    else:
        score = F.when(F.col("_vv") == 0, F.lit(0.0)).otherwise(
            F.col("dot_q").cast("double")
            / F.sqrt((F.col("_vv") * F.lit(int(qq))).cast("double"))
        )
    return (
        scored.select(
            F.col(id_col),
            F.col("dot_q"),
            F.round(score * 1e6, 0).cast("long").alias("qcos_micro"),
        )
        .orderBy(F.desc("qcos_micro"), F.col(id_col))
        .limit(k)
    )


def quantize_embeddings(
    df: DataFrame,
    bits: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-vector symmetric scalar quantization — the storage-side half of
    a 100 TB embedding store (int8 vectors are 4x smaller than float32 and
    SIMD-friendly for re-ranking; this op reports the codes AND the exact
    reconstruction-error audit a pipeline gates promotion on).

    Scheme: per-vector scale = max|x| / qmax with qmax = 2^(bits-1) - 1;
    code q_i = round(x_i / scale) in [-qmax, qmax]; reconstruction error
    e_i = |x_i - q_i * scale|.  An all-zero vector has scale 0 and codes 0
    (no division).  Errors and the scale are canonicalized to integer
    micro-units BEFORE summing so the per-vector totals are order-free and
    hash-exact cross-engine (double accumulation order is not).

    Plan shape: one projection, zero shuffles, zero Python — array HOFs
    (transform/aggregate) are interpreted expressions but JVM-side; the
    scale column and the code lambda are the SHARED ``_with_scale`` /
    ``_code`` helpers (also used by quantized_cosine_topk), so the
    storage and compute halves can never disagree on codes.

    Output: (id, dim, scale_micro, sum_abs_err_micro, max_q, min_q) —
    all integer columns.
    """
    with_scale = _with_scale(df, bits, vec_col, id_col)
    sc = F.col("_scale")

    def code(x: Column) -> Column:
        return _code(x, sc)

    def err_micro(x: Column) -> Column:
        return F.round(F.abs(x.cast("double") - code(x) * sc) * 1e6, 0).cast("long")

    return with_scale.select(
        F.col(id_col),
        F.size("_v").alias("dim"),
        F.round(sc * 1e6, 0).cast("long").alias("scale_micro"),
        F.aggregate(
            "_v", F.lit(0).cast("long"), lambda acc, x: acc + err_micro(x)
        ).alias("sum_abs_err_micro"),
        F.array_max(F.transform("_v", code)).cast("long").alias("max_q"),
        F.array_min(F.transform("_v", code)).cast("long").alias("min_q"),
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — compressed codes + asymmetric-distance search
# ---------------------------------------------------------------------------


def train_pq_codebooks(
    df: DataFrame,
    m: int = 8,
    k: int = 16,
    sample_rows: int = 10_000,
    iters: int = 10,
    seed: int = 42,
    vec_col: str = "embedding",
):
    """Per-subspace Lloyd's k-means on a driver-side sample: split each
    d-dim vector into ``m`` contiguous subvectors of d/m dims and train an
    independent ``k``-codeword codebook per subspace.  Returns a float64
    numpy array of shape (m, k, d/m).

    PQ is the standard billion-scale compression (Jégou et al., "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011): a 64-dim
    float32 vector (256 B) stores as m=8 uint8 codes (8 B, 32×), and a
    query scans codes with m table lookups per vector instead of d
    multiply-adds.  Same sampling posture as train_ivf_centroids (seeded
    df.sample across all partitions, driver memory O(sample·d))."""
    import numpy as np

    n = df.count()
    fraction = min(1.0, (sample_rows * 1.2) / max(n, 1))
    sample = (
        df.select(vec_col)
        .sample(withReplacement=False, fraction=fraction, seed=seed)
        .limit(sample_rows)
        .collect()
    )
    x = np.stack([r[0] for r in sample]).astype("float64")
    d = x.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, k, dsub))
    for j in range(m):
        xj = x[:, j * dsub : (j + 1) * dsub]
        cent = xj[rng.choice(len(xj), size=min(k, len(xj)), replace=False)]
        for _ in range(iters):
            dist = ((xj[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = dist.argmin(axis=1)
            for c in range(len(cent)):
                mask = assign == c
                if mask.any():
                    cent[c] = xj[mask].mean(axis=0)
        books[j, : len(cent)] = cent
        if len(cent) < k:  # degenerate tiny sample: repeat the last
            books[j, len(cent):] = cent[-1]
    return books


def _milli_np(a):
    """Float -> int64 milli-units with ROUND-HALF-AWAY-FROM-ZERO — the
    same rule as Spark's F.round and DuckDB's round(), which the PQ
    oracle relies on.  (np.rint would be half-to-even: an embedding
    component at exactly k+0.5 milli would encode differently here than
    in the SQL twin — the float straddle the integer canonicalization
    exists to eliminate.)"""
    import numpy as np

    a = np.asarray(a, dtype="float64") * 1000.0
    return np.where(
        a >= 0, np.floor(a + 0.5), np.ceil(a - 0.5)
    ).astype("int64")


def pq_encode(
    df: DataFrame,
    codebooks_int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Append ``pq_codes`` (array<int>, length m): per subspace the
    nearest codeword by exact INTEGER squared L2 over milli-unit values
    (ties -> smallest code id; np.argmin takes the first minimum, the
    same rule the SQL oracle's ORDER BY dist, c pins).

    This is the WRITE path — codes are computed once per vector (one
    Arrow-batched pandas UDF; int64 matmul, no float compares anywhere)
    and persisted; queries never touch the float vectors.
    """
    import numpy as np
    from pyspark.sql.types import ArrayType

    cb = np.asarray(codebooks_int, dtype="int64")  # (m, k, dsub)
    m, k, dsub = cb.shape
    cb_sq = (cb * cb).sum(axis=2)  # (m, k)

    @F.pandas_udf(ArrayType(IntegerType()))
    def encode(vecs):
        import pandas as pd

        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        x = _milli_np(np.stack(vecs.to_numpy()))
        n = x.shape[0]
        codes = np.empty((n, m), dtype="int32")
        for j in range(m):
            xj = x[:, j * dsub : (j + 1) * dsub]
            # exact integer expanded L2: ||x||^2 - 2 x.c + ||c||^2
            dist = (
                (xj * xj).sum(axis=1)[:, None]
                - 2 * (xj @ cb[j].T)
                + cb_sq[j][None, :]
            )
            codes[:, j] = dist.argmin(axis=1)
        return pd.Series(list(codes))

    return df.withColumn("pq_codes", encode(F.col(vec_col)))


def pq_adc_topk(
    codes_df: DataFrame,
    query_vec: list[float],
    codebooks_int,
    k_out: int = 10,
    id_col: str = "vec_id",
    codes_col: str = "pq_codes",
) -> DataFrame:
    """Asymmetric-distance top-k over stored PQ codes: the query builds an
    (m × k) integer lookup table (squared L2 from each query subvector to
    each codeword, in milli-units) and every stored vector's approximate
    distance is m table lookups summed — a JVM-side array fold over the
    codes column, no Python, no float drift (integer adds commute).

    Plan: one projection + TakeOrderedAndProject; at 100 TB the codes
    table is 32× smaller than the vectors and the scan is
    memory-bandwidth-bound; compose with IVF lists for sub-linear probes.
    Output: (id, adist) ascending (smaller = closer), ties by id.
    """
    import numpy as np

    cb = np.asarray(codebooks_int, dtype="int64")
    m, k, dsub = cb.shape
    q = _milli_np(query_vec)
    if q.shape[0] != m * dsub:
        raise ValueError(f"query dim {q.shape[0]} != m*dsub {m * dsub}")
    lut = np.empty((m, k), dtype="int64")
    for j in range(m):
        diff = q[j * dsub : (j + 1) * dsub][None, :] - cb[j]
        lut[j] = (diff * diff).sum(axis=1)
    flat = ", ".join(f"{int(v)}L" for v in lut.reshape(-1))
    adist = F.expr(
        f"aggregate(transform(sequence(0, {m - 1}), "
        f"j -> element_at(array({flat}), j * {k} + element_at({codes_col}, j + 1) + 1)), "
        f"0L, (acc, x) -> acc + x)"
    )
    return (
        codes_df.select(F.col(id_col), adist.alias("adist"))
        .orderBy(F.col("adist").asc(), F.col(id_col).asc())
        .limit(k_out)
    )


def quantize_codebooks_milli(codebooks) -> "list":
    """Float codebooks -> int64 milli-units (the stored form encode/ADC
    consume; freezing the quantization at train time keeps every later
    comparison integer-exact)."""
    import numpy as np

    return _milli_np(codebooks)


def train_ivf_centroids_distributed(
    df: DataFrame,
    n_centroids: int = 16,
    iters: int = 10,
    seed: int = 42,
    vec_col: str = "embedding",
):
    """Distributed Lloyd's k-means: every iteration assigns the FULL
    corpus (Arrow-batched argmin, the ivf_assign kernel) and reduces the
    per-cluster mean with one shuffle — ``posexplode → groupBy(cluster,
    dim).avg`` — so only k·d aggregated rows ever reach the driver.

    This is the 100 TB trainer: ``train_ivf_centroids`` caps quality at
    its driver-side sample (fine for coarse IVF lists), while this one
    sees every vector at the cost of ``iters`` Spark jobs.  Empty
    clusters keep their previous centroid.  Initialisation is the same
    seeded distributed sample, so small inputs start identically; the
    ITERATION means are float aggregations over an unordered shuffle —
    deterministic in assignment (integer-free argmin ties broken by
    index) but not bit-reproducible across cluster layouts, which is why
    the oracle-paired driver queries pin codebooks instead of training.
    Returns (n_centroids, dim) float64 numpy centroids."""
    import numpy as np

    n = df.count()
    fraction = min(1.0, (n_centroids * 20) / max(n, 1))
    init = (
        df.select(vec_col)
        .sample(withReplacement=False, fraction=fraction, seed=seed)
        .limit(n_centroids)
        .collect()
    )
    cent = np.stack([r[0] for r in init]).astype("float64")
    vecs = df.select(vec_col).localCheckpoint(eager=False)
    for _ in range(iters):
        assigned = ivf_assign(vecs, cent, vec_col)
        rows = (
            assigned.select(
                "ivf_list", F.posexplode(F.col(vec_col)).alias("dim", "x")
            )
            .groupBy("ivf_list", "dim")
            .agg(F.avg(F.col("x").cast("double")).alias("mean"))
            .collect()
        )
        new = cent.copy()
        by_cluster: dict[int, dict[int, float]] = {}
        for r in rows:
            by_cluster.setdefault(r.ivf_list, {})[r.dim] = r.mean
        for c, dims in by_cluster.items():
            for d_i, v in dims.items():
                new[c, d_i] = v
        cent = new
    return cent
