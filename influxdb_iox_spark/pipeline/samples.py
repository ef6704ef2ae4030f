"""Deterministic bottom-k sample cells — mergeable quantiles, no rescan.

The fourth rollup family (HLL ≈distinct, KMV exact-pairable distinct,
moments exact mean/σ — this adds DISTRIBUTION SHAPE): each cell keeps a
uniform without-replacement sample of its rows — the k rows whose
md5-derived 60-bit row-id hashes are smallest (``pipeline/kmv``'s hash
recipe applied to row IDENTITY instead of value).  Ordering rows by a
uniform hash of a unique id is a uniform random permutation, so
bottom-k by hash IS a uniform sample; and bottom-k of a UNION equals
bottom-k of the per-cell bottom-k's (any union-bottom-k row is in its
own cell's bottom-k), so cells merge LOSSLESSLY across any regrouping
or time range — a merged quantile is bit-identical to sampling the
unioned raw rows directly.

Why not t-digest/KLL: those are better estimators per byte, but their
merge is implementation-defined and no other engine reproduces their
internal state — unpairable, like HLL.  This sketch trades constant
factors for DETERMINISM: DuckDB replays the identical sample and the
identical order-statistic from the same md5 recipe, so the whole
surface is hash-exact (the repo's oracle-pairing discipline).

Estimator: the q-quantile of a cell group is the order statistic at
zero-based index ``floor(q·(n_s−1))`` of the merged sample's sorted
values (n_s = sample size ≤ k).  When the group's TRUE row count
n ≤ k the sample is the whole population and the quantile is exact
(``is_exact`` says so).  Sampling error otherwise is the classic
order-statistic bound: the returned value's true rank is within
O(√(q(1−q)/k)) of q with high probability (k=256 ⇒ ~±3% rank at the
median).

Scale shape: build is one rank-window + one aggregate per cell
(bounded by k rows/cell, 12-16 B each ⇒ ~4 KB at k=256); every later
quantile question folds cell arrays, never raw data.  Requires a
UNIQUE row id column (event_id, doc_id) — sampling a multiset needs
row identity, not values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_K = 256


def _id_hash(col) -> F.Column:
    """60-bit md5 hash of the row id — the engine's portable recipe
    (DuckDB: ``CAST(('0x' || substr(md5(CAST(id AS VARCHAR)),1,15)) AS
    BIGINT)``).  A NULL id raises IN-PLAN: the uniqueness contract is
    load-bearing (every NULL would hash to the same NULL slot, and
    Spark's NULLS FIRST vs DuckDB's NULLS LAST would silently desync
    the sample from the oracle), so it fails loudly like every other
    contract breach in this engine (round-16 review)."""
    return F.when(
        col.isNotNull(),
        F.conv(
            F.substring(F.md5(col.cast("string")), 1, 15), 16, 10
        ).cast("long"),
    ).otherwise(
        F.raise_error(
            F.lit(
                "sample cells: NULL row id — the sampler requires a "
                "unique non-null id column (see the module docstring)"
            )
        ).cast("long")
    )


def build_sample_cells(
    df: DataFrame,
    keys: list[str],
    time_col: str,
    id_col: str,
    value_col: str,
    bucket_ns: int,
    k: int = DEFAULT_K,
) -> DataFrame:
    """(keys…, bucket, n, sample) cells: ``n`` the exact row count,
    ``sample`` the ≤k (hash, value) structs with smallest id hashes,
    sorted by hash.  NULL values participate like any row (quantile
    callers exclude them at estimate time, mirroring SQL order
    statistics over non-null values); NULL ids are rejected by the
    uniqueness contract — the hash of NULL would collide every NULL-id
    row into one sample slot."""
    if bucket_ns <= 0:
        raise ValueError("bucket_ns must be positive")
    if k < 1:
        raise ValueError("k must be >= 1")
    base = df.select(
        *keys,
        F.expr(f"{time_col} div {bucket_ns}").alias("bucket"),
        _id_hash(F.col(id_col)).alias("__h"),
        F.col(value_col).cast("double").alias("__v"),
    )
    # Split shapes so the bottom-k leg gets WindowGroupLimit (round-16
    # review of the sf10 plan): an explicit rank-filter lets Spark push
    # a per-partition partial top-k BELOW the exchange — each map task
    # ships at most k rows per cell instead of the cell's whole row set
    # (the 100 TB difference).  Folding the filter into a `when` inside
    # collect_list hid it from the optimizer.  The exact count rides a
    # separate plain aggregate; both legs shuffle on the same keys, so
    # the join is co-partitioned.
    counts = base.groupBy(*keys, "bucket").agg(F.count("*").alias("n"))
    w = Window.partitionBy(*keys, "bucket").orderBy("__h")
    kept = base.withColumn("__rk", F.row_number().over(w)).filter(
        F.col("__rk") <= k
    )
    samples = kept.groupBy(*keys, "bucket").agg(
        F.array_sort(
            F.collect_list(
                F.struct(F.col("__h").alias("h"), F.col("__v").alias("v"))
            )
        ).alias("sample")
    )
    return counts.join(samples, [*keys, "bucket"])


def sample_quantiles(
    cells: DataFrame,
    quantiles: list[float],
    group_keys: list[str] | None = None,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Re-group cells to any SUBSET of their key/bucket columns and
    estimate each quantile from the merged bottom-k sample (lossless
    merge — see module docstring).  Output: (group_keys…, n, is_exact,
    q_<NN> per requested quantile).  Quantiles are order statistics
    over the sample's NON-NULL values at zero-based index
    ``floor(q·(n_s−1))`` — spelled identically in the DuckDB twin, so
    results are bit-exact across engines."""
    for q in quantiles:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile {q} outside [0, 1]")
    gk = list(group_keys or [])
    # In-plan k guard (round-16 review): merging at k LARGER than the k
    # the cells were built with silently breaks the lossless-merge
    # invariant (ranks past a truncated cell's own k are missing, so
    # the merged set is no longer the union's bottom-k and quantiles
    # bias).  A cell that was truncated (n > |sample|) with |sample| <
    # the requested k proves the mismatch — raise in-plan, riding the
    # hash expression so pruning can never drop it.
    checked_h = F.when(
        (F.col("__cell_n") > F.col("__cs")) & (F.col("__cs") < F.lit(k)),
        F.raise_error(
            F.lit(
                f"sample_quantiles: k={k} exceeds the k these cells "
                "were built with (a truncated cell holds fewer rows) — "
                "merge at the cells' own k or rebuild them larger"
            )
        ).cast("long"),
    ).otherwise(F.col("__h0"))
    ex = cells.select(
        *gk,
        F.col("n").alias("__cell_n"),
        F.size("sample").alias("__cs"),
        F.explode("sample").alias("e"),
    ).select(
        *gk,
        "__cell_n",
        "__cs",
        F.col("e.h").alias("__h0"),
        F.col("e.v").alias("__v"),
    ).select(
        *gk, "__cell_n", checked_h.alias("__h"), "__v"
    )
    if gk:
        w = Window.partitionBy(*gk).orderBy("__h")
        kept = ex.withColumn("__rk", F.row_number().over(w)).filter(
            F.col("__rk") <= k
        )
    else:
        # grand total: TakeOrderedAndProject keeps the merge distributed
        # (per-partition bottom-k, k rows to the final gather)
        kept = ex.orderBy("__h").limit(k)
    # group totals ride a separate small aggregate over cell rows (the
    # sample explode must not double-count n)
    totals = cells.groupBy(*gk).agg(F.sum("n").alias("n"))
    merged = kept.groupBy(*gk).agg(
        F.array_sort(F.collect_list("__v")).alias("__vals"),  # skips NULLs
        F.count("*").alias("__ns"),
    )
    j = merged.join(totals, gk) if gk else merged.crossJoin(totals)
    nv = F.size("__vals")
    cols = [
        *gk,
        F.col("n"),
        (F.col("n") <= F.col("__ns")).cast("bigint").alias("is_exact"),
    ]
    for q in quantiles:
        idx = F.floor(F.lit(float(q)) * (nv - 1).cast("double")).cast("int") + 1
        name = f"q_{int(round(q * 100)):02d}"
        cols.append(
            F.when(nv > 0, F.element_at("__vals", idx)).alias(name)
        )
    return j.select(*cols)


# ---------------------------------------------------------------------------
# Persistence + exactly-once incremental maintenance
# ---------------------------------------------------------------------------
#
# The sample ARRAYS would be replay-convergent under (h, v) dedup, but
# the exact per-cell count ``n`` is not (a replayed batch would
# double-count it, and `is_exact` with it) — so sample cells ride the
# same exactly-once versioned-swap machinery as moment cells
# (pipeline/versioned_fold: batch-id ledger, atomic version mint,
# convergent redrive of torn runs).

import json as _json
import os as _os

from influxdb_iox_spark.pipeline.versioned_fold import (  # noqa: E402
    read_versioned_cells,
    seed_versioned_cells,
    versioned_fold,
)

META_FILE = "_samples_meta.json"


def save_sample_cells(
    spark,
    path: str,
    df: DataFrame,
    keys: list[str],
    time_col: str,
    id_col: str,
    value_col: str,
    bucket_ns: int,
    k: int = DEFAULT_K,
) -> None:
    """Seed a persisted sample-cell table (version 1) from a frame —
    possibly an empty one."""
    seed_versioned_cells(
        path,
        build_sample_cells(df, keys, time_col, id_col, value_col, bucket_ns, k),
        {
            "kind": "sample_cells",
            "keys": list(keys),
            "time_col": time_col,
            "id_col": id_col,
            "value_col": value_col,
            "bucket_ns": int(bucket_ns),
            "k": int(k),
        },
        META_FILE,
        writer="samples:seed",
    )


def read_sample_cells(spark, path: str):
    """(current-version cells, meta)."""
    return read_versioned_cells(spark, path, META_FILE)


def update_sample_cells(
    spark,
    path: str,
    batch_df: DataFrame,
    batch_id: int | str | None = None,
    writer: str | None = None,
    force: bool = False,
) -> bool:
    """Fold one batch of RAW rows into the persisted cells: per cell,
    ``n`` sums and the sample becomes the k smallest of the merged
    (hash, value) structs — ``slice(array_sort(...), 1, k)``, the
    lossless bottom-k merge.  Batches must be row-disjoint (standard
    ingest contract); replays of the SAME batch are skipped by id."""
    with open(_os.path.join(path, META_FILE)) as f:
        meta = _json.load(f)
    k = int(meta["k"])

    def merge(existing: DataFrame) -> DataFrame:
        batch_cells = build_sample_cells(
            batch_df,
            meta["keys"],
            meta["time_col"],
            meta["id_col"],
            meta["value_col"],
            meta["bucket_ns"],
            k,
        )
        return (
            existing.select(batch_cells.columns)
            .unionByName(batch_cells)
            .groupBy(*meta["keys"], "bucket")
            .agg(
                F.sum("n").alias("n"),
                F.slice(
                    F.array_sort(F.flatten(F.collect_list("sample"))),
                    1,
                    k,
                ).alias("sample"),
            )
        )

    return versioned_fold(
        spark,
        path,
        merge,
        batch_id=batch_id,
        writer=writer or "samples:update",
        force=force,
    )
