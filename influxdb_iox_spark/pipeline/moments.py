"""Exact mergeable moment cells — mean/variance rollups with no rescan.

The third rollup family, completing the metadata-first trio
(reference posture: influxrpc metadata-first discipline, SCALE.md §r14):

- HLL cells   → approximate distinct counts (``pipeline/cardinality``)
- KMV cells   → deterministic distinct counts  (``pipeline/kmv``)
- moment cells→ EXACT first/second moments (this module)

A cell is ``(keys…, bucket, n, s, s2)`` where values are canonicalized
to µ-unit longs (``round(v·1e6)`` — the engine's standard exact-parity
quantization) and ``s = Σv_µ``, ``s2 = Σv_µ²`` accumulate in
``decimal(38,0)``.  Count/sum/sum-of-squares are ASSOCIATIVE, so cells
merge losslessly across any regrouping or time range: mean, population
variance and stddev over arbitrary unions of cells are bit-identical
to a direct computation over the raw rows — which is exactly how the
DuckDB oracle replays them (HUGEINT sums), keeping the whole surface
hash-exact, unlike HLL (no DuckDB twin) and on par with KMV.

Scale shape: the build is ONE hash aggregate over the raw scan (same
cost class as the cardinality rollup build); every later question —
"mean and σ of `value` per event_type per day", "same but weekly",
"trailing-7-day sliding σ" — is answered from KB-sized cell tables,
never a rescan.  At 100 TB with 90-day retention a 7-day sliding σ
would otherwise re-scan each raw day seven times; here it folds
7 cells.  Streaming ingest can maintain cells incrementally (sum the
batch's cells into the store's — associativity again).

Numeric contract (loud, not silent): |value| ≤ 9.2e12 for the µ-long
scaling (in-plan raise, same bound as ``operators/lttb``), and ``s2``
overflows decimal(38,0) when n·v_µ² exceeds ~1e38 — under ANSI mode
(this engine's default) Spark raises, and DuckDB's HUGEINT raises at
1.7e38: loud-vs-loud parity, never a silent wrong moment.  For
|v| ≤ 1e6 (v_µ ≤ 1e12) a single cell holds 10^14 rows before the
bound; quantize coarser or bucket finer for wilder columns.

Buckets: ``time div bucket_ns`` with exact integer ``div`` — times are
epoch ns ≥ 0, so div == floor and DuckDB's ``//`` agrees (the same
>2^53 double-division trap the LTTB rebase avoids).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"

#: |value| bound for the exact µ-unit long scaling (shared contract
#: with operators/lttb: 9.2e12·1e6 < 2^63).
_V_MAX = 9.2e12


def _v_mu(value_col: str) -> F.Column:
    """µ-unit long with the in-plan range guard (raise_error rides the
    expression tree so pruning can never drop it)."""
    v_dbl = F.col(value_col).cast("double")
    return F.when(
        v_dbl.isNull(), F.lit(None).cast("long")  # NULLs exclude, not raise
    ).when(
        F.abs(v_dbl) <= F.lit(_V_MAX),
        F.round(v_dbl * 1_000_000).cast("long"),
    ).otherwise(
        F.raise_error(
            F.lit(
                f"moment cells: |{value_col}| exceeds {_V_MAX:.1e} — "
                "outside the exact µ-unit scaling range (see the module "
                "docstring's numeric contract)"
            )
        ).cast("long")
    )


def build_moment_cells(
    df: DataFrame,
    keys: list[str],
    time_col: str,
    value_col: str,
    bucket_ns: int,
) -> DataFrame:
    """One hash aggregate → ``(keys…, bucket, n, s, s2)`` cells.

    ``bucket = time div bucket_ns`` (epoch-ns times, ≥ 0).  NULL values
    are excluded from all three accumulators (count counts the value
    column), matching SQL aggregate semantics so the oracle needs no
    special casing."""
    if bucket_ns <= 0:
        raise ValueError("bucket_ns must be positive")
    vm = _v_mu(value_col).cast(_DEC)
    return (
        df.select(
            *keys,
            F.expr(f"{time_col} div {bucket_ns}").alias("bucket"),
            F.col(value_col).alias("__v"),
            vm.alias("__vm"),
        )
        .groupBy(*keys, "bucket")
        .agg(
            F.count("__v").alias("n"),
            F.sum("__vm").alias("s"),
            F.sum(F.col("__vm") * F.col("__vm")).alias("s2"),
        )
    )


def _stats_cols() -> list[F.Column]:
    """mean / population variance / stddev from merged (n, s, s2) —
    spelled EXACTLY like the DuckDB twin (identical double ops in the
    same order), so the rounded doubles agree bit-for-bit."""
    n_d = F.col("n").cast("double")
    s_d = F.col("s").cast("double")
    s2_d = F.col("s2").cast("double")
    mean = s_d / n_d / F.lit(1e6)
    var = (s2_d / n_d - (s_d / n_d) * (s_d / n_d)) / F.lit(1e12)
    var = F.greatest(var, F.lit(0.0))  # FP slop can dip epsilon-negative
    return [
        F.col("n"),
        (F.round(mean * 1_000_000) / 1_000_000).alias("mean"),
        (F.round(var * 1_000_000) / 1_000_000).alias("variance"),
        (F.round(F.sqrt(var) * 1_000_000) / 1_000_000).alias("stddev"),
    ]


def moment_stats(
    cells: DataFrame,
    group_keys: list[str] | None = None,
) -> DataFrame:
    """Re-group cells to any SUBSET of their key/bucket columns (or a
    grand total with ``group_keys=[]``): lossless merge — summing
    (n, s, s2) over cells IS the aggregate of the unioned raw rows —
    then (n, mean, variance, stddev).  No raw data touched."""
    gk = list(group_keys or [])
    merged = cells.groupBy(*gk).agg(
        F.sum("n").alias("n"),
        F.sum("s").alias("s"),
        F.sum("s2").alias("s2"),
    )
    return merged.select(*gk, *_stats_cols())


def moment_sliding_stats(
    cells: DataFrame,
    bucket_col: str,
    window_buckets: int,
    keys: list[str] | None = None,
) -> DataFrame:
    """Trailing-window mean/σ from per-bucket cells — the "rolling
    7-day volatility per series" dashboard primitive, answered entirely
    from the cell table: each cell contributes to the ``window_buckets``
    windows ending at buckets [b, b+W) (one ``sequence`` explode — the
    ``kmv_sliding_estimate`` shape), cells sum per window, and windows
    are anchored at buckets PRESENT in the input.  Work is
    |cells| × W — bounded by cells, never raw data."""
    if window_buckets < 1:
        raise ValueError("window_buckets must be >= 1")
    gk = list(keys or [])
    contrib = cells.select(
        *gk,
        F.explode(
            F.sequence(
                F.col(bucket_col),
                F.col(bucket_col) + F.lit(window_buckets - 1),
            )
        ).alias("__w"),
        "n",
        "s",
        "s2",
    )
    merged = contrib.groupBy(*gk, "__w").agg(
        F.sum("n").alias("n"),
        F.sum("s").alias("s"),
        F.sum("s2").alias("s2"),
    )
    anchors = cells.select(*gk, F.col(bucket_col).alias("__w")).distinct()
    merged = merged.join(anchors, [*gk, "__w"])
    return merged.select(
        *gk, F.col("__w").alias(bucket_col), *_stats_cols()
    )


# ---------------------------------------------------------------------------
# Persistence + exactly-once incremental maintenance
# ---------------------------------------------------------------------------
#
# Moment folds are NOT replay-convergent: re-summing a replayed batch
# double-counts (unlike the HLL rollups, where re-inserting the same
# values is a set-semantics no-op).  The fold therefore rides the
# shared exactly-once versioned-swap machinery (pipeline/versioned_fold
# — layout and crash-safety argument documented there).

from influxdb_iox_spark.pipeline.versioned_fold import (  # noqa: E402,F401
    cells_dir as _cells_dir,  # re-exported: tests/test_moments.py builds torn-run layouts with it
    read_versioned_cells,
    seed_versioned_cells,
    versioned_fold,
)

META_FILE = "_moments_meta.json"


def save_moment_cells(
    spark: SparkSession,
    path: str,
    df: DataFrame,
    keys: list[str],
    time_col: str,
    value_col: str,
    bucket_ns: int,
) -> None:
    """Seed a persisted moment-cell table (version 1) from a frame —
    possibly an empty one (a stream-maintained table starts empty)."""
    seed_versioned_cells(
        path,
        build_moment_cells(df, keys, time_col, value_col, bucket_ns),
        {
            "kind": "moment_cells",
            "keys": list(keys),
            "time_col": time_col,
            "value_col": value_col,
            "bucket_ns": int(bucket_ns),
        },
        META_FILE,
        writer="moments:seed",
    )


def read_moment_cells(
    spark: SparkSession, path: str
) -> tuple[DataFrame, dict]:
    """(current-version cells, meta)."""
    return read_versioned_cells(spark, path, META_FILE)


def update_moment_cells(
    spark: SparkSession,
    path: str,
    batch_df: DataFrame,
    batch_id: int | str | None = None,
    writer: str | None = None,
    force: bool = False,
) -> bool:
    """Fold one batch of RAW rows into the persisted cells.  Returns
    False (no-op) when ``batch_id`` was already folded into the current
    version — the replayed-batch case; True when a new version was
    committed."""
    with open(os.path.join(path, META_FILE)) as f:
        meta = json.load(f)

    def merge(existing: DataFrame) -> DataFrame:
        batch_cells = build_moment_cells(
            batch_df,
            meta["keys"],
            meta["time_col"],
            meta["value_col"],
            meta["bucket_ns"],
        )
        return (
            existing.select(batch_cells.columns)
            .unionByName(batch_cells)
            .groupBy(*meta["keys"], "bucket")
            .agg(
                F.sum("n").alias("n"),
                F.sum("s").alias("s"),
                F.sum("s2").alias("s2"),
            )
        )

    return versioned_fold(
        spark,
        path,
        merge,
        batch_id=batch_id,
        writer=writer or "moments:update",
        force=force,
    )
