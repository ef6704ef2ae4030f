"""Mergeable cardinality rollups — HLL sketches as a persisted pre-agg.

The 100 TB dashboard problem: "distinct users per day / per event type /
per arbitrary date range" over an events table that no one wants to
rescan.  The classic answer is a SKETCH rollup: collapse the raw table
once into one HyperLogLog sketch per (group keys, time bucket) — a few
KB per cell — and answer every later cardinality question by UNIONING
sketches (HLL union is lossless w.r.t. the sketch's own accuracy, and
associative/commutative, so any grouping or time range is a cheap fold
over pre-aggregated cells, never a rescan).

Spark-first: the sketches are Spark's built-in Apache DataSketches HLL
aggregates (``hll_sketch_agg`` / ``hll_union_agg`` /
``hll_sketch_estimate`` — JVM-side, codegen-adjacent, binary columns),
so building a rollup is ONE hash aggregate over the raw table and
estimating from it is one aggregate over the rollup.  No Python in
either path.

Maintenance: ``update_rollup`` folds a new batch of raw rows into a
persisted rollup — sketch-union per collided cell, append for new cells
— serialized by the same writer-claim guard as every other persisted
index in this package (``pipeline/index_txn``).  Folding the SAME batch
twice DOES NOT over-count **distincts already present in the cell**
(set semantics absorb re-inserted values), but a replayed batch is
indistinguishable from new data only because HLL is insert-only; unlike
the BM25/ANN maintainers there is no replacement-by-id, so exact
replay-idempotence holds for the VALUES (the sketch state converges to
the same estimate) — the property tests pin rebuild-equality.

What this deliberately does not do: deletion (HLL cannot un-insert —
takedown means rebuilding affected cells from raw data) and exact
counts (standard error ≈ 1.04/√2^lgk; lgk=12 ⇒ ~1.6%).  Both stated,
not hidden.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from influxdb_iox_spark.pipeline.index_txn import maintenance_txn

DEFAULT_LGK = 12  # DataSketches default: ~1.6% relative standard error


def build_cardinality_rollup(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    lgk: int = DEFAULT_LGK,
) -> DataFrame:
    """(keys..., sketch) — one HLL sketch of ``value_col``'s distinct
    values per key cell; ONE hash aggregate over the raw table."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lgk)).alias("sketch")
    )


def estimate_cardinality(
    rollup: DataFrame, group_keys: list[str] | None = None
) -> DataFrame:
    """Distinct-count estimates from a rollup, re-grouped to any SUBSET
    of its key columns (one sketch-union aggregate — the whole point:
    arbitrary regrouping without touching raw data).  Empty
    ``group_keys`` gives the single grand total."""
    gk = list(group_keys or [])
    agg = F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("estimate")
    if gk:
        return rollup.groupBy(*gk).agg(agg)
    return rollup.agg(agg)


def estimate_overlap(
    rollup: DataFrame,
    cell_a: dict,
    cell_b: dict,
) -> dict:
    """Estimated |A|, |B|, |A∪B| and |A∩B| between two rollup cells
    (key-column → value dicts), via inclusion–exclusion over sketch
    unions — the day-over-day retained-users primitive, answered from
    the pre-agg alone.

    Honesty: HLL supports union natively; the intersection comes from
    |A|+|B|−|A∪B|, so its ABSOLUTE error is the sum of three estimate
    errors — fine when the overlap is a sizable fraction of the sets,
    useless for tiny intersections of huge sets (that needs theta/KMV
    sketches, out of scope).  Clamped at 0."""
    import functools
    import operator

    def pick(cell: dict):
        cond = functools.reduce(
            operator.and_, (F.col(k) == F.lit(v) for k, v in cell.items())
        )
        return rollup.filter(cond)

    a, b = pick(cell_a), pick(cell_b)
    est = lambda df: (
        df.agg(
            F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("e")
        ).collect()[0]["e"]
        or 0
    )
    na, nb = est(a), est(b)
    nu = est(a.unionByName(b))
    return {
        "a": na,
        "b": nb,
        "union": nu,
        "intersection": max(0, na + nb - nu),
    }


def save_rollup(
    rollup: DataFrame, path: str, keys: list[str], value_col: str,
    lgk: int = DEFAULT_LGK,
) -> None:
    rollup.write.mode("overwrite").parquet(os.path.join(path, "cells"))
    with open(os.path.join(path, "_hll_meta.json"), "w") as f:
        json.dump(
            {"kind": "hll_rollup", "keys": keys, "value_col": value_col,
             "lgk": lgk},
            f,
        )


def load_rollup(spark: SparkSession, path: str) -> tuple[DataFrame, dict]:
    with open(os.path.join(path, "_hll_meta.json")) as f:
        meta = json.load(f)
    return spark.read.parquet(os.path.join(path, "cells")), meta


def update_rollup(
    spark: SparkSession,
    path: str,
    new_rows: DataFrame,
    guard=None,
    force: bool = False,
    writer: str | None = None,
) -> None:
    """Fold a raw-row batch into a persisted rollup: batch cells union
    into existing cells (hll_union_agg over the two sketch sets), new
    cells append.  Serialized by the index writer claim.  ``writer=`` names a SINGLE logical owner — two live processes must never share a name (a quiet dead incarnation is self-succeeded after the liveness grace).  HLL union is
    associative and idempotent on re-inserted VALUES, so replaying a
    batch leaves estimates unchanged; note the union-folded sketch
    STATE is not guaranteed bit-identical to a single-pass sketch over
    the same rows (DataSketches unions may settle in a different
    internal mode), so incremental vs rebuilt rollups agree within the
    sketch's error bounds, not necessarily to the exact estimate
    (tests pin both properties)."""
    with maintenance_txn(path, guard=guard, force=force, writer=writer) as txn:
        cells, meta = load_rollup(spark, path)
        batch = build_cardinality_rollup(
            new_rows, meta["keys"], meta["value_col"], meta["lgk"]
        )
        merged = (
            cells.unionByName(batch)
            .groupBy(*meta["keys"])
            .agg(F.hll_union_agg("sketch").alias("sketch"))
            .localCheckpoint(eager=True)  # break the self-overwrite cycle
        )
        txn.mutating()
        merged.write.mode("overwrite").parquet(os.path.join(path, "cells"))
