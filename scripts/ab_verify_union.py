"""A/B for the round-16 jaccard_verify union-elimination (guide §1.1/§2.3).

Hypothesis: ``|A∪B| = |A| + |B| − |A∩B|`` for the distinct, null-free
shingle-hash sets ``minhash_signatures`` emits, so the per-pair
``array_union`` hash-set build (which materializes a |A|+|B|-element array
per candidate pair just to count it) can be replaced by arithmetic over
the set sizes the size-prefilter join already computes.  Numerator and
denominator stay the same exact integers, so the divided double — and the
declared query's output — is bit-identical.

Protocol: signatures and candidates are parquet-materialized ONCE and both
formulations read the same files; runs interleave old/new min-of-N with
single-shot sentinels so host drift cancels (BENCH_NOTES sentinel
protocol).  Also asserts old/new outputs agree exactly (collected sorted
rows) at the probe scale before timing.

Usage: python scripts/ab_verify_union.py [sf_dir] [--runs=N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("SPARK_DRIVER_MEM", "48g")

from influxdb_iox_spark.session import get_spark


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs_n = 3
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs_n = int(a.split("=", 1)[1])
    sf_dir = args[0] if args else "/tmp/spark_graft_sf10"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    import pyspark.sql.functions as F
    from pyspark.sql import DataFrame

    from influxdb_iox_spark.pipeline.dedup import (
        lsh_candidate_pairs,
        materialize_parquet,
        minhash_signatures,
    )

    def _sentinel_once() -> float:
        t0 = time.perf_counter()
        spark.range(5_000_000).select(
            F.sum(F.col("id").cast("decimal(18,2)")).alias("s"),
            F.min(F.hash("id")).alias("h"),
        ).write.mode("overwrite").format("noop").save()
        return round(time.perf_counter() - t0, 3)

    def verify_old(
        pairs: DataFrame, sig_df: DataFrame, id_col: str, threshold: float
    ) -> DataFrame:
        sz = sig_df.select(F.col(id_col), F.size("shingles").alias("__n"))
        survivors = (
            pairs.hint("shuffle_hash")
            .join(sz.withColumnsRenamed({id_col: "a", "__n": "__n_a"}), "a")
            .join(sz.withColumnsRenamed({id_col: "b", "__n": "__n_b"}), "b")
            .filter(
                F.least("__n_a", "__n_b").cast("double")
                >= F.lit(threshold) * F.greatest("__n_a", "__n_b")
            )
            .select("a", "b")
        )
        sh = sig_df.select(F.col(id_col), F.col("shingles"))
        a_sh = sh.withColumnsRenamed({id_col: "a", "shingles": "sh_a"})
        b_sh = sh.withColumnsRenamed({id_col: "b", "shingles": "sh_b"})
        inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
        union = F.size(F.array_union(F.col("sh_a"), F.col("sh_b")))
        return (
            survivors.hint("shuffle_hash")
            .join(a_sh, "a")
            .join(b_sh, "b")
            .select(
                "a",
                "b",
                (inter / F.greatest(union, F.lit(1))).alias("jaccard"),
            )
            .filter(F.col("jaccard") >= threshold)
        )

    def verify_new(
        pairs: DataFrame, sig_df: DataFrame, id_col: str, threshold: float
    ) -> DataFrame:
        sz = sig_df.select(F.col(id_col), F.size("shingles").alias("__n"))
        survivors = (
            pairs.hint("shuffle_hash")
            .join(sz.withColumnsRenamed({id_col: "a", "__n": "__n_a"}), "a")
            .join(sz.withColumnsRenamed({id_col: "b", "__n": "__n_b"}), "b")
            .filter(
                F.least("__n_a", "__n_b").cast("double")
                >= F.lit(threshold) * F.greatest("__n_a", "__n_b")
            )
            .select("a", "b", "__n_a", "__n_b")
        )
        sh = sig_df.select(F.col(id_col), F.col("shingles"))
        a_sh = sh.withColumnsRenamed({id_col: "a", "shingles": "sh_a"})
        b_sh = sh.withColumnsRenamed({id_col: "b", "shingles": "sh_b"})
        inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b"))).alias(
            "__i"
        )
        scored = (
            survivors.hint("shuffle_hash")
            .join(a_sh, "a")
            .join(b_sh, "b")
            .select("a", "b", "__n_a", "__n_b", inter)
        )
        return scored.select(
            "a",
            "b",
            (
                F.col("__i")
                / F.greatest(
                    F.col("__n_a") + F.col("__n_b") - F.col("__i"), F.lit(1)
                )
            ).alias("jaccard"),
        ).filter(F.col("jaccard") >= threshold)

    _sentinel_once(), _sentinel_once()  # untimed JIT warm
    print(
        json.dumps({"sentinel_before": min(_sentinel_once() for _ in range(3))}),
        flush=True,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sigs = materialize_parquet(minhash_signatures(docs, "text", "doc_id", 3, 64))
    cands = materialize_parquet(lsh_candidate_pairs(sigs, "doc_id", 64, 16))
    n_cands = cands.count()

    # equivalence gate before any timing: exact row equality
    old_rows = sorted(verify_old(cands, sigs, "doc_id", 0.5).collect())
    new_rows = sorted(verify_new(cands, sigs, "doc_id", 0.5).collect())
    assert old_rows == new_rows, (
        f"MISMATCH: {len(old_rows)} old vs {len(new_rows)} new rows"
    )
    print(
        json.dumps({"n_candidates": n_cands, "n_pairs": len(old_rows),
                    "equivalence": "exact"}),
        flush=True,
    )

    # untimed JIT warm of both shapes
    for fn in (verify_old, verify_new):
        fn(cands.limit(500), sigs, "doc_id", 0.5).write.mode(
            "overwrite"
        ).format("noop").save()

    # Alternate which shape runs first each round: a host that degrades
    # monotonically over the session (GC/thermal/co-tenant waves) otherwise
    # biases against whichever shape always runs second.
    results = {"old": [], "new": [], "sent": []}
    for r in range(runs_n):
        order = (("old", verify_old), ("new", verify_new))
        if r % 2 == 1:
            order = tuple(reversed(order))
        for key, fn in order:
            results["sent"].append(_sentinel_once())
            t0 = time.perf_counter()
            fn(cands, sigs, "doc_id", 0.5).write.mode("overwrite").format(
                "noop"
            ).save()
            results[key].append(round(time.perf_counter() - t0, 3))
    results["old_min"] = min(results["old"])
    results["new_min"] = min(results["new"])
    print(json.dumps(results), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
