"""Round-16 minhash re-time (verdict #1): sentinel-bracketed,
stage-decomposed profile at sf10/48g with the round-15 lossless size
prefilter in, plus the integrated min-of-3 standalone number.

Protocol (BENCH_NOTES §36 addendum): only run when the pre-run
5M-range gate sentinel reads ≤0.12 — the §36 101.7 s profile was
retired as storm-contaminated (sentinel 2.24).  Stage decomposition
materializes each stage to parquet so later stages read exact-stat
inputs (no localCheckpoint — §36 suspect (b)).

Usage: python scripts/bench_minhash_profile.py [sf_dir]
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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf10"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    import pyspark.sql.functions as F

    from influxdb_iox_spark.pipeline.dedup import (
        jaccard_verify,
        lsh_candidate_pairs,
        materialize_parquet,
        minhash_signatures,
        near_duplicate_pairs_minhash,
    )

    def _sentinel_once() -> float:
        t0 = time.perf_counter()
        spark.range(5_000_000).select(
            F.sum(F.col("id").cast("decimal(18,2)")).alias("s"),
            F.min(F.hash("id")).alias("h"),
        ).write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    _sentinel_once(), _sentinel_once()  # untimed JIT warm
    sent_before = round(min(_sentinel_once() for _ in range(3)), 3)
    print(json.dumps({"sentinel_before": sent_before}), flush=True)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # plan-shape JIT warm on a small slice (bench.py protocol)
    near_duplicate_pairs_minhash(
        docs.limit(2000), threshold=0.5, materialize="parquet"
    ).write.mode("overwrite").format("noop").save()

    # ---- stage decomposition (one pass, parquet-materialized) ----
    stages = {}
    t0 = time.perf_counter()
    sigs = materialize_parquet(minhash_signatures(docs, "text", "doc_id", 3, 64))
    stages["signatures_materialize"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    cands = materialize_parquet(
        lsh_candidate_pairs(sigs, "doc_id", 64, 16, 20_000)
    )
    n_cands = cands.count()
    stages["banding_materialize"] = round(time.perf_counter() - t0, 3)

    sent_mid = round(_sentinel_once(), 3)
    t0 = time.perf_counter()
    jaccard_verify(cands, sigs, "doc_id", 0.5).write.mode(
        "overwrite"
    ).format("noop").save()
    stages["jaccard_verify"] = round(time.perf_counter() - t0, 3)
    print(
        json.dumps(
            {"stages": stages, "n_candidates": n_cands, "sentinel_mid": sent_mid}
        ),
        flush=True,
    )

    # ---- integrated min-of-3 (the §32-comparable number) ----
    runs = []
    sents = []
    for _ in range(3):
        sents.append(round(_sentinel_once(), 3))
        t0 = time.perf_counter()
        near_duplicate_pairs_minhash(
            docs, threshold=0.5, materialize="parquet"
        ).write.mode("overwrite").format("noop").save()
        runs.append(round(time.perf_counter() - t0, 3))
    sent_after = round(min(_sentinel_once() for _ in range(3)), 3)
    print(
        json.dumps(
            {
                "integrated_runs": runs,
                "integrated_min": min(runs),
                "per_run_sentinels": sents,
                "sentinel_after": sent_after,
            }
        )
    )


if __name__ == "__main__":
    main()
