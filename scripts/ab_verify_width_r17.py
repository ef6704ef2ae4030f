"""Round-17 A/B for the minhash verify stage's shuffle WIDTH (VERDICT
r16 item 3, guide §2.3/§8): the shipped shape attaches each surviving
pair's full shingle-hash array before the second pair join, so that
exchange carries one |A|-element array per pair; the candidate
restructure explodes the signature sets into (id, hash) rows doc-side
and counts the intersection with a (b, hash) equi-join + pair
aggregate — NO array column ever crosses a pair-keyed exchange.

The shipped side IS `jaccard_verify` imported from pipeline.dedup (the
round-16 advice: never re-implement the shipped shape inline).  Exact
row equality is asserted before timing; shapes alternate per round with
single-shot sentinels.

Usage: python scripts/ab_verify_width_r17.py [sf_dir] [--runs=N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("SPARK_DRIVER_MEM", "48g")

from influxdb_iox_spark.session import get_spark


def verify_rows(pairs, sig_df, id_col, threshold):
    """Exploded-rows intersection count: pair exchanges carry longs only.

    Identical output to jaccard_verify for threshold > 0: the inner
    (b, hash) join drops zero-intersection pairs, whose jaccard 0 the
    threshold filter drops anyway; sets are distinct/null-free by the
    minhash_signatures contract, so count(*) over matches is |A∩B|.
    """
    import pyspark.sql.functions as F

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
    sr = sig_df.select(F.col(id_col), F.explode("shingles").alias("__h"))
    ra = sr.withColumnsRenamed({id_col: "a"})
    rb = sr.withColumnsRenamed({id_col: "b"})
    # the (b, hash) join gets NO shuffle_hash hint: both sides are
    # corpus-scale row tables (pairs×|A| probe, corpus shingle rows
    # build) and a forced per-partition hash map OOMs at sf10 — the
    # sort-merge join spills gracefully (guide §3.1)
    counts = (
        survivors.hint("shuffle_hash")
        .join(ra, "a")
        .join(rb, ["b", "__h"])
        .groupBy("a", "b")
        .agg(
            F.count("*").alias("__i"),
            F.max("__n_a").alias("__n_a"),
            F.max("__n_b").alias("__n_b"),
        )
    )
    return counts.select(
        "a",
        "b",
        (
            F.col("__i")
            / F.greatest(F.col("__n_a") + F.col("__n_b") - F.col("__i"), F.lit(1))
        ).alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)


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

    from influxdb_iox_spark.pipeline.dedup import (
        jaccard_verify,
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

    _sentinel_once(), _sentinel_once()
    print(json.dumps(
        {"sentinel_before": min(_sentinel_once() for _ in range(3))}
    ), flush=True)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sigs = materialize_parquet(minhash_signatures(docs, "text", "doc_id", 3, 64))
    cands = materialize_parquet(lsh_candidate_pairs(sigs, "doc_id", 64, 16))
    n_cands = cands.count()

    old_rows = sorted(jaccard_verify(cands, sigs, "doc_id", 0.5).collect())
    new_rows = sorted(verify_rows(cands, sigs, "doc_id", 0.5).collect())
    assert old_rows == new_rows, (
        f"MISMATCH: {len(old_rows)} old vs {len(new_rows)} new rows"
    )
    print(json.dumps({"n_candidates": n_cands, "n_pairs": len(old_rows),
                      "equivalence": "exact"}), flush=True)

    for fn in (jaccard_verify, verify_rows):
        fn(cands.limit(500), sigs, "doc_id", 0.5).write.mode(
            "overwrite"
        ).format("noop").save()

    results = {"old": [], "new": [], "sent": []}
    for r in range(runs_n):
        order = (("old", jaccard_verify), ("new", verify_rows))
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
