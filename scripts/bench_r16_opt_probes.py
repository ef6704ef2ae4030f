"""Round-16 OPTIMIZATION sf10 probes: every query whose operator was
restructured this round, min-of-3 with per-row single-shot sentinels
(bench.py's protocol), plus tpch_q3 (the round-15 verdict's standing
ask — its pre-agg plan's sf10 vintage under a clean sentinel was never
recorded).

Usage:  python scripts/bench_r16_opt_probes.py [sf_dir] [names...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("SPARK_DRIVER_MEM", "48g")

import __spark_entry__ as entry_mod
from influxdb_iox_spark.session import get_spark

PROBES = [
    "tpch_q3_shipping_priority",
    "tpch_q21_waiting_supplier",
    "events_lttb_downsample",
    "simhash_near_dup",
    "minhash_near_dup",
    "corpus_ngram_topk",
    "doc_bm25_topk",
    "doc_nb_classify",
    "doc_dup_spans",
    "doc_dup_span_removal",
    "events_kmv_overlap",
    "series_seasonal_decompose",
]


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/tmp/spark_graft_sf10"
    names = args[1:] or PROBES
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()

    from pyspark.sql import functions as F

    sent_df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    def sentinel_once() -> float:
        t = time.time()
        sent_df.select(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        ).collect()
        return time.time() - t

    sentinel_once(), sentinel_once()  # untimed JIT warm
    sent_before = round(min(sentinel_once() for _ in range(3)), 3)
    print(json.dumps({"sent_before": sent_before, "sf_dir": sf_dir}), flush=True)

    for name in names:
        fn = queries[name]
        s0 = round(sentinel_once(), 3)
        runs = []
        for _ in range(3):
            t0 = time.time()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            runs.append(round(time.time() - t0, 3))
        print(
            json.dumps({"name": name, "runs": runs, "min": min(runs), "sent": s0}),
            flush=True,
        )
    print(json.dumps({"sent_after": round(min(sentinel_once() for _ in range(3)), 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
