"""Round-16 sf10 probes: the five round-15 operators the verdict asked
to confirm at the sf10 decade (interval_join, funnel, retention,
kmv_sliding, snapshot_diff), the restructured tpch_q3, and the two new
round-16 operators — each min-of-3 with per-row single-shot sentinels
(bench.py's protocol: a row with an elevated sentinel was measured
under co-tenant load and says so).

Usage:  python scripts/bench_r16_probes.py [sf_dir]   (default sf10)
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
    "events_interval_join",
    "events_funnel_horizon",
    "events_retention",
    "events_kmv_sliding",
    "doc_snapshot_diff",
    "events_moment_sliding",
    "events_sample_quantiles",
    "doc_weighted_sample",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf10"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    queries = entry_mod.queries()

    from pyspark.sql import functions as F

    sent_df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    def sentinel_once() -> float:
        t = time.time()
        sent_df.select(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        ).collect()
        return time.time() - t

    sentinel_once(), sentinel_once()  # untimed JIT warm (round-15 fix)
    sent_before = round(min(sentinel_once() for _ in range(3)), 3)

    out = {}
    for name in PROBES:
        fn = queries[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        sent = round(sentinel_once(), 3)
        runs = []
        for _ in range(3):
            t = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t, 3))
        out[name] = {"min": min(runs), "runs": runs, "sentinel": sent}
        print(json.dumps({name: out[name]}), flush=True)

    sent_after = round(min(sentinel_once() for _ in range(3)), 3)
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "sentinel_before": sent_before,
                "sentinel_after": sent_after,
                "probes": out,
            }
        )
    )


if __name__ == "__main__":
    main()
