"""Sentinel-bracketed per-query timer for optimization before/after runs.

Usage: python scripts/qtime.py <query> [<query> ...] [--runs N]

Starts ONE fresh JVM with the bench's exact session + warmup, then for
each named query: sentinel, N timed noop-sink runs, sentinel.  Prints a
compact JSON line per query: {"name", "runs": [...], "min", "sent": [...]}.
The sentinel is bench.py's fixed decimal/hash aggregate (JIT-warmed
untimed first), so numbers are comparable to the gate records row-by-row
and a co-tenant storm is visible in the brackets instead of silently
poisoning the row.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from influxdb_iox_spark.session import get_spark


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs_n = 3
    for a in sys.argv[1:]:
        if a.startswith("--runs"):
            runs_n = int(a.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="iox-spark-qtime",
        master=f"local[{cpus}]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    import pyspark.sql.functions as F

    queries = entry_mod.queries()

    # bench.py's exact warmup (JVM + codegen paths)
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    spark.range(1000).agg(
        F.sum(F.col("id").cast("decimal(12,2)")), F.min(F.hash("id"))
    ).collect()
    from influxdb_iox_spark.pipeline.dedup import near_duplicate_pairs_minhash

    warm_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(2000)
    near_duplicate_pairs_minhash(
        warm_docs, threshold=0.5, materialize="parquet"
    ).write.mode("overwrite").format("noop").save()

    def sentinel_once() -> float:
        t0 = time.perf_counter()
        spark.range(5_000_000).select(
            F.sum(F.col("id").cast("decimal(18,2)")).alias("s"),
            F.min(F.hash("id")).alias("h"),
        ).write.mode("overwrite").format("noop").save()
        return round(time.perf_counter() - t0, 3)

    sentinel_once()
    sentinel_once()

    for name in args:
        fn = queries[name]
        s0 = sentinel_once()
        runs = []
        for _ in range(runs_n):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            runs.append(round(time.perf_counter() - t0, 3))
        s1 = sentinel_once()
        print(
            json.dumps(
                {"name": name, "runs": runs, "min": min(runs), "sent": [s0, s1]}
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
