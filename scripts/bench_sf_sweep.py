"""Scale sweep: time the comparable headline queries on BOTH engines at
several scale factors in one session — extends BENCH_NOTES §2's
fixed-overhead table by the sf1 decade (VERDICT r6 task #2).

Usage: python scripts/bench_sf_sweep.py [sf_dir ...]
Defaults to /root/testdata/sf0.01, /root/testdata/sf0.1, $SPARK_GRAFT_SF1_DIR.

Prints one JSON line per (sf_dir): {"sf_dir":…, "spark": {q: sec},
"duckdb": {q: sec}, "sentinel_sec": …}.  Spark times are min-of-2
noop-sink runs (same protocol as bench.py); DuckDB runs the SAME
queries from oracle_sql() with 32 threads, min-of-2, results fetched.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import duckdb

# Memory-fair single-node comparison: DuckDB uses the whole host (125 GiB
# here); Spark's 16g default driver heap makes the sf10 fact joins spill.
# 48g measured q5 14.3->10.7 s, q10 ~9.8->6.9 s (BENCH_NOTES S29
# addendum).  Overridable, like everywhere else.
os.environ.setdefault("SPARK_DRIVER_MEM", "48g")

import __spark_entry__ as entry_mod
from influxdb_iox_spark.session import get_spark

QUERIES = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    "tpch_q10_returned_revenue",
    "rpc_read_filter",
    "rpc_read_group_two_tags",
    "rpc_window_agg_1h",
    "rpc_selector_last_first",
    "dedup_last_non_null",
    "doc_token_stats",
    "doc_exact_dedup",
    "doc_lang_id",
    "minhash_near_dup",
    "emb_cosine_topk",
]

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
        os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1"),
    ]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="iox-sf-sweep", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    import pyspark.sql.functions as F

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    # same warmup protocol as bench.py (JIT the minhash plan shape once)
    from influxdb_iox_spark.pipeline.dedup import near_duplicate_pairs_minhash

    spark.range(1000).agg(
        F.sum(F.col("id").cast("decimal(12,2)")), F.min(F.hash("id"))
    ).collect()
    warm_docs = spark.read.parquet(f"{dirs[0]}/documents.parquet").limit(2000)
    near_duplicate_pairs_minhash(
        warm_docs, threshold=0.5, materialize="parquet"
    ).write.mode("overwrite").format("noop").save()

    def _sentinel_once() -> float:
        t0 = time.perf_counter()
        spark.range(5_000_000).select(
            F.sum(F.col("id").cast("decimal(18,2)")).alias("s"),
            F.min(F.hash("id")).alias("h"),
        ).write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    # Untimed sentinel warmup + min-of-2, same as bench.py (round 15):
    # a fresh JVM's first sentinel measures JIT compilation (~0.2-0.35 s
    # vs ~0.1 warm) — r14's four sweep attempts all read 0.34-0.73 partly
    # from this artifact, not only co-tenancy.  The sentinel exists to
    # measure MACHINE state; warm it like everything else.
    _sentinel_once()

    def sentinel() -> float:
        return round(min(_sentinel_once() for _ in range(2)), 3)

    for sf_dir in dirs:
        spark_t: dict[str, float] = {}
        duck_t: dict[str, float] = {}
        sent = sentinel()
        for name in QUERIES:
            runs = []
            for _ in range(2):
                t0 = time.perf_counter()
                queries[name](spark, sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
                runs.append(time.perf_counter() - t0)
            spark_t[name] = round(min(runs), 3)
        con = duckdb.connect()
        con.execute(f"SET threads TO {cpus}")
        for t in TABLES:
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        skip_duck = set(
            filter(None, os.environ.get("SPARK_GRAFT_DUCK_SKIP", "").split(","))
        )
        for name in QUERIES:
            sql = oracles.get(name)
            if sql is None or name in skip_duck:
                continue
            runs = []
            for _ in range(2):
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
                runs.append(time.perf_counter() - t0)
            duck_t[name] = round(min(runs), 3)
        con.close()
        print(
            json.dumps(
                {
                    "sf_dir": sf_dir,
                    "sentinel_sec": sent,
                    "spark": spark_t,
                    "spark_total": round(sum(spark_t.values()), 3),
                    "duckdb": duck_t,
                    "duckdb_total": round(sum(duck_t.values()), 3),
                    "duckdb_skipped": sorted(skip_duck),
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
