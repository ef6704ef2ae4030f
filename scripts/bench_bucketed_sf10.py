"""Bucketed-layout experiment (VERDICT r9 task #3): remove the
lineitem<->orders exchange tax from the sf10 TPC-H rows by paying the
partitioning ONCE at write time.

Writes lineitem and orders bucketed by orderkey (same bucket count), then
times the q5/q10 join shapes against (a) the stock parquet layout and
(b) the bucketed layout, asserting from the formatted plan that no
Exchange feeds the bucketed lineitem<->orders join.  Prints one JSON line:

  {"sf_dir":…, "n_buckets":…, "write_once_sec": {…},
   "stock": {q: sec}, "bucketed": {q: sec},
   "bucketed_join_exchange_free": true, "sentinel_sec": …}

Usage: python scripts/bench_bucketed_sf10.py [sf_dir [n_buckets]]
(defaults /tmp/spark_graft_sf10, 32).  The bucketed tables land under
$SPARK_GRAFT_BUCKET_DIR (default /tmp/spark_graft_bucketed).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import DataFrame, functions as F

from influxdb_iox_spark.session import get_spark
from influxdb_iox_spark.sources.bucketed import read_bucketed, write_bucketed

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf10"
N_BUCKETS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
BUCKET_DIR = os.environ.get(
    "SPARK_GRAFT_BUCKET_DIR", "/tmp/spark_graft_bucketed"
)


def _dec(col: str, prec: str = "12,2") -> F.Column:
    return F.col(col).cast(f"decimal({prec})")


def q5_shape(spark, lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """The q5 join tree with the lineitem<->orders edge parameterized so
    the same code runs over either layout (dims broadcast, as in
    __spark_entry__.q_local_supplier_volume)."""
    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    supplier = spark.read.parquet(f"{SF_DIR}/supplier.parquet")
    nation = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    region = spark.read.parquet(f"{SF_DIR}/region.parquet")
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount", "4,2"))
    nr = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select("n_nationkey", "n_name")
    )
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supplier),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nr), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(revenue).alias("revenue"))
        .orderBy("n_name")
    )


def q10_shape(spark, lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount", "4,2"))
    return (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(F.sum(revenue).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


def _noop(df: DataFrame) -> None:
    df.write.mode("overwrite").format("noop").save()


def _time_min2(fn) -> float:
    runs = []
    for _ in range(2):
        t0 = time.perf_counter()
        _noop(fn())
        runs.append(time.perf_counter() - t0)
    return round(min(runs), 3)


def _plan_of(df: DataFrame) -> str:
    jmode = df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(jmode)


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="iox-spark-bucketed-bench",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            # the bucketed tables live in an external warehouse dir so the
            # experiment never leaves state inside the repo
            "spark.sql.warehouse.dir": os.path.join(BUCKET_DIR, "warehouse"),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.perf_counter()
    spark.range(5_000_000).agg(F.sum(F.col("id") * 2)).collect()
    sentinel = round(time.perf_counter() - t0, 3)

    lineitem_raw = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    orders_raw = spark.read.parquet(f"{SF_DIR}/orders.parquet")

    # stock layout first (fresh JVM warms on it; bucketed runs later get
    # the same warmed state, so the comparison favors neither)
    stock = {
        "tpch_q5": _time_min2(lambda: q5_shape(spark, lineitem_raw, orders_raw)),
        "tpch_q10": _time_min2(lambda: q10_shape(spark, lineitem_raw, orders_raw)),
    }

    # write-once cost: both sides bucketed + sorted by the join key.
    # Repartition to bucket alignment first (same murmur3-pmod hash as the
    # bucket id) so each bucket lands in EXACTLY one file — the reader only
    # trusts bucket sortedness with one file per bucket, and trusting it is
    # what lets the join skip the Sort as well as the Exchange.
    shutil.rmtree(BUCKET_DIR, ignore_errors=True)
    write_once = {}
    t0 = time.perf_counter()
    write_bucketed(
        lineitem_raw.repartition(N_BUCKETS, F.col("l_orderkey")),
        "bk_lineitem", os.path.join(BUCKET_DIR, "lineitem"),
        ["l_orderkey"], N_BUCKETS,
    )
    write_once["lineitem"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    write_bucketed(
        orders_raw.repartition(N_BUCKETS, F.col("o_orderkey")),
        "bk_orders", os.path.join(BUCKET_DIR, "orders"),
        ["o_orderkey"], N_BUCKETS,
    )
    write_once["orders"] = round(time.perf_counter() - t0, 3)

    lineitem_b = read_bucketed(spark, "bk_lineitem")
    orders_b = read_bucketed(spark, "bk_orders")

    # plan assertion: neither Exchange NOR Sort anywhere in the BARE join
    # plan (no downstream aggregate — it would shuffle on its own key, and
    # a pre-HashAggregate text split is vacuous in formatted AQE output:
    # the tree section leads with the aggregate.  Round-11 fix; the r10
    # run's sort_free=true was from the vacuous split).
    import re as _re

    plan = _plan_of(
        lineitem_b.join(
            orders_b, F.col("l_orderkey") == F.col("o_orderkey")
        )
    )
    exchange_free = "Exchange" not in plan
    sort_free = not _re.search(r"\bSort\b", plan)

    bucketed = {
        "tpch_q5": _time_min2(lambda: q5_shape(spark, lineitem_b, orders_b)),
        "tpch_q10": _time_min2(lambda: q10_shape(spark, lineitem_b, orders_b)),
    }

    # correctness twin: both layouts must produce identical q5 revenues
    a = {(r.n_name, str(r.revenue)) for r in q5_shape(spark, lineitem_raw, orders_raw).collect()}
    b = {(r.n_name, str(r.revenue)) for r in q5_shape(spark, lineitem_b, orders_b).collect()}
    assert a == b, "bucketed layout changed q5 results"

    print(json.dumps({
        "sf_dir": SF_DIR,
        "n_buckets": N_BUCKETS,
        "sentinel_sec": sentinel,
        "write_once_sec": write_once,
        "stock": stock,
        "bucketed": bucketed,
        "bucketed_join_exchange_free": exchange_free,
        "bucketed_join_sort_free": sort_free,
    }))
    spark.sql("DROP TABLE IF EXISTS bk_lineitem")
    spark.sql("DROP TABLE IF EXISTS bk_orders")
    spark.stop()


if __name__ == "__main__":
    main()
