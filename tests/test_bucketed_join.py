"""Bucketed co-located join: same-bucket tables join with ZERO exchanges."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from influxdb_iox_spark.sources.bucketed import read_bucketed, write_bucketed

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet")
    write_bucketed(orders, "b_orders", str(tmp_path / "bo"), ["o_orderkey"], 8)
    write_bucketed(
        lineitem, "b_lineitem", str(tmp_path / "bl"), ["l_orderkey"], 8
    )
    try:
        j = (
            read_bucketed(spark, "b_lineitem")
            .join(
                read_bucketed(spark, "b_orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
        )
        jmode = j._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = j._jdf.queryExecution().explainString(jmode)
        join_section = plan.split("HashAggregate")[0]
        # co-located: no shuffle feeding the join
        assert "Exchange" not in join_section, join_section
        # correctness unchanged vs unbucketed
        expect = {
            (r.o_orderstatus, r.n)
            for r in lineitem.join(
                orders, F.col("l_orderkey") == F.col("o_orderkey")
            )
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        got = {(r.o_orderstatus, r.n) for r in j.collect()}
        assert got == expect
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
