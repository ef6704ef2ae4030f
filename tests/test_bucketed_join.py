"""Bucketed co-located join: same-bucket tables join with ZERO exchanges,
and with one file per bucket (the default) the join is Sort-free too —
the round-10 sf10 finding promoted into the store as a first-class layout
(sources/bucketed.py, TableStore.write_bucketed_projection).

Plan assertions run on the BARE join (no downstream aggregate): a
groupBy after the join legitimately shuffles on its own key, and carving
it out of a formatted AQE plan by text-splitting is vacuous (the tree
section leads with the aggregate)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from influxdb_iox_spark.schema import InfluxColumnType, IoxSchema
from influxdb_iox_spark.sources.bucketed import (
    assert_colocated_join,
    bucket_file_counts,
    plan_of,
    read_bucketed,
    write_bucketed,
)
from influxdb_iox_spark.sources.store import TableStore

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def no_broadcast(spark):
    """At sf0.001 every side fits the broadcast threshold and Catalyst
    bypasses bucketing entirely ("Bucketed: false (disabled by query
    planner)") — correct at this size, but it would no-op the co-location
    assertions.  Forcing the shuffle-join path is what simulates the
    100 TB fact-fact case the layout exists for."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_no_exchange_no_sort(spark, tmp_path, no_broadcast):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet")
    write_bucketed(orders, "b_orders", str(tmp_path / "bo"), ["o_orderkey"], 8)
    write_bucketed(
        lineitem, "b_lineitem", str(tmp_path / "bl"), ["l_orderkey"], 8
    )
    try:
        # one-file-per-bucket invariant held on disk
        for d in ("bo", "bl"):
            counts = bucket_file_counts(str(tmp_path / d))
            assert counts and all(c == 1 for c in counts.values()), counts
        bare = read_bucketed(spark, "b_lineitem").join(
            read_bucketed(spark, "b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        # co-located AND pre-sorted: neither Exchange nor Sort anywhere
        assert_colocated_join(bare)
        # correctness unchanged vs unbucketed
        agg = bare.groupBy("o_orderstatus").agg(F.count("*").alias("n"))
        expect = {
            (r.o_orderstatus, r.n)
            for r in lineitem.join(
                orders, F.col("l_orderkey") == F.col("o_orderkey")
            )
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert {(r.o_orderstatus, r.n) for r in agg.collect()} == expect
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_multi_file_buckets_reintroduce_sort(spark, tmp_path, no_broadcast):
    """The guard the one-file-per-bucket invariant exists for: the same
    bucketed table written WITHOUT write alignment gets >1 file in some
    bucket, and the join plan re-grows a Sort (though still no Exchange)."""
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet").repartition(6)
    orders = spark.read.parquet(f"{SF}/orders.parquet").repartition(6)
    write_bucketed(
        lineitem, "m_lineitem", str(tmp_path / "ml"), ["l_orderkey"], 4,
        one_file_per_bucket=False,
    )
    write_bucketed(
        orders, "m_orders", str(tmp_path / "mo"), ["o_orderkey"], 4,
        one_file_per_bucket=False,
    )
    try:
        counts = bucket_file_counts(str(tmp_path / "ml"))
        assert any(c > 1 for c in counts.values()), counts
        bare = read_bucketed(spark, "m_lineitem").join(
            read_bucketed(spark, "m_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = plan_of(bare)
        assert "Exchange" not in plan, plan
        assert "Sort" in plan, plan  # sortedness not trusted
        with pytest.raises(AssertionError, match="still sorts"):
            assert_colocated_join(bare)
    finally:
        spark.sql("DROP TABLE IF EXISTS m_lineitem")
        spark.sql("DROP TABLE IF EXISTS m_orders")


def test_gate_query_green_in_bare_session(spark):
    """Round-11 regression: the driver harness builds its OWN
    SparkSession (no session.get_spark builder), where the SPARK-28595
    ordering flag defaulted false and the gate query red-rowed on
    re-introduced Sorts.  Pin portability: in a session where the flag
    is explicitly FALSE, the query itself must flip it (the layout
    contract is self-contained) and pass its own colocation assertion."""
    import __spark_entry__ as E

    s2 = spark.newSession()
    s2.conf.set(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "false"
    )
    df = E.queries()["bucketed_join_revenue"](s2, "/root/testdata/sf0.01")
    assert len(df.collect()) > 0
    assert (
        s2.conf.get("spark.sql.legacy.bucketedTableScan.outputOrdering")
        == "true"
    )


CPU = IoxSchema.build(["host"], {"user": InfluxColumnType.FIELD_FLOAT})


def _make_store(spark, tmp_path):
    store = TableStore(str(tmp_path / "store"))
    rows1 = [(f"h{i % 7}", float(i), 100 + i) for i in range(50)]
    # overlapping chunk upserting some PKs — the projection must carry the
    # DEDUP-CORRECT scan, not a raw union of chunks
    rows2 = [("h1", 999.0, 101), ("h2", 998.0, 102)]
    store.write_chunk(
        spark.createDataFrame(rows1, "host string, user double, time long"),
        "cpu", CPU, partition_key="p1",
    )
    store.write_chunk(
        spark.createDataFrame(rows2, "host string, user double, time long"),
        "cpu", CPU, partition_key="p1",
    )
    return store


def test_store_bucketed_projection_joins_colocated(spark, tmp_path, no_broadcast):
    store = _make_store(spark, tmp_path)
    spec = store.write_bucketed_projection(
        spark, "cpu", CPU, ["host"], n_buckets=4, name="by_host"
    )
    assert spec["n_buckets"] == 4 and spec["one_file_per_bucket"]
    # a dim table bucketed with the SAME count on the join key
    dims = spark.createDataFrame(
        [(f"h{i}", f"rack{i % 2}") for i in range(7)], "host string, rack string"
    )
    write_bucketed(dims, "bk_hostinfo", str(tmp_path / "hi"), ["host"], 4)
    try:
        proj = store.bucketed_projection(spark, "cpu", "by_host")
        bare = proj.join(read_bucketed(spark, "bk_hostinfo"), "host")
        assert_colocated_join(bare)
        # values match the dedup-correct scan joined the plain way
        j = bare.groupBy("rack").agg(F.sum("user").alias("total"))
        base = (
            store.scan(spark, "cpu", CPU)
            .join(dims, "host")
            .groupBy("rack")
            .agg(F.sum("user").alias("total"))
        )
        assert {tuple(r) for r in j.collect()} == {
            tuple(r) for r in base.collect()
        }
        # the upserted PK carries the LAST value (dedup happened pre-write)
        assert proj.filter(
            (F.col("host") == "h1") & (F.col("time") == 101)
        ).select("user").collect()[0][0] == 999.0
        # operation recorded
        ops = [o for o in store.operations() if o["job"] == "bucketed_projection"]
        assert ops and ops[-1]["table_name"] == "cpu"
        # spec listing
        assert [s["n_buckets"] for s in store.bucketed_projections("cpu")] == [4]
    finally:
        spark.sql("DROP TABLE IF EXISTS cpu__bk_by_host")
        spark.sql("DROP TABLE IF EXISTS bk_hostinfo")


def test_bucketed_projection_survives_fresh_catalog(spark, tmp_path, no_broadcast):
    """Bucket metadata lives in the session catalog; the spec sidecar must
    be enough to re-register in a catalog that has never seen the table."""
    store = _make_store(spark, tmp_path)
    store.write_bucketed_projection(
        spark, "cpu", CPU, ["host"], n_buckets=4, name="by_host"
    )
    try:
        spark.sql("DROP TABLE cpu__bk_by_host")  # simulate a fresh session
        proj = store.bucketed_projection(spark, "cpu", "by_host")
        # self-join through the re-registered entry is still co-located
        bare = proj.alias("a").join(
            store.bucketed_projection(spark, "cpu", "by_host").alias("b"),
            "host",
        )
        assert_colocated_join(bare)
        assert proj.count() == 50
    finally:
        spark.sql("DROP TABLE IF EXISTS cpu__bk_by_host")
