"""EXPLAIN-verified pushdown goldens.

Mirrors the reference's golden-file EXPLAIN tests
(query_tests/cases/in/pushdown.sql — predicate pushdown verified against the
physical plan) for the Spark engine: predicates and projections must reach
the parquet scan, broadcast joins must be chosen for small dims, and the
dedup aggregate must be a single exchange.
"""

from __future__ import annotations

import re

import pytest

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def formatted(df) -> str:
    jmode = df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(jmode)


def plan_of(spark, name: str) -> str:
    return formatted(E.queries()[name](spark, SF))


def scan_sections(plan: str) -> list[str]:
    """Each '(n) Scan parquet' detail block of a formatted explain."""
    return re.findall(r"\(\d+\) Scan parquet.*?(?=\n\(\d+\)|\Z)", plan, re.S)


def test_filter_pushdown_reaches_scan(spark):
    plan = plan_of(spark, "rpc_read_filter")
    scans = scan_sections(plan)
    assert any("EqualTo(event_type,click)" in s for s in scans)
    assert any("GreaterThan(value,100.0)" in s for s in scans)
    assert any("GreaterThanOrEqual(ts," in s for s in scans)


def test_date_filter_pushdown_tpch(spark):
    plan = plan_of(spark, "tpch_q1_pricing_summary")
    assert any("LessThan(l_shipdate" in s for s in scan_sections(plan))


def test_column_pruning(spark):
    # Q1 touches 7 lineitem columns; the scan must not read the rest
    plan = plan_of(spark, "tpch_q1_pricing_summary")
    scan = scan_sections(plan)[0]
    m = re.search(r"ReadSchema: struct<([^>]*)>", scan)
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert "l_orderkey" not in cols and "l_partkey" not in cols
    assert {"l_quantity", "l_extendedprice", "l_discount", "l_returnflag"} <= cols


def test_broadcast_join_for_small_dims(spark):
    plan = plan_of(spark, "tpch_q5_local_supplier")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_dedup_single_exchange_no_sort(spark):
    plan = plan_of(spark, "dedup_last_non_null")
    # one hash exchange for the PK aggregate; no global sort operator
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "hashpartitioning" in plan
    assert not re.search(r"\(\d+\) Sort\b", plan)
    assert "max_by" in plan


def test_topk_is_take_ordered_not_global_sort(spark):
    plan = plan_of(spark, "top_orders_limit")
    assert "TakeOrderedAndProject" in plan


def test_metadata_media_scan_prunes_blob(spark):
    from influxdb_iox_spark.pipeline.multimodal import docs_to_media, filter_by_metadata

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        docs_to_media(docs).write.parquet(f"{d}/media")
        df = spark.read.parquet(f"{d}/media")
        plan = formatted(filter_by_metadata(df, min_width=100))
        scan = scan_sections(plan)[0]
        assert "blob" not in scan.split("ReadSchema:")[-1]

def test_series_transforms_partitioned_window_single_exchange(spark):
    """The transform suite must shuffle ONCE on the series key: every
    window (lag / running sum / sliding frame) shares the same
    partitioning, so Catalyst reuses a single hashpartitioning exchange
    (plus the final presentation sort)."""
    plan = plan_of(spark, "series_transforms")
    exchanges = re.findall(r"\(\d+\) Exchange.*?(?=\n\(\d+\)|\Z)", plan, re.S)
    hash_ex = [e for e in exchanges if "hashpartitioning" in e]
    assert len(hash_ex) == 1, plan
    assert "event_type" in hash_ex[0]
    # exactly one Window operator evaluates all five frames
    assert len(re.findall(r"\(\d+\) Window\b", plan)) == 1


def test_paragraph_dedup_stays_jvm_side(spark):
    """Segment dedup is codegen column work + digest-keyed shuffles —
    no Python eval nodes, no cross join, no broadcast of the corpus."""
    plan = plan_of(spark, "doc_paragraph_dedup")
    assert "EvalPython" not in plan and "InPandas" not in plan
    assert "CartesianProduct" not in plan
    # first-occurrence-wins is ONE min-struct aggregate — no join-back,
    # so the whole dedup is digest-agg + per-doc reassembly
    assert "min(" in plan
    # the only join left is totals-vs-rebuilt on the doc id
    assert len(re.findall(r"\(\d+\) (?:SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)", plan)) == 1


def test_tpch_q2_broadcasts_dims_only(spark):
    """Q2's dimensions (part/supplier/nation/region) broadcast; lineitem
    must never be the build side of a broadcast."""
    plan = plan_of(spark, "tpch_q2_min_cost_supplier_adapted")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert any("lineitem" in s for s in scan_sections(plan)), "lineitem scan missing"
    # part-filter predicates must reach the part scan
    assert any("EqualTo(p_type,ECONOMY)" in s for s in scan_sections(plan))


def test_tombstone_scan_plan_shape(spark, tmp_path):
    """Delete tombstones must not degrade the scan plan: without
    deletes the plan is byte-identical to before (zero tombstone reads
    in the plan); with one delete over N clean chunks the chunks still
    batch into ONE multi-path parquet relation, and the anti-filter is
    PUSHED to the scan (PushedFilters), not evaluated post-hoc."""
    from influxdb_iox_spark.database import Database
    from influxdb_iox_spark.plans.predicate import DeleteExpr, DeletePredicate
    from influxdb_iox_spark.schema import InfluxColumnType, IoxSchema
    from influxdb_iox_spark.sources.store import TableStore

    schema = IoxSchema.build(["host"], {"v": InfluxColumnType.FIELD_FLOAT})
    store = TableStore(str(tmp_path / "d"))
    db = Database("db", store, spark)
    db.register_table("cpu", schema)
    for i in range(3):  # three non-overlapping clean chunks
        store.write_chunk(
            spark.createDataFrame(
                [("h1", 1.0, 100 * i + 1), ("h2", 2.0, 100 * i + 2)],
                "host string, v double, time long",
            ),
            "cpu", schema,
        )
    clean_plan = db.table("cpu")._jdf.queryExecution().executedPlan().toString()
    assert clean_plan.count("FileScan parquet") == 1  # one batched relation

    store.delete_predicate(
        "cpu",
        DeletePredicate(start=0, stop=150, exprs=[DeleteExpr("host", "=", "h1")]),
    )
    plan = db.table("cpu")._jdf.queryExecution().executedPlan().toString()
    # all three chunks share the one tombstone -> still ONE relation
    assert plan.count("FileScan parquet") == 1
    # the anti-filter reaches the parquet scan as pushed predicates
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert pushed.strip(), f"tombstone filter not pushed: {plan}"
    # and the results are right
    got = sorted((r.host, r.time) for r in db.table("cpu").collect())
    assert got == [
        ("h1", 201), ("h2", 2), ("h2", 102), ("h2", 202),
    ]


def _series_bucket_plan_shape(plan: str) -> None:
    """The bucket-then-series shape both r13 series gates share, pinned
    deliberately: exchange #1 keys on (event_type, hr) — fine-grained
    parallelism for the HEAVY hourly aggregate over raw events — and
    exchange #2 re-keys the tiny hourly rows on event_type alone for
    the window/aggregate.  Collapsing to one exchange is possible
    (pre-partition by event_type satisfies the clustered distribution)
    but would run the raw-events aggregate at series-count parallelism
    — the wrong trade at scale, so TWO exchanges is the asserted plan,
    with the series-keyed one carrying only bucketed rows."""
    exchanges = re.findall(r"\(\d+\) Exchange.*?(?=\n\(\d+\)|\Z)", plan, re.S)
    hash_ex = [e for e in exchanges if "hashpartitioning" in e]
    assert len(hash_ex) == 2, plan
    assert any(
        "event_type" in e and "groupingexpression" in e for e in hash_ex
    ), plan  # the fine-grained bucket-agg exchange
    assert any(
        "event_type" in e and "groupingexpression" not in e for e in hash_ex
    ), plan  # the series-keyed exchange over bucketed rows only


def test_changepoints_plan_shape(spark):
    """CUSUM changepoints: bucket-then-series two-exchange shape; the
    ordered window (prefix sums) and the per-series aggregate share the
    series-keyed partitioning."""
    plan = plan_of(spark, "series_changepoints")
    _series_bucket_plan_shape(plan)
    # two Window operators (the ORDERED prefix-sum/row-number pass and
    # the whole-partition stats pass) but both ride the one series-keyed
    # exchange asserted above — no extra shuffle between them
    assert len(re.findall(r"\(\d+\) Window\b", plan)) == 2


def test_median_filter_plan_shape(spark):
    """Sliding-median despike: bucket-then-series shape, one Window
    operator, and the median is the exact percentile aggregate (never
    approx_percentile)."""
    plan = plan_of(spark, "series_median_filter")
    _series_bucket_plan_shape(plan)
    assert len(re.findall(r"\(\d+\) Window\b", plan)) == 1
    assert "percentile" in plan and "approx_percentile" not in plan


def test_sessionize_plan_shape(spark):
    """Sessionization: the lag window, the boundary-sum window, AND the
    per-session stats aggregate all ride ONE series-keyed hash exchange
    (hashpartitioning(user_id) satisfies the (user_id, session_id)
    clustering); only the presentation ORDER BY adds a range exchange."""
    plan = plan_of(spark, "events_sessionize")
    final = plan.split("== Initial Plan ==")[0]
    hashex = re.findall(
        r"\(\d+\) Exchange\s*\nInput[^\n]*\nArguments: hashpartitioning",
        final,
    )
    assert len(hashex) == 1, final
    assert len(re.findall(r"\(\d+\) Window\b", final)) == 2
    # the aggregate sits directly on the windowed output: partial+final
    # HashAggregate pair with no exchange between them
    assert re.search(
        r"HashAggregate(?:(?!Exchange).)*HashAggregate", final, re.S
    )


def test_lttb_plan_shape(spark):
    """LTTB: no cartesian products, no Python rows (pure codegen
    expressions), and the per-bucket argmax is a rank-1 filter that
    Spark rewrites into WindowGroupLimit (top-1 per group pushed into
    the sort, never a full per-bucket sort retained)."""
    plan = plan_of(spark, "events_lttb_downsample")
    final = plan.split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in final
    assert "EvalPython" not in final and "InPandas" not in final
    assert "WindowGroupLimit" in final


def test_q5_preagg_is_hash_aggregate_with_reused_partitioning(spark):
    """Round-15 q5 restructure goldens: the revenue pre-aggregation must
    stay a HashAggregate (a string min in the buffer would demote it to
    SortAggregate and re-sort the fact rows), the customer join must be
    shuffled-hash on the pre-agg's own (custkey, nationkey) keys — NO
    extra exchange between the aggregate and the join — and supplier/
    nation/region stay broadcast."""
    plan = plan_of(spark, "tpch_q5_local_supplier")
    assert "SortAggregate" not in plan
    assert "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" in plan
    # exchanges: lineitem, orders, customer, the pre-agg, and the final
    # two aggs' n_name hash + the orderBy range exchange = 6 total; the
    # join side of the pre-agg must NOT add a seventh
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 6
    # the pre-agg partitioning doubles as the customer join distribution
    assert "hashpartitioning(o_custkey" in plan


def test_interval_join_never_nested_loop_at_query_level(spark):
    plan = plan_of(spark, "events_interval_join")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # the expansion explode feeds an equi-join
    assert "Explode" in plan or "Generate" in plan


def test_q3_preagg_top10_is_take_ordered_no_post_join_agg(spark):
    """Round-16 q3 restructure goldens (the q5/q10 pre-agg trick): the
    revenue limbs collapse by l_orderkey BEFORE the orders join (group
    key contains the join key; o_orderdate is functionally determined),
    the pre-agg stays a HashAggregate with a long-only buffer, its
    l_orderkey exchange doubles as the SHJ distribution, and the top-10
    plans as TakeOrderedAndProject with NO aggregate above the joins."""
    plan = plan_of(spark, "tpch_q3_shipping_priority")
    assert "SortAggregate" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" in plan
    # lineitem scan, orders scan, pre-agg, orders-join side = 4 exchanges
    # max; a post-join aggregate or a second pre-agg shuffle would add more
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 4
    # no aggregate above the joins: the only HashAggregate nodes are the
    # two-phase (partial + final) pre-agg below them
    assert len(re.findall(r"\(\d+\) HashAggregate", plan)) == 2
