"""RPC predicate-tree translation tests (expr.rs port semantics)."""

from __future__ import annotations

import pytest

from influxdb_iox_spark.plans.rpc_expr import (
    RpcExprError,
    rpc_predicate_to_predicate,
)


def tag(v):
    return {"node_type": "tag_ref", "value": v}


def lit(v):
    return {"node_type": "literal", "value": v}


def cmp(op, l, r):
    return {"node_type": "comparison", "op": op, "children": [l, r]}


def logical(op, *children):
    return {"node_type": "logical", "op": op, "children": list(children)}


def test_measurement_pseudo_tag_becomes_table_list(spark):
    root = logical(
        "and",
        cmp("eq", tag("\x00"), lit("cpu")),
        cmp("gt", {"node_type": "field_ref", "value": "usage"}, lit(50)),
    )
    pred = rpc_predicate_to_predicate(root)
    assert pred.table_names == ["cpu"]
    assert len(pred.exprs) == 1


def test_measurement_or_chain_is_in_list(spark):
    root = logical(
        "or",
        cmp("eq", tag("_measurement"), lit("cpu")),
        cmp("eq", tag("_measurement"), lit("disk")),
    )
    pred = rpc_predicate_to_predicate(root)
    assert pred.table_names == ["cpu", "disk"]
    assert pred.exprs == []


def test_field_pseudo_tag_becomes_projection(spark):
    pred = rpc_predicate_to_predicate(cmp("eq", tag("\xff"), lit("usage")))
    assert pred.field_columns == ["usage"]


def test_and_tree_flattens_to_conjuncts(spark):
    root = logical(
        "and",
        cmp("eq", tag("region"), lit("west")),
        logical(
            "and",
            cmp("gt", {"node_type": "field_ref", "value": "v"}, lit(1)),
            cmp("lt", {"node_type": "field_ref", "value": "v"}, lit(9)),
        ),
    )
    pred = rpc_predicate_to_predicate(root)
    # simple col-vs-literal conjuncts lift to STRUCTURED bounds (readable by
    # the chunk pruner); eq expands to [v, v], so 4 row exprs from 3 nodes
    assert len(pred.exprs) == 4
    assert ("region", "west", "west", False, False) in pred.col_ranges
    assert ("v", 1, None, True, False) in pred.col_ranges
    assert ("v", None, 9, False, True) in pred.col_ranges


def test_translated_exprs_filter_correctly(spark):
    df = spark.createDataFrame(
        [("west", 5.0), ("west", 20.0), ("east", 5.0)], "region string, v double"
    )
    root = logical(
        "and",
        cmp("eq", tag("region"), lit("west")),
        cmp("lte", {"node_type": "field_ref", "value": "v"}, lit(10.0)),
    )
    pred = rpc_predicate_to_predicate(root)
    rows = pred.apply(df).collect()
    assert [(r.region, r.v) for r in rows] == [("west", 5.0)]


def test_regex_match(spark):
    df = spark.createDataFrame([("west",), ("east",)], "region string")
    pred = rpc_predicate_to_predicate(
        cmp("regex_match", tag("region"), {"node_type": "regex", "value": "^we"})
    )
    assert [r.region for r in pred.apply(df).collect()] == ["west"]
    pred2 = rpc_predicate_to_predicate(
        cmp("not_regex_match", tag("region"), {"node_type": "regex", "value": "^we"})
    )
    assert [r.region for r in pred2.apply(df).collect()] == ["east"]


def test_rejects_like_and_modulo(spark):
    with pytest.raises(RpcExprError):
        rpc_predicate_to_predicate(cmp("like", tag("region"), lit("w%")))
    with pytest.raises(RpcExprError):
        rpc_predicate_to_predicate(
            {"node_type": "arithmetic", "op": "%", "children": [lit(1), lit(2)]}
        )


def test_pseudo_tag_outside_equality_rejected(spark):
    with pytest.raises(RpcExprError):
        rpc_predicate_to_predicate(cmp("gt", tag("\x00"), lit("cpu")))
