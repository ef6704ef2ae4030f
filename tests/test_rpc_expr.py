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


# ---------------------------------------------------------------------------
# differential fuzz: random wire trees vs a Kleene-logic Python oracle


def _fuzz_rows():
    """Fixed row set with nulls in both tags and the field."""
    vals = ["a", "b", "cc", None]
    rows = []
    i = 0
    for t1 in vals:
        for t2 in vals:
            for f in [0, 5, 17, None]:
                rows.append((i, t1, t2, f, i * 10))
                i += 1
    return rows


def _eval_node(node, row):
    """Reference three-valued evaluation of a wire tree over one row dict
    (missing/null column -> unknown; Kleene and/or) — mirrors what
    DataFusion computes for the reference."""
    import re

    nt = node["node_type"]
    if nt == "comparison":
        op = node["op"]
        lhs, rhs = node["children"]
        col = lhs["value"]
        lv = row.get(col)
        rv = rhs["value"]
        if op in ("regex_match", "not_regex_match"):
            if lv is None:
                return None
            hit = re.search(str(rv), lv) is not None
            return hit if op == "regex_match" else not hit
        if lv is None:
            return None
        return {
            "eq": lv == rv, "not_eq": lv != rv, "lt": lv < rv,
            "lte": lv <= rv, "gt": lv > rv, "gte": lv >= rv,
        }[op]
    if nt == "logical":
        vals = [_eval_node(c, row) for c in node["children"]]
        if node["op"] == "and":
            if any(v is False for v in vals):
                return False
            return None if any(v is None for v in vals) else True
        if any(v is True for v in vals):
            return True
        return None if any(v is None for v in vals) else False
    raise AssertionError(nt)


def _tree_strategy():
    from hypothesis import strategies as st

    str_lits = st.sampled_from(["a", "b", "cc", "zz"])
    int_lits = st.sampled_from([0, 5, 17, 100])
    ops = st.sampled_from(["eq", "not_eq", "lt", "lte", "gt", "gte"])
    # t_missing exists in NO row: exercises the missing-column-as-NULL
    # rewrite (ADVICE r04: OR branches over present columns must survive)
    tag_cmp = st.builds(
        lambda o, c, v: cmp(o, tag(c), lit(v)),
        ops, st.sampled_from(["t1", "t2", "t_missing"]), str_lits,
    )
    field_cmp = st.builds(
        lambda o, v: cmp(o, {"node_type": "field_ref", "value": "f"}, lit(v)),
        ops, int_lits,
    )
    regex_cmp = st.builds(
        lambda c, p, neg: {
            "node_type": "comparison",
            "op": "not_regex_match" if neg else "regex_match",
            "children": [tag(c), {"node_type": "regex", "value": p}],
        },
        st.sampled_from(["t1", "t2"]),
        st.sampled_from(["^a", "c+", "b$"]),
        st.booleans(),
    )
    leaf = st.one_of(tag_cmp, field_cmp, regex_cmp)
    return st.recursive(
        leaf,
        lambda sub: st.builds(
            lambda o, cs: logical(o, *cs),
            st.sampled_from(["and", "or"]),
            st.lists(sub, min_size=2, max_size=3),
        ),
        max_leaves=6,
    )


def test_rpc_expr_differential_fuzz(spark):
    """Random wire predicate trees: the translated Spark filter must select
    exactly the rows the three-valued oracle keeps (row kept iff True)."""
    from hypothesis import HealthCheck, given, settings

    rows = _fuzz_rows()
    df = spark.createDataFrame(
        rows, "id long, t1 string, t2 string, f long, time long"
    )
    df = df.localCheckpoint(eager=True)  # one materialization for all examples
    row_dicts = [
        {"id": r[0], "t1": r[1], "t2": r[2], "f": r[3], "time": r[4]}
        for r in rows
    ]

    @settings(
        max_examples=60, deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(_tree_strategy())
    def run(tree):
        pred = rpc_predicate_to_predicate(tree)
        got = sorted(r.id for r in pred.apply(df).collect())
        want = sorted(
            r["id"]
            for r in row_dicts
            if _eval_node(tree, {k: v for k, v in r.items() if v is not None})
            is True
        )
        assert got == want, f"tree={tree}"

    run()
