"""RPC predicate-tree → engine Predicate translation.

Port of the storage-gRPC expression layer
(/root/reference/src/influxdb_ioxd/rpc/storage/expr.rs): the wire predicate
is a node tree of comparisons / logical ops / arithmetic over tag refs,
field refs and literals.  Special patterns are lifted into structured
Predicate parts exactly like the reference (expr.rs:150-230 AddRpcNode):

- ``_measurement`` pseudo-tag (wire tag key ``\\x00``) comparisons/IN-lists
  become the table-name list
- ``_field`` pseudo-tag (wire key ``\\xff``) comparisons become the field
  projection
- AND trees are flattened into conjuncts (flatten_ands, expr.rs:227-240)
- everything else converts to a ``pyspark.sql.Column`` expression

Supported operators mirror the reference's support matrix
(query/src/frontend/influxrpc.rs:1207-1253): Eq/NotEq/Lt/LtEq/Gt/GtEq,
And/Or, +,-,*,/, regex match / not-match.  Like and Modulo are rejected.

Node format (dict-encoded tree, the JSON shape of the proto):
    {"node_type": "comparison", "op": "eq", "children": [lhs, rhs]}
    {"node_type": "logical", "op": "and"|"or", "children": [...]}
    {"node_type": "arithmetic", "op": "+", "children": [...]}
    {"node_type": "tag_ref", "value": "region"}       # or "\\x00" / "\\xff"
    {"node_type": "field_ref", "value": "usage"}
    {"node_type": "literal", "value": 3.5}
    {"node_type": "regex", "value": "^we.*"}          # rhs of (not_)regex ops
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from influxdb_iox_spark.plans.predicate import Predicate

MEASUREMENT_TAG_KEYS = ("\x00", "_measurement")
FIELD_TAG_KEYS = ("\xff", "_field")

_COMPARISONS = {
    "eq": lambda a, b: a == b,
    "not_eq": lambda a, b: a != b,
    "lt": lambda a, b: a < b,
    "lte": lambda a, b: a <= b,
    "gt": lambda a, b: a > b,
    "gte": lambda a, b: a >= b,
}
_ARITHMETIC = {
    "+": lambda a, b: a + b,
    "-": lambda a, b: a - b,
    "*": lambda a, b: a * b,
    "/": lambda a, b: a / b,
}


class RpcExprError(ValueError):
    pass


def check_regex_envelope(pattern: str) -> None:
    """Reject regex syntax where the engine dialect (Java ``rlike``) and
    the reference dialect (Rust ``regex``, query/src/func/regex.rs:38)
    DIVERGE — the guarded envelope is the intersection both interpret
    identically (literals, classes, alternation, anchors, quantifiers,
    plain + ``(?<name>…)`` groups, Unicode classes; both are unanchored
    substring matchers via is_match/rlike):

    - ``(?P<name>…)`` / ``(?P=name)``: Rust/PCRE named-group spelling —
      Java rejects the ``P`` syntax, so a pattern that worked against the
      reference would ERROR here; rejected with a clear message instead.
    - lookarounds ``(?=`` ``(?!`` ``(?<=`` ``(?<!``: Java-only — Rust
      regex cannot compile them, so no reference client ever sent one;
      accepting them would silently widen the dialect.
    - backreferences ``\\1``-``\\9`` / ``\\k<name>``: Java-only, same
      reasoning.

    Tested against the reference's own match battery plus these
    rejections in tests/test_regex_envelope.py."""
    import re as _re

    checks = [
        (r"\(\?P[<=]", "named-group syntax '(?P<…>' (Rust spelling)"),
        (r"\(\?=|\(\?!|\(\?<=|\(\?<!", "lookaround (unsupported by the reference's regex dialect)"),
        # a backreference is an ODD run of backslashes before the digit —
        # an even run is escaped literal backslashes (both dialects agree
        # on those, e.g. 'dir\\\\1' = backslash + '1')
        (r"(?<!\\)(?:\\\\)*\\(?:[1-9]|k<)", "backreference (unsupported by the reference's regex dialect)"),
    ]
    for pat, what in checks:
        if _re.search(pat, pattern):
            raise RpcExprError(
                f"regex {pattern!r} uses {what}, outside the supported "
                "rlike/Rust-regex common envelope"
            )


def _is_tag_ref(node: dict, keys: tuple[str, ...]) -> bool:
    return node.get("node_type") == "tag_ref" and node.get("value") in keys


def _flatten_ands(node: dict, dst: list[dict]) -> list[dict]:
    if node.get("node_type") == "logical" and node.get("op") == "and":
        for child in node.get("children", []):
            _flatten_ands(child, dst)
    else:
        dst.append(node)
    return dst


def _in_list(node: dict, keys: tuple[str, ...]) -> list[str] | None:
    """Detect ``pseudo_tag = v`` / OR-chain of equalities → value list
    (InList::try_from, expr.rs:243-300)."""
    nt, op = node.get("node_type"), node.get("op")
    if nt == "comparison" and op == "eq":
        lhs, rhs = node["children"]
        if _is_tag_ref(lhs, keys) and rhs.get("node_type") == "literal":
            return [str(rhs["value"])]
        return None
    if nt == "logical" and op == "or":
        out: list[str] = []
        for child in node["children"]:
            sub = _in_list(child, keys)
            if sub is None:
                return None
            out.extend(sub)
        return out
    return None


def _referenced_columns(node: dict, dst: set[str]) -> set[str]:
    """Every real column name a node tree references (pseudo-tags
    excluded) — recorded on the Predicate so apply() can NULL-substitute
    names a target table lacks without parsing analyzer errors."""
    nt = node.get("node_type")
    if nt in ("tag_ref", "field_ref"):
        if node.get("value") not in MEASUREMENT_TAG_KEYS + FIELD_TAG_KEYS:
            dst.add(node["value"])
    for child in node.get("children", []) or []:
        _referenced_columns(child, dst)
    return dst


def _to_column(node: dict) -> Column:
    nt = node.get("node_type")
    if nt == "tag_ref":
        if node["value"] in MEASUREMENT_TAG_KEYS + FIELD_TAG_KEYS:
            raise RpcExprError(
                f"pseudo-tag {node['value']!r} only supported in equality/IN position"
            )
        return F.col(node["value"])
    if nt == "field_ref":
        return F.col(node["value"])
    if nt == "literal":
        return F.lit(node["value"])
    if nt == "comparison":
        op = node["op"]
        lhs, rhs = node["children"]
        if op in ("regex_match", "not_regex_match"):
            if rhs.get("node_type") not in ("regex", "literal"):
                raise RpcExprError("regex comparison needs a regex rhs")
            check_regex_envelope(str(rhs["value"]))
            matched = _to_column(lhs).rlike(str(rhs["value"]))
            return matched if op == "regex_match" else ~matched
        if op in ("like", "modulo", "%"):
            # influxrpc.rs:1207-1253 rejects these
            raise RpcExprError(f"unsupported RPC operator {op!r}")
        if op not in _COMPARISONS:
            raise RpcExprError(f"unknown comparison {op!r}")
        return _COMPARISONS[op](_to_column(lhs), _to_column(rhs))
    if nt == "logical":
        op = node["op"]
        children = [_to_column(c) for c in node["children"]]
        if op == "and":
            out = children[0]
            for c in children[1:]:
                out = out & c
            return out
        if op == "or":
            out = children[0]
            for c in children[1:]:
                out = out | c
            return out
        raise RpcExprError(f"unknown logical op {op!r}")
    if nt == "arithmetic":
        op = node["op"]
        if op in ("%", "modulo"):
            raise RpcExprError("modulo is not supported by the RPC surface")
        if op not in _ARITHMETIC:
            raise RpcExprError(f"unknown arithmetic op {op!r}")
        lhs, rhs = node["children"]
        return _ARITHMETIC[op](_to_column(lhs), _to_column(rhs))
    raise RpcExprError(f"unknown node type {nt!r}")


def _lift_col_range(pred: Predicate, node: dict) -> bool:
    """Lift ``col OP literal`` conjuncts (OP ∈ <,<=,>,>=,=) into the
    Predicate's STRUCTURED bounds so the chunk pruner can evaluate them
    against manifest stats (the pruning.rs path) — with_col_range also adds
    the row filter, so lifting replaces the plain expr append."""
    if node.get("node_type") != "comparison":
        return False
    op = node.get("op")
    if op not in ("lt", "lte", "gt", "gte", "eq"):
        return False
    lhs, rhs = node["children"]
    if lhs.get("node_type") == "literal" and rhs.get("node_type") in (
        "tag_ref", "field_ref",
    ):  # literal OP col  ->  col flipped-OP literal
        lhs, rhs = rhs, lhs
        op = {"lt": "gt", "lte": "gte", "gt": "lt", "gte": "lte", "eq": "eq"}[op]
    if rhs.get("node_type") != "literal" or lhs.get("node_type") not in (
        "tag_ref", "field_ref",
    ):
        return False
    if lhs.get("node_type") == "tag_ref" and lhs["value"] in (
        MEASUREMENT_TAG_KEYS + FIELD_TAG_KEYS
    ):
        return False
    col, v = lhs["value"], rhs["value"]
    if op == "eq":
        pred.with_col_range(col, lo=v, hi=v)
    elif op == "lt":
        pred.with_col_range(col, hi=v, hi_open=True)
    elif op == "lte":
        pred.with_col_range(col, hi=v)
    elif op == "gt":
        pred.with_col_range(col, lo=v, lo_open=True)
    else:
        pred.with_col_range(col, lo=v)
    return True


def rpc_predicate_to_predicate(
    root: dict | None, base: Predicate | None = None
) -> Predicate:
    """Convert an RPC predicate tree into the engine Predicate."""
    pred = base or Predicate()
    if root is None:
        return pred
    for conjunct in _flatten_ands(root, []):
        tables = _in_list(conjunct, MEASUREMENT_TAG_KEYS)
        if tables is not None:
            pred.table_names = sorted(set(pred.table_names or []) | set(tables))
            continue
        fields = _in_list(conjunct, FIELD_TAG_KEYS)
        if fields is not None:
            pred.field_columns = sorted(set(pred.field_columns or []) | set(fields))
            continue
        if _lift_col_range(pred, conjunct):
            continue
        pred.with_expr(
            _to_column(conjunct), _referenced_columns(conjunct, set())
        )
    return pred
