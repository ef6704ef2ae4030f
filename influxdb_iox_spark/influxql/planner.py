"""Lower parsed InfluxQL statements onto the engine's Spark operators.

Every lowering target already exists: plain/selector aggregates
(operators/series.py, operators/selectors.py — the reference's
query/src/func/selectors.rs surface), per-series transforms
(operators/transforms.py), order statistics (operators/stats.py), bucket
gap-fill (operators/gapfill.py), SLIMIT (operators/series.py
series_limit), and time bucketing (functions/time.py window_bounds —
query/src/func/window.rs semantics).  This module is only the
translation layer; no new physical strategy is introduced here.

Documented divergences from stock InfluxDB 1.x output framing (values
are identical; framing is relational):

- results are ONE DataFrame with the group tags as ordinary columns,
  not a nested series/values JSON envelope;
- an un-bucketed aggregate row carries no time column (stock InfluxQL
  fabricates time=0 / range start);
- GROUP BY time() reports the bucket START (stock InfluxQL behavior;
  note the storage-RPC layer reports the STOP boundary — window.rs:44-47
  — which is why read_window_aggregate and this front-end differ);
- fill() with an explicit WHERE time bound materializes buckets across
  the bounded range for every series (stock behavior; lower-bound-only
  ranges fill up to now()); with NO explicit time bound it spans each
  series' own observed bucket extent (first..last) — stock requires a
  time range for GROUP BY time(), so the un-ranged case has no stock
  twin (see _fill_grid_bounds).
"""

from __future__ import annotations

import datetime as _dt
import time as _time

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from influxdb_iox_spark.influxql.ast_nodes import (
    BinaryExpr,
    Call,
    FillOption,
    Literal,
    Measurement,
    Projection,
    SelectStatement,
    ShowStatement,
    VarRef,
)
from influxdb_iox_spark.influxql.parser import InfluxQLParseError, parse


class InfluxQLPlanError(ValueError):
    pass


# -- WHERE lowering ----------------------------------------------------------


def _rfc3339_to_ns(text: str) -> int:
    """'2026-01-01T00:00:00Z' (or date-only / space-separated) → epoch ns."""
    t = text.strip().replace(" ", "T")
    if t.endswith("Z"):
        t = t[:-1] + "+00:00"
    if "T" not in t:
        t += "T00:00:00+00:00"
    elif "+" not in t and "-" not in t[10:]:
        t += "+00:00"
    # fractional seconds beyond µs: keep ns exactly
    frac_ns = 0
    m = t.split(".")
    if len(m) == 2:
        frac, tz = m[1][:-6], m[1][-6:]
        digits = frac.ljust(9, "0")[:9]
        frac_ns = int(digits)
        t = m[0] + tz
    dt = _dt.datetime.fromisoformat(t)
    return int(dt.timestamp()) * 1_000_000_000 + (
        frac_ns if frac_ns else dt.microsecond * 1_000
    )


def _time_operand_ns(node, now_ns: int) -> int:
    if isinstance(node, Literal):
        if node.kind in ("int", "duration"):
            return int(node.value)
        if node.kind == "string":
            return _rfc3339_to_ns(str(node.value))
    if isinstance(node, Call):
        if node.func == "now":
            return now_ns
        if node.func == "now_offset":
            return now_ns + int(node.args[0].value)
    raise InfluxQLPlanError(f"cannot interpret {node!r} as a time literal")


def _where_time_range(node, now_ns: int) -> tuple[int | None, int | None]:
    """The contiguous time range pinned by AND-combined WHERE comparisons
    on ``time``: (inclusive lo ns, exclusive hi ns), either side None when
    unbounded.  Bounds under OR don't guarantee a contiguous range, so OR
    subtrees contribute nothing (stock InfluxQL rejects OR on time
    outright; we just fall back to observed-extent fill)."""
    if not isinstance(node, BinaryExpr):
        return (None, None)
    if node.op == "AND":
        l1, h1 = _where_time_range(node.left, now_ns)
        l2, h2 = _where_time_range(node.right, now_ns)
        lo = l1 if l2 is None else (l2 if l1 is None else max(l1, l2))
        hi = h1 if h2 is None else (h2 if h1 is None else min(h1, h2))
        return (lo, hi)
    if node.op == "OR":
        return (None, None)
    left, right, op = node.left, node.right, node.op
    if isinstance(left, (Literal, Call)) and isinstance(right, VarRef):
        left, right = right, left
        op = {">": "<", "<": ">", ">=": "<=", "<=": ">="}.get(op, op)
    if not (isinstance(left, VarRef) and left.name == "time"):
        return (None, None)
    try:
        ns = _time_operand_ns(right, now_ns)
    except InfluxQLPlanError:
        return (None, None)
    return {
        ">": (ns + 1, None),
        ">=": (ns, None),
        "<": (None, ns),
        "<=": (None, ns + 1),
        "=": (ns, ns + 1),
    }.get(op, (None, None))


#: Cap on fill-grid buckets PER SERIES (stock influxdb.conf
#: ``max-select-buckets``; stock defaults to unlimited, we default to a
#: generous million): a dashboard typo like ``WHERE time > now() - 5y
#: GROUP BY time(1s) FILL(previous)`` would otherwise materialize 1.6e8
#: rows per series before LIMIT applies.  The aggregate itself (no fill)
#: is never capped — it only produces observed buckets.
MAX_SELECT_BUCKETS = 1_000_000


def _fill_grid_bounds(
    stmt: SelectStatement, now_ns: int
) -> tuple[int | None, int | None]:
    """First/last fill bucket starts for GROUP BY time() + fill(): stock
    InfluxDB materializes buckets across the WHERE-clause time range, so
    an explicit bound pins that side of the grid for EVERY series (leading
    /trailing empty buckets included).  With a lower bound only, the upper
    defaults to now() (stock's implicit ``time < now()``).  No explicit
    bounds -> (None, None): each series' observed extent (the documented
    pre-range behavior, kept for un-ranged queries)."""
    if stmt.where is None or stmt.group_by_time_ns is None:
        return (None, None)
    lo, hi = _where_time_range(stmt.where, now_ns)
    if lo is None and hi is None:
        return (None, None)
    if lo is not None and hi is None:
        hi = now_ns
    every = stmt.group_by_time_ns
    off = stmt.group_by_offset_ns or 0
    if stmt.tz is not None:
        # with tz() the grid lives in the zone's wall-clock frame
        # (_bucket_col), so the literal bounds shift there first — plain
        # modular arithmetic stays exact in that frame even across DST
        if lo is not None:
            lo += _zone_offset_ns(lo, stmt.tz)
        if hi is not None:
            hi += _zone_offset_ns(hi - 1, stmt.tz)

    def _floor(t: int) -> int:
        return t - ((t - off) % every)

    start = _floor(lo) if lo is not None else None
    stop = _floor(hi - 1) if hi is not None else None
    if start is not None and stop is not None:
        n_buckets = (stop - start) // every + 1
        if n_buckets > MAX_SELECT_BUCKETS:
            raise InfluxQLPlanError(
                f"GROUP BY time({every}ns) over this WHERE range would "
                f"materialize {n_buckets} fill buckets per series "
                f"(max-select-buckets {MAX_SELECT_BUCKETS}); narrow the "
                "range or widen the interval"
            )
    return (start, stop)


def _lower_where(node, m: Measurement, now_ns: int) -> Column:
    if isinstance(node, BinaryExpr):
        if node.op in ("AND", "OR"):
            left = _lower_where(node.left, m, now_ns)
            right = _lower_where(node.right, m, now_ns)
            return (left & right) if node.op == "AND" else (left | right)
        return _lower_comparison(node, m, now_ns)
    raise InfluxQLPlanError(f"unsupported WHERE node {node!r}")


def _lower_comparison(node: BinaryExpr, m: Measurement, now_ns: int) -> Column:
    left, right, op = node.left, node.right, node.op
    # normalize literal-on-the-left ( 5 < value ) to column-on-the-left
    if isinstance(left, (Literal, Call)) and isinstance(right, VarRef):
        left, right = right, left
        op = {">": "<", "<": ">", ">=": "<=", "<=": ">="}.get(op, op)
    if isinstance(left, VarRef) and left.name == "time":
        col = F.col(m.time_col)
        ns = _time_operand_ns(right, now_ns)
        return {
            "=": col == ns, "!=": col != ns, ">": col > ns,
            ">=": col >= ns, "<": col < ns, "<=": col <= ns,
        }[op]
    if isinstance(left, VarRef) and left.name not in (*m.tags, *m.fields):
        raise InfluxQLPlanError(f"unknown column {left.name!r} in WHERE")
    if op in ("=~", "!~"):
        if not isinstance(left, VarRef):
            raise InfluxQLPlanError("=~ / !~ apply to a column")
        if not isinstance(right, Literal) or right.kind != "regex":
            raise InfluxQLPlanError("=~ / !~ need a /regex/")
        matched = F.col(left.name).rlike(str(right.value))
        return matched if op == "=~" else ~matched
    # value expressions on either side (field arithmetic in WHERE)
    col = _lower_value(left, m)
    rhs = _lower_value(right, m)
    return {
        "=": col == rhs, "!=": col != rhs, ">": col > rhs,
        ">=": col >= rhs, "<": col < rhs, "<=": col <= rhs,
    }[op]


# -- SELECT lowering ---------------------------------------------------------

_PLAIN_AGGS = {
    "count": F.count,
    "sum": F.sum,
    "mean": F.avg,
    "min": F.min,
    "max": F.max,
    # exact interpolated median (spec: "like percentile(50) but averages
    # the two middle values for even counts" — Spark's exact percentile)
    "median": lambda c: F.percentile(c, F.lit(0.5)),
    "stddev": F.stddev_samp,
    # MODE(): most frequent value; ties pinned to the SMALLEST value
    # (Spark's deterministic mode — same contract as
    # operators.stats.mode_smallest, but a single composable hash
    # aggregate).  NULLs never count, like every InfluxQL aggregate.
    "mode": lambda c: F.mode(c, True),
}

_SELECTORS = ("first", "last")
_TRANSFORMS = (
    "difference",
    "non_negative_difference",
    "cumulative_sum",
    "derivative",
    "non_negative_derivative",
    "moving_average",
    "elapsed",
    # N-truncated technical indicators: pure window expressions, so they
    # ride the whole transform machinery (raw + of-aggregate) for free
    "chande_momentum_oscillator",
    "kaufmans_efficiency_ratio",
)
# Recursive technical indicators (stock 1.x technical-analysis family):
# order-dependent per-series recurrences — one applyInPandas pass via
# operators/technical.py, dispatched by _plan_technical[_of_agg].
_TECH_RECURSIVE = (
    "exponential_moving_average",
    "double_exponential_moving_average",
    "triple_exponential_moving_average",
    "triple_exponential_derivative",
    "relative_strength_index",
    "kaufmans_adaptive_moving_average",
)
_HW = ("holt_winters", "holt_winters_with_fit")
# Scalar math (spec "mathematical operators/functions"): pure codegen
# column functions, composable with fields, aggregates, and transforms.
_MATH_1 = {
    "abs": F.abs,
    "ceil": F.ceil,
    "floor": F.floor,
    "round": lambda c: F.round(c, 0),  # spec ROUND(): nearest integer
    "sqrt": F.sqrt,
    "exp": F.exp,
    "ln": F.log,
    "log2": F.log2,
    "log10": F.log10,
    "sin": F.sin,
    "cos": F.cos,
    "tan": F.tan,
    "asin": F.asin,
    "acos": F.acos,
    "atan": F.atan,
}
_MATH_2 = {
    "pow": F.pow,
    "atan2": F.atan2,
    # spec LOG(x, b): log base b
    "log": lambda x, b: F.log(x) / F.log(b),
}
_AGG_FAMILY = frozenset(_PLAIN_AGGS) | {
    *_SELECTORS,
    "spread",
    "count_distinct",  # normalized COUNT(DISTINCT(x))
}
_SPECIAL = frozenset(
    ("top", "bottom", "distinct", "percentile", "integral", "sample")
)
_ARITH = {"+", "-", "*", "/", "%"}
_SUPPORTED = (
    tuple(_PLAIN_AGGS)
    + _SELECTORS
    + _TRANSFORMS
    + _TECH_RECURSIVE
    + _HW
    + tuple(_MATH_1)
    + tuple(_MATH_2)
    + ("spread", "percentile", "top", "bottom", "distinct", "integral",
       "sample")
)


def _normalize(node):
    """Tree rewrites done before classification: COUNT(DISTINCT(x)) →
    count_distinct(x)."""
    if isinstance(node, Call):
        args = tuple(_normalize(a) for a in node.args)
        if (
            node.func == "count"
            and len(args) == 1
            and isinstance(args[0], Call)
            and args[0].func == "distinct"
        ):
            return Call("count_distinct", args[0].args)
        return Call(node.func, args)
    if isinstance(node, BinaryExpr):
        return BinaryExpr(node.op, _normalize(node.left), _normalize(node.right))
    return node


def _walk_calls(node):
    """Yield every Call in an expression tree (pre-order)."""
    if isinstance(node, Call):
        yield node
        for a in node.args:
            yield from _walk_calls(a)
    elif isinstance(node, BinaryExpr):
        yield from _walk_calls(node.left)
        yield from _walk_calls(node.right)


def _walk_varrefs(node):
    if isinstance(node, VarRef):
        yield node
    elif isinstance(node, Call):
        for a in node.args:
            yield from _walk_varrefs(a)
    elif isinstance(node, BinaryExpr):
        yield from _walk_varrefs(node.left)
        yield from _walk_varrefs(node.right)


def _arith(op: str, left: Column, right: Column) -> Column:
    if op == "+":
        return left + right
    if op == "-":
        return left - right
    if op == "*":
        return left * right
    if op == "/":
        return left / right
    if op == "%":
        return left % right
    raise InfluxQLPlanError(f"unsupported operator {op!r} in expression")


def _lower_value(node, m: Measurement) -> Column:
    """Lower a pure value expression (fields/tags, literals, scalar math,
    arithmetic) — no aggregates or transforms inside."""
    if isinstance(node, VarRef):
        if node.name == "time":
            return F.col(m.time_col)
        if node.name not in (*m.fields, *m.tags):
            raise InfluxQLPlanError(f"unknown column {node.name!r}")
        return F.col(node.name)
    if isinstance(node, Literal):
        if node.kind in ("int", "float", "string"):
            return F.lit(node.value)
        if node.kind == "duration":
            return F.lit(int(node.value))
        raise InfluxQLPlanError(f"cannot use {node.kind} literal here")
    if isinstance(node, Call):
        if node.func in _MATH_1 and len(node.args) == 1:
            return _MATH_1[node.func](_lower_value(node.args[0], m))
        if node.func in _MATH_2 and len(node.args) == 2:
            return _MATH_2[node.func](
                _lower_value(node.args[0], m), _lower_value(node.args[1], m)
            )
        raise InfluxQLPlanError(
            f"function {node.func}() is not valid in a value expression"
        )
    if isinstance(node, BinaryExpr) and node.op in _ARITH:
        return _arith(
            node.op, _lower_value(node.left, m), _lower_value(node.right, m)
        )
    raise InfluxQLPlanError(f"unsupported expression node {node!r}")


def _lower_over(node, m: Measurement, resolve) -> Column:
    """Lower an expression tree where ``resolve(call)`` produces the
    Column for aggregate/transform leaf calls; scalar math and arithmetic
    compose around them."""
    got = resolve(node) if isinstance(node, Call) else None
    if got is not None:
        return got
    if isinstance(node, (VarRef, Literal)):
        return _lower_value(node, m)
    if isinstance(node, Call):
        if node.func in _MATH_1 and len(node.args) == 1:
            return _MATH_1[node.func](_lower_over(node.args[0], m, resolve))
        if node.func in _MATH_2 and len(node.args) == 2:
            return _MATH_2[node.func](
                _lower_over(node.args[0], m, resolve),
                _lower_over(node.args[1], m, resolve),
            )
        raise InfluxQLPlanError(f"unsupported function {node.func}() here")
    if isinstance(node, BinaryExpr) and node.op in _ARITH:
        return _arith(
            node.op,
            _lower_over(node.left, m, resolve),
            _lower_over(node.right, m, resolve),
        )
    raise InfluxQLPlanError(f"unsupported expression node {node!r}")


def _field_arg(call: Call, m: Measurement) -> str:
    if not call.args or not isinstance(call.args[0], VarRef):
        raise InfluxQLPlanError(f"{call.func}() needs a field argument")
    name = call.args[0].name
    if name not in m.fields:
        raise InfluxQLPlanError(f"{call.func}(): unknown field {name!r}")
    return name


def _int_arg(call: Call, idx: int, what: str) -> int:
    if len(call.args) <= idx or not isinstance(call.args[idx], Literal):
        raise InfluxQLPlanError(f"{call.func}() needs {what}")
    v = call.args[idx].value
    if isinstance(v, float) and not v.is_integer():
        if call.func == "percentile":
            return v  # percentile N may be fractional
        raise InfluxQLPlanError(f"{call.func}(): {what} must be an integer")
    return v


def _alias_for(proj, used: set[str]) -> str:
    if proj.alias:
        base = proj.alias
    elif isinstance(proj.expr, Call):
        base = proj.expr.func
    elif isinstance(proj.expr, VarRef):
        base = proj.expr.name
    else:
        # arithmetic tree: name after the first call or column inside
        inner = next(_walk_calls(proj.expr), None)
        if inner is not None:
            base = inner.func
        else:
            base = next(
                (
                    n.name
                    for n in _walk_varrefs(proj.expr)
                ),
                "expr",
            )
    name, k = base, 1
    while name in used:
        name = f"{base}_{k}"
        k += 1
    used.add(name)
    return name


def plan_select(
    stmt: SelectStatement,
    catalog: dict[str, Measurement],
    now_ns: int | None = None,
) -> DataFrame:
    now_ns = now_ns if now_ns is not None else _time.time_ns()
    out, _tags = _plan_select_impl(stmt, catalog, now_ns)
    return out


def plan_select_with_tags(
    stmt: SelectStatement,
    catalog: dict[str, Measurement],
    now_ns: int | None = None,
) -> tuple[DataFrame, list[str]]:
    """plan_select, also returning the statement's RESOLVED group tags —
    the only columns a v1 envelope may frame as series tags.  (Framing by
    name-match against the whole catalog mis-frames raw selects that
    project a tag-named field: stock v1 returns one series with the
    column inline unless the statement actually grouped by it.)"""
    now_ns = now_ns if now_ns is not None else _time.time_ns()
    return _plan_select_impl(stmt, catalog, now_ns)


def _plan_select_impl(
    stmt: SelectStatement,
    catalog: dict[str, Measurement],
    now_ns: int,
) -> tuple[DataFrame, list[str]]:
    if stmt.from_names or stmt.from_regex is not None:
        return _plan_multi_from(stmt, catalog, now_ns)
    if stmt.from_sub is not None:
        m = _subquery_measurement(stmt.from_sub, catalog, now_ns)
    else:
        if stmt.measurement not in catalog:
            raise InfluxQLPlanError(
                f"unknown measurement {stmt.measurement!r}"
            )
        m = catalog[stmt.measurement]
    return _plan_single(stmt, m, now_ns)


def _subquery_measurement(
    inner: SelectStatement, catalog: dict[str, Measurement], now_ns: int
) -> Measurement:
    """FROM (SELECT ...): the inner result becomes an anonymous
    measurement — its surviving GROUP BY tags stay tags, every other
    non-time output column is a field.  Lazy end to end: the outer plan
    composes onto the inner DataFrame, Catalyst optimizes the whole
    tree (inner projections/filters fuse with outer ones)."""
    inner_df, inner_tags = _plan_select_impl(inner, catalog, now_ns)
    cols = inner_df.columns
    tags = tuple(t for t in inner_tags if t in cols)
    fields = tuple(c for c in cols if c not in tags and c != "time")
    return Measurement(df=inner_df, tags=tags, fields=fields, time_col="time")


def _plan_multi_from(
    stmt: SelectStatement, catalog: dict[str, Measurement], now_ns: int
) -> tuple[DataFrame, list[str]]:
    """FROM m1, m2 / FROM /regex/: plan per measurement, union by name
    (missing columns null), leading ``measurement`` column — stock
    InfluxQL's one-series-per-measurement framing, relationally.
    Returns (frame, resolved group tags): ordering and downstream v1
    series framing use ONLY the per-statement resolved tags — a field
    that happens to share a name with another measurement's tag must not
    change row order or get hoisted into the series tag set."""
    import copy
    import re as _re

    if stmt.from_regex is not None:
        try:
            names = [
                n for n in sorted(catalog) if _re.search(stmt.from_regex, n)
            ]
        except _re.error as e:
            raise InfluxQLPlanError(f"bad FROM regex: {e}") from None
        if not names:
            raise InfluxQLPlanError(
                f"no measurement matches /{stmt.from_regex}/"
            )
    else:
        names = list(stmt.from_names or ())
        for nme in names:
            if nme not in catalog:
                raise InfluxQLPlanError(f"unknown measurement {nme!r}")

    frames = []
    resolved: list[str] = []
    for nme in names:
        s2 = copy.copy(stmt)
        s2.measurement = nme
        s2.from_regex = None
        s2.from_names = None
        df_n, tags_n = _plan_single(s2, catalog[nme], now_ns)
        for t in tags_n:
            if t not in resolved:
                resolved.append(t)
        frames.append(df_n.select(F.lit(nme).alias("measurement"), "*"))
    out = frames[0]
    for f2 in frames[1:]:
        out = out.unionByName(f2, allowMissingColumns=True)
    order = [F.col("measurement")]
    order += [F.col(c) for c in out.columns if c in resolved]
    if "time" in out.columns:
        order.append(
            F.col("time").desc() if stmt.order_desc else F.col("time").asc()
        )
    return out.orderBy(*order), [c for c in out.columns if c in resolved]


def _expand_wildcard_calls(
    stmt: SelectStatement, m: Measurement
) -> SelectStatement:
    """``mean(*)`` / ``count(*)`` / ``percentile(*, N)``: stock InfluxQL
    expands a wildcard first argument to one call per FIELD, named
    ``<func>_<field>`` (tags are never aggregated).  Fields expand in
    sorted order, matching stock's column ordering."""
    import copy

    out: list[Projection] = []
    changed = False
    for p in stmt.projections:
        e = p.expr
        if isinstance(e, Call) and e.args and e.args[0] == VarRef("*"):
            if p.alias:
                raise InfluxQLPlanError(
                    "a wildcard call cannot take an alias"
                )
            for f in sorted(m.fields):
                out.append(
                    Projection(
                        Call(e.func, (VarRef(f), *e.args[1:])),
                        f"{e.func}_{f}",
                    )
                )
            changed = True
        else:
            out.append(p)
    if not changed:
        return stmt
    stmt = copy.copy(stmt)
    stmt.projections = out
    return stmt


def _plan_single(
    stmt: SelectStatement, m: Measurement, now_ns: int
) -> tuple[DataFrame, list[str]]:
    df = m.df
    _validate_tz(stmt)
    stmt = _expand_wildcard_calls(stmt, m)
    if stmt.where is not None:
        df = df.filter(_lower_where(stmt.where, m, now_ns))

    tags = _resolve_group_tags(stmt, m)

    stmt = _with_normalized_projections(stmt)
    exprs = [p.expr for p in stmt.projections]
    all_calls = [c for e in exprs for c in _walk_calls(e)]
    for c in all_calls:
        if c.func not in (*_SUPPORTED, "count_distinct"):
            raise InfluxQLPlanError(
                f"unsupported function {c.func}(); supported: "
                + ", ".join(sorted(_SUPPORTED))
            )

    def has(family) -> bool:
        return any(c.func in family for c in all_calls)

    has_agg = has(_AGG_FAMILY)
    has_transform = has(_TRANSFORMS)
    has_special = has(_SPECIAL)
    has_tech = has(_TECH_RECURSIVE)
    has_hw = has(_HW)
    # raw = a projection mentioning a bare column outside any call
    has_raw = any(_mentions_raw_column(e, m) for e in exprs)

    if has_hw:
        if has_tech or has_transform or has_special:
            raise InfluxQLPlanError(
                "holt_winters() cannot mix with other function families"
            )
        out = _plan_holt_winters(stmt, m, df, tags)
    elif has_tech:
        if has_transform or has_special:
            raise InfluxQLPlanError(
                "technical-analysis functions cannot mix with transforms "
                "or top/bottom/distinct/percentile/integral/sample"
            )
        if has_agg:
            out = _plan_technical_of_agg(stmt, m, df, tags, now_ns)
        else:
            out = _plan_technical(stmt, m, df, tags)
    elif has_special:
        if has_agg or has_transform:
            raise InfluxQLPlanError(
                "top()/bottom()/distinct()/percentile()/integral()/sample() "
                "cannot mix with other aggregates or transforms"
            )
        if any(c.func in ("top", "bottom") for c in all_calls):
            out = _plan_top_bottom(stmt, m, df, tags)
        elif any(c.func == "distinct" for c in all_calls):
            out = _plan_distinct(stmt, m, df, tags)
        elif any(c.func == "integral" for c in all_calls):
            out = _plan_integral(stmt, m, df, tags)
        elif any(c.func == "sample" for c in all_calls):
            out = _plan_sample(stmt, m, df, tags)
        else:
            out = _plan_percentile(stmt, m, df, tags)
    elif has_transform and has_agg:
        out = _plan_transform_of_agg(stmt, m, df, tags, now_ns)
    elif has_transform:
        out = _plan_transforms(stmt, m, df, tags)
    elif has_agg:
        if has_raw:
            raise InfluxQLPlanError(
                "mixing aggregate calls and raw fields is not supported "
                "(stock InfluxQL rejects this too)"
            )
        out = _plan_aggregates(stmt, m, df, tags, now_ns)
    else:
        out = _plan_raw(stmt, m, df, tags)

    out = _apply_series_limits(stmt, out, tags)
    return out, tags


def _with_normalized_projections(stmt: SelectStatement) -> SelectStatement:
    stmt.projections = [
        Projection(_normalize(p.expr), p.alias) for p in stmt.projections
    ]
    return stmt


def _mentions_raw_column(node, m: Measurement) -> bool:
    """True when the tree references a bare column OUTSIDE any
    aggregate/transform call (scalar math does not encapsulate)."""
    if isinstance(node, VarRef):
        return True
    if isinstance(node, BinaryExpr):
        return _mentions_raw_column(node.left, m) or _mentions_raw_column(
            node.right, m
        )
    if isinstance(node, Call):
        if node.func in _MATH_1 or node.func in _MATH_2:
            return any(_mentions_raw_column(a, m) for a in node.args)
        return False
    return False


def _resolve_group_tags(stmt: SelectStatement, m: Measurement) -> list[str]:
    tags: list[str] = []
    for t in stmt.group_by_tags:
        if t == "*":
            tags.extend(x for x in m.tags if x not in tags)
        elif t in m.tags:
            if t not in tags:
                tags.append(t)
        else:
            raise InfluxQLPlanError(f"GROUP BY: unknown tag {t!r}")
    return tags


def _time_out(m: Measurement) -> Column:
    return F.col(m.time_col).alias("time")


def _plan_raw(
    stmt: SelectStatement, m: Measurement, df: DataFrame, tags: list[str]
) -> DataFrame:
    if stmt.group_by_time_ns is not None:
        raise InfluxQLPlanError("GROUP BY time() requires an aggregate")
    used: set[str] = {"time", *tags}
    cols = [*tags, _time_out(m)]
    for p in stmt.projections:
        if isinstance(p.expr, VarRef) and p.expr.name == "*":
            for f_ in m.fields:
                if f_ not in used:
                    used.add(f_)
                    cols.append(F.col(f_))
            continue
        alias = _alias_for(p, used)
        cols.append(_lower_value(p.expr, m).alias(alias))
    out = df.select(*cols)
    # stock: a SELECT that references no FIELD returns no data (tags
    # alone don't identify points) — same schema, zero rows
    fields = set(m.fields)
    mentions_field = any(
        (isinstance(p.expr, VarRef) and p.expr.name in ("*", *fields))
        or any(v.name in fields for v in _walk_varrefs(p.expr))
        for p in stmt.projections
    )
    if not mentions_field:
        out = out.filter(F.lit(False))
    out = _apply_point_limit(stmt, m, out, tags)
    order = [F.col("time").desc() if stmt.order_desc else F.col("time").asc()]
    return out.orderBy(*[F.col(t) for t in tags], *order)


def _apply_point_limit(
    stmt: SelectStatement, m: Measurement, out: DataFrame, tags: list[str]
) -> DataFrame:
    """InfluxQL LIMIT/OFFSET: points per series (per GROUP BY tag set);
    global when un-grouped."""
    if stmt.limit is None and not stmt.offset:
        return out
    n = stmt.limit if stmt.limit is not None else (1 << 31)
    tcol = F.col("time").desc() if stmt.order_desc else F.col("time").asc()
    if tags:
        w = Window.partitionBy(*tags).orderBy(tcol)
        return (
            out.withColumn("__rn", F.row_number().over(w))
            .filter(
                (F.col("__rn") > stmt.offset) & (F.col("__rn") <= stmt.offset + n)
            )
            .drop("__rn")
        )
    # global: bounded top-k first (TakeOrdered), then the tiny offset cut
    bounded = out.orderBy(tcol).limit(stmt.offset + n)
    w = Window.orderBy(tcol)
    return (
        bounded.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") > stmt.offset)
        .drop("__rn")
    )


def _zone_offset_ns(t_ns: int, tz: str) -> int:
    """UTC offset of ``tz`` at the instant ``t_ns`` (driver-side zoneinfo;
    used only for literal WHERE bounds, never per row)."""
    import zoneinfo as _zi

    dt = _dt.datetime.fromtimestamp(
        t_ns // 10**9, tz=_zi.ZoneInfo(tz)
    )
    return int(dt.utcoffset().total_seconds()) * 10**9


def _validate_tz(stmt: SelectStatement) -> None:
    if stmt.tz is None:
        return
    import zoneinfo as _zi

    try:
        _zi.ZoneInfo(stmt.tz)
    except Exception:
        raise InfluxQLPlanError(f"unknown time zone {stmt.tz!r}") from None


def _bucket_col(stmt: SelectStatement, m: Measurement) -> Column:
    """GROUP BY time() bucket start.  With tz(), the bucket is computed
    on the zone's WALL CLOCK and kept in the LOCAL-ns frame through
    aggregation/fill (uniform grid even across DST); _finish_tz_time
    converts to epoch ns at the end."""
    from influxdb_iox_spark.functions.time import (
        local_window_start,
        window_start,
    )

    if stmt.tz is not None:
        return local_window_start(
            m.time_col,
            stmt.group_by_time_ns,
            stmt.group_by_offset_ns,
            stmt.tz,
        ).alias("time")
    return window_start(
        m.time_col, stmt.group_by_time_ns, stmt.group_by_offset_ns
    ).alias("time")


def _finish_tz_time(stmt: SelectStatement, out: DataFrame) -> DataFrame:
    """Map the local-frame bucket column back to epoch ns (monotone, so
    ordering done in the local frame survives)."""
    if stmt.tz is None or stmt.group_by_time_ns is None:
        return out
    from influxdb_iox_spark.functions.time import local_ns_to_utc_ns

    if "time" not in out.columns:
        return out
    return out.withColumn(
        "time", local_ns_to_utc_ns(F.col("time"), stmt.tz)
    )


def _collect_agg_calls(
    projections, m: Measurement
) -> tuple[list[Column], dict]:
    """Pre-pass: every unique aggregate-family Call across the projection
    trees becomes ONE internal agg column ``__aN`` (selector calls keep
    their (value, time) struct so the lone-selector path can surface the
    matching timestamp).  Shared sub-aggregates dedupe: ``mean(v) +
    mean(v)`` computes one mean."""
    from influxdb_iox_spark.operators.selectors import (
        selector_first,
        selector_last,
    )
    from influxdb_iox_spark.operators.stats import spread

    agg_cols: list[Column] = []
    agg_alias: dict = {}
    for p in projections:
        for call in _walk_calls(p.expr):
            if call.func not in _AGG_FAMILY or call in agg_alias:
                continue
            name = f"__a{len(agg_alias)}"
            agg_alias[call] = name
            if call.func in _SELECTORS:
                fld = _field_arg(call, m)
                sel = (
                    selector_first if call.func == "first" else selector_last
                )(fld, m.time_col)
                agg_cols.append(sel.alias(name))
            elif call.func == "spread":
                agg_cols.append(spread(_field_arg(call, m)).alias(name))
            elif call.func == "count_distinct":
                if not call.args:
                    raise InfluxQLPlanError("count(distinct()) needs a field")
                agg_cols.append(
                    F.count_distinct(_lower_value(call.args[0], m)).alias(name)
                )
            else:
                if not call.args:
                    raise InfluxQLPlanError(f"{call.func}() needs an argument")
                agg_cols.append(
                    _PLAIN_AGGS[call.func](
                        _lower_value(call.args[0], m)
                    ).alias(name)
                )
    if not agg_alias:
        raise InfluxQLPlanError("no aggregate call in projection")
    return agg_cols, agg_alias


def _plan_aggregates(
    stmt: SelectStatement,
    m: Measurement,
    df: DataFrame,
    tags: list[str],
    now_ns: int,
) -> DataFrame:
    used: set[str] = {"time", *tags}
    lone_selector = (
        len(stmt.projections) == 1
        and isinstance(stmt.projections[0].expr, Call)
        and stmt.projections[0].expr.func in _SELECTORS
        and stmt.group_by_time_ns is None
    )

    agg_cols, agg_alias = _collect_agg_calls(stmt.projections, m)

    def resolve(node):
        if isinstance(node, Call) and node.func in _AGG_FAMILY:
            name = agg_alias[node]
            if node.func in _SELECTORS:
                return F.col(name).getField("value")
            return F.col(name)
        return None

    group_cols: list[Column] = [F.col(t) for t in tags]
    if stmt.group_by_time_ns is not None:
        group_cols.append(_bucket_col(stmt, m))
    if group_cols:
        grouped = df.groupBy(*group_cols).agg(*agg_cols)
    else:
        grouped = df.agg(*agg_cols)

    sel: list[Column] = [F.col(t) for t in tags]
    if stmt.group_by_time_ns is not None:
        sel.append(F.col("time"))
    if lone_selector:
        sel.append(
            F.col(agg_alias[stmt.projections[0].expr])
            .getField("time")
            .alias("time")
        )
    for p in stmt.projections:
        alias = _alias_for(p, used)
        sel.append(_lower_over(p.expr, m, resolve).alias(alias))
    out = grouped.select(*sel)

    if stmt.group_by_time_ns is not None and stmt.fill is not FillOption.NONE:
        from influxdb_iox_spark.operators.gapfill import fill_window_gaps

        strategy = (
            "value" if stmt.fill is FillOption.VALUE else stmt.fill.value
        )
        gstart, gstop = _fill_grid_bounds(stmt, now_ns)
        out = fill_window_gaps(
            out,
            tags,
            "time",
            stmt.group_by_time_ns,
            strategy=strategy,
            fill_value=stmt.fill_value,
            grid_start=gstart,
            grid_stop=gstop,
        )

    order: list[Column] = [F.col(t) for t in tags]
    if stmt.group_by_time_ns is not None or lone_selector:
        order.append(
            F.col("time").desc() if stmt.order_desc else F.col("time").asc()
        )
    out = _apply_bucket_limit(stmt, out, tags)
    out = _finish_tz_time(stmt, out)
    return out.orderBy(*order) if order else out


def _apply_bucket_limit(
    stmt: SelectStatement, out: DataFrame, tags: list[str]
) -> DataFrame:
    """LIMIT on a bucketed aggregate limits buckets per series."""
    if stmt.group_by_time_ns is None or (stmt.limit is None and not stmt.offset):
        return out
    return _apply_point_limit(stmt, None, out, tags)


def _transform_expr(
    call: Call,
    value: Column,
    time_col: Column,
    w,
    default_per_unit: int = 1_000_000_000,
) -> tuple[Column, bool]:
    """One transform call → (window Column over ``value``, drops-first?).
    ``default_per_unit``: derivative's reporting interval when the call
    omits it (1s for raw points; the GROUP BY time() interval for
    aggregated derivatives, per spec)."""
    from influxdb_iox_spark.operators import transforms as T

    f = call.func
    if f == "difference":
        return T.difference(value, w), True
    if f == "non_negative_difference":
        return T.non_negative_difference(value, w), False
    if f == "cumulative_sum":
        return T.cumulative_sum(value, w), False
    if f == "elapsed":
        unit = (
            int(call.args[1].value)
            if len(call.args) > 1
            and isinstance(call.args[1], Literal)
            and call.args[1].kind == "duration"
            else 1
        )
        return ((T.elapsed(time_col, w)) / unit).cast("long"), True
    if f in ("derivative", "non_negative_derivative"):
        unit = (
            int(call.args[1].value)
            if len(call.args) > 1
            and isinstance(call.args[1], Literal)
            and call.args[1].kind == "duration"
            else default_per_unit
        )
        fn = (
            T.derivative
            if f == "derivative"
            else T.non_negative_derivative
        )
        return fn(value, time_col, w, unit), True
    if f == "moving_average":
        n = int(_int_arg(call, 1, "a window size"))
        ma = T.moving_average_sum(value, w, n) / T.moving_average_count(w, n)
        # spec: emitted only once n points accumulated
        full = T.moving_average_count(w, n) == n
        return F.when(full, ma), True
    if f in ("chande_momentum_oscillator", "kaufmans_efficiency_ratio"):
        n = int(_int_arg(call, 1, "a period N"))
        if n < 1:
            raise InfluxQLPlanError(f"{f}(): N must be positive")
        fn = (
            T.chande_momentum_oscillator
            if f == "chande_momentum_oscillator"
            else T.kaufmans_efficiency_ratio
        )
        return fn(value, w, n), True
    raise InfluxQLPlanError(f"unsupported transform {f}()")


def _drop_leading_nulls(out: DataFrame, aliases: list[str]) -> DataFrame:
    if not aliases:
        return out
    keep = None
    for c in aliases:
        k = F.col(c).isNotNull()
        keep = k if keep is None else (keep | k)
    return out.filter(keep)


def _plan_transforms(
    stmt: SelectStatement, m: Measurement, df: DataFrame, tags: list[str]
) -> DataFrame:
    from influxdb_iox_spark.operators import transforms as T

    if stmt.group_by_time_ns is not None:
        raise InfluxQLPlanError(
            "GROUP BY time() with a raw-point transform is not valid; "
            "wrap an aggregate (e.g. derivative(mean(v))) to bucket first"
        )
    w = T.series_window(tags, [m.time_col])
    used: set[str] = {"time", *tags}
    cols: list[Column] = [*[F.col(t) for t in tags], _time_out(m)]
    drop_first_null_of: list[str] = []
    for p in stmt.projections:
        alias = _alias_for(p, used)
        drops: list[bool] = []

        def resolve(node, _drops=drops):
            if isinstance(node, Call) and node.func in _TRANSFORMS:
                arg = (
                    _lower_value(node.args[0], m)
                    if node.args
                    else F.lit(None)
                )
                c, d = _transform_expr(node, arg, F.col(m.time_col), w)
                if d:
                    _drops.append(True)
                return c
            return None

        cols.append(_lower_over(p.expr, m, resolve).alias(alias))
        if drops:
            drop_first_null_of.append(alias)
    out = df.select(*cols)
    out = _drop_leading_nulls(out, drop_first_null_of)
    out = _apply_point_limit(stmt, m, out, tags)
    tcol = F.col("time").desc() if stmt.order_desc else F.col("time").asc()
    return out.orderBy(*[F.col(t) for t in tags], tcol)


def _plan_transform_of_agg(
    stmt: SelectStatement,
    m: Measurement,
    df: DataFrame,
    tags: list[str],
    now_ns: int,
) -> DataFrame:
    """The Grafana staple: ``SELECT derivative(mean(v), 1h) FROM m GROUP
    BY time(1h), tag`` — bucketed aggregate first, then the per-series
    transform over the bucket sequence.  One hash aggregate on
    (tags, bucket) + window expressions sharing one (tags) exchange.

    Fill interplay: fill(none) transforms over observed buckets only;
    fill(null) materializes missing buckets as null rows AFTER the
    transform (stock InfluxQL semantics for transformed aggregates);
    carry/value/linear fills of a *transformed* series are rejected —
    their stock behavior (fill the aggregate, then transform the filled
    series) silently manufactures zero rates, which we refuse to do
    implicitly."""
    from influxdb_iox_spark.operators import transforms as T

    if stmt.group_by_time_ns is None:
        raise InfluxQLPlanError(
            "a transform of an aggregate requires GROUP BY time()"
        )
    if stmt.fill not in (FillOption.NONE, FillOption.NULL):
        raise InfluxQLPlanError(
            "transform-of-aggregate supports fill(none) / fill(null) only"
        )

    agg_cols, agg_alias = _collect_agg_calls(stmt.projections, m)
    group_cols = [*[F.col(t) for t in tags], _bucket_col(stmt, m)]
    inner = df.groupBy(*group_cols).agg(*agg_cols)

    def resolve_agg(node):
        if isinstance(node, Call) and node.func in _AGG_FAMILY:
            name = agg_alias[node]
            if node.func in _SELECTORS:
                return F.col(name).getField("value")
            return F.col(name)
        return None

    w = T.series_window(tags, ["time"])
    used: set[str] = {"time", *tags}
    sel: list[Column] = [*[F.col(t) for t in tags], F.col("time")]
    drop_first_null_of: list[str] = []
    for p in stmt.projections:
        alias = _alias_for(p, used)
        drops: list[bool] = []

        def resolve(node, _drops=drops):
            if isinstance(node, Call) and node.func in _TRANSFORMS:
                if not node.args:
                    raise InfluxQLPlanError(
                        f"{node.func}() needs an aggregate argument"
                    )
                arg = _lower_over(node.args[0], m, resolve_agg)
                c, d = _transform_expr(
                    node,
                    arg,
                    F.col("time"),
                    w,
                    default_per_unit=stmt.group_by_time_ns,
                )
                if d:
                    _drops.append(True)
                return c
            return resolve_agg(node)

        sel.append(_lower_over(p.expr, m, resolve).alias(alias))
        if drops:
            drop_first_null_of.append(alias)
    out = inner.select(*sel)
    out = _drop_leading_nulls(out, drop_first_null_of)
    if stmt.fill is FillOption.NULL:
        from influxdb_iox_spark.operators.gapfill import fill_window_gaps

        gstart, gstop = _fill_grid_bounds(stmt, now_ns)
        out = fill_window_gaps(
            out,
            tags,
            "time",
            stmt.group_by_time_ns,
            strategy="null",
            grid_start=gstart,
            grid_stop=gstop,
        )
    out = _apply_bucket_limit(stmt, out, tags)
    out = _finish_tz_time(stmt, out)
    tcol = F.col("time").desc() if stmt.order_desc else F.col("time").asc()
    return out.orderBy(*[F.col(t) for t in tags], tcol)


def _plan_top_bottom(
    stmt: SelectStatement, m: Measurement, df: DataFrame, tags: list[str]
) -> DataFrame:
    from influxdb_iox_spark.operators.selectors import (
        selector_bottom,
        selector_top,
    )

    if len(stmt.projections) != 1:
        raise InfluxQLPlanError("top()/bottom() must be the only projection")
    call = stmt.projections[0].expr
    fld = _field_arg(call, m)
    n = int(_int_arg(call, 1, "an N"))
    fn = selector_top if call.func == "top" else selector_bottom
    picked = fn(df, n, fld, tags, time=m.time_col)
    alias = stmt.projections[0].alias or call.func
    out = picked.select(
        *tags, _time_out(m), F.col(fld).alias(alias), "rank"
    )
    tcol = F.col("time").desc() if stmt.order_desc else F.col("time").asc()
    return out.orderBy(*[F.col(t) for t in tags], "rank", tcol)


def _plan_distinct(
    stmt: SelectStatement, m: Measurement, df: DataFrame, tags: list[str]
) -> DataFrame:
    if len(stmt.projections) != 1:
        raise InfluxQLPlanError("distinct() must be the only projection")
    call = stmt.projections[0].expr
    fld = _field_arg(call, m)
    alias = stmt.projections[0].alias or "distinct"
    out = df.select(*tags, F.col(fld).alias(alias)).distinct()
    return out.orderBy(*[F.col(t) for t in tags], F.col(alias))


def _plan_percentile(
    stmt: SelectStatement, m: Measurement, df: DataFrame, tags: list[str]
) -> DataFrame:
    from influxdb_iox_spark.operators.stats import percentile_nearest_rank

    if len(stmt.projections) != 1:
        raise InfluxQLPlanError("percentile() must be the only projection")
    call = stmt.projections[0].expr
    fld = _field_arg(call, m)
    p = float(_int_arg(call, 1, "a percentile"))
    by: list[str] = list(tags)
    pre = df
    if stmt.group_by_time_ns is not None:
        pre = df.withColumn("time", _bucket_col(stmt, m))
        by = [*tags, "time"]
    out = percentile_nearest_rank(pre, fld, by, [p])
    pcol = ("p%g" % p).replace(".", "_")
    alias = stmt.projections[0].alias or "percentile"
    out = out.withColumnRenamed(pcol, alias)
    order = [F.col(t) for t in tags]
    if stmt.group_by_time_ns is not None:
        order.append(
            F.col("time").desc() if stmt.order_desc else F.col("time").asc()
        )
    return out.orderBy(*order) if order else out


def _plan_integral(
    stmt: SelectStatement, m: Measurement, df: DataFrame, tags: list[str]
) -> DataFrame:
    """INTEGRAL(field[, unit]): per-series trapezoid area under the field
    curve, reported in value·unit (unit defaults to 1s).  Exact
    arithmetic end to end: values in micro-units int64, per-term products
    and the sum in decimal, ONE final double division — so the result is
    bit-identical regardless of partitioning/summation order (and
    oracle-pairable).  With GROUP BY time() the trapezoids are computed
    WITHIN each bucket (terms crossing a bucket boundary are excluded —
    documented divergence from stock, which interpolates the boundary
    crossing)."""
    from influxdb_iox_spark.operators.transforms import trapezoidal_integral

    if len(stmt.projections) != 1:
        raise InfluxQLPlanError("integral() must be the only projection")
    call = stmt.projections[0].expr
    fld = _field_arg(call, m)
    unit_ns = 1_000_000_000
    if len(call.args) > 1:
        a = call.args[1]
        if not (isinstance(a, Literal) and a.kind == "duration"):
            raise InfluxQLPlanError("integral() unit must be a duration")
        unit_ns = int(a.value)
        if unit_ns <= 0:
            raise InfluxQLPlanError("integral() unit must be positive")
    by: list[str] = list(tags)
    pre = df.filter(F.col(fld).isNotNull())
    if stmt.group_by_time_ns is not None:
        # keep the raw timestamp for in-bucket ordering; the bucket rides
        # as a separate grouping key
        pre = pre.withColumn("__bucket", _bucket_col(stmt, m))
        by = [*tags, "__bucket"]
    pre = pre.withColumn(
        "__iv", F.round(F.col(fld) * 1_000_000).cast("long")
    )
    out = trapezoidal_integral(
        pre, by, m.time_col, "__iv", time_units_per_second=unit_ns
    )
    alias = stmt.projections[0].alias or "integral"
    sel = [F.col(t) for t in tags]
    if stmt.group_by_time_ns is not None:
        sel.append(F.col("__bucket").alias("time"))
    # a single-point series has no interval: area 0, not null
    sel.append(F.coalesce(F.col("integral"), F.lit(0.0)).alias(alias))
    out = out.select(*sel)
    if stmt.group_by_time_ns is not None:
        out = _finish_tz_time(stmt, out)
    order = [F.col(t) for t in tags]
    if stmt.group_by_time_ns is not None:
        order.append(
            F.col("time").desc() if stmt.order_desc else F.col("time").asc()
        )
    return out.orderBy(*order) if order else out


def _plan_sample(
    stmt: SelectStatement, m: Measurement, df: DataFrame, tags: list[str]
) -> DataFrame:
    """SAMPLE(field, N): N points per series.  Stock picks via reservoir
    sampling; here the pick is a DETERMINISTIC pseudo-random order — md5
    of the (timestamp, micro-units value) rendering, which every engine
    computes identically, so results are stable run-to-run and
    oracle-pairable.  No GROUP BY tags → one global sample via
    sort-limit (TakeOrderedAndProject, distributed top-k); with tags →
    one row_number window per series (state bounded per series)."""
    if len(stmt.projections) != 1:
        raise InfluxQLPlanError("sample() must be the only projection")
    call = stmt.projections[0].expr
    fld = _field_arg(call, m)
    n = int(_int_arg(call, 1, "a sample size N"))
    if n <= 0:
        raise InfluxQLPlanError("sample(): N must be positive")
    alias = stmt.projections[0].alias or "sample"
    pre = df.filter(F.col(fld).isNotNull())
    key = F.md5(
        F.concat_ws(
            ":",
            F.col(m.time_col).cast("string"),
            F.round(F.col(fld) * 1_000_000).cast("long").cast("string"),
        )
    )
    if tags:
        w = Window.partitionBy(*[F.col(t) for t in tags]).orderBy(
            key, F.col(m.time_col)
        )
        picked = (
            pre.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= n)
            .drop("__rn")
        )
    else:
        picked = pre.orderBy(key, F.col(m.time_col)).limit(n)
    out = picked.select(*tags, _time_out(m), F.col(fld).alias(alias))
    tcol = F.col("time").desc() if stmt.order_desc else F.col("time").asc()
    return out.orderBy(*[F.col(t) for t in tags], tcol)


def _tech_args(call: Call) -> tuple[int, str, int]:
    """Parse ``(field, N[, HOLD_PERIOD[, WARMUP_TYPE]])`` per the stock
    technical-analysis argument order → (n, warmup, hold).  HOLD_PERIOD
    suppresses that many additional leading emitted values; the stock
    sentinel -1 ("use the warmup type's default") maps to 0.  WARMUP_TYPE
    is ``'exponential'`` (default; recurrence from the first point) or
    ``'simple'`` (simple-mean seed over the first N points) — accepted
    for every family member, ignored by RSI/KAMA whose seeding is pinned
    by their own contract (operators/technical.py docstrings)."""
    n = int(_int_arg(call, 1, "a period N"))
    if n < 1:
        raise InfluxQLPlanError(f"{call.func}(): N must be positive")
    hold = 0
    warmup = "exponential"
    if len(call.args) > 2:
        a = call.args[2]
        if not (isinstance(a, Literal) and a.kind == "int"):
            raise InfluxQLPlanError(
                f"{call.func}(): HOLD_PERIOD must be an integer"
            )
        hold = max(0, int(a.value))
    if len(call.args) > 3:
        a = call.args[3]
        if not (
            isinstance(a, Literal)
            and a.kind == "string"
            and a.value in ("exponential", "simple")
        ):
            raise InfluxQLPlanError(
                f"{call.func}(): WARMUP_TYPE must be 'exponential' or "
                "'simple'"
            )
        warmup = a.value
    if len(call.args) > 4:
        raise InfluxQLPlanError(f"{call.func}(): too many arguments")
    return n, warmup, hold


def _plan_technical(
    stmt: SelectStatement, m: Measurement, df: DataFrame, tags: list[str]
) -> DataFrame:
    """Recursive technical indicators over raw points: one applyInPandas
    pass per statement computing every projected indicator (single hash
    exchange on the series key — same cost model as the window
    transforms, see operators/technical.py)."""
    from influxdb_iox_spark.operators.technical import apply_technical

    if stmt.group_by_time_ns is not None:
        raise InfluxQLPlanError(
            "GROUP BY time() with a raw-point technical function is not "
            "valid; wrap an aggregate (e.g. exponential_moving_average("
            "mean(v), 10)) to bucket first"
        )
    if any(_mentions_raw_column(p.expr, m) for p in stmt.projections):
        raise InfluxQLPlanError(
            "technical-analysis calls cannot mix with raw fields"
        )
    # Pre-pass (the _collect_agg_calls pattern): every unique TA call in
    # the projection trees computes ONE kernel column __tN; scalar math /
    # arithmetic then composes around them in the final select.
    specs: list[tuple[str, str, str, int, str, int]] = []
    tech_alias: dict = {}
    base_cols: dict[str, Column] = {}
    for p in stmt.projections:
        for c in _walk_calls(p.expr):
            if c.func not in _TECH_RECURSIVE or c in tech_alias:
                continue
            name = f"__t{len(tech_alias)}"
            tech_alias[c] = name
            fld = _field_arg(c, m)
            n, warmup, hold = _tech_args(c)
            in_col = f"__in_{fld}"
            base_cols[in_col] = F.col(fld).cast("double")
            specs.append((name, c.func, in_col, n, warmup, hold))
    if not specs:
        raise InfluxQLPlanError("no technical-analysis call in projection")
    base = df.select(
        *[F.col(t) for t in tags],
        F.col(m.time_col),
        *[v.alias(k) for k, v in base_cols.items()],
    )
    out = apply_technical(base, tags, m.time_col, specs)

    def resolve(node):
        if isinstance(node, Call) and node.func in _TECH_RECURSIVE:
            return F.col(tech_alias[node])
        return None

    used: set[str] = {"time", *tags}
    sel: list[Column] = [*[F.col(t) for t in tags], F.col("time")]
    aliases: list[str] = []
    for p in stmt.projections:
        alias = _alias_for(p, used)
        aliases.append(alias)
        sel.append(_lower_over(p.expr, m, resolve).alias(alias))
    out = out.select(*sel)
    out = _drop_leading_nulls(out, aliases)
    out = _apply_point_limit(stmt, m, out, tags)
    tcol = F.col("time").desc() if stmt.order_desc else F.col("time").asc()
    return out.orderBy(*[F.col(t) for t in tags], tcol)


def _plan_technical_of_agg(
    stmt: SelectStatement,
    m: Measurement,
    df: DataFrame,
    tags: list[str],
    now_ns: int,
) -> DataFrame:
    """``SELECT exponential_moving_average(mean(v), 10) FROM m GROUP BY
    time(1m)[, tag]``: bucketed aggregate first (one hash aggregate), then
    the recursive indicator over the bucket sequence (one applyInPandas).
    Fill interplay mirrors _plan_transform_of_agg: fill(none) over observed
    buckets; fill(null) materializes missing buckets AFTER the indicator;
    carry/value/linear fills are rejected (implicitly manufacturing
    smoothed values over filled data is never what the user wants)."""
    from influxdb_iox_spark.operators.technical import apply_technical

    if stmt.group_by_time_ns is None:
        raise InfluxQLPlanError(
            "a technical function of an aggregate requires GROUP BY time()"
        )
    if stmt.fill not in (FillOption.NONE, FillOption.NULL):
        raise InfluxQLPlanError(
            "technical-of-aggregate supports fill(none) / fill(null) only"
        )
    agg_cols, agg_alias = _collect_agg_calls(stmt.projections, m)
    group_cols = [*[F.col(t) for t in tags], _bucket_col(stmt, m)]
    inner = df.groupBy(*group_cols).agg(*agg_cols)

    # Pre-pass like the raw path: every unique TA call computes one
    # kernel column __tN over its aggregate's bucket series; scalar math
    # composes around them afterwards.  An aggregate OUTSIDE a TA call
    # (``mean(v), ema(mean(v), 3)``) is rejected — the kernel output
    # frames only TA columns (stock mixes them; documented divergence).
    specs: list[tuple[str, str, str, int, str, int]] = []
    tech_alias: dict = {}
    pre_cols: dict[str, Column] = {}
    for p in stmt.projections:
        for c in _walk_calls(p.expr):
            if c.func not in _TECH_RECURSIVE or c in tech_alias:
                continue
            if not (
                c.args
                and isinstance(c.args[0], Call)
                and c.args[0].func in _AGG_FAMILY
            ):
                raise InfluxQLPlanError(
                    f"{c.func}() under GROUP BY time() needs an aggregate "
                    "argument (e.g. mean(v))"
                )
            name = f"__t{len(tech_alias)}"
            tech_alias[c] = name
            n, warmup, hold = _tech_args(c)
            agg_name = agg_alias[c.args[0]]
            val = (
                F.col(agg_name).getField("value")
                if c.args[0].func in _SELECTORS
                else F.col(agg_name)
            )
            in_col = f"__in_{agg_name}"
            pre_cols[in_col] = val.cast("double")
            specs.append((name, c.func, in_col, n, warmup, hold))
    pre: list[Column] = [
        *[F.col(t) for t in tags],
        F.col("time"),
        *[v.alias(k) for k, v in pre_cols.items()],
    ]
    if not specs:
        raise InfluxQLPlanError("no technical-analysis call in projection")

    def _tech_depth(node, inside=False):
        """True when an agg-family call appears OUTSIDE every TA call."""
        if isinstance(node, Call):
            if node.func in _TECH_RECURSIVE:
                return False
            if node.func in _AGG_FAMILY and not inside:
                return True
            return any(_tech_depth(a, inside) for a in node.args)
        if isinstance(node, BinaryExpr):
            return _tech_depth(node.left, inside) or _tech_depth(
                node.right, inside
            )
        return False

    for p in stmt.projections:
        if _tech_depth(p.expr):
            raise InfluxQLPlanError(
                "mixing bare aggregates with technical-analysis calls in "
                "one statement is not supported; split the statements"
            )
    base = inner.select(*pre)
    out = apply_technical(base, tags, "time", specs)

    def resolve(node):
        if isinstance(node, Call) and node.func in _TECH_RECURSIVE:
            return F.col(tech_alias[node])
        return None

    used: set[str] = {"time", *tags}
    sel: list[Column] = [*[F.col(t) for t in tags], F.col("time")]
    aliases: list[str] = []
    for p in stmt.projections:
        alias = _alias_for(p, used)
        aliases.append(alias)
        sel.append(_lower_over(p.expr, m, resolve).alias(alias))
    out = out.select(*sel)
    out = _drop_leading_nulls(out, aliases)
    if stmt.fill is FillOption.NULL:
        from influxdb_iox_spark.operators.gapfill import fill_window_gaps

        gstart, gstop = _fill_grid_bounds(stmt, now_ns)
        out = fill_window_gaps(
            out,
            tags,
            "time",
            stmt.group_by_time_ns,
            strategy="null",
            grid_start=gstart,
            grid_stop=gstop,
        )
    out = _apply_bucket_limit(stmt, out, tags)
    out = _finish_tz_time(stmt, out)
    tcol = F.col("time").desc() if stmt.order_desc else F.col("time").asc()
    return out.orderBy(*[F.col(t) for t in tags], tcol)


def _plan_holt_winters(
    stmt: SelectStatement, m: Measurement, df: DataFrame, tags: list[str]
) -> DataFrame:
    """``SELECT holt_winters[_with_fit](agg(v), N, S) FROM m WHERE time …
    GROUP BY time(interval)[, tag]``: fit an additive Holt-Winters model
    per series on the bucketed aggregate and emit N forecast buckets
    continuing the grid (the _WITH_FIT form also emits the fitted values
    over the observed range).  Semantics contract pinned in
    operators/technical.py (the stock docs leave fit details open).  One
    hash aggregate + one applyInPandas per statement."""
    from influxdb_iox_spark.operators.technical import apply_holt_winters

    if len(stmt.projections) != 1:
        raise InfluxQLPlanError(
            "holt_winters() must be the only projection"
        )
    call = stmt.projections[0].expr
    if not (isinstance(call, Call) and call.func in _HW):
        raise InfluxQLPlanError(
            "holt_winters() cannot appear inside another expression"
        )
    if stmt.group_by_time_ns is None:
        raise InfluxQLPlanError("holt_winters() requires GROUP BY time()")
    if stmt.tz is not None:
        raise InfluxQLPlanError("holt_winters() does not support tz() yet")
    if not (
        call.args
        and isinstance(call.args[0], Call)
        and call.args[0].func in _AGG_FAMILY
    ):
        raise InfluxQLPlanError(
            "holt_winters() needs an aggregate argument (e.g. mean(v))"
        )
    n_pred = int(_int_arg(call, 1, "a forecast length N"))
    if n_pred < 1:
        raise InfluxQLPlanError("holt_winters(): N must be positive")
    season = int(_int_arg(call, 2, "a seasonal pattern length"))
    if season < 0:
        raise InfluxQLPlanError(
            "holt_winters(): seasonal pattern length must be >= 0"
        )
    # Extension beyond stock InfluxQL: optional pinned smoothing factors
    # holt_winters(agg(v), N, S[, alpha, beta[, gamma]]).  With pinned
    # parameters the fit is skipped and the recursion is a closed coupled
    # level/trend[/seasonal] fold — SQL-expressible, hence oracle-
    # checkable (the fitted form's Nelder-Mead search is not).
    params: tuple[float, float, float] | None = None
    if len(call.args) > 6:
        raise InfluxQLPlanError(
            "holt_winters() takes at most 6 arguments"
            " (agg, N, S[, alpha, beta[, gamma]])"
        )
    if len(call.args) > 3:
        if len(call.args) < 5:
            raise InfluxQLPlanError(
                "holt_winters(): pinned smoothing needs both alpha and"
                " beta (gamma optional)"
            )
        vals = []
        for i, what in ((3, "alpha"), (4, "beta"), (5, "gamma")):
            if i >= len(call.args):
                vals.append(0.0)
                continue
            arg = call.args[i]
            if not (
                isinstance(arg, Literal) and arg.kind in ("int", "float")
            ):
                raise InfluxQLPlanError(
                    f"holt_winters(): {what} must be a number literal"
                )
            v = float(arg.value)
            if not 0.0 <= v <= 1.0:
                raise InfluxQLPlanError(
                    f"holt_winters(): {what} must be in [0, 1]"
                )
            vals.append(v)
        params = (vals[0], vals[1], vals[2])
    agg_cols, agg_alias = _collect_agg_calls(stmt.projections, m)
    group_cols = [*[F.col(t) for t in tags], _bucket_col(stmt, m)]
    inner = df.groupBy(*group_cols).agg(*agg_cols)
    name = agg_alias[call.args[0]]
    val = (
        F.col(name).getField("value")
        if call.args[0].func in _SELECTORS
        else F.col(name)
    )
    base = inner.select(
        *[F.col(t) for t in tags],
        F.col("time"),
        val.cast("double").alias("__y"),
    )
    alias = stmt.projections[0].alias or call.func
    out = apply_holt_winters(
        base,
        tags,
        "time",
        "__y",
        n_pred,
        season,
        stmt.group_by_time_ns,
        with_fit=call.func.endswith("_with_fit"),
        out_col=alias,
        params=params,
    )
    tcol = F.col("time").desc() if stmt.order_desc else F.col("time").asc()
    return out.orderBy(*[F.col(t) for t in tags], tcol)


def _apply_series_limits(
    stmt: SelectStatement, out: DataFrame, tags: list[str]
) -> DataFrame:
    if stmt.slimit is None and not stmt.soffset:
        return out
    if not tags:
        raise InfluxQLPlanError("SLIMIT/SOFFSET need GROUP BY tags")
    from influxdb_iox_spark.operators.series import series_limit

    n = stmt.slimit if stmt.slimit is not None else (1 << 31)
    return series_limit(out, tags, n, stmt.soffset)


# -- INTO writeback ----------------------------------------------------------

_INTO_FIELD_TYPES = {
    "double": "field::float",
    "float": "field::float",
    "bigint": "field::integer",
    "int": "field::integer",
    "smallint": "field::integer",
    "tinyint": "field::integer",
    "string": "field::string",
    "boolean": "field::boolean",
}


def run_into(
    stmt: SelectStatement,
    catalog: dict[str, Measurement],
    database,
    now_ns: int | None = None,
) -> int:
    """``SELECT ... INTO dst FROM ...`` — the continuous-query
    writeback: run the select, persist the result as a chunk of ``dst``
    through the engine's normal write path (PK-sorted parquet +
    manifest), register the destination schema.  Re-running the same
    INTO upserts refreshed buckets via PK dedup-on-read, exactly like
    ``streaming/downsample.py`` (same idempotence argument).  Returns
    rows written."""
    import copy

    from influxdb_iox_spark.schema import InfluxColumnType, IoxSchema

    dst = stmt.into
    if not dst:
        raise InfluxQLPlanError("run_into needs an INTO clause")
    inner = copy.copy(stmt)
    inner.into = None
    now_ns = now_ns if now_ns is not None else _time.time_ns()
    out, stmt_tags = _plan_select_impl(inner, catalog, now_ns)
    cols = out.columns
    if "time" not in cols:
        raise InfluxQLPlanError(
            "INTO requires a time column in the result — bucketed "
            "aggregates (GROUP BY time()) or raw selects"
        )
    # destination tags = the STATEMENT's resolved group tags (plus the
    # synthetic measurement column for multi-FROM, which keeps per-source
    # series distinct in the destination PK).  Classifying by name match
    # against the whole catalog would silently turn an aliased field
    # (SELECT mean(v) AS host INTO ...) into a tag.
    tag_cols = [c for c in cols if c in stmt_tags or c == "measurement"]
    dtypes = dict(out.dtypes)
    for c in tag_cols:
        if dtypes.get(c) != "string":
            raise InfluxQLPlanError(
                f"INTO tag column {c!r} has non-string type "
                f"{dtypes.get(c)}; tags must be strings"
            )
    field_types: dict[str, InfluxColumnType] = {}
    for c in cols:
        if c in tag_cols or c == "time":
            continue
        t = _INTO_FIELD_TYPES.get(dtypes.get(c, ""))
        if t is None:
            raise InfluxQLPlanError(
                f"column {c!r} of type {dtypes.get(c)} cannot be an "
                "Influx field"
            )
        field_types[c] = InfluxColumnType(t)
    if not field_types:
        raise InfluxQLPlanError("INTO result has no field columns")
    schema = IoxSchema.build(tag_cols, field_types)
    # materialize ONCE: the emptiness probe and the chunk write must not
    # each re-run the query (same pattern as downsample's writeback)
    out = out.localCheckpoint(eager=True)
    n = out.count()
    if n == 0:
        return 0
    database.store.write_chunk(out, dst, schema)
    database.register_table(dst, schema)
    return n


def run_delete(
    stmt,
    catalog: dict[str, Measurement],
    database,
    now_ns: int | None = None,
) -> list[str]:
    """``DELETE [FROM m] [WHERE ...]`` — lower onto the engine's delete
    tombstones (plans/predicate.py DeletePredicate, the entry.fbs
    Delete{table_name, predicate} wire shape): rows vanish from every
    subsequent scan, physically folded at compaction.  Stock 1.x
    restrictions enforced: conditions are AND-combined tag = / !=
    comparisons plus a time range — fields and OR are rejected.
    Returns the measurements tombstoned."""
    import re as _re

    from influxdb_iox_spark.plans.predicate import DeleteExpr, DeletePredicate

    now_ns = now_ns if now_ns is not None else _time.time_ns()
    if stmt.from_regex is not None:
        try:
            names = [
                n for n in sorted(catalog) if _re.search(stmt.from_regex, n)
            ]
        except _re.error as e:
            raise InfluxQLPlanError(f"bad FROM regex: {e}") from None
    elif stmt.from_names is not None:
        names = list(stmt.from_names)
        for n in names:
            if n not in catalog:
                raise InfluxQLPlanError(f"unknown measurement {n!r}")
    else:
        names = sorted(catalog)

    lo, hi = (None, None)
    exprs: list[DeleteExpr] = []
    if stmt.where is not None:
        lo, hi = _where_time_range(stmt.where, now_ns)
        exprs = _delete_conjuncts(stmt.where)
    if lo is None and hi is None and not exprs:
        # bare DELETE FROM m: stock deletes every point — an explicit
        # all-time tombstone, never an empty predicate (the store
        # rejects those as too dangerous to be implicit)
        hi = (1 << 63) - 1

    deleted: list[str] = []
    for n in names:
        m = catalog[n]
        bad = [e.column for e in exprs if e.column not in m.tags]
        fieldish = [c for c in bad if c in m.fields]
        if fieldish:
            raise InfluxQLPlanError(
                f"DELETE conditions may reference tags and time only; "
                f"{fieldish[0]!r} is a field of {n!r} (stock restriction)"
            )
        dpred = DeletePredicate(start=lo, stop=hi, exprs=exprs)
        database.store.delete_predicate(n, dpred)
        deleted.append(n)
    return deleted


def run_drop_series(
    stmt,
    catalog: dict[str, Measurement],
    database,
) -> list[str]:
    """``DROP SERIES [FROM m | /re/] [WHERE tag-conds]`` — stock 1.x:
    deletes whole series across ALL time.  Lowered onto the same delete
    tombstones as DELETE (an explicit all-time predicate), with the stock
    restriction that WHERE may not mention time — DROP SERIES is a series
    operation, not a range delete."""
    from influxdb_iox_spark.influxql.ast_nodes import DeleteStatement

    if stmt.where is not None:
        lo, hi = _where_time_range(stmt.where, _time.time_ns())
        if lo is not None or hi is not None:
            raise InfluxQLPlanError(
                "DROP SERIES does not accept time conditions "
                "(use DELETE for range deletes)"
            )
    twin = DeleteStatement(
        from_names=stmt.from_names,
        from_regex=stmt.from_regex,
        where=stmt.where,
    )
    return run_delete(twin, catalog, database)


def _delete_conjuncts(node) -> list:
    """AND-combined tag comparisons of a DELETE WHERE -> DeleteExpr list
    (time comparisons are consumed separately by _where_time_range)."""
    from influxdb_iox_spark.plans.predicate import DeleteExpr

    if isinstance(node, BinaryExpr) and node.op == "AND":
        return _delete_conjuncts(node.left) + _delete_conjuncts(node.right)
    if isinstance(node, BinaryExpr) and node.op == "OR":
        raise InfluxQLPlanError(
            "DELETE WHERE supports AND-combined conditions only"
        )
    if not isinstance(node, BinaryExpr):
        raise InfluxQLPlanError(f"unsupported DELETE condition {node!r}")
    left, right, op = node.left, node.right, node.op
    if isinstance(left, (Literal, Call)) and isinstance(right, VarRef):
        left, right = right, left
        op = {">": "<", "<": ">", ">=": "<=", "<=": ">="}.get(op, op)
    if isinstance(left, VarRef) and left.name == "time":
        if op not in (">", ">=", "<", "<=", "="):
            raise InfluxQLPlanError(
                f"DELETE time conditions support range operators, got {op!r}"
            )
        return []  # folded into the predicate's time range
    if not isinstance(left, VarRef) or not isinstance(right, Literal):
        raise InfluxQLPlanError(
            "DELETE conditions must compare a tag to a literal"
        )
    if op not in ("=", "!="):
        raise InfluxQLPlanError(
            f"DELETE tag conditions support = and != only, got {op!r}"
        )
    if right.kind == "regex":
        raise InfluxQLPlanError("DELETE does not support regex conditions")
    return [DeleteExpr(left.name, op, right.value)]


# -- SHOW lowering -----------------------------------------------------------

_INFLUX_TYPES = {
    "double": "float",
    "float": "float",
    "bigint": "integer",
    "int": "integer",
    "smallint": "integer",
    "tinyint": "integer",
    "string": "string",
    "boolean": "boolean",
    "decimal(20,0)": "unsigned",
}


def _apply_show_limit(stmt: ShowStatement, out: DataFrame) -> DataFrame:
    """LIMIT/OFFSET on SHOW output (applied after the sort; SHOW results
    are metadata-sized)."""
    if stmt.offset:
        out = out.offset(stmt.offset)
    if stmt.limit is not None:
        out = out.limit(stmt.limit)
    return out


def format_duration_ns(ns: int) -> str:
    """Stock's RP duration rendering: ``24h0m0s``; 0 = keep forever =
    ``0s``.  Sub-second remainders (unreachable through stock clients,
    possible through ours) render as a trailing ns part."""
    if ns <= 0:
        return "0s"
    s, rem = divmod(int(ns), 1_000_000_000)
    h, s = divmod(s, 3600)
    m, s = divmod(s, 60)
    out = f"{h}h{m}m{s}s"
    return out + (f"{rem}ns" if rem else "")


def plan_show(
    stmt: ShowStatement,
    catalog: dict[str, Measurement],
    databases: list[str] | None = None,
    now_ns: int | None = None,
    retention: list[tuple[str, int, bool]] | None = None,
) -> DataFrame:
    now_ns = now_ns if now_ns is not None else _time.time_ns()
    # metadata-only SHOWs (DATABASES / RETENTION POLICIES / MEASUREMENTS)
    # must work against an EMPTY database — a fresh server gets probed by
    # clients (Grafana datasource check) before any write lands — so the
    # session cannot be derived from the catalog.
    if catalog:
        spark = next(iter(catalog.values())).df.sparkSession
    else:
        from pyspark.sql import SparkSession

        # getActiveSession is thread-local (None on an HTTP server
        # thread); fall back to the process-wide default session, which
        # getOrCreate returns without creating anything new.
        spark = (
            SparkSession.getActiveSession()
            or SparkSession.builder.getOrCreate()
        )
    names = sorted(catalog)
    if stmt.measurement is not None and stmt.measurement not in catalog:
        raise InfluxQLPlanError(f"unknown measurement {stmt.measurement!r}")
    scope = [stmt.measurement] if stmt.measurement else names
    out = _plan_show_core(
        stmt, catalog, spark, names, scope, databases, now_ns, retention
    )
    return _apply_show_limit(stmt, out)


def _tag_values_keys(stmt: ShowStatement, mm: Measurement) -> list[str]:
    """The tag keys a SHOW TAG VALUES [CARDINALITY] statement selects on
    one measurement (WITH KEY =, WITH KEY IN, WITH KEY =~), restricted
    to keys the measurement actually has — shared by the listing
    lowering and the sketch-estimate branch so they can never pick
    different keys."""
    import re as _re

    if stmt.with_key is not None:
        return [stmt.with_key] if stmt.with_key in mm.tags else []
    if stmt.with_keys is not None:
        return [k for k in stmt.with_keys if k in mm.tags]
    if stmt.with_key_regex is not None:
        try:
            pat = _re.compile(stmt.with_key_regex)
        except _re.error as e:
            raise InfluxQLPlanError(f"bad WITH KEY regex: {e}") from None
        return [k for k in mm.tags if pat.search(k)]
    raise InfluxQLPlanError("SHOW TAG VALUES needs WITH KEY")


def _plan_show_core(
    stmt: ShowStatement,
    catalog: dict[str, Measurement],
    spark,
    names: list[str],
    scope: list[str],
    databases: list[str] | None,
    now_ns: int,
    retention: list[tuple[str, int, bool]] | None = None,
) -> DataFrame:
    def scoped_df(mm: Measurement) -> DataFrame:
        """The measurement's frame under the statement's WHERE (stock
        SHOW ... WHERE: Grafana's dashboard-variable queries scope tag
        listings by time range and tag conditions)."""
        if stmt.where is None:
            return mm.df
        return mm.df.filter(_lower_where(stmt.where, mm, now_ns))

    if stmt.what.endswith("cardinality"):
        # SHOW <kind> [EXACT] CARDINALITY: exact distinct counts over the
        # corresponding listing plan — one extra aggregate, reusing the
        # listing lowering verbatim so the two can never disagree
        import copy

        if stmt.what == "measurement cardinality":
            return spark.createDataFrame([(len(names),)], "count long")
        if (
            stmt.what == "series cardinality"
            and not stmt.exact
            and stmt.where is None
            and scope
            and all(catalog[n].series_rollup is not None for n in scope)
        ):
            # Metadata-first: every in-scope measurement carries a
            # registered HLL series rollup and the statement has no
            # WHERE — answer from sketch cells (one union-fold each,
            # KB-sized rows), never scanning raw tables.  Measurements'
            # series sets are disjoint, so the per-table estimates sum.
            # EXACT CARDINALITY (stmt.exact) always takes the rescan
            # below — the opt-in exactness toggle.
            from influxdb_iox_spark.pipeline.cardinality import (
                estimate_series_cardinality,
            )

            total = sum(
                estimate_series_cardinality(
                    catalog[n].series_rollup[0], [], identity="tagset"
                )
                for n in scope
            )
            return spark.createDataFrame([(total,)], "count long")
        if (
            stmt.what == "tag values cardinality"
            and not stmt.exact
            and stmt.where is None
            and scope
            and (
                stmt.with_key is not None
                or stmt.with_keys is not None
                or stmt.with_key_regex is not None
            )
        ):
            # Metadata-first tag-values count, multi-measurement + IN /
            # regex key selection (round-15; was single-measurement
            # WITH KEY = only).  The listing DEDUPES values across
            # measurements, so per-measurement sketches are HLL-UNIONED
            # per key (never summed); distinct keys' (key, value) pair
            # sets are disjoint, so per-key estimates sum.  Coverable
            # only when EVERY measurement carrying a selected key has a
            # registered rollup sketching that key; otherwise the exact
            # listing rescan below answers.  EXACT CARDINALITY
            # (stmt.exact) always rescans — the opt-in toggle.
            from influxdb_iox_spark.pipeline.cardinality import (
                estimate_union_cardinality,
            )

            key_tables: dict[str, list[str]] = {}
            for n in scope:
                for key in _tag_values_keys(stmt, catalog[n]):
                    key_tables.setdefault(key, []).append(n)
            coverable = key_tables and all(
                catalog[n].series_rollup is not None
                and f"sketch_tv_{k}" in catalog[n].series_rollup[0].columns
                for k, ns in key_tables.items()
                for n in ns
            )
            if coverable:
                total = sum(
                    estimate_union_cardinality(
                        [catalog[n].series_rollup[0] for n in ns],
                        identity=f"tv:{k}",
                    )
                    for k, ns in sorted(key_tables.items())
                )
                return spark.createDataFrame([(total,)], "count long")
        inner = copy.copy(stmt)
        inner.what = {
            "series cardinality": "series",
            "tag key cardinality": "tag keys",
            "field key cardinality": "field keys",
            "tag values cardinality": "tag values",
        }[stmt.what]
        df = _plan_show_core(
            inner, catalog, spark, names, scope, databases, now_ns
        )
        if "measurement" in df.columns:
            return (
                df.groupBy("measurement")
                .agg(F.count("*").alias("count"))
                .orderBy("measurement")
            )
        return df.agg(F.count("*").alias("count"))
    if stmt.what == "measurements":
        if stmt.with_measurement is not None:
            names = [n for n in names if n == stmt.with_measurement]
        if stmt.with_measurement_regex is not None:
            import re as _re

            try:
                pat = _re.compile(stmt.with_measurement_regex)
            except _re.error as e:
                raise InfluxQLPlanError(
                    f"bad WITH MEASUREMENT regex: {e}"
                ) from None
            names = [n for n in names if pat.search(n)]
        return spark.createDataFrame([(n,) for n in names], "name string")
    if stmt.what == "databases":
        return spark.createDataFrame(
            [(d,) for d in (databases or [])], "name string"
        )
    if stmt.what == "retention policies":
        # declared policies (retention.RetentionRegistry, fed by the RP
        # DDL and ENFORCED since round 12); a fresh database with none
        # declared shows the stock autogen row so v1 clients' probes
        # (Grafana's datasource check) stay happy
        rows = (
            [
                (n, format_duration_ns(d), "168h0m0s", 1, bool(is_def))
                for (n, d, is_def) in retention
            ]
            if retention
            else [("autogen", "0s", "168h0m0s", 1, True)]
        )
        return spark.createDataFrame(
            rows,
            "name string, duration string, shardGroupDuration string, "
            "replicaN int, `default` boolean",
        )
    if stmt.what == "series":
        frames = []
        if not scope:
            return spark.createDataFrame([], "key string")
        for n in scope:
            mm = catalog[n]
            key = F.lit(n)
            for t in sorted(mm.tags):
                key = F.concat(
                    key,
                    F.when(
                        F.col(t).isNotNull(),
                        F.concat(F.lit(f",{t}="), F.col(t)),
                    ).otherwise(F.lit("")),
                )
            frames.append(
                scoped_df(mm).select(key.alias("key")).distinct()
            )
        out = frames[0]
        for f_ in frames[1:]:
            out = out.unionByName(f_)
        return out.distinct().orderBy("key")
    if stmt.what == "tag keys":
        if stmt.where is None:
            # metadata fast path: the catalog knows the keys
            rows = [
                (n, t) for n in scope for t in sorted(catalog[n].tags)
            ]
            return spark.createDataFrame(
                rows, "measurement string, tag_key string"
            )
        # WHERE: a key is listed iff some in-scope row has it non-null —
        # ONE one-row aggregate per measurement (the SchemaPivot shape,
        # operators/metadata.py), unpivoted with stack; no collect
        frames = []
        for n in scope:
            mm = catalog[n]
            tags = sorted(mm.tags)
            if not tags:
                continue
            agg = scoped_df(mm).agg(
                *[F.max(F.col(t).isNotNull()).alias(t) for t in tags]
            )
            pairs = ", ".join(f"'{t}', `{t}`" for t in tags)
            un = agg.select(
                F.expr(
                    f"stack({len(tags)}, {pairs}) as (tag_key, present)"
                )
            )
            frames.append(
                un.filter("present").select(
                    F.lit(n).alias("measurement"), "tag_key"
                )
            )
        if not frames:
            return spark.createDataFrame(
                [], "measurement string, tag_key string"
            )
        out = frames[0]
        for f_ in frames[1:]:
            out = out.unionByName(f_)
        return out.orderBy("measurement", "tag_key")
    if stmt.what == "field keys":
        rows = []
        for n in scope:
            mm = catalog[n]
            dtypes = dict(mm.df.dtypes)
            for f_ in sorted(mm.fields):
                rows.append(
                    (n, f_, _INFLUX_TYPES.get(dtypes.get(f_, ""), dtypes.get(f_, "")))
                )
        return spark.createDataFrame(
            rows, "measurement string, field_key string, field_type string"
        )
    if stmt.what == "tag values":
        frames = []
        for n in scope:
            mm = catalog[n]
            for key in _tag_values_keys(stmt, mm):
                frames.append(
                    scoped_df(mm)
                    .select(
                        F.lit(key).alias("key"), F.col(key).alias("value")
                    )
                    .filter(F.col(key).isNotNull())
                    .distinct()
                )
        if not frames:
            return spark.createDataFrame([], "key string, value string")
        out = frames[0]
        for f_ in frames[1:]:
            out = out.unionByName(f_)
        return out.distinct().orderBy("key", "value")
    raise InfluxQLPlanError(f"unsupported SHOW {stmt.what!r}")


def execute(
    text: str,
    catalog: dict[str, Measurement],
    now_ns: int | None = None,
    databases: list[str] | None = None,
) -> DataFrame:
    """Parse + plan one InfluxQL statement against ``catalog``.
    ``databases``: names surfaced by SHOW DATABASES (the catalog itself
    is one database's measurements)."""
    stmt = parse(text)
    if isinstance(stmt, SelectStatement):
        if stmt.into is not None:
            raise InfluxQLPlanError(
                "SELECT ... INTO needs a Database to write to — use "
                "run_into() (or the /query HTTP endpoint, which routes "
                "it automatically)"
            )
        return plan_select(stmt, catalog, now_ns=now_ns)
    if not isinstance(stmt, ShowStatement):
        raise InfluxQLPlanError(
            f"{type(stmt).__name__} needs a Database — use the /query "
            "HTTP endpoint (or run_delete/ContinuousQueryRegistry/"
            "Database.drop_table directly)"
        )
    return plan_show(stmt, catalog, databases=databases, now_ns=now_ns)
