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
- fill() spans each series' own observed bucket extent (first..last),
  not the WHERE-clause time range, matching operators/gapfill.py.
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
    if not isinstance(left, VarRef):
        raise InfluxQLPlanError("comparison must reference a column")
    name = left.name
    if name == "time":
        col = F.col(m.time_col)
        ns = _time_operand_ns(right, now_ns)
        return {
            "=": col == ns, "!=": col != ns, ">": col > ns,
            ">=": col >= ns, "<": col < ns, "<=": col <= ns,
        }[op]
    if name not in (*m.tags, *m.fields):
        raise InfluxQLPlanError(f"unknown column {name!r} in WHERE")
    col = F.col(name)
    if op in ("=~", "!~"):
        if not isinstance(right, Literal) or right.kind != "regex":
            raise InfluxQLPlanError("=~ / !~ need a /regex/")
        matched = col.rlike(str(right.value))
        return matched if op == "=~" else ~matched
    if not isinstance(right, Literal):
        raise InfluxQLPlanError("comparison literal expected")
    val = right.value
    return {
        "=": col == val, "!=": col != val, ">": col > val,
        ">=": col >= val, "<": col < val, "<=": col <= val,
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
}

_SELECTORS = ("first", "last")
_TRANSFORMS = (
    "difference",
    "non_negative_difference",
    "cumulative_sum",
    "derivative",
    "moving_average",
    "elapsed",
)
_SUPPORTED = (
    tuple(_PLAIN_AGGS)
    + _SELECTORS
    + _TRANSFORMS
    + ("spread", "percentile", "top", "bottom", "distinct")
)


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
    else:
        base = proj.expr.name
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
    if stmt.measurement not in catalog:
        raise InfluxQLPlanError(f"unknown measurement {stmt.measurement!r}")
    m = catalog[stmt.measurement]
    now_ns = now_ns if now_ns is not None else _time.time_ns()
    df = m.df
    if stmt.where is not None:
        df = df.filter(_lower_where(stmt.where, m, now_ns))

    tags = _resolve_group_tags(stmt, m)

    exprs = [p.expr for p in stmt.projections]
    calls = [e for e in exprs if isinstance(e, Call)]
    raws = [e for e in exprs if isinstance(e, VarRef)]
    if calls and raws:
        raise InfluxQLPlanError(
            "mixing aggregate calls and raw fields is not supported "
            "(stock InfluxQL rejects this too)"
        )
    for c in calls:
        if c.func not in _SUPPORTED:
            raise InfluxQLPlanError(
                f"unsupported function {c.func}(); supported: "
                + ", ".join(sorted(_SUPPORTED))
            )
        if any(isinstance(a, Call) for a in c.args):
            raise InfluxQLPlanError(
                "nested calls (transform-of-aggregate) are not supported"
            )

    if not calls:
        out = _plan_raw(stmt, m, df, tags)
    elif any(c.func in _TRANSFORMS for c in calls):
        out = _plan_transforms(stmt, m, df, tags)
    elif any(c.func in ("top", "bottom") for c in calls):
        out = _plan_top_bottom(stmt, m, df, tags)
    elif any(c.func == "distinct" for c in calls):
        out = _plan_distinct(stmt, m, df, tags)
    elif any(c.func == "percentile" for c in calls):
        out = _plan_percentile(stmt, m, df, tags)
    else:
        out = _plan_aggregates(stmt, m, df, tags)

    out = _apply_series_limits(stmt, out, tags)
    return out


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
        name = p.expr.name
        if name == "*":
            for f_ in m.fields:
                if f_ not in used:
                    used.add(f_)
                    cols.append(F.col(f_))
            continue
        if name not in (*m.fields, *m.tags):
            raise InfluxQLPlanError(f"unknown column {name!r}")
        alias = _alias_for(p, used)
        cols.append(F.col(name).alias(alias))
    out = df.select(*cols)
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


def _bucket_col(stmt: SelectStatement, m: Measurement) -> Column:
    from influxdb_iox_spark.functions.time import window_start

    return window_start(
        m.time_col, stmt.group_by_time_ns, stmt.group_by_offset_ns
    ).alias("time")


def _plan_aggregates(
    stmt: SelectStatement, m: Measurement, df: DataFrame, tags: list[str]
) -> DataFrame:
    from influxdb_iox_spark.operators.selectors import (
        selector_first,
        selector_last,
    )
    from influxdb_iox_spark.operators.stats import spread

    used: set[str] = {"time", *tags}
    aggs: list[Column] = []
    lone_selector = (
        len(stmt.projections) == 1
        and isinstance(stmt.projections[0].expr, Call)
        and stmt.projections[0].expr.func in _SELECTORS
        and stmt.group_by_time_ns is None
    )
    for p in stmt.projections:
        call = p.expr
        fld = _field_arg(call, m)
        alias = _alias_for(p, used)
        if call.func in _SELECTORS:
            sel = (selector_first if call.func == "first" else selector_last)(
                fld, m.time_col
            )
            if lone_selector:
                aggs.append(sel.getField("time").alias("time"))
            aggs.append(sel.getField("value").alias(alias))
        elif call.func == "spread":
            aggs.append(spread(fld).alias(alias))
        else:
            aggs.append(_PLAIN_AGGS[call.func](F.col(fld)).alias(alias))

    group_cols: list[Column] = [F.col(t) for t in tags]
    if stmt.group_by_time_ns is not None:
        group_cols.append(_bucket_col(stmt, m))
    if group_cols:
        out = df.groupBy(*group_cols).agg(*aggs)
    else:
        out = df.agg(*aggs)

    if stmt.group_by_time_ns is not None and stmt.fill is not FillOption.NONE:
        from influxdb_iox_spark.operators.gapfill import fill_window_gaps

        strategy = (
            "value" if stmt.fill is FillOption.VALUE else stmt.fill.value
        )
        out = fill_window_gaps(
            out,
            tags,
            "time",
            stmt.group_by_time_ns,
            strategy=strategy,
            fill_value=stmt.fill_value,
        )

    order: list[Column] = [F.col(t) for t in tags]
    if stmt.group_by_time_ns is not None or lone_selector:
        order.append(
            F.col("time").desc() if stmt.order_desc else F.col("time").asc()
        )
    out = _apply_bucket_limit(stmt, out, tags)
    return out.orderBy(*order) if order else out


def _apply_bucket_limit(
    stmt: SelectStatement, out: DataFrame, tags: list[str]
) -> DataFrame:
    """LIMIT on a bucketed aggregate limits buckets per series."""
    if stmt.group_by_time_ns is None or (stmt.limit is None and not stmt.offset):
        return out
    return _apply_point_limit(stmt, None, out, tags)


def _plan_transforms(
    stmt: SelectStatement, m: Measurement, df: DataFrame, tags: list[str]
) -> DataFrame:
    from influxdb_iox_spark.operators import transforms as T

    if stmt.group_by_time_ns is not None:
        raise InfluxQLPlanError(
            "transform-over-GROUP-BY-time (transform of an aggregate) "
            "is not supported; apply the transform to raw points"
        )
    w = T.series_window(tags, [m.time_col])
    used: set[str] = {"time", *tags}
    cols: list[Column] = [*[F.col(t) for t in tags], _time_out(m)]
    drop_first_null_of: list[str] = []
    for p in stmt.projections:
        call = p.expr
        if call.func not in _TRANSFORMS:
            raise InfluxQLPlanError(
                "transforms cannot mix with aggregates in one statement"
            )
        fld = _field_arg(call, m)
        alias = _alias_for(p, used)
        v = F.col(fld)
        if call.func == "difference":
            cols.append(T.difference(v, w).alias(alias))
            drop_first_null_of.append(alias)
        elif call.func == "non_negative_difference":
            cols.append(T.non_negative_difference(v, w).alias(alias))
        elif call.func == "cumulative_sum":
            cols.append(T.cumulative_sum(v, w).alias(alias))
        elif call.func == "elapsed":
            unit = (
                int(call.args[1].value)
                if len(call.args) > 1 and isinstance(call.args[1], Literal)
                and call.args[1].kind == "duration"
                else 1
            )
            e = T.elapsed(F.col(m.time_col), w)
            cols.append((e / unit).cast("long").alias(alias))
            drop_first_null_of.append(alias)
        elif call.func == "derivative":
            unit = (
                int(call.args[1].value)
                if len(call.args) > 1 and isinstance(call.args[1], Literal)
                and call.args[1].kind == "duration"
                else 1_000_000_000  # spec default: per second
            )
            cols.append(
                T.derivative(v, F.col(m.time_col), w, unit).alias(alias)
            )
            drop_first_null_of.append(alias)
        elif call.func == "moving_average":
            n = int(_int_arg(call, 1, "a window size"))
            ma = T.moving_average_sum(v, w, n) / T.moving_average_count(w, n)
            # spec: emitted only once n points accumulated
            full = T.moving_average_count(w, n) == n
            cols.append(F.when(full, ma).alias(alias))
            drop_first_null_of.append(alias)
    out = df.select(*cols)
    if drop_first_null_of:
        keep = None
        for c in drop_first_null_of:
            k = F.col(c).isNotNull()
            keep = k if keep is None else (keep | k)
        out = out.filter(keep)
    out = _apply_point_limit(stmt, m, out, tags)
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


def plan_show(
    stmt: ShowStatement, catalog: dict[str, Measurement]
) -> DataFrame:
    some_df = next(iter(catalog.values())).df
    spark = some_df.sparkSession
    names = sorted(catalog)
    if stmt.measurement is not None and stmt.measurement not in catalog:
        raise InfluxQLPlanError(f"unknown measurement {stmt.measurement!r}")
    scope = [stmt.measurement] if stmt.measurement else names

    if stmt.what == "measurements":
        return spark.createDataFrame([(n,) for n in names], "name string")
    if stmt.what == "tag keys":
        rows = [
            (n, t) for n in scope for t in sorted(catalog[n].tags)
        ]
        return spark.createDataFrame(
            rows, "measurement string, tag_key string"
        )
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
        key = stmt.with_key
        frames = []
        for n in scope:
            mm = catalog[n]
            if key not in mm.tags:
                continue
            frames.append(
                mm.df.select(
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
        return out.distinct().orderBy("value")
    raise InfluxQLPlanError(f"unsupported SHOW {stmt.what!r}")


def execute(
    text: str,
    catalog: dict[str, Measurement],
    now_ns: int | None = None,
) -> DataFrame:
    """Parse + plan one InfluxQL statement against ``catalog``."""
    stmt = parse(text)
    if isinstance(stmt, SelectStatement):
        return plan_select(stmt, catalog, now_ns=now_ns)
    return plan_show(stmt, catalog)
