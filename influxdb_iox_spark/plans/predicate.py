"""Unified query predicate — the Spark twin of the reference's Predicate.

Mirrors /root/reference/query/src/predicate.rs:53-75 (struct) and :189
(builder): {table_names, field_columns, partition_key, time range, conjunctive
exprs}.  Time-range semantics are half-open ``start <= time < end`` in ns
(/root/reference/data_types/src/timestamp.rs:6-35; expression built at
predicate.rs:115-121) — preserved exactly here.

Exprs are plain ``pyspark.sql.Column`` booleans, so the whole RPC expression
menu (Eq/NotEq/Lt/LtEq/Gt/GtEq, And/Or, arithmetic, regex-match via
``col.rlike``) from rpc/storage/expr.rs:254-484 maps 1:1 and stays inside
Catalyst — every predicate here is pushdown-eligible.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F

from influxdb_iox_spark.schema import TIME_COLUMN_NAME


def _harvest_refs(expr: Column) -> set[str]:
    """Column names an unresolved expression references, read from the
    column's AST (``Column._jc.node()`` — the ColumnNode tree whose
    case-class rendering names each ``UnresolvedAttribute``).  This is a
    build-time, locale-independent read of the expression structure — the
    replacement for parsing analyzer ERROR MESSAGES at filter time (the
    round-5 review finding).  Qualified (multi-part) names are skipped:
    engine columns are flat, and a qualified ref should resolve or fail
    loudly.  Returns empty when the AST is unavailable (e.g. Spark
    Connect columns) — apply() then simply raises on a genuinely missing
    column instead of silently substituting."""
    import re

    try:
        rendered = str(expr._jc.node())
    except Exception:
        return set()
    out: set[str] = set()
    for m in re.finditer(r"UnresolvedAttribute\(List\(([^)]*)\)", rendered):
        parts = m.group(1)
        if "," not in parts and parts:
            out.add(parts.strip())
    return out


@dataclass(frozen=True)
class TimestampRange:
    """Half-open ns range [start, end) — timestamp.rs:6-35."""

    start: int
    end: int

    def contains(self, t: int) -> bool:
        return self.start <= t < self.end

    def to_column(self, time_col: str = TIME_COLUMN_NAME) -> Column:
        return (F.col(time_col) >= F.lit(self.start)) & (F.col(time_col) < F.lit(self.end))


@dataclass
class Predicate:
    """Conjunction of: optional table filter, field projection, partition key,
    time range, and arbitrary boolean exprs (predicate.rs:53-75)."""

    table_names: list[str] | None = None
    field_columns: list[str] | None = None
    partition_key: str | None = None
    range: TimestampRange | None = None
    exprs: list[Column] = field(default_factory=list)
    # structured per-column bounds: (col, lo, hi, lo_open, hi_open) with
    # None = unbounded.  Unlike the opaque ``exprs``, these are READABLE by
    # the chunk pruner (TableStore.scan field-stat pruning, the Spark twin
    # of query/src/pruning.rs evaluating exprs against chunk interval
    # stats).  Added via with_col_range, which also appends the equivalent
    # row filter so the two can never disagree.
    col_ranges: list[tuple] = field(default_factory=list)
    # every column name the exprs reference (recorded by the builders:
    # rpc_expr walks the wire tree, with_col_range/with_expr record
    # theirs).  apply() uses this to NULL-substitute columns a target
    # table lacks AT BUILD TIME — schema-aware resolution, no
    # AnalysisException parsing (round-5 review finding).
    referenced_columns: set[str] = field(default_factory=set)

    # -- builder API (predicate.rs:189 PredicateBuilder) ------------------
    def with_range(self, start: int, end: int) -> "Predicate":
        self.range = TimestampRange(start, end)
        return self

    def with_expr(self, expr: Column, columns=()) -> "Predicate":
        """``columns``: names the expr references — lets apply() resolve
        them against each target table's schema (missing → typed NULL).
        When omitted (an expr built directly from ``F.col``), the names
        are harvested from the column's OWN expression tree at build
        time — see _harvest_refs."""
        self.exprs.append(expr)
        self.referenced_columns.update(columns or _harvest_refs(expr))
        return self

    def with_col_range(
        self,
        col: str,
        lo=None,
        hi=None,
        lo_open: bool = False,
        hi_open: bool = False,
    ) -> "Predicate":
        """Add ``lo (<|<=) col (<|<=) hi`` as BOTH a structured bound (read
        by the chunk pruner) and a row-level filter expression."""
        self.col_ranges.append((col, lo, hi, lo_open, hi_open))
        self.referenced_columns.add(col)
        c = F.col(col)
        if lo is not None:
            self.exprs.append(c > F.lit(lo) if lo_open else c >= F.lit(lo))
        if hi is not None:
            self.exprs.append(c < F.lit(hi) if hi_open else c <= F.lit(hi))
        return self

    def excludes_stats(self, stats: dict) -> bool:
        """True iff some structured bound is provably disjoint with a
        chunk's [min, max] column stats — i.e. NO row of that chunk can
        satisfy the predicate.  Unknown/missing stats never exclude
        (conservative, like the reference returning 'unknown' from
        metadata-only evaluation)."""
        for col, lo, hi, lo_open, hi_open in self.col_ranges:
            r = stats.get(col)
            if r is None or r[0] is None or r[1] is None:
                continue
            cmin, cmax = r
            try:
                if lo is not None and (cmax < lo or (lo_open and cmax <= lo)):
                    return True
                if hi is not None and (cmin > hi or (hi_open and cmin >= hi)):
                    return True
            except TypeError:  # stats/bound type mismatch -> unknown
                continue
        return False

    def tables(self, *names: str) -> "Predicate":
        self.table_names = list(names)
        return self

    def fields(self, *names: str) -> "Predicate":
        self.field_columns = list(names)
        return self

    def is_row_unconstrained(self) -> bool:
        """True iff the predicate cannot exclude any row of a candidate table:
        no time range, no exprs, AND no partition key.  Gates the
        metadata-only fast paths — a partition_key-only predicate still
        constrains which chunks (and therefore which values) are visible."""
        return self.range is None and not self.exprs and self.partition_key is None

    # -- application ------------------------------------------------------
    def filter_column(self, time_col: str = TIME_COLUMN_NAME) -> Column | None:
        """AND of time range + exprs, or None if unconstrained."""
        parts: list[Column] = []
        if self.range is not None:
            parts.append(self.range.to_column(time_col))
        parts.extend(self.exprs)
        if not parts:
            return None
        return reduce(lambda a, b: a & b, parts)

    def apply(self, df: DataFrame, time_col: str = TIME_COLUMN_NAME) -> DataFrame:
        """Filter ``df``; a predicate referencing a column the table does not
        have treats that column as NULL — the reference's/DataFusion's
        missing-column rewrite (query_tests/src/influxrpc/read_filter.rs:222,
        275: `tag_not_in_h20 = 'foo'` over h2o returns nothing, because
        `NULL = 'foo'` is NULL and the conjunction can never be true; but a
        disjunction like `missing = 'x' OR present = 'y'` still returns the
        rows matching the present branch).  Resolved AT BUILD TIME against
        the table's schema: the builders record every referenced column
        name (``referenced_columns``), so the ones the table lacks get a
        typed NULL literal substituted up front and the filter evaluates
        with exact SQL three-valued logic — AND yields empty, OR keeps
        live branches — with no exception-message parsing anywhere."""
        c = self.filter_column(time_col)
        if c is None:
            return df
        missing = [
            n for n in sorted(self.referenced_columns) if n not in df.columns
        ]
        if not missing:
            return df.filter(c)
        probe = df
        for name in missing:
            # Tags are strings; a missing field compared to a numeric
            # literal still works because NULL casts to any type.
            probe = probe.withColumn(name, F.lit(None).cast("string"))
        return probe.filter(c).select(*df.columns)

    def should_scan_table(self, table: str) -> bool:
        return self.table_names is None or table in self.table_names
