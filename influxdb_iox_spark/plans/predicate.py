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

    # -- builder API (predicate.rs:189 PredicateBuilder) ------------------
    def with_range(self, start: int, end: int) -> "Predicate":
        self.range = TimestampRange(start, end)
        return self

    def with_expr(self, expr: Column) -> "Predicate":
        self.exprs.append(expr)
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
        rows matching the present branch).  Implemented by substituting a
        typed NULL literal for each unresolved column and retrying — the
        filter then evaluates with exact SQL three-valued logic, so AND
        yields empty and OR keeps live branches, matching both reference
        cases without special-casing the boolean structure."""
        c = self.filter_column(time_col)
        if c is None:
            return df
        import re

        base_cols = list(df.columns)
        added: list[str] = []
        probe = df
        for _ in range(32):  # bounded: one retry per distinct missing column
            try:
                out = probe.filter(c)
                return out.select(*base_cols) if added else out
            except Exception as e:  # AnalysisException (classic or connect)
                msg = str(e)
                if "UNRESOLVED_COLUMN" not in msg and "cannot be resolved" not in msg:
                    raise
                m = re.search(r"`([^`]+)`", msg)
                if m is None or m.group(1) in probe.columns:
                    return df.limit(0)  # unparseable error — safe fallback
                name = m.group(1)
                # Tags are strings; a missing field compared to a numeric
                # literal still works because NULL casts to any type.
                probe = probe.withColumn(name, F.lit(None).cast("string"))
                added.append(name)
        return df.limit(0)

    def should_scan_table(self, table: str) -> bool:
        return self.table_names is None or table in self.table_names
