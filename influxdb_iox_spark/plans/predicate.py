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


# -- delete predicates (tombstones) ------------------------------------------

_DELETE_OPS = ("=", "!=")


@dataclass(frozen=True)
class DeleteExpr:
    """One conjunct of a delete predicate: ``column (=|!=) literal``.

    The restricted-by-design shape of the reference's delete predicate
    (entry/src/entry.fbs ``Delete.predicate`` carries it as a string;
    the engine grammar is equality/inequality conjuncts + a time range —
    deliberately NOT the full query Predicate, so a tombstone is always
    serializable, cheap to re-evaluate at scan time, and foldable at
    compaction)."""

    column: str
    op: str
    value: str | int | float | bool

    def __post_init__(self):
        if self.op not in _DELETE_OPS:
            raise ValueError(f"delete expr op must be = or !=, got {self.op!r}")

    def to_column(self) -> Column:
        c = F.col(self.column)
        # SQL three-valued logic would keep NULL rows out of BOTH a
        # delete and its complement; deletes must partition rows exactly,
        # so NULL never matches (= nor !=) — a row with a NULL tag is
        # only deletable via a time-range-only predicate.
        if self.op == "=":
            return c.isNotNull() & (c == F.lit(self.value))
        return c.isNotNull() & (c != F.lit(self.value))


@dataclass
class DeletePredicate:
    """Rows to DELETE: (half-open [start, stop) ns time range) AND every
    expr.  An empty predicate (no range, no exprs) is rejected — it
    would silently delete the whole table; use drop_chunks for that."""

    start: int | None = None
    stop: int | None = None
    exprs: list[DeleteExpr] = field(default_factory=list)

    def __post_init__(self):
        if self.start is None and self.stop is None and not self.exprs:
            raise ValueError(
                "empty delete predicate would delete every row — "
                "use drop_chunks to drop whole chunks/tables"
            )

    def to_column(self, time_col: str = TIME_COLUMN_NAME) -> Column:
        """Boolean column: True for rows the tombstone deletes."""
        parts: list[Column] = []
        if self.start is not None:
            parts.append(F.col(time_col) >= F.lit(self.start))
        if self.stop is not None:
            parts.append(F.col(time_col) < F.lit(self.stop))
        parts.extend(e.to_column() for e in self.exprs)
        return reduce(lambda a, b: a & b, parts)

    def keep_column(self, time_col: str = TIME_COLUMN_NAME) -> Column:
        """Boolean column: True for rows that SURVIVE (the anti-filter
        applied at scan/compaction).  A bare ``~expr`` would also drop
        rows where the delete condition evaluates NULL (three-valued
        logic); DeleteExpr.to_column forces NULL→False first, so delete
        and keep partition the rows exactly."""
        return ~self.to_column(time_col)

    def deletes_nothing_on(self, columns) -> bool:
        """True when this predicate cannot match any row of a table
        with ``columns``: an expr over an ABSENT column reads all-NULL,
        and NULL never matches (= nor !=, see DeleteExpr.to_column), so
        one absent-column conjunct makes the whole AND False.  Every
        tombstone-application site must check this BEFORE building the
        filter — an unresolvable F.col() would otherwise poison scans
        and compaction of a table an HTTP multi-table delete merely
        fanned out to (review finding)."""
        cols = set(columns)
        return any(e.column not in cols for e in self.exprs)

    # -- wire formats ------------------------------------------------------
    def to_dict(self) -> dict:
        return {
            "start": self.start,
            "stop": self.stop,
            "exprs": [
                {"column": e.column, "op": e.op, "value": e.value}
                for e in self.exprs
            ],
        }

    @classmethod
    def from_dict(cls, d: dict) -> "DeletePredicate":
        return cls(
            start=d.get("start"),
            stop=d.get("stop"),
            exprs=[
                DeleteExpr(e["column"], e["op"], e["value"])
                for e in (d.get("exprs") or [])
            ],
        )

    @classmethod
    def parse(cls, text: str, start: int | None = None, stop: int | None = None) -> "DeletePredicate":
        """Parse the reference's predicate STRING (entry.fbs Delete.
        predicate).  Two accepted forms:

        - a JSON object: ``{"start":…, "stop":…, "exprs":[…]}`` (this
          engine's canonical serialization);
        - the InfluxDB 2 delete-predicate grammar: conjunctions of
          ``col = literal`` / ``col != literal`` joined by AND, with
          string literals in single or double quotes — the public
          /api/v2/delete syntax.

        ``start``/``stop`` override/augment the parsed range (the HTTP
        API carries them as separate parameters)."""
        import json as _json
        import re as _re

        text = (text or "").strip()
        if text.startswith("{"):
            d = _json.loads(text)
            if start is not None:
                d["start"] = start
            if stop is not None:
                d["stop"] = stop
            return cls.from_dict(d)
        def _split_and(s: str) -> list[str]:
            # conjunct split on AND *outside* quoted literals — a plain
            # re.split would cut inside host = 'foo and bar', rejecting
            # a predicate the /api/v2/delete grammar allows
            out, cur, i, n, quote = [], [], 0, len(s), None
            while i < n:
                c = s[i]
                if quote is not None:
                    cur.append(c)
                    if c == quote:
                        quote = None
                    i += 1
                    continue
                if c in "'\"":
                    quote = c
                    cur.append(c)
                    i += 1
                    continue
                m = _re.match(r"(?i)\s+and\s+", s[i:])
                if m:
                    out.append("".join(cur))
                    cur = []
                    i += m.end()
                    continue
                cur.append(c)
                i += 1
            out.append("".join(cur))
            return out

        exprs: list[DeleteExpr] = []
        if text:
            for part in _split_and(text):
                m = _re.match(
                    r"""^\s*"?([\w.]+)"?\s*(!?=)\s*(?:'([^']*)'|"([^"]*)"|(\S+))\s*$""",
                    part,
                )
                if not m:
                    raise ValueError(f"cannot parse delete conjunct {part!r}")
                col, op, sq, dq, bare = m.groups()
                if sq is not None or dq is not None:
                    val: str | int | float | bool = sq if sq is not None else dq
                else:
                    low = bare.lower()
                    if low in ("true", "false"):
                        val = low == "true"
                    else:
                        try:
                            val = int(bare)
                        except ValueError:
                            val = float(bare)
                exprs.append(DeleteExpr(col, op, val))
        return cls(start=start, stop=stop, exprs=exprs)
