"""Selector aggregates: first / last / min / max returning (value, time).

The reference implements these as paired UDAFs with 16 typed accumulators
because DataFusion lacked multi-column aggregates
(/root/reference/query/src/func/selectors.rs:56-160).  Spark needs no UDAF:
an ordered-struct min/max compiles to a plain hash aggregate.

Tie-break rules from the reference doc comments (selectors.rs:48-56, 78-86,
104-116, 134-146):
- first: value at the minimum timestamp
- last:  value at the maximum timestamp
- min:   minimum value; among equal values, the EARLIEST timestamp
- max:   maximum value; among equal values, the EARLIEST timestamp

``F.min(struct(time, value))`` orders lexicographically on (time, value) so
first/last fall out naturally; min orders (value, time); max needs (value,
-time) so that the earliest timestamp wins among equal maxima.

Each helper returns a struct column — unpack with ``.getField("value")`` /
``.getField("time")`` or use the ``*_value`` / ``*_time`` convenience pair.
Null handling matches the reference: rows with NULL value are ignored (the
selector is over a field column; aggregates skip nulls via masking).

DOCUMENTED DIVERGENCE (first/last at exactly-equal timestamps): when two
rows share the extreme timestamp, the reference keeps whichever it
encountered first — SCAN-ORDER nondeterministic (selectors.rs keeps the
incumbent accumulator on ties).  The struct ordering here breaks the
same tie by VALUE (lexicographic on (time, value)), which is strictly
deterministic across partitionings and replays.  Any value the
reference could return is one of the tied rows; this implementation
always returns the same one.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from influxdb_iox_spark.schema import TIME_COLUMN_NAME


def _nn(value: Column, inner: Column) -> Column:
    # Mask rows where the field is NULL so min/max skip them entirely.
    return F.when(value.isNotNull(), inner)


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def selector_first(value: Column | str, time: Column | str = TIME_COLUMN_NAME) -> Column:
    v, t = _col(value), _col(time)
    s = F.min(_nn(v, F.struct(t.alias("time"), v.alias("value"))))
    return F.struct(s.getField("value").alias("value"), s.getField("time").alias("time"))


def selector_last(value: Column | str, time: Column | str = TIME_COLUMN_NAME) -> Column:
    v, t = _col(value), _col(time)
    s = F.max(_nn(v, F.struct(t.alias("time"), v.alias("value"))))
    return F.struct(s.getField("value").alias("value"), s.getField("time").alias("time"))


def selector_min(value: Column | str, time: Column | str = TIME_COLUMN_NAME) -> Column:
    v, t = _col(value), _col(time)
    s = F.min(_nn(v, F.struct(v.alias("value"), t.alias("time"))))
    return F.struct(s.getField("value").alias("value"), s.getField("time").alias("time"))


def selector_max(value: Column | str, time: Column | str = TIME_COLUMN_NAME) -> Column:
    v, t = _col(value), _col(time)
    # Negate time so the max struct picks the EARLIEST timestamp among ties.
    s = F.max(_nn(v, F.struct(v.alias("value"), (-t).alias("neg_time"))))
    return F.struct(s.getField("value").alias("value"), (-s.getField("neg_time")).alias("time"))


def _top_bottom(df, n, value, by, time, tiebreak, descending):
    from pyspark.sql import Window

    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if "rank" in df.columns:
        raise ValueError(
            "input already has a 'rank' column — TOP/BOTTOM emit their "
            "1-based rank under that name; rename the input column first"
        )
    v, t = _col(value), _col(time)
    first = F.desc(v) if descending else F.asc(v)
    order = [first, F.asc(t)] + [F.asc(_col(c)) for c in tiebreak]
    w = Window.partitionBy(*[_col(c) for c in by]).orderBy(*order)
    return (
        df.filter(v.isNotNull())
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n)
    )


def selector_top(df, n, value, by, time=TIME_COLUMN_NAME, tiebreak=()):
    """InfluxQL ``TOP(field, N)`` per series group: the N greatest field
    values in each group, each with its row (so the timestamp rides along,
    unlike plain max), plus a 1-based ``rank``.

    Ties follow InfluxQL: equal values rank by EARLIER timestamp first;
    rows tied on (value, time) need ``tiebreak`` columns for a
    deterministic result (same contract as ``deduplicate()`` — the
    precondition is the caller's, loudly).

    Scale shape: row_number + rank<=n compiles to WindowGroupLimit in
    Spark 3.5+ — a per-group bounded top-k heap run BOTH map-side (before
    the exchange) and reduce-side, so each partition ships at most n rows
    per group instead of whole series.  One key-hash exchange, no global
    sort.  Plan-asserted in test_selectors_topn.py.

    The reference's selector UDAFs return a single (value, time) pair
    (query/src/func/selectors.rs:56-160); TOP/BOTTOM generalize them to
    n rows — the InfluxQL surface family (influxql: top(), bottom()).
    """
    return _top_bottom(df, n, value, by, time, tiebreak, descending=True)


def selector_bottom(df, n, value, by, time=TIME_COLUMN_NAME, tiebreak=()):
    """InfluxQL ``BOTTOM(field, N)``: the N smallest values per group —
    see :func:`selector_top` for semantics, tie rules, and the
    WindowGroupLimit scale shape."""
    return _top_bottom(df, n, value, by, time, tiebreak, descending=False)
