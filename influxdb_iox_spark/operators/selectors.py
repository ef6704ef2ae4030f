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
