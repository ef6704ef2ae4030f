"""ns-precision time-window functions.

``window_bounds`` reproduces the reference UDF
(/root/reference/query/src/func/window.rs:19-88): given a ns timestamp and a
window spec (every, offset), return the **end** ("stop") boundary of the
window containing the timestamp — InfluxDB ``GetEarliestBounds`` semantics.
Exact expected values from the reference unit test (window.rs:95-117):
every=200ns offset=50ns → t=100 → 250, t=300 → 450.

Unlike the reference this is NOT a UDF: it is a Column expression
(`t - pmod(t - offset, every) + every`) that stays inside whole-stage codegen
and is pushdown/partition-pruning friendly.  ``pmod`` gives the floored
modulus the Rust code gets via its negative-remainder correction
(query/src/func/window/internal.rs:330-343 truncate_by_nsecs).

Calendar-month windows (Duration::Variable{months} —
query/src/group_by.rs:70-76, internal.rs:278-345 truncate_by_months) are
supported for whole-month widths via date_trunc on a derived µs timestamp;
month boundaries are µs-aligned so no ns precision is lost.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from influxdb_iox_spark.schema import TIME_COLUMN_NAME

NS_PER_US = 1_000
NS_PER_SECOND = 1_000_000_000


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def window_start(
    time: Column | str = TIME_COLUMN_NAME, every_ns: int = NS_PER_SECOND, offset_ns: int = 0
) -> Column:
    """Start boundary of the window containing ``time`` (ns)."""
    t = _col(time)
    return t - F.pmod(t - F.lit(offset_ns), F.lit(every_ns))


def window_bounds(
    time: Column | str = TIME_COLUMN_NAME, every_ns: int = NS_PER_SECOND, offset_ns: int = 0
) -> Column:
    """End ("stop") boundary of the window containing ``time`` (ns) —
    the value the reference reports as the output ``time`` of
    read_window_aggregate (window.rs:44-47, GetEarliestBounds)."""
    return window_start(time, every_ns, offset_ns) + F.lit(every_ns)


def month_window_bounds(time: Column | str = TIME_COLUMN_NAME, months: int = 1) -> Column:
    """End boundary (ns) of the calendar-month window containing ``time``.

    Whole-month windows only (the common case of Duration::Variable).  The ns
    value is converted to a µs timestamp, truncated to month start, advanced
    ``months`` months, and converted back — month boundaries have zero
    sub-second component so the round-trip is exact.
    """
    t = _col(time)
    # exact ns→µs: strip the sub-µs remainder BEFORE dividing — a multiple of
    # 1000 up to ~1.7e18 divides to <2^53, so the double division is exact
    # (raw float division of the ns value is not: 53-bit mantissa).
    ts = F.timestamp_micros(
        ((t - F.pmod(t, F.lit(NS_PER_US))) / NS_PER_US).cast("long")
    )
    start = F.date_trunc("month", ts)
    # floor to the month grid anchored at epoch when months > 1
    if months > 1:
        months_since_epoch = (F.year(start) - F.lit(1970)) * 12 + F.month(start) - 1
        aligned = months_since_epoch - F.pmod(months_since_epoch, F.lit(months))
        start = F.make_date(
            F.lit(1970) + F.floor(aligned / 12).cast("int"),
            F.pmod(aligned, F.lit(12)).cast("int") + 1,
            F.lit(1),
        ).cast("timestamp")
    end = F.add_months(start, months).cast("timestamp")
    return F.unix_micros(end) * NS_PER_US
