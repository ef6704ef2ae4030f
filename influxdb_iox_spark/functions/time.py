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


def utc_ns_to_local_ns(time: Column | str, tz: str) -> Column:
    """Shift epoch-ns instants into a named zone's wall-clock frame
    (local ns) — JVM-side via from_utc_timestamp, so DST transitions use
    the executor's tzdata, not a fixed offset.  Zone offsets are whole
    minutes, so the sub-second ns remainder passes through untouched."""
    t = _col(time)
    t_us = ((t - F.pmod(t, F.lit(1000))) / 1000).cast("long")
    off_us = (
        F.unix_micros(F.from_utc_timestamp(F.timestamp_micros(t_us), tz))
        - t_us
    )
    return t + off_us * 1000


def local_ns_to_utc_ns(local: Column | str, tz: str) -> Column:
    """Inverse of utc_ns_to_local_ns: interpret wall-clock ns in ``tz``
    and return the epoch instant (to_utc_timestamp's resolution for
    DST-ambiguous wall times — the standard-library choice stock engines
    share)."""
    l = _col(local)
    l_us = ((l - F.pmod(l, F.lit(1000))) / 1000).cast("long")
    utc_us = F.unix_micros(
        F.to_utc_timestamp(F.timestamp_micros(l_us), tz)
    )
    return utc_us * 1000 + F.pmod(l, F.lit(1000))


def local_window_start(
    time: Column | str,
    every_ns: int,
    offset_ns: int = 0,
    tz: str = "UTC",
) -> Column:
    """Start boundary of the window containing ``time``, computed on the
    zone's WALL CLOCK (InfluxQL ``tz()``): daily buckets align to local
    midnight, and a bucket spanning a DST transition covers 23/25 wall
    hours of UTC.  Returns the bucket start in LOCAL ns — keep grids and
    gap-fills in this uniform frame, convert once at the end with
    local_ns_to_utc_ns."""
    local = utc_ns_to_local_ns(time, tz)
    return local - F.pmod(local - F.lit(offset_ns), F.lit(every_ns))


def window_bounds(
    time: Column | str = TIME_COLUMN_NAME, every_ns: int = NS_PER_SECOND, offset_ns: int = 0
) -> Column:
    """End ("stop") boundary of the window containing ``time`` (ns) —
    the value the reference reports as the output ``time`` of
    read_window_aggregate (window.rs:44-47, GetEarliestBounds)."""
    return window_start(time, every_ns, offset_ns) + F.lit(every_ns)


def window_bounds_struct(
    time: Column | str = TIME_COLUMN_NAME,
    every_ns: int = NS_PER_SECOND,
    offset_ns: int = 0,
    period_ns: int | None = None,
) -> Column:
    """Full ``GetEarliestBounds`` for fixed-ns windows: struct(start, stop).

    ``period`` defaults to ``every`` (tumbling); period > every gives the
    reference's overlapping windows, period < every the underlapping ones
    (window_test.go cases reproduced in tests/test_functions.py).
    """
    period_ns = every_ns if period_ns is None else period_ns
    stop = window_bounds(time, every_ns, offset_ns)
    return F.struct((stop - F.lit(period_ns)).alias("start"), stop.alias("stop"))


def _ns_to_month_ts(t: Column) -> Column:
    """ns → µs TimestampType with FLOOR semantics (negative ns included).

    Month boundaries are µs-aligned, so flooring sub-µs detail never moves a
    timestamp across a month boundary; flooring (not truncation toward zero)
    keeps pre-1970 values in their correct month.
    """
    # exact ns→µs: strip the sub-µs remainder BEFORE dividing — a multiple of
    # 1000 up to ~1.7e18 divides to <2^53, so the double division is exact
    # (raw float division of the ns value is not: 53-bit mantissa); pmod makes
    # the strip a floor for negative ns.
    return F.timestamp_micros(((t - F.pmod(t, F.lit(NS_PER_US))) / NS_PER_US).cast("long"))


def month_window_bounds_struct(
    time: Column | str = TIME_COLUMN_NAME,
    every_months: int = 1,
    offset_months: int = 0,
    period_months: int | None = None,
) -> Column:
    """``GetEarliestBounds`` for calendar-month windows: struct(start, stop) ns.

    Faithful to the reference chain (internal.rs:24-60 Duration,
    :278-345 truncate_by_months + Add impl, window.go:70 GetEarliestBounds):

      t'    = t + offset·(−1)          calendar shift, day clamped to month end
      stop  = truncate_months(t', every) + every months + offset
      start = stop − period months

    - ``offset_months`` may be NEGATIVE (Duration::from_months_with_negative /
      the reference's "negative calendar offset" unit case) — the sign simply
      flips the two calendar shifts.
    - truncate_by_months anchors on ABSOLUTE year·12 + (month−1) (not the
      1970 epoch), exactly like the reference; for ``every`` not dividing
      23640 the two anchors differ.
    - Calendar shifts use ``add_months``, whose clamp-to-last-day behavior
      matches the reference's Add impl (internal.rs:204-257).
    """
    period_months = every_months if period_months is None else period_months
    t = _col(time)
    shifted = F.add_months(_ns_to_month_ts(t), -offset_months)
    total = F.year(shifted) * 12 + F.month(shifted) - 1
    aligned = total - F.pmod(total, F.lit(every_months))
    trunc = F.make_date(
        F.floor(aligned / 12).cast("int"),
        F.pmod(aligned, F.lit(12)).cast("int") + 1,
        F.lit(1),
    )
    stop = F.add_months(F.add_months(trunc, every_months), offset_months)
    start = F.add_months(stop, -period_months)
    to_ns = lambda d: F.unix_micros(d.cast("timestamp")) * NS_PER_US  # noqa: E731
    return F.struct(to_ns(start).alias("start"), to_ns(stop).alias("stop"))


def month_window_bounds(time: Column | str = TIME_COLUMN_NAME, months: int = 1) -> Column:
    """End boundary (ns) of the calendar-month window containing ``time``
    (the tumbling offset-0 case of ``month_window_bounds_struct``)."""
    return month_window_bounds_struct(time, months).getField("stop")
