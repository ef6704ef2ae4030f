"""Bucketized interval join — range joins without the nested-loop trap.

A point-in-interval join (``p.t >= i.start AND p.t < i.end``) has no
equi-key, so Catalyst plans it as BroadcastNestedLoopJoin — points ×
intervals, the single most common scale-killer in event analytics
(sessions × events, maintenance windows × telemetry, span containment).
The standard distributed fix, applied here: EXPAND each interval to the
coarse time buckets it covers (``sequence`` over bucket ordinals — one
array expression, no Python), explode, and equi-join on (keys…,
bucket).  A point falls in exactly ONE bucket, so every qualifying
(point, interval) pair meets on exactly one bucket row — no post-join
dedup.  The residual range predicate rides ON the equi-join, so the
join is a plain ShuffledHashJoin/SortMergeJoin that scales out with
partition count; shuffle volume is |points| + |intervals| × expansion,
where expansion = interval length / bucket size.

Pick ``bucket_ns`` near the TYPICAL interval length: expansion stays
O(1) per interval and each point meets only the handful of intervals
sharing its bucket.  An interval longer than ``max_expansion`` buckets
raises IN-PLAN (``raise_error`` inside the sequence bound — cannot be
pruned): a million-bucket interval means the caller picked a bucket
three orders of magnitude too fine, and silently exploding it would be
the exact catastrophe this operator exists to prevent.  The same
discipline as the LSH hot-bucket cap and the KMV pairwise guard.

Interval–interval overlap joins reduce to the same shape (expand BOTH
sides; join on bucket; predicate ``a.start < b.end AND b.start <
a.end``; dedup on the pair id) — compose it from this primitive when
needed.  No reference counterpart: influxdb_iox has no join operator at
all (SURVEY §2.4 — joins are inherited from the query engine); this is
beyond-reference training-pipeline surface.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: An interval covering more than this many buckets raises: re-bucket.
DEFAULT_MAX_EXPANSION = 4096


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    time_col: str,
    start_col: str,
    end_col: str,
    keys: list[str] | None = None,
    bucket_ns: int = 60 * 1_000_000_000,
    how: str = "inner",
    max_expansion: int = DEFAULT_MAX_EXPANSION,
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= t < end`` (half-open, the engine's time-range convention)
    and equal ``keys`` — planned as an equi-join on (keys…, time
    bucket), never a nested loop.  ``how``: "inner" or "left_semi"
    (points that fall in ANY interval, deduplicated by construction).

    Columns: the output carries all point columns plus (for "inner")
    all interval columns except the expansion bucket.  Interval rows
    with ``end <= start`` are dropped (empty half-open range)."""
    keys = list(keys or [])
    if how not in ("inner", "left_semi"):
        raise ValueError(f"how must be 'inner' or 'left_semi', got {how!r}")
    b0 = F.floor(F.col(start_col) / bucket_ns)
    b1 = F.floor((F.col(end_col) - 1) / bucket_ns)
    n_buckets = b1 - b0 + 1
    # in-plan expansion guard: rides inside the sequence bound so column
    # pruning can never drop it
    b1_guarded = F.when(n_buckets <= F.lit(max_expansion), b1).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "interval_join: an interval spans more than "
                    f"{max_expansion} buckets of {bucket_ns} ns — choose "
                    "bucket_ns near the typical interval length "
                    "(expansion is length/bucket_ns per interval)"
                )
            )
        ).cast("long")
    )
    iv = intervals.filter(F.col(end_col) > F.col(start_col)).withColumn(
        "__bucket", F.explode(F.sequence(b0, b1_guarded))
    )
    pt = points.withColumn("__bucket", F.floor(F.col(time_col) / bucket_ns))
    cond = [pt["__bucket"] == iv["__bucket"]]
    for k in keys:
        cond.append(pt[k] == iv[k])
    cond.append(pt[time_col] >= iv[start_col])
    cond.append(pt[time_col] < iv[end_col])
    joined = pt.join(iv, functools.reduce(operator.and_, cond), how)
    if how == "left_semi":
        return joined.drop("__bucket")
    drop = [iv["__bucket"], pt["__bucket"]] + [iv[k] for k in keys]
    out = joined
    for c in drop:
        out = out.drop(c)
    return out

