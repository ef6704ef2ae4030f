"""Gap-based sessionization + frequent-items (heavy hitters) — two
classic event-stream operators the reference's storage RPC menu stops
short of but every analytics consumer of it ends up writing by hand.

Sessionize: a session is a maximal run of a series' events where each
consecutive gap is ≤ the threshold (the standard web-analytics /
device-telemetry definition).  Spark shape: ONE series-keyed ordered
window — ``lag`` for the gap, a running SUM of boundary flags for the
session ordinal (the gaps-and-islands idiom, same family as
``pipeline/spans.py``'s island merge) — then one hash aggregate for the
per-session stats.  Both steps share the series exchange; nothing is
iterative and nothing leaves the JVM.

Heavy hitters: candidate generation via per-partition Misra-Gries
summaries (mergeable, bounded memory — the classic frequent-items
sketch) would be the pure-sketch route, but its candidate SET depends
on partition order, which breaks engine-portable determinism.  The
production-honest variant implemented here is the two-pass
candidates → EXACT recount gate: pass 1 computes per-group counts
map-side-combined (one shuffle of partial counts — at 100 TB this is
the same cost class as any groupBy), pass 2 keeps groups with
count ≥ threshold.  The output is exactly-correct and deterministic
(oracle = GROUP BY ... HAVING), while the plan stays one aggregate +
one filter — there is no cheaper CORRECT answer to "which keys exceed
support s"; a sketch can only approximate the same question.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    keys: list[str],
    time_col: str,
    gap: int,
    order_tiebreak: list[str] | None = None,
) -> DataFrame:
    """Input rows + ``session_id`` (0-based ordinal per series, in time
    order).  A new session starts when the gap from the previous event
    EXCEEDS ``gap`` (ties at exactly ``gap`` stay in-session — the
    standard closed-threshold convention; both engines integer-compare,
    so the boundary is exact)."""
    if gap <= 0:
        raise ValueError("gap must be > 0")
    w = Window.partitionBy(*keys).orderBy(
        time_col, *(order_tiebreak or [])
    )
    prev = F.lag(F.col(time_col)).over(w)
    boundary = F.when(
        prev.isNull() | ((F.col(time_col) - prev) <= gap), 0
    ).otherwise(1)
    return df.withColumn(
        "session_id", F.sum(boundary).over(w).cast("long")
    )


def session_stats(
    df: DataFrame,
    keys: list[str],
    time_col: str,
    gap: int,
    order_tiebreak: list[str] | None = None,
) -> DataFrame:
    """(keys..., session_id, n_events, session_start, session_end,
    duration) — one row per session; duration in the time column's own
    units (integer-exact)."""
    s = sessionize(df, keys, time_col, gap, order_tiebreak)
    return s.groupBy(*keys, "session_id").agg(
        F.count("*").alias("n_events"),
        F.min(time_col).alias("session_start"),
        F.max(time_col).alias("session_end"),
        (F.max(time_col) - F.min(time_col)).alias("duration"),
    )


def heavy_hitters(
    df: DataFrame,
    keys: list[str],
    min_count: int,
) -> DataFrame:
    """(keys..., n) for every key combination occurring at least
    ``min_count`` times — the exact frequent-items gate (see module
    docstring for why exact-recount beats a Misra-Gries candidate set
    here).  One map-side-combined aggregate + one filter."""
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    return df.groupBy(*keys).agg(F.count("*").alias("n")).filter(
        F.col("n") >= min_count
    )
