"""As-of join: match each left row with the latest right row at-or-before
its timestamp, per key — the canonical time-series enrichment join.

The reference's query engine does not ship one (users compose it from
selectors); it is named in every time-series engine's wishlist and is a
first-class operator here.  Implementation is the UNION-AND-WINDOW
technique, not a range join:

    tag sides → union by (keys, time) → per-key window ordered by
    (time, side) → last non-null right value → keep left rows

One shuffle on the keys, no range-condition row explosion, no
broadcast requirement on either side — the plan is size-symmetric and
survives both sides being huge (the naive ``l.ts >= r.ts`` theta-join
is quadratic per key and the first thing to die at 100 TB).  Skewed
keys hit the same single window partition a skewed groupBy would; the
usual salting applies upstream if one key dominates.

``tolerance`` bounds staleness: a match older than ``tolerance`` ns is
nulled out (the row is kept — this is a LEFT join).  ``direction`` is
"backward" (default, match ≤ t) or "forward" (match ≥ t), the two
pandas.merge_asof directions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

#: internal marker columns
_SIDE = "__asof_side"
_RIGHT_TIME = "__asof_right_time"
_ORDER = "__asof_order"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str | None = None,
    value_columns: list[str] | None = None,
    direction: str = "backward",
    tolerance: int | None = None,
    suffix: str = "_right",
    right_order: str | None = None,
) -> DataFrame:
    """For each left row, attach the right row's ``value_columns`` from
    the latest right row with ``right_time <= left_time`` per ``on`` key
    ("backward"; "forward" = earliest ≥).  Ties at equal timestamps
    match (inclusive).  Unmatched/over-tolerance rows keep NULL values.

    Returns the left columns + one ``<col><suffix>`` per value column +
    ``<left_time><suffix>`` (the matched right timestamp, NULL when
    unmatched) — callers can compute staleness directly.

    PRECONDITION (mirrors ``deduplicate()``): when TWO right rows share
    the same key AND the same timestamp, which one wins is
    order-nondeterministic unless ``right_order`` names a right column
    that breaks the tie — the row with the LARGEST ``right_order`` value
    wins (last-writer-wins, in both directions).  Without it, equal-
    timestamp right duplicates may flip winners between runs.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    right_time = right_time or left_time
    if value_columns is None:
        value_columns = [
            c for c in right.columns if c not in on and c != right_time
        ]
    for c in (_SIDE, _RIGHT_TIME, _ORDER):
        if c in left.columns or c in right.columns:
            raise ValueError(f"reserved column name {c!r} present in input")
    if right_order is not None and right_order not in right.columns:
        raise ValueError(f"right_order column {right_order!r} not in right side")

    carried = [f"{c}{suffix}" for c in value_columns]
    matched_time_out = f"{left_time}{suffix}"
    clashes = (set(carried) | {matched_time_out}) & set(left.columns)
    if clashes:
        raise ValueError(
            f"output columns {sorted(clashes)} collide with left columns — "
            "pass a different suffix"
        )
    if matched_time_out in carried:
        raise ValueError(
            f"right value column {left_time!r} collides with the matched-"
            "timestamp output column — exclude it via value_columns"
        )
    r = right.select(
        *[F.col(k) for k in on],
        F.col(right_time).alias(left_time),
        F.col(right_time).alias(_RIGHT_TIME),
        *[F.col(c).alias(a) for c, a in zip(value_columns, carried)],
        *([F.col(right_order).alias(_ORDER)] if right_order is not None else []),
    ).withColumn(_SIDE, F.lit(0))
    l = left.withColumn(_RIGHT_TIME, F.lit(None).cast(r.schema[_RIGHT_TIME].dataType))
    for a, c in zip(carried, value_columns):
        l = l.withColumn(a, F.lit(None).cast(right.schema[c].dataType))
    l = l.withColumn(_SIDE, F.lit(1))
    if right_order is not None:
        l = l.withColumn(_ORDER, F.lit(None).cast(r.schema[_ORDER].dataType))

    unioned = l.unionByName(r, allowMissingColumns=True)
    if direction == "backward":
        # right rows sort BEFORE left rows at equal time (side 0 < 1), so
        # an equal-timestamp right row is visible to the left row; among
        # equal-timestamp right rows, _ORDER asc + fill=last makes the
        # LARGEST right_order value win deterministically
        order_cols = [F.col(left_time).asc(), F.col(_SIDE).asc()]
        if right_order is not None:
            order_cols.append(F.col(_ORDER).asc_nulls_first())
        w = (
            Window.partitionBy(*on)
            .orderBy(*order_cols)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        fill = F.last
    else:
        # forward frame is [current, following]: left rows (side 1) must
        # sort BEFORE right rows (side 0) at equal time so an
        # equal-timestamp right row stays inside the left row's frame;
        # _ORDER desc + fill=first keeps last-writer-wins here too
        order_cols = [F.col(left_time).asc(), F.col(_SIDE).desc()]
        if right_order is not None:
            order_cols.append(F.col(_ORDER).desc_nulls_first())
        w = (
            Window.partitionBy(*on)
            .orderBy(*order_cols)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        fill = F.first

    filled = unioned.select(
        *[
            fill(F.col(c), ignorenulls=True).over(w).alias(c)
            if c in (*carried, _RIGHT_TIME)
            else F.col(c)
            for c in unioned.columns
        ]
    )
    out = filled.filter(F.col(_SIDE) == 1).drop(_SIDE, _ORDER)
    if tolerance is not None:
        staleness = (
            F.col(left_time) - F.col(_RIGHT_TIME)
            if direction == "backward"
            else F.col(_RIGHT_TIME) - F.col(left_time)
        )
        ok = F.col(_RIGHT_TIME).isNotNull() & (staleness <= F.lit(tolerance))
        for a in (*carried, _RIGHT_TIME):
            out = out.withColumn(a, F.when(ok, F.col(a)))
    return out.withColumnRenamed(_RIGHT_TIME, f"{left_time}{suffix}")
