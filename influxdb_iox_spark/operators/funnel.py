"""Funnel and retention-cohort analytics — exact, single-exchange.

Two event-analytics primitives every product pipeline runs at scale;
neither exists in the reference (its RPC surface stops at per-series
grouping — these are beyond-reference composition operators, same
class as sessionize/heavy-hitters).

``funnel_counts`` — first-occurrence ordered funnel: a user converts
through step i iff the FIRST times of the steps are strictly
increasing, min_ts(s₀) < min_ts(s₁) < … < min_ts(sᵢ), optionally
within a horizon of the first step.  This is the standard "did the
user ever do A, then later first do B, …" funnel; re-entry funnels
(retry windows per attempt) are a different, stateful operator and out
of scope — the semantics are stated here so the numbers are never
misread.  Shape: ONE hash aggregate per user computes k conditional
first-times (map-side combined — the per-user row is k longs), then
one tiny aggregate folds step flags into counts: no window functions,
no self-joins, no per-step scans.  At 100 TB the only shuffle is the
user-keyed aggregate, and its output is |users| rows of k longs.

``retention_cohorts`` — the signup-cohort × activity-period matrix:
cohort(user) = time bucket of the user's FIRST event; for every
(cohort, period offset ≥ 0) the count of DISTINCT users from that
cohort active in that period.  Shape: the per-user first-bucket
aggregate reshuffles on user; the activity join is user-keyed onto the
same partitioning (exchange reused), then one distinct + count per
(cohort, offset).  Counts are exact — the sketch-based twin at extreme
scale is ``pipeline/kmv.kmv_sliding_estimate``'s bucketed posture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_counts(
    df: DataFrame,
    user_col: str,
    time_col: str,
    type_col: str,
    steps: list[str],
    within: int | None = None,
) -> DataFrame:
    """(step, step_index, n_users) — users whose first-occurrence times
    of ``steps[0..i]`` are strictly increasing (and, with ``within``,
    whose step-i first time is within that many time units of step 0).
    Step 0's row counts every user who did step 0 at all."""
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    firsts = df.filter(F.col(type_col).isin(list(steps))).groupBy(
        user_col
    ).agg(
        *[
            F.min(
                F.when(F.col(type_col) == s, F.col(time_col))
            ).alias(f"__t{i}")
            for i, s in enumerate(steps)
        ]
    )
    # reached_i = t0 < t1 < ... < ti (nulls fail the comparison chain)
    reached = F.col("__t0").isNotNull()
    flags = [reached.cast("long").alias("__r0")]
    for i in range(1, len(steps)):
        reached = (
            reached
            & F.col(f"__t{i}").isNotNull()
            & (F.col(f"__t{i}") > F.col(f"__t{i-1}"))
        )
        if within is not None:
            reached = reached & (
                F.col(f"__t{i}") - F.col("__t0") <= F.lit(within)
            )
        flags.append(reached.cast("long").alias(f"__r{i}"))
    agg = firsts.select(*flags).agg(
        *[F.sum(f"__r{i}").alias(f"__n{i}") for i in range(len(steps))]
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(s).alias("step"),
                F.lit(i).alias("step_index"),
                F.col(f"__n{i}").alias("n_users"),
            )
            for i, s in enumerate(steps)
        ]
    )
    return (
        agg.select(F.explode(pairs).alias("p"))
        .select("p.step", "p.step_index", "p.n_users")
        .orderBy("step_index")
    )


def retention_cohorts(
    df: DataFrame,
    user_col: str,
    time_col: str,
    bucket: int,
    max_offset: int | None = None,
) -> DataFrame:
    """(cohort_bucket, period_offset, n_users) — distinct users whose
    FIRST event fell in ``cohort_bucket`` (floor(t/bucket)) and who were
    active ``period_offset`` buckets later.  Offset 0 is the cohort
    size by construction.  ``max_offset`` truncates the matrix."""
    ub = df.select(
        F.col(user_col).alias("__u"),
        F.floor(F.col(time_col) / bucket).alias("__b"),
    ).distinct()
    cohorts = ub.groupBy("__u").agg(F.min("__b").alias("__cohort"))
    j = ub.join(cohorts, "__u").select(
        "__u", "__cohort", (F.col("__b") - F.col("__cohort")).alias("__off")
    )
    if max_offset is not None:
        j = j.filter(F.col("__off") <= max_offset)
    return (
        j.groupBy("__cohort", "__off")
        .agg(F.countDistinct("__u").alias("n_users"))
        .select(
            F.col("__cohort").alias("cohort_bucket"),
            F.col("__off").alias("period_offset"),
            "n_users",
        )
        .orderBy("cohort_bucket", "period_offset")
    )
