"""String similarity join under edit distance — q-gram count filtering +
exact Levenshtein verification (the classic filter-verify design the
compressed-index literature builds on, cf. "Highly Efficient String
Similarity Search and Join over Compressed Indexes", ICDE 2022; the
filters here are Gravano et al.'s q-gram bounds, VLDB 2001).

Filter-verify, never all-pairs:

- **length filter**: ||a|−|b|| ≤ d, applied inside every join.
- **count filter**: ed(a,b) ≤ d ⇒ a and b share at least
  max(|a|,|b|) − q + 1 − q·d q-grams — candidates come from an inverted
  q-gram join + a shared-gram count, so only strings with overlapping
  grams ever pair.
- **short-string band**: strings with max length ≤ q·(d+1) − 1 make the
  count bound vacuous (≤ 0), so they pair all-against-all WITHIN the
  length band instead.  At corpus scale this band is the hot spot when
  many tiny strings exist — shard it further by (length, first char)
  before densifying, the same salting recipe as LSH hot buckets.
- **verify**: ``F.levenshtein`` — JVM codegen, unit-cost edit distance,
  identical semantics in DuckDB's levenshtein(), so results are
  integer-exact cross-engine.

Q-grams are built with ``transform(sequence(…), i -> substring(s, i, q))``
over the PLAIN source column — safe from the lambda-inlining trap (the
re-evaluated expression is an attribute, not a computed chain; see
pipeline/text.gram_structs for the chained case and its workaround).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def edit_distance_join(
    df: DataFrame,
    str_col: str,
    id_col: str,
    max_dist: int = 2,
    q: int = 3,
) -> DataFrame:
    """All pairs (a, b, dist) with ``dist = ed(a, b) ≤ max_dist`` and
    ``a.id < b.id`` over one table (self-join form).  NULL and empty
    strings are excluded."""
    if max_dist < 0 or q < 1:
        raise ValueError("max_dist >= 0 and q >= 1 required")
    d = max_dist
    # base feeds SIX join legs (both gram sides, both short sides, both
    # edge sides); without materialization each leg replays the upstream
    # scan (+ any distinct/aggregate the caller stacked under df — the
    # part_name_edit_join audit plan showed 6 part scans).  One eager
    # localCheckpoint of the (id, s, len) projection — bounded by the
    # caller's row count — runs that pipeline once.
    base = (
        df.select(
            F.col(id_col).alias("id"),
            F.col(str_col).alias("s"),
            F.length(str_col).alias("len"),
        )
        .filter(F.col("s").isNotNull() & (F.col("len") > 0))
        .localCheckpoint(eager=True)
    )
    short_max = q * (d + 1) - 1  # count bound vacuous at/below this length

    # -- long strings: inverted q-gram join + count filter ------------------
    lng = base.filter(F.col("len") > short_max)
    # substring(s, i, q) with a lambda index needs expr() (the python DSL
    # has no 3-arg substring taking a Column start)
    grams = lng.select(
        "id", "s", "len",
        F.explode(
            F.expr(f"transform(sequence(1, len - {q} + 1), i -> substring(s, i, {q}))")
        ).alias("g"),
    )
    a = grams.select(
        F.col("id").alias("ida"), F.col("s").alias("sa"),
        F.col("len").alias("la"), F.col("g").alias("ga"),
    )
    b = grams.select(
        F.col("id").alias("idb"), F.col("s").alias("sb"),
        F.col("len").alias("lb"), F.col("g").alias("gb"),
    )
    long_cand = (
        a.join(
            b,
            (F.col("ga") == F.col("gb"))
            & (F.col("ida") < F.col("idb"))
            & (F.abs(F.col("la") - F.col("lb")) <= d),
        )
        .groupBy("ida", "idb", "sa", "sb", "la", "lb")
        .agg(F.count("*").alias("shared"))
        .filter(
            F.col("shared")
            >= F.greatest(F.col("la"), F.col("lb")) - q + 1 - q * d
        )
        .select("ida", "idb", "sa", "sb")
    )

    # -- short strings: length-banded all-pairs -----------------------------
    sh = base.filter(F.col("len") <= short_max)
    sa = sh.select(
        F.col("id").alias("ida"), F.col("s").alias("sa"),
        F.col("len").alias("la"),
    )
    sb = sh.select(
        F.col("id").alias("idb"), F.col("s").alias("sb"),
        F.col("len").alias("lb"),
    )
    short_cand = sa.join(
        sb,
        (F.col("ida") < F.col("idb"))
        & (F.abs(F.col("la") - F.col("lb")) <= d),
    ).select("ida", "idb", "sa", "sb")

    # -- short x long boundary: a short string can be within d of a string
    # just over the band edge; the length filter bounds the long side to
    # short_max + d, a thin slice joined by gram when the long side has
    # grams (it always does: len > short_max >= q)
    edge_long = lng.filter(F.col("len") <= short_max + d).select(
        F.col("id").alias("idb"), F.col("s").alias("sb"),
        F.col("len").alias("lb"),
    )
    edge_cand = (
        sh.select(
            F.col("id").alias("ida"), F.col("s").alias("sa"),
            F.col("len").alias("la"),
        )
        .join(
            edge_long,
            (F.abs(F.col("la") - F.col("lb")) <= d)
            & (F.col("ida") != F.col("idb")),
        )
        .select(
            F.least("ida", "idb").alias("ida"),
            F.greatest("ida", "idb").alias("idb"),
            F.when(F.col("ida") < F.col("idb"), F.col("sa"))
            .otherwise(F.col("sb")).alias("sa"),
            F.when(F.col("ida") < F.col("idb"), F.col("sb"))
            .otherwise(F.col("sa")).alias("sb"),
        )
        .distinct()
    )

    cand = long_cand.unionByName(short_cand).unionByName(edge_cand).distinct()
    return (
        cand.withColumn("dist", F.levenshtein("sa", "sb"))
        .filter(F.col("dist") <= d)
        .select(
            F.col("ida").alias("id_a"),
            F.col("idb").alias("id_b"),
            "dist",
        )
    )
