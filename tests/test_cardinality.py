"""HLL cardinality rollups: accuracy bounds, merge algebra, incremental
maintenance ≡ rebuild, and regrouping without raw data."""

from __future__ import annotations

import pytest

from influxdb_iox_spark.pipeline.cardinality import (
    build_cardinality_rollup,
    estimate_cardinality,
    load_rollup,
    save_rollup,
    update_rollup,
)


def _rows(spark, n, keys=4, card=500, offset=0):
    from pyspark.sql import functions as F

    return spark.range(offset, offset + n).select(
        (F.col("id") % keys).alias("g"),
        ((F.col("id") * 2654435761) % card).alias("v"),
    )


def test_estimates_within_hll_error_bounds(spark):
    df = _rows(spark, 20_000, keys=4, card=500)
    rollup = build_cardinality_rollup(df, ["g"], "v")
    got = {r["g"]: r["estimate"] for r in estimate_cardinality(rollup, ["g"]).collect()}
    from pyspark.sql import functions as F

    exact = {
        r["g"]: r["n"]
        for r in df.groupBy("g")
        .agg(F.countDistinct("v").alias("n"))
        .collect()
    }
    for g, n in exact.items():
        assert abs(got[g] - n) / n < 0.05, (g, got[g], n)  # lgk=12 ~1.6% σ
    # grand total via union of per-group sketches (no raw rescans)
    total = estimate_cardinality(rollup).collect()[0]["estimate"]
    exact_total = df.select("v").distinct().count()
    assert abs(total - exact_total) / exact_total < 0.05


def test_union_is_associative_across_splits(spark):
    """Rollup(A ∪ B) and union(Rollup(A), Rollup(B)) estimate the same —
    the property that makes the pre-agg answer arbitrary regroupings."""
    a = _rows(spark, 5_000, card=300)
    b = _rows(spark, 5_000, card=300, offset=5_000)
    whole = estimate_cardinality(
        build_cardinality_rollup(a.unionByName(b), ["g"], "v"), ["g"]
    )
    split = estimate_cardinality(
        build_cardinality_rollup(a, ["g"], "v").unionByName(
            build_cardinality_rollup(b, ["g"], "v")
        ),
        ["g"],
    )
    lhs = {r["g"]: r["estimate"] for r in whole.collect()}
    rhs = {r["g"]: r["estimate"] for r in split.collect()}
    assert lhs == rhs


def test_incremental_update_equals_rebuild(spark, tmp_path):
    path = str(tmp_path / "hll")
    a = _rows(spark, 4_000, card=400)
    b = _rows(spark, 4_000, card=400, offset=4_000)
    save_rollup(build_cardinality_rollup(a, ["g"], "v"), path, ["g"], "v")
    update_rollup(spark, path, b)
    cells, meta = load_rollup(spark, path)
    inc = {r["g"]: r["estimate"] for r in estimate_cardinality(cells, ["g"]).collect()}
    # union-folded sketch state need not be bit-identical to a
    # single-pass sketch; both must sit within the error bound of exact
    from pyspark.sql import functions as F

    exact = {
        r["g"]: r["n"]
        for r in a.unionByName(b)
        .groupBy("g")
        .agg(F.countDistinct("v").alias("n"))
        .collect()
    }
    for g, n in exact.items():
        assert abs(inc[g] - n) / n < 0.05, (g, inc[g], n)
    # replaying the same batch leaves every estimate unchanged
    # (re-inserted values are set-semantics no-ops)
    update_rollup(spark, path, b)
    cells2, _ = load_rollup(spark, path)
    again = {r["g"]: r["estimate"] for r in estimate_cardinality(cells2, ["g"]).collect()}
    assert again == inc
    # maintenance is claim-guarded: two commits in the ledger
    from influxdb_iox_spark.pipeline.index_txn import guard_for_path

    assert guard_for_path(path).current_version() == 2


def test_new_cells_appear_via_update(spark, tmp_path):
    from pyspark.sql import functions as F

    path = str(tmp_path / "hll2")
    a = _rows(spark, 1_000, keys=2)
    save_rollup(build_cardinality_rollup(a, ["g"], "v"), path, ["g"], "v")
    # a batch introducing a brand-new group key
    b = spark.range(100).select(
        F.lit(99).alias("g"), (F.col("id") % 37).alias("v")
    )
    update_rollup(spark, path, b)
    cells, _ = load_rollup(spark, path)
    got = {r["g"]: r["estimate"] for r in estimate_cardinality(cells, ["g"]).collect()}
    assert set(got) == {0, 1, 99}
    assert abs(got[99] - 37) <= 2


def test_overlap_estimation_inclusion_exclusion(spark):
    """Retained-users shape: two day cells with a known 50% overlap;
    the inclusion-exclusion intersection lands within a few percent of
    truth (overlap is a sizable fraction — the documented good case)."""
    from pyspark.sql import functions as F

    from influxdb_iox_spark.pipeline.cardinality import estimate_overlap

    # day 0: users 0..999; day 1: users 500..1499 (overlap 500)
    d0 = spark.range(0, 1000).select(F.lit(0).alias("day"), F.col("id").alias("u"))
    d1 = spark.range(500, 1500).select(F.lit(1).alias("day"), F.col("id").alias("u"))
    rollup = build_cardinality_rollup(d0.unionByName(d1), ["day"], "u")
    got = estimate_overlap(rollup, {"day": 0}, {"day": 1})
    assert abs(got["a"] - 1000) / 1000 < 0.05
    assert abs(got["b"] - 1000) / 1000 < 0.05
    assert abs(got["union"] - 1500) / 1500 < 0.05
    assert abs(got["intersection"] - 500) / 500 < 0.2  # 3-way error sum


def test_sliding_cardinality_tracks_exact_trailing_distinct(spark):
    """estimate_sliding_cardinality (round 15): trailing-3-bucket
    estimates from bucketed cells stay within the lgk error bound of
    the exact trailing distinct counts; windows anchor only at observed
    buckets (bucket 3 missing)."""
    from pyspark.sql import functions as F

    from influxdb_iox_spark.pipeline.cardinality import (
        build_cardinality_rollup,
        estimate_sliding_cardinality,
    )

    buckets = [0, 1, 2, 4, 5]
    rows = [
        (b, (b * 700 + i) % 2500) for b in buckets for i in range(1200)
    ]
    df = spark.createDataFrame(rows, "b long, v long")
    cells = build_cardinality_rollup(df, ["b"], "v")
    got = {
        r["b"]: r["estimate"]
        for r in estimate_sliding_cardinality(cells, "b", 3).collect()
    }
    assert set(got) == set(buckets)
    for anchor in buckets:
        exact = (
            df.filter((F.col("b") >= anchor - 2) & (F.col("b") <= anchor))
            .select("v")
            .distinct()
            .count()
        )
        assert abs(got[anchor] - exact) / exact < 0.05, (anchor, got[anchor], exact)
