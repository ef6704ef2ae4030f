"""Funnel + retention-cohort operators (operators/funnel): first-
occurrence ordering semantics, the conversion horizon, monotone step
counts, and the cohort matrix against hand-computed truth."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from influxdb_iox_spark.operators.funnel import (
    funnel_counts,
    retention_cohorts,
)


def _events(spark, rows):
    return spark.createDataFrame(rows, "u long, t long, e string")


def test_funnel_first_occurrence_ordering(spark):
    rows = [
        # u1 converts fully: a@1 < b@5 < c@9
        (1, 1, "a"), (1, 5, "b"), (1, 9, "c"),
        # u2: b BEFORE a -> stops at a (first-occurrence semantics: the
        # later b@2 repeat doesn't help because min(b)=0 < min(a)=1)
        (2, 0, "b"), (2, 1, "a"), (2, 2, "b"), (2, 9, "c"),
        # u3: a then c only -> reaches a; c fails because b missing
        (3, 1, "a"), (3, 2, "c"),
        # u4: never did a -> counts nowhere
        (4, 1, "b"), (4, 2, "c"),
        # u5: a only
        (5, 7, "a"),
    ]
    got = {
        r["step"]: r["n_users"]
        for r in funnel_counts(
            _events(spark, rows), "u", "t", "e", ["a", "b", "c"]
        ).collect()
    }
    assert got == {"a": 4, "b": 1, "c": 1}


def test_funnel_horizon_bounds_conversion(spark):
    rows = [
        (1, 0, "a"), (1, 5, "b"),     # within 10
        (2, 0, "a"), (2, 50, "b"),    # outside 10
    ]
    got = {
        r["step"]: r["n_users"]
        for r in funnel_counts(
            _events(spark, rows), "u", "t", "e", ["a", "b"], within=10
        ).collect()
    }
    assert got == {"a": 2, "b": 1}


def test_funnel_counts_are_monotone_and_indexed(spark):
    rows = [(u, u * 10 + i, e) for u in range(20) for i, e in enumerate("abc")]
    out = funnel_counts(
        _events(spark, rows), "u", "t", "e", ["a", "b", "c"]
    ).collect()
    assert [r["step_index"] for r in out] == [0, 1, 2]
    ns = [r["n_users"] for r in out]
    assert ns[0] >= ns[1] >= ns[2]
    with pytest.raises(ValueError, match="at least 2"):
        funnel_counts(_events(spark, rows), "u", "t", "e", ["a"])


def test_retention_cohort_matrix(spark):
    B = 10
    rows = [
        # u1 first in bucket 0, active 0 and 2
        (1, 3), (1, 25),
        # u2 first in bucket 0, active 0, 1
        (2, 8), (2, 14),
        # u3 first in bucket 1 only
        (3, 17),
    ]
    df = spark.createDataFrame(rows, "u long, t long")
    got = {
        (r["cohort_bucket"], r["period_offset"]): r["n_users"]
        for r in retention_cohorts(df, "u", "t", B).collect()
    }
    assert got == {(0, 0): 2, (0, 1): 1, (0, 2): 1, (1, 0): 1}
    capped = {
        (r["cohort_bucket"], r["period_offset"]): r["n_users"]
        for r in retention_cohorts(df, "u", "t", B, max_offset=1).collect()
    }
    assert capped == {(0, 0): 2, (0, 1): 1, (1, 0): 1}
