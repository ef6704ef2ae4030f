"""Edit-distance similarity join (pipeline/strings.py): the filter-verify
result must EQUAL brute force on every band (long/long via q-grams,
short/short, the short x long boundary)."""

from __future__ import annotations

import itertools

import pytest

from influxdb_iox_spark.pipeline.strings import edit_distance_join


def _ed(a: str, b: str) -> int:
    # textbook DP Levenshtein (unit costs) as the independent referee
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
        prev = cur
    return prev[n]


NAMES = [
    # short band (<= 8 chars at q=3, d=2)
    "ring", "rink", "wing", "bolt", "belt", "bell", "a", "ab",
    # boundary: short vs just-over-the-band
    "bigwidget", "bigwidgets",
    # long band
    "small copper ring", "small copper rink", "small copper wings",
    "large copper ring", "totally different text",
]


@pytest.mark.parametrize("d", [0, 1, 2])
def test_matches_brute_force(spark, d):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(NAMES)], "id long, s string"
    )
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_join(df, "s", "id", max_dist=d).collect()
    }
    expect = {
        (i, j, _ed(a, b))
        for (i, a), (j, b) in itertools.combinations(enumerate(NAMES), 2)
        if _ed(a, b) <= d
    }
    assert got == expect


def test_validation(spark):
    df = spark.createDataFrame([(1, "x")], "id long, s string")
    with pytest.raises(ValueError):
        edit_distance_join(df, "s", "id", max_dist=-1)


def test_nulls_and_empties_excluded(spark):
    df = spark.createDataFrame(
        [(1, "ring"), (2, None), (3, ""), (4, "rink")], "id long, s string"
    )
    got = {(r.id_a, r.id_b) for r in edit_distance_join(df, "s", "id", 1).collect()}
    assert got == {(1, 4)}
