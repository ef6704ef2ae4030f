"""As-of join operator (operators/asof.py): semantics + plan shape.

Semantics cross-checked against DuckDB's native ASOF JOIN in the
oracle-paired query `events_asof_join`; these tests pin the fine grain —
tie inclusivity, tolerance nulling, forward direction, unmatched rows —
and that the plan is the single-shuffle union-window shape, not a
range join.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from influxdb_iox_spark.operators.asof import asof_join


@pytest.fixture()
def quotes_trades(spark):
    trades = spark.createDataFrame(
        [("a", 100, 1.0), ("a", 200, 2.0), ("a", 205, 3.0), ("b", 150, 4.0), ("c", 50, 5.0)],
        "sym string, ts long, price double",
    )
    quotes = spark.createDataFrame(
        [("a", 90, 10.0), ("a", 200, 20.0), ("a", 210, 30.0), ("b", 160, 40.0)],
        "sym string, ts long, bid double",
    )
    return trades, quotes


def _rows(df):
    return sorted(
        (r.sym, r.ts, r.price, r.bid_right, r.ts_right) for r in df.collect()
    )


def test_backward_matches_latest_at_or_before(spark, quotes_trades):
    trades, quotes = quotes_trades
    out = asof_join(trades, quotes, on=["sym"], left_time="ts")
    assert _rows(out) == [
        ("a", 100, 1.0, 10.0, 90),
        ("a", 200, 2.0, 20.0, 200),  # tie at 200 matches (inclusive)
        ("a", 205, 3.0, 20.0, 200),
        ("b", 150, 4.0, None, None),  # quote at 160 is after -> no match
        ("c", 50, 5.0, None, None),  # key with no right rows
    ]


def test_forward_matches_earliest_at_or_after(spark, quotes_trades):
    trades, quotes = quotes_trades
    out = asof_join(trades, quotes, on=["sym"], left_time="ts", direction="forward")
    assert _rows(out) == [
        ("a", 100, 1.0, 20.0, 200),
        ("a", 200, 2.0, 20.0, 200),  # tie inclusive forward too
        ("a", 205, 3.0, 30.0, 210),
        ("b", 150, 4.0, 40.0, 160),
        ("c", 50, 5.0, None, None),
    ]


def test_tolerance_nulls_stale_matches(spark, quotes_trades):
    trades, quotes = quotes_trades
    out = asof_join(trades, quotes, on=["sym"], left_time="ts", tolerance=5)
    got = _rows(out)
    # trade a@100 matched quote@90 (staleness 10 > 5) -> nulled, row kept
    assert ("a", 100, 1.0, None, None) in got
    assert ("a", 200, 2.0, 20.0, 200) in got  # staleness 0 kept
    assert len(got) == 5  # left join: every left row survives


def test_distinct_time_columns_and_value_selection(spark):
    left = spark.createDataFrame([("a", 100)], "k string, t_l long")
    right = spark.createDataFrame(
        [("a", 90, 7.0, "x")], "k string, t_r long, v double, junk string"
    )
    out = asof_join(
        left, right, on=["k"], left_time="t_l", right_time="t_r",
        value_columns=["v"],
    )
    [r] = out.collect()
    assert (r.k, r.t_l, r.v_right, r.t_l_right) == ("a", 100, 7.0, 90)
    assert "junk_right" not in out.columns


def test_plan_is_single_shuffle_no_join(spark, quotes_trades):
    """The scale property: ONE exchange on the key and a window — no
    join node at all, so there is no range-condition row explosion and
    neither side needs to be broadcastable."""
    trades, quotes = quotes_trades
    plan = asof_join(trades, quotes, on=["sym"], left_time="ts")._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window" in plan


def test_right_order_pins_equal_timestamp_winner(spark):
    """Two right rows share (key, timestamp); ``right_order`` breaks the
    tie deterministically — LARGEST order value wins, both directions
    (last-writer-wins, mirroring deduplicate()'s chunk-order rule)."""
    left = spark.createDataFrame(
        [("a", 100), ("a", 300)], "sym string, ts long"
    )
    # duplicate right timestamps at ts=100 and ts=300 with seq tiebreak
    right = spark.createDataFrame(
        [("a", 100, 1.0, 7), ("a", 100, 2.0, 9), ("a", 100, 3.0, 8),
         ("a", 300, 4.0, 2), ("a", 300, 5.0, 1)],
        "sym string, ts long, bid double, seq long",
    )
    back = asof_join(
        left, right, on=["sym"], left_time="ts",
        value_columns=["bid"], right_order="seq",
    )
    got = {r.ts: r.bid_right for r in back.collect()}
    assert got == {100: 2.0, 300: 4.0}  # seq 9 wins at 100, seq 2 at 300
    fwd = asof_join(
        left, right, on=["sym"], left_time="ts",
        value_columns=["bid"], direction="forward", right_order="seq",
    )
    got_f = {r.ts: r.bid_right for r in fwd.collect()}
    assert got_f == {100: 2.0, 300: 4.0}
    assert "__asof_order" not in back.columns
    # plan shape unchanged: still single shuffle, no join (fresh plan —
    # a collected one prints Final+Initial sections and double-counts)
    fresh = asof_join(
        left, right, on=["sym"], left_time="ts",
        value_columns=["bid"], right_order="seq",
    )
    plan = fresh._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
    with pytest.raises(ValueError, match="right_order"):
        asof_join(left, right, on=["sym"], left_time="ts",
                  value_columns=["bid"], right_order="nope")


def test_output_name_collisions_rejected(spark):
    left = spark.createDataFrame([("a", 100, 1.0)], "k string, ts long, v_right double")
    right = spark.createDataFrame([("a", 90, 2.0)], "k string, ts long, v double")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, on=["k"], left_time="ts")
    # a right column named like the left time would shadow the matched-
    # timestamp output
    left2 = spark.createDataFrame([("a", 100)], "k string, t_l long")
    right2 = spark.createDataFrame(
        [("a", 90, 5.0)], "k string, t_r long, t_l double"
    )
    with pytest.raises(ValueError, match="matched-"):
        asof_join(left2, right2, on=["k"], left_time="t_l", right_time="t_r")
