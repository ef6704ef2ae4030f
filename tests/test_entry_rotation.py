"""Correctness-window ordering invariants for __spark_entry__.

The driver checks a ~50-entry window of queries() per round; since round
12 the entry orders the dict STALEST-FIRST (by each query's newest green
round in the committed CORRECTNESS_r*.json files, never-green first,
canonical position as tiebreak).  That replaces the rounds-4..11 modular
shift, whose "no query more than one round stale" promise silently broke
when the registry grew between rounds (115 -> 122 stranded 10 rpc_*
queries at their round-8 rows — the round-11 verdict's What's-wrong #3).

Invariants kept sound here:

1. The staleness table is pinned at first use — the driver writes round
   N's CORRECTNESS file mid-round, so a call-time re-read could shift
   the window between two checker invocations within one round.
2. Bounded staleness UNDER GROWTH: simulating rounds where each round's
   window goes green, every query gets a fresh driver row at least
   every ceil(n/WINDOW) rounds even as new queries keep being added.
3. New (never-driven) queries always land in the current window.

No SparkSession needed — these only inspect the query registry.
"""

from __future__ import annotations

import importlib
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
entry_mod = importlib.import_module("__spark_entry__")

WINDOW = 50  # the driver's per-round correctness window size


def test_round_number_pinned_at_import(monkeypatch):
    before = entry_mod._round_number()
    # simulate the driver writing this round's CORRECTNESS file mid-round
    monkeypatch.setattr(
        entry_mod, "_count_correctness_files", lambda: before + 17
    )
    assert entry_mod._round_number() == before  # window cannot shift


def test_staleness_table_pinned_after_first_use(tmp_path, monkeypatch):
    """_last_green_rounds caches on first call: a CORRECTNESS file the
    driver writes mid-round must not reorder queries() between two
    checker invocations in the same process."""
    first = entry_mod.queries()
    # even wiping the repo-dir view cannot change the order now
    monkeypatch.setattr(entry_mod, "_REPO_DIR", str(tmp_path))
    assert list(entry_mod.queries()) == list(first)


def _simulate(last_green: dict[str, int], names: list[str]) -> dict:
    """Run _rotate_for_round against an injected staleness table."""
    saved = entry_mod._LAST_GREEN_CACHE
    entry_mod._LAST_GREEN_CACHE = dict(last_green)
    try:
        return entry_mod._rotate_for_round({k: k for k in names})
    finally:
        entry_mod._LAST_GREEN_CACHE = saved


def test_stalest_first_bounds_staleness_under_registry_growth():
    """THE invariant the modular shift lost: with stalest-first ordering,
    every query gets a green driver row at least every ceil(n/WINDOW)
    rounds EVEN while the registry keeps growing.  Simulate 30 rounds,
    adding 7 queries per round (the observed growth shape), marking each
    round's 50-entry window green, and assert the staleness bound on
    every declared query at every step."""
    import math

    names = [f"q{i:03d}" for i in range(115)]
    last: dict[str, int] = {n: 8 for n in names}  # all green at r8
    for rnd in range(9, 39):
        # registry growth: new queries appear with NO green row
        new = [f"q{len(names) + j:03d}" for j in range(7)]
        names += new
        ordered = list(_simulate(last, names))
        window = ordered[:WINDOW]
        # every never-green query must be in the window immediately
        assert all(n in window for n in new), (rnd, new)
        for n in window:
            last[n] = rnd  # driver marks the window green
        horizon = math.ceil(len(names) / WINDOW)
        worst = min(last[n] for n in names)
        assert rnd - worst <= horizon, (
            f"round {rnd}: a query is {rnd - worst} rounds stale "
            f"(bound {horizon}, n={len(names)})"
        )


def test_never_green_queries_order_first():
    names = ["a", "b", "c", "d"]
    ordered = list(_simulate({"a": 9, "c": 8}, names))
    # never-green b, d first (canonical tiebreak), then c (r8), then a (r9)
    assert ordered == ["b", "d", "c", "a"]


def test_round11_strandees_regreened_in_round12():
    """History pin (round-12 verdict, What's-wrong closure): the 10
    queries the rounds-4..11 modular shift stranded at round-8 rows all
    received fresh GREEN driver rows in CORRECTNESS_r12.json once the
    stalest-first rotation put them in the round-12 window.  This pins
    what HAPPENED — it never re-asserts window membership, which by
    design rotates them back out once their rows are the freshest."""
    import json
    import pathlib

    strandees = {
        "rpc_read_filter", "rpc_read_group", "rpc_read_group_two_tags",
        "rpc_window_agg_1h", "rpc_window_agg_offset",
        "rpc_selector_last_first", "rpc_field_columns", "rpc_tag_values",
        "rpc_window_gapfill_value", "doc_paragraph_dedup",
    }
    repo_root = pathlib.Path(__file__).resolve().parents[1]
    r12 = json.load(open(repo_root / "CORRECTNESS_r12.json"))
    missing = strandees - set(r12)
    assert not missing, f"strandees missing from CORRECTNESS_r12: {missing}"
    for name in sorted(strandees):
        row = r12[name]
        assert row.get("rows_match") or row.get("hash_match"), (name, row)


def test_no_green_query_staler_than_horizon():
    """THE durable invariant, asserted against the real committed
    history: at the start of the current round, no query with at least
    one green driver row may be staler than ceil(n/WINDOW) rounds.
    Stalest-first ordering guarantees this by construction (the
    simulation above proves the mechanism); this checks the actual
    CORRECTNESS_r*.json files never violated it."""
    import math

    names = list(entry_mod.queries())
    current = entry_mod._round_number()
    horizon = math.ceil(len(names) / WINDOW)
    table = entry_mod._last_green_rounds()
    # staleness at the start of round N = (N-1) - last_green: the number
    # of completed rounds since the query's newest green row (the r12
    # verdict's measure — three r9 rows at round 13 sit exactly at 3).
    stale = {
        n: (current - 1) - r
        for n, r in table.items()
        if n in set(names) and (current - 1) - r > horizon
    }
    assert not stale, (
        f"green queries staler than the {horizon}-round bound at the "
        f"start of round {current}: {stale}"
    )


def test_current_round_window_covers_undriven_queries():
    """Every query new this round (no CORRECTNESS_r* row yet) must sit
    inside the CURRENT round's 50-entry window — never-green sorts
    before every green query by construction, so a violation here means
    the registry outgrew the window with >50 undriven queries."""
    import glob
    import json
    import pathlib

    repo_root = pathlib.Path(__file__).resolve().parents[1]
    driven: set[str] = set()
    for p in glob.glob(str(repo_root / "CORRECTNESS_r*.json")):
        data = json.load(open(p))
        if isinstance(data, dict):
            driven |= set(data)
    names = list(entry_mod.queries())
    undriven = set(names) - driven
    window = set(names[:WINDOW])
    assert undriven <= window, (
        f"queries with no driver row outside this round's window: "
        f"{sorted(undriven - window)}"
    )


def test_freshness_horizon_documented():
    """ceil(n/WINDOW) is the max rounds any query can go without a fresh
    driver row under stalest-first; keep the horizon at 3 (n <= 150)
    unless a round DELIBERATELY accepts a longer one — crossing 150
    should be a decision, not drift.  (The local DuckDB parity suite
    re-checks all queries every run regardless, so driver-row staleness
    never means unchecked correctness.)"""
    n = len(entry_mod.queries())
    assert n <= 3 * WINDOW, (
        f"{n} queries -> freshness horizon {-(-n // WINDOW)} rounds; if "
        "this growth is deliberate, raise this bound in the same commit "
        "and say so"
    )


def test_rotation_is_permutation_and_oracle_paired():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) == len(set(qs))  # no name collisions
    # every oracle key is a declared query (weaker rows-only checks aside)
    assert set(oracles) <= set(qs)
