"""Correctness-window rotation invariants for __spark_entry__.

The driver checks a ~50-entry window of queries() per round; the entry
rotates the dict so consecutive rounds' windows TILE the whole declared
surface.  Two invariants keep that sound:

1. The round number is pinned at import — the driver writes round N's
   CORRECTNESS file mid-round, so a call-time count would shift the
   window between two checker invocations within one round.
2. Tiling: the union of any two consecutive rounds' windows covers every
   declared query, which holds exactly while the query count stays in
   [WINDOW, 2*WINDOW].  Growing past 100 queries must FAIL here so the
   rotation step gets widened deliberately, not silently.

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


def test_consecutive_windows_tile_all_queries():
    names = list(entry_mod.queries())
    n = len(names)
    # tiling precondition: one window reaches at least half the surface
    assert WINDOW <= n <= 2 * WINDOW, (
        f"{n} queries breaks the two-round tiling invariant — widen the "
        "rotation step or the window"
    )
    # simulate every pair of consecutive rounds' windows on the canonical
    # cycle: round r starts at (WINDOW * (r - 4)) % n
    for r in range(4, 4 + n):
        a = (WINDOW * (r - 4)) % n
        b = (WINDOW * (r - 3)) % n
        wa = {names[(a + i) % n] for i in range(WINDOW)}
        wb = {names[(b + i) % n] for i in range(WINDOW)}
        assert wa | wb == set(names), f"rounds {r},{r + 1} miss queries"


def test_current_round_window_covers_undriven_queries():
    """Every query new this round (no CORRECTNESS_r* row yet) must sit
    inside the CURRENT round's 50-entry window — a freshly-shipped query
    that waits a full round for its first driver row is a registry
    ordering bug (place new queries inside the window, displacing
    long-green ones)."""
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


def test_rotation_is_permutation_and_oracle_paired():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) == len(set(qs))  # no name collisions
    # every oracle key is a declared query (weaker rows-only checks aside)
    assert set(oracles) <= set(qs)
