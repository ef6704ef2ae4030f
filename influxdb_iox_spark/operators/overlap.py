"""Chunk-overlap analysis — decides which chunks need dedup at scan time.

Reference: ``group_potential_duplicates``
(/root/reference/query/src/provider/overlap.rs:49-80) with range comparison via
``StatOverlap`` (/root/reference/data_types/src/partition_metadata.rs:445).

Two chunks *may* share duplicate primary keys only if, for EVERY primary-key
column (tags + time), their [min, max] stat ranges intersect.  Chunks are
grouped by the transitive closure of that pairwise relation; groups of one
"clean" chunk skip the dedup aggregate entirely (provider.rs:336-400 fast
path).  Missing stats are treated as unbounded (conservative: overlaps
everything), matching the reference.

This runs on the driver over manifest metadata (thousands of entries, not
rows).  A naive all-pairs check is O(n²) Python calls — measured ~42 s at
10⁴ chunks — so grouping sweeps the LAST pk column (time, by the
``[tags…, time]`` PK convention): chunks sorted by time-min, an active set
retires chunks whose time-max has passed, and only active chunks are
pair-checked.  Continuous ingest writes near-disjoint time ranges, so the
active set stays small and the sweep is ~O(n log n); fully-overlapping
pathologies degrade to the same O(n²) the reference pays.  Chunks with
unknown/incomparable time bounds stay active forever (conservative).
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Protocol


class HasStats(Protocol):
    """Anything exposing per-column (min, max) stats — see manifest ChunkMeta."""

    def column_range(self, col: str) -> tuple[object, object] | None: ...


def ranges_overlap(a: tuple | None, b: tuple | None) -> bool:
    """Closed-interval intersection; unknown stats are conservative-overlap."""
    if a is None or b is None:
        return True
    amin, amax = a
    bmin, bmax = b
    if amin is None or amax is None or bmin is None or bmax is None:
        return True
    return not (amax < bmin or bmax < amin)


def chunks_overlap(a: HasStats, b: HasStats, pk_columns: Sequence[str]) -> bool:
    return all(ranges_overlap(a.column_range(c), b.column_range(c)) for c in pk_columns)


def group_potential_duplicates(
    chunks: Sequence[HasStats], pk_columns: Sequence[str]
) -> list[list[int]]:
    """Partition chunk indices into groups whose members may share PKs.

    Union-find over the pairwise overlap relation (transitive closure, like
    overlap.rs:49-80).  Returns groups of indices into ``chunks``; singleton
    groups are the no-dedup fast path.
    """
    n = len(chunks)
    parent = list(range(n))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(x: int, y: int) -> None:
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[ry] = rx

    lows: list = [None] * n
    highs: list = [None] * n
    if pk_columns:
        for i in range(n):
            r = chunks[i].column_range(pk_columns[-1])
            if r is not None:
                lows[i], highs[i] = r[0], r[1]

    order = list(range(n))
    sweepable = bool(pk_columns)
    if sweepable:
        try:
            # sort by time-min; unknown mins first (conservative: processed
            # early and never retired, so they meet everything)
            order.sort(key=lambda i: (lows[i] is not None, lows[i] or 0))
        except TypeError:  # incomparable stat types -> all-pairs fallback
            sweepable = False

    if sweepable:
        active: list[int] = []
        try:
            for i in order:
                lo = lows[i]
                if lo is not None:
                    # retire chunks whose time range ended before this one
                    # starts (sorted lo only grows, so they can never overlap
                    # anything later either).  ANY None bound means
                    # ranges_overlap treats the chunk as overlapping
                    # everything, so half-bounded chunks never retire.
                    active = [
                        j
                        for j in active
                        if lows[j] is None
                        or highs[j] is None
                        or not (highs[j] < lo)
                    ]
                for j in active:
                    if chunks_overlap(chunks[i], chunks[j], pk_columns):
                        union(i, j)
                active.append(i)
        except TypeError:
            # mixed bound types mid-sweep: unions so far are all verified
            # overlaps, finishing with all-pairs stays correct
            sweepable = False

    if not sweepable:
        for i in range(n):
            for j in range(i + 1, n):
                if chunks_overlap(chunks[i], chunks[j], pk_columns):
                    union(i, j)

    groups: dict[int, list[int]] = {}
    for i in range(n):
        groups.setdefault(find(i), []).append(i)
    return sorted(groups.values(), key=lambda g: g[0])
