"""Sharded write routing — ShardConfig / Matcher / HashRing / Sharder.

The reference's router (data_types/src/database_rules.rs:286-420 +
consistent_hasher.rs) assigns every line to a shard: matchers are
evaluated in order (first table-name regex match wins), otherwise the
hash ring hashes the line's routing key (optional measurement name +
configured column values, 0-byte separated) onto a ring of shard ids
(smallest node-hash greater than the point hash, wrapping to the first).
Shards map to node groups; nodes map to remote connections.

Divergence (documented): the ring's 64-bit hash is a stable digest
(blake2b-8) rather than Rust's std DefaultHasher — the ALGORITHM
(hash-sorted ring, first-greater lookup with wraparound) is identical,
the placement of any given key differs.  Nothing here needs to agree
with a Rust cluster's placement; it needs to be deterministic across
Python processes, which std DefaultHasher placement would not buy
either (it is explicitly not a stable hash across Rust releases).

Two evaluators ship:

- ``shard_of_line`` — per-line, the reference's row-by-row semantics,
  used by the write router on ingest payloads.
- ``shard_id_column`` — the SAME decision as a Spark column expression
  (rlike matchers + blake-compatible xxhash?  no: the ring digest is
  computed via a tiny Arrow-batched pandas UDF so both evaluators share
  one digest function), for bulk re-sharding jobs; a differential test
  pins the two to identical outputs.
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass, field

from influxdb_iox_spark.sources.line_protocol import ParsedLine


class ShardingError(ValueError):
    pass


def _digest64(data: bytes) -> int:
    """Stable 64-bit digest (blake2b with 8-byte output, little-endian)."""
    return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "little")


def _ring_points(shards: list[int]) -> list[tuple[int, int]]:
    """(node_hash, shard_id) ring sorted by hash (ConsistentHasher::new)."""
    pts = [(_digest64(str(s).encode()), s) for s in shards]
    pts.sort()
    return pts


def _ring_find(ring: list[tuple[int, int]], point_hash: int) -> int | None:
    """First node-hash strictly greater than the point, wrapping
    (ConsistentHasher::find)."""
    for node_hash, shard in ring:
        if node_hash > point_hash:
            return shard
    return ring[0][1] if ring else None


def _field_str(v) -> str:
    """Field value as the hash-key string (LineHasher uses
    field_value.to_string(); bools render true/false, ints bare)."""
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


@dataclass
class Matcher:
    table_name_regex: str | None = None

    def match_line(self, pl: ParsedLine) -> bool:
        # Regex::is_match = unanchored search, like re.search
        if self.table_name_regex is None:
            return False
        return re.search(self.table_name_regex, pl.measurement) is not None


@dataclass
class MatcherToShard:
    matcher: Matcher
    shard: int


@dataclass
class HashRing:
    table_name: bool = False
    columns: list[str] = field(default_factory=list)
    shards: list[int] = field(default_factory=list)

    def key_of(self, pl: ParsedLine) -> bytes:
        """LineHasher: optional measurement, then per configured column the
        tag value else stringified field value (absent -> nothing), each
        column terminated by one 0 byte."""
        parts = []
        if self.table_name:
            parts.append(pl.measurement.encode())
        for col in self.columns:
            if col in pl.tags:
                parts.append(pl.tags[col].encode())
            elif col in pl.fields:
                parts.append(_field_str(pl.fields[col]).encode())
            parts.append(b"\x00")
        return b"".join(parts)


@dataclass
class ShardConfig:
    specific_targets: list[MatcherToShard] = field(default_factory=list)
    hash_ring: HashRing | None = None
    ignore_errors: bool = False
    #: shard id -> node group (list of server/remote ids)
    shards: dict[int, list[int]] = field(default_factory=dict)

    def shard_of_line(self, pl: ParsedLine) -> int:
        """Sharder::shard (database_rules.rs:347-368)."""
        for mts in self.specific_targets:
            if mts.matcher.match_line(pl):
                return mts.shard
        if self.hash_ring is not None:
            shard = _ring_find(
                _ring_points(self.hash_ring.shards),
                _digest64(self.hash_ring.key_of(pl)),
            )
            if shard is None:
                raise ShardingError("no shards defined in the hash ring")
            return shard
        raise ShardingError(f"No sharding rule matches line: {pl.measurement}")

    @staticmethod
    def from_rules(cfg: dict) -> "ShardConfig":
        """Wire ShardConfig dict (management_proto.SHARD_CONFIG) → model."""
        targets = [
            MatcherToShard(
                Matcher((t.get("matcher") or {}).get("table_name_regex") or None),
                t.get("shard") or 0,
            )
            for t in cfg.get("specific_targets") or []
        ]
        ring = None
        if cfg.get("hash_ring") is not None:
            hr = cfg["hash_ring"]
            ring = HashRing(
                bool(hr.get("table_name")),
                list(hr.get("columns") or []),
                list(hr.get("shards") or []),
            )
        shards = {}
        for entry in cfg.get("shards") or []:
            group = ((entry.get("value") or {}).get("iox") or {}).get("nodes") or []
            shards[entry.get("key") or 0] = [n.get("id") or 0 for n in group]
        return ShardConfig(
            targets, ring, bool(cfg.get("ignore_errors")), shards
        )


def shard_id_column(config: ShardConfig, table_col: str, all_columns: list[str]):
    """The same shard decision as a Spark Column over a parsed DataFrame
    (one row per point, measurement in ``table_col``, tags/fields as
    columns) — for bulk re-sharding jobs.

    Matchers become rlike chains (codegen); the ring digest runs in one
    Arrow-batched pandas UDF sharing ``_digest64`` with the per-line
    evaluator, so the two can never disagree on placement.  Rows no rule
    covers get shard NULL (the caller decides whether that is an error,
    mirroring ignore_errors).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    expr = F.lit(None).cast("long")
    ring = config.hash_ring
    if ring is not None:
        ring_pts = _ring_points(ring.shards)
        cols_present = [c for c in ring.columns if c in all_columns]

        pos = {
            c: (1 if ring.table_name else 0) + j for j, c in enumerate(cols_present)
        }
        ring_columns = list(ring.columns)

        @F.pandas_udf(LongType())
        def ring_shard(*series):
            import pandas as pd

            out = []
            n = len(series[0]) if series else 0
            for i in range(n):
                parts = []
                if ring.table_name:
                    parts.append(str(series[0][i]).encode())
                # EVERY configured column appends its separator, present in
                # the frame or not — LineHasher writes the 0 byte per
                # column unconditionally.  Inputs arrive pre-stringified
                # (see below) so pandas' null-int -> float64 promotion can
                # never change a value's rendering.
                for col in ring_columns:
                    j = pos.get(col)
                    v = None if j is None else series[j][i]
                    if v is not None and not (isinstance(v, float) and pd.isna(v)):
                        parts.append(str(v).encode())
                    parts.append(b"\x00")
                out.append(_ring_find(ring_pts, _digest64(b"".join(parts))))
            return pd.Series(out, dtype="object")

        # cast("string") matches _field_str's rendering for longs, doubles,
        # and booleans, and sidesteps pandas' nullable-int promotion
        inputs = ([F.col(table_col)] if ring.table_name else []) + [
            F.col(c).cast("string") for c in cols_present
        ]
        # zero inputs (no table_name, no present columns): constant key
        expr = (
            ring_shard(*inputs)
            if inputs
            else F.lit(_ring_find(ring_pts, _digest64(b"\x00" * len(ring.columns))))
        )
    for mts in reversed(config.specific_targets):
        if mts.matcher.table_name_regex is not None:
            expr = F.when(
                F.col(table_col).rlike(mts.matcher.table_name_regex),
                F.lit(mts.shard),
            ).otherwise(expr)
    return expr.alias("shard_id")
