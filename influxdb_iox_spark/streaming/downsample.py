"""Continuous downsampling — InfluxDB continuous queries / tasks,
re-expressed on the engine's own upsert semantics.

The reference engine has no continuous-query runner (classic InfluxDB
CQs/tasks live outside iox v0); this is the beyond-reference composition
a dashboard deployment needs: periodically roll a raw measurement up
into a coarser one (``cpu`` → ``cpu_1h``).

The design leans on the engine's primary-key dedup instead of
read-modify-write state:

- Each sweep aggregates only the TAIL of the source (rows at or after
  the destination's high-water mark minus the late-arrival window) —
  cost proportional to recent writes, not source size, exactly like the
  lifecycle compactor.
- Refreshed buckets are simply re-emitted: the destination's primary
  key is (tags…, bucket-stop time), so dedup-on-read upserts the new
  value over the old chunk's (last-non-null, chunk order) and the
  normal compaction sweep collapses the physical duplicates later.
  No transactional update path is needed — idempotent re-runs are free.
- The bucket boundary is the window STOP (functions/time.window_bounds,
  the reference's GetEarliestBounds convention), so downsampled tables
  read exactly like read_window_aggregate output.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from influxdb_iox_spark.functions.time import window_bounds
from influxdb_iox_spark.schema import InfluxColumnType, IoxSchema

NS_PER_SECOND = 1_000_000_000

_AGGS = {
    "mean": F.avg,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "count": F.count,
}


def _manifest_time_hwm(store, table: str) -> tuple[int | None, bool]:
    """Destination high-water mark (max time) answered METADATA-ONLY
    from the manifest's per-chunk column stats — O(chunk count), zero
    data reads, where a ``max("time")`` scan would be O(dst size) and
    grow every sweep.  PK upserts never remove the max-time row, so the
    max over chunk stats equals the max over folded data.

    Returns ``(hwm, needs_scan)``: ``(None, False)`` for an empty
    manifest (no rows — nothing to scan either); ``(None, True)`` when
    any chunk lacks time stats, in which case only a data scan can
    answer."""
    metas = store.manifest(table)
    if not metas:
        return None, False
    maxes = []
    for m in metas:
        r = m.column_range("time")
        if r is None or r[1] is None:
            return None, True
        maxes.append(r[1])
    return max(maxes), False


def downsample_table(
    database,
    src_table: str,
    dst_table: str,
    every_seconds: int,
    agg: "str | list[str]" = "mean",
    late_arrive_window_seconds: int = 300,
):
    """One downsample sweep; returns the written ChunkMeta (or None when
    the tail holds no complete rows).

    Numeric fields of ``src_table`` aggregate under ``agg``; tags group.
    A single agg keeps the source field names (like an InfluxQL
    ``mean(value) AS value`` CQ); a LIST of aggs produces one
    ``<field>_<agg>`` column per pair (``SELECT mean(v), max(v), count(v)
    INTO cpu_1h`` — the common dashboard-rollup CQ shape) in ONE
    aggregation pass, still a single shuffle on (tags, bucket).
    Incremental: only source rows with ``time >= hwm - every - late``
    are touched, where hwm is the destination's max bucket — late
    arrivals inside the window refresh their bucket via re-emit + PK
    dedup.
    """
    aggs = [agg] if isinstance(agg, str) else list(agg)
    if not aggs:
        raise ValueError("agg list must not be empty")
    for a in aggs:
        if a not in _AGGS:
            raise ValueError(f"unknown agg {a!r}: pick one of {sorted(_AGGS)}")
    multi = not isinstance(agg, str)
    # Domain bound: a row within `every` of int64::MAX ns cannot be
    # bucketed — its stop boundary (window_bounds' `+ every`) exceeds
    # i64 and ANSI arithmetic raises, identically in full and
    # incremental sweeps (no silent divergence).  Practical timestamps
    # (year < 2262) are nowhere near it.
    src_schema = database.table_schema(src_table)
    tags = src_schema.tag_columns
    numeric = [
        f.name
        for f in src_schema.struct
        if f.name in src_schema.field_columns
        and f.dataType.typeName() in ("double", "long", "integer", "float")
    ]
    if not numeric:
        raise ValueError(f"{src_table!r} has no numeric fields to downsample")

    # (output column, agg, source field); single-agg mode keeps names
    out_fields = [
        (f"{f}_{a}" if multi else f, a, f) for f in numeric for a in aggs
    ]
    field_types = {
        name: (
            InfluxColumnType.FIELD_INTEGER
            if a == "count"
            else InfluxColumnType.FIELD_FLOAT
        )
        for name, a, _ in out_fields
    }
    dst_schema = IoxSchema.build(tags, field_types)

    every_ns = every_seconds * NS_PER_SECOND

    hwm = None
    if dst_table in database.schemas:
        hwm, needs_scan = _manifest_time_hwm(database.store, dst_table)
        if needs_scan:
            # some chunk lacks time stats (foreign/imported parquet) —
            # only then pay a dst data read
            hwm = database.table(dst_table).agg(F.max("time")).collect()[0][0]
    if hwm is not None:
        lo = hwm - every_ns - late_arrive_window_seconds * NS_PER_SECOND
        # floor to a bucket boundary: a cut INSIDE a bucket would
        # re-aggregate that bucket from a subset of its rows and the
        # partial mean would permanently overwrite the correct value via
        # the PK upsert.  Aligned, every bucket is either fully in the
        # tail or fully excluded.
        lo = (lo // every_ns) * every_ns
        # the tail bound rides a Predicate because of the MANIFEST: whole
        # pre-hwm chunks prune on the driver before Spark sees a file (a
        # plain .filter() on time would also push through the dedup
        # aggregate into the scans — time is a grouping key — but could
        # not prune chunks).  Lower bound only: an upper bound of
        # int64::MAX-as-half-open would silently drop a row AT the max
        # timestamp, which ingest accepts.
        from influxdb_iox_spark.plans.predicate import Predicate

        src = database.table(
            src_table, Predicate().with_col_range("time", lo=lo)
        )
    else:
        src = database.table(src_table)

    out = (
        src.withColumn("__bucket", window_bounds("time", every_ns))
        .groupBy(*tags, "__bucket")
        .agg(*[_AGGS[a](f).alias(name) for name, a, f in out_fields])
        .withColumnRenamed("__bucket", "time")
    )
    out = out.select(
        *tags,
        "time",
        *[
            F.col(name) if a == "count" else F.col(name).cast("double").alias(name)
            for name, a, _ in out_fields
        ],
    )
    # materialize the (small) rollup ONCE: the emptiness probe and the
    # chunk write must not each re-run the tail aggregation
    out = out.localCheckpoint(eager=True)
    if not out.take(1):
        return None
    meta = database.store.write_chunk(out, dst_table, dst_schema)
    database.register_table(dst_table, dst_schema)
    return meta
