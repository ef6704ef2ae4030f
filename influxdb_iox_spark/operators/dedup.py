"""Primary-key deduplication — the signature IOx operator.

Reference semantics (/root/reference/query/src/provider/deduplicate.rs:28-60,
algorithm in deduplicate/algo.rs:22-120): the same primary key (all tags +
time) may appear in several chunks (upserts, replays, late data).  Every scan
must collapse PK-equal runs to ONE row where each field column takes the
**last non-null** value, "last" meaning the latest chunk, and within a chunk
the latest row.

Spark-first design — instead of the reference's Sort → Union →
SortPreservingMerge → Deduplicate physical tree (provider.rs:336-560), the
whole thing is ONE hash aggregation:

    groupBy(tags…, time).agg(max_by(field, when(field.isNotNull(), order)) …)

which Catalyst executes as partial (map-side) + final hash aggregate with
whole-stage codegen — no global sort, no merge operator, and the shuffle key
(tags + ns-time) is near-unique so it distributes evenly at any scale.  Spark's
``max_by`` ignores rows whose ordering expression is NULL, which implements
last-NON-NULL exactly when the order is masked by field nullity.

Determinism: the reference's "later wins" depends on chunk order; Spark
aggregation has no input order, so callers must provide an explicit ordering
column (chunk sequence, or (chunk, row) packed).  ``attach_chunk_order``
builds one.  At 100 TB the scan planner routes only chunk groups whose PK
stat-ranges overlap through this aggregate (see sources/manifest.py, mirroring
provider.rs:336-400 clean-chunk fast path) — non-overlapping files scan
directly with zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from influxdb_iox_spark.schema import TIME_COLUMN_NAME, merge_chunk_frames

DEDUP_ORDER_COLUMN = "__chunk_order"


def attach_chunk_order(chunks: list[DataFrame], start: int = 0) -> DataFrame:
    """Union chunk frames with an explicit per-chunk ordering column.

    Chunk index replicates "later chunk wins".  Within one chunk the reference
    takes the later row; parquet chunks written by this engine are already
    PK-unique within a file (ingest dedups each batch), so the chunk index
    alone is a total order across duplicates.  For raw multi-row-per-PK input
    use ``deduplicate_within`` first.
    """
    ordered = [
        df.withColumn(DEDUP_ORDER_COLUMN, F.lit(start + i)) for i, df in enumerate(chunks)
    ]
    return merge_chunk_frames(ordered)


def deduplicate(
    df: DataFrame,
    tag_columns: list[str],
    field_columns: list[str] | None = None,
    time_column: str = TIME_COLUMN_NAME,
    order_column: str = DEDUP_ORDER_COLUMN,
) -> DataFrame:
    """Collapse PK-equal rows to one row, last-non-null per field.

    ``order_column`` must totally order duplicate rows ("last" = max).  If it
    is absent from ``df``, rows are assumed PK-unique already except for exact
    replays, and an arbitrary-but-deterministic order (monotonic id) is used.
    Output columns: tags…, fields…, time (canonical sorted-by-name projection
    is left to the caller).

    PRECONDITION on the no-order fallback: ``monotonically_increasing_id``
    is a function of partition LAYOUT, so it only yields a stable winner
    when duplicate rows are exact replays (identical field values — any
    winner is the same row) or when the caller replays the identical
    plan.  Store scan paths always pass chunk-id order and never hit
    this branch; it exists for ad-hoc inputs, asserted below rather than
    assumed.
    """
    if field_columns is None:
        pk = set(tag_columns) | {time_column, order_column}
        field_columns = [c for c in df.columns if c not in pk]
    if order_column not in df.columns:
        assert DEDUP_ORDER_COLUMN not in df.columns, (
            "caller built a dedup-order column but passed a different "
            "order_column name — ambiguous ordering"
        )
        df = df.withColumn(order_column, F.monotonically_increasing_id())

    ord_col = F.col(order_column)
    aggs = [
        F.max_by(F.col(f), F.when(F.col(f).isNotNull(), ord_col)).alias(f)
        for f in field_columns
    ]
    return df.groupBy(*tag_columns, time_column).agg(*aggs)


def deduplicate_within(
    df: DataFrame,
    tag_columns: list[str],
    field_columns: list[str] | None = None,
    time_column: str = TIME_COLUMN_NAME,
    seq_column: str | None = None,
) -> DataFrame:
    """Dedup rows WITHIN one batch/chunk before persisting.

    Mirrors mutable-buffer upsert behaviour: a write batch can itself contain
    PK duplicates; the later line wins per field.  ``seq_column`` is the
    within-batch line number; required for deterministic results when real
    duplicates exist.
    """
    return deduplicate(
        df,
        tag_columns,
        field_columns,
        time_column,
        order_column=seq_column or DEDUP_ORDER_COLUMN,
    )
