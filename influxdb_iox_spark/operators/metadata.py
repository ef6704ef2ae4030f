"""Metadata query operators: table_names / tag_keys / tag_values /
field_columns — the schema-introspection half of the InfluxRPC menu.

Reference: /root/reference/query/src/frontend/influxrpc.rs —
table_names :183-219, tag_keys :225-323, tag_values :328-471,
field_columns :477-504 (+ exec/fieldlist.rs:44-57), and the custom
``SchemaPivot`` node (query/src/exec/schema_pivot.rs:1-46).

Spark-first: SchemaPivot ("which columns have ≥1 non-null value") is a single
one-row aggregate of ``count(col)`` per column — no custom plan node.  All
operators take the dedup-correct scan as input, so results agree with what a
query would actually see (the reference guarantees the same by planning over
the same provider).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from influxdb_iox_spark.database import Database
from influxdb_iox_spark.plans.predicate import Predicate
from influxdb_iox_spark.schema import TIME_COLUMN_NAME


def schema_pivot(df: DataFrame, columns: list[str] | None = None) -> list[str]:
    """Names of columns with at least one non-null value (SchemaPivot).

    One aggregate row — Catalyst computes all counts in a single pass with
    map-side partials; the early-exit optimization in the reference
    (schema_pivot.rs exec) is subsumed by columnar scan speed.
    """
    cols = columns if columns is not None else df.columns
    if not cols:
        return []
    row = df.agg(*[F.count(F.col(c)).alias(c) for c in cols]).first()
    return [c for c in cols if row[c] > 0]


def table_names(db: Database, predicate: Predicate | None = None) -> list[str]:
    """Tables with ≥1 row matching the predicate (influxrpc.rs:183-219).

    Unconstrained → answered from the catalog/manifest alone (metadata-only
    path); with a predicate → existence probe per candidate table, which
    Spark answers from pruned scans (`LIMIT 1`).
    """
    names = [
        t
        for t in db.table_names()
        if predicate is None or predicate.should_scan_table(t)
    ]

    def _has_rows_meta(t: str, chunks) -> bool:
        """Metadata-only ≥1-row check; a table whose chunks are targeted
        by delete tombstones may have had EVERY row deleted (manifest
        row counts don't see tombstones), so only a scan can answer —
        same guard as tag_keys/catalog_tag_values (review finding)."""
        live = [c for c in chunks if c.row_count]
        if not live:
            return False
        if db.store.has_tombstoned_chunks(t, (c.chunk_id for c in live)):
            return db.table(t, predicate).limit(1).count() > 0
        return True

    if predicate is None or predicate.is_row_unconstrained():
        return [t for t in names if _has_rows_meta(t, db.store.manifest(t))]
    if predicate.range is None and not predicate.exprs:
        # partition_key-only predicate: still metadata-answerable — a table
        # matches iff it has ≥1 row in a chunk of that partition.
        return [
            t
            for t in names
            if _has_rows_meta(
                t,
                db.store.prune_chunks(t, predicate, db.table_schema(t).time_column),
            )
        ]
    out = []
    for t in names:
        chunks = db.store.prune_chunks(t, predicate, db.table_schema(t).time_column)
        if not chunks:
            continue
        if db.table(t, predicate).limit(1).count() > 0:
            out.append(t)
    return out


def tag_keys(db: Database, table: str, predicate: Predicate | None = None) -> list[str]:
    """Tag columns with ≥1 matching (non-null) row (influxrpc.rs:225-323)."""
    schema = db.table_schema(table)
    tags = schema.tag_columns
    if predicate is None or (predicate.range is None and not predicate.exprs):
        # metadata path: answered from the per-chunk tag catalog recorded at
        # write time.  A tag qualifies iff some chunk saw a non-null value
        # for it: a catalog entry of [] means the tag was null in EVERY row
        # of that chunk (collect_set drops nulls); None means it overflowed
        # the cap (definitely has values).  An ABSENT entry (legacy chunk
        # written before the catalog existed) is unknown — the reference
        # falls back to a scan when metadata-only evaluation is unknown, so
        # tags that no chunk confirms and some chunk leaves unknown are
        # resolved by one schema_pivot scan rather than included blindly
        # (which would break non-null StringSet semantics for a tag that is
        # null everywhere).  A partition_key-only predicate restricts which
        # chunks count.
        chunks = (
            db.store.manifest(table)
            if predicate is None or predicate.partition_key is None
            else db.store.prune_chunks(table, predicate, schema.time_column)
        )
        live = [c for c in chunks if c.row_count]
        if not live:
            return []
        # delete tombstones may have removed every row carrying a tag —
        # write-time catalogs of targeted chunks can no longer confirm a
        # key; fall through to the scan path (tombstone-filtered)
        if db.store.has_tombstoned_chunks(table, (c.chunk_id for c in live)):
            return sorted(schema_pivot(db.table(table, predicate), tags))
        out: list[str] = []
        scan_tags: list[str] = []
        for tag in tags:
            confirmed = False
            unknown = False
            for c in live:
                cat = c.tag_values or {}
                if tag not in cat:
                    unknown = True
                elif cat[tag] is None or cat[tag]:
                    confirmed = True
                    break
            if confirmed:
                out.append(tag)
            elif unknown:
                scan_tags.append(tag)
        if scan_tags:
            out.extend(schema_pivot(db.table(table, predicate), scan_tags))
        return sorted(out)
    df = db.table(table, predicate)
    return sorted(schema_pivot(df, tags))


def tag_values(
    db: Database, table: str, tag: str, predicate: Predicate | None = None
) -> list[str]:
    """Distinct non-null values of one tag under the predicate
    (influxrpc.rs:328-471)."""
    schema = db.table_schema(table)
    if tag not in schema.tag_columns:
        # The reference separates the two non-tag cases (tag_values.rs:47-59
        # list_tag_values_no_tag vs :225-246 list_tag_values_field_col): a
        # column that exists but is a FIELD is a planner error; a column not
        # present at all yields an empty string set, not an error.
        if tag in schema.field_columns or tag == schema.time_column:
            raise ValueError(f"{tag!r} is not a tag column of {table!r}")
        return []
    df = db.table(table, predicate)
    rows = (
        df.select(tag)
        .where(F.col(tag).isNotNull())
        .distinct()
        .orderBy(tag)
        .collect()
    )
    return [r[0] for r in rows]


def series_cardinality(
    db: Database,
    table: str,
    predicate: Predicate | None = None,
    exact: bool = False,
) -> int:
    """Number of distinct series the table contributes under the predicate.

    BEYOND the reference: service.rs:560-566 leaves ReadSeriesCardinality
    ``unimplemented!``.  Semantics chosen to be self-consistent with OUR
    read_filter framing (and the reference's data.rs framing): one series
    per (tag-value combination, field) pair that has at least one matching
    row with a non-null field value — i.e. exactly the number of
    SeriesFrames a read_filter for the same predicate would stream.

    Metadata-first (influxrpc.rs:244-293 posture): when the database has
    a registered series rollup for the table
    (``Database.register_series_rollup``) whose cells COVER the
    predicate, the answer is one sketch-union fold over KB-sized cells —
    zero raw scans (~1.6% standard error at the default lgk).  The exact
    rescan below remains the fallback for unsketchable predicates and
    the explicit path when ``exact=True``.

    Exact path, one aggregation pass: per field, ``count_distinct`` of
    the tag tuple over rows where the field is non-null (the WHEN
    collapses excluded rows to NULL, which count_distinct ignores).
    Map-side partials make this a single shuffle of pre-aggregated
    sketches at scale.
    """
    if not exact and table in db.series_rollups:
        from influxdb_iox_spark.pipeline.cardinality import (
            covering_filters,
            estimate_series_cardinality,
        )

        _path, meta = db.series_rollups[table]
        filters = covering_filters(meta, predicate)
        if filters is not None:
            return estimate_series_cardinality(db.rollup_cells(table), filters)
    schema = db.table_schema(table)
    fields = schema.field_columns
    if not fields:
        return 0
    df = db.table(table, predicate)
    tags = schema.tag_columns
    key = F.struct(*[F.col(t) for t in tags]) if tags else F.lit(1)
    row = df.agg(
        *[
            F.count_distinct(F.when(F.col(f).isNotNull(), key)).alias(f)
            for f in fields
        ]
    ).first()
    return sum(row[f] for f in fields)


def field_columns(
    db: Database, table: str, predicate: Predicate | None = None
) -> list[dict]:
    """(field name, type, last timestamp at which it was non-null) per
    matching field — exec/fieldlist.rs:44-57 Field{name,data_type,
    last_timestamp}.  One aggregate pass over the pruned scan.

    An unknown table yields an empty FieldList, not an error: the
    reference's planner iterates tables matching the request's predicate
    and a name that matches nothing contributes nothing
    (field_columns.rs:59-66 list_column_names over "NoSuchTable")."""
    if table not in db.schemas:
        return []
    schema = db.table_schema(table)
    fields = schema.field_columns
    if not fields:
        return []
    df = db.table(table, predicate)
    t = F.col(schema.time_column)
    row = df.agg(
        *[F.max(F.when(F.col(f).isNotNull(), t)).alias(f) for f in fields]
    ).first()
    by_name = {f.name: f.dataType.simpleString() for f in schema.struct.fields}
    return [
        {"name": f, "data_type": by_name[f], "last_timestamp": row[f]}
        for f in fields
        if row[f] is not None
    ]
