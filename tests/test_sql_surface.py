"""SQL-frontend surface: information_schema / SHOW TABLES / system tables —
the reference's sql.rs:183-365 information-schema + system-table tests."""

from __future__ import annotations

from influxdb_iox_spark.database import Database
from influxdb_iox_spark.schema import InfluxColumnType, IoxSchema
from influxdb_iox_spark.sources.store import TableStore

CPU = IoxSchema.build(["region"], {"user": InfluxColumnType.FIELD_FLOAT})


def test_show_tables_and_describe(spark, tmp_path):
    store = TableStore(str(tmp_path))
    df = spark.createDataFrame(
        [("west", 1.0, 100)], "region string, user double, time long"
    )
    store.write_chunk(df, "cpu", CPU)
    db = Database("db", store, spark)
    db.register_table("cpu", CPU)
    db.register_views()

    tables = {r.tableName for r in spark.sql("SHOW TABLES").collect()}
    assert {
        "cpu", "system_chunks", "system_columns", "system_chunk_columns",
        "system_operations",
    } <= tables

    cols = {r.col_name: r.data_type for r in spark.sql("DESCRIBE cpu").collect()}
    assert cols == {"region": "string", "time": "bigint", "user": "double"}

    sys_cols = {
        (r.column_name, r.column_type)
        for r in db.query("SELECT * FROM system_columns WHERE table_name='cpu'").collect()
    }
    assert sys_cols == {
        ("region", "tag"),
        ("time", "timestamp"),
        ("user", "field::float"),
    }


def test_system_operations_records_lifecycle_jobs(spark, tmp_path):
    """system.operations (ref system_tables.rs:465-559): compact and persist
    jobs appear with status/partition/chunks/wall-time, queryable via SQL."""
    from influxdb_iox_spark.plans.reorg import compact_chunks, persist_split

    store = TableStore(str(tmp_path / "ops"))
    for v in (1.0, 2.0):
        df = spark.createDataFrame(
            [("west", v, 100)], "region string, user double, time long"
        )
        store.write_chunk(df, "cpu", CPU, partition_key="p1")
    db = Database("db", store, spark)
    db.register_table("cpu", CPU)

    compact_chunks(spark, store, "cpu", CPU)
    persist_split(spark, store, "cpu", CPU, split_time_ns=50)

    ops = db.query(
        "SELECT job, status, table_name, partition_key, chunk_ids, wall_time_used "
        "FROM system_operations ORDER BY job"
    ).collect()
    assert [(o.job, o.status, o.table_name, o.partition_key) for o in ops] == [
        ("CompactChunks", "Complete", "cpu", "p1"),
        ("PersistChunks", "Complete", "cpu", "p1"),
    ]
    assert all(o.wall_time_used > 0 for o in ops)
    assert ops[0].chunk_ids == "0,1"


def test_register_views_cached_until_catalog_changes(spark, tmp_path):
    """View registration reuses the cached catalog version between queries
    and refreshes when a write changes the manifest."""
    from influxdb_iox_spark.database import _VIEW_REGISTRY

    store = TableStore(str(tmp_path / "cache"))
    df = spark.createDataFrame(
        [("west", 1.0, 100)], "region string, user double, time long"
    )
    store.write_chunk(df, "cpu", CPU)
    db = Database("db", store, spark)
    db.register_table("cpu", CPU)

    assert db.query("SELECT COUNT(*) AS n FROM cpu").collect()[0].n == 1
    v1 = _VIEW_REGISTRY[spark]
    db.query("SELECT 1")
    assert _VIEW_REGISTRY[spark] == v1  # no re-registration

    df2 = spark.createDataFrame(
        [("east", 2.0, 200)], "region string, user double, time long"
    )
    store.write_chunk(df2, "cpu", CPU)
    assert db.query("SELECT COUNT(*) AS n FROM cpu").collect()[0].n == 2
    assert _VIEW_REGISTRY[spark] != v1  # refreshed after the write


def test_two_databases_one_session_do_not_serve_stale_views(spark, tmp_path):
    """Temp views are session-global: after database B registers its 'cpu'
    view, database A's next query must re-register its own rather than
    silently reading B's data (the cache is keyed by session, not
    instance)."""
    dbs = []
    for name, val in (("a", 1.0), ("b", 2.0)):
        store = TableStore(str(tmp_path / name))
        df = spark.createDataFrame(
            [("west", val, 100)], "region string, user double, time long"
        )
        store.write_chunk(df, "cpu", CPU)
        db = Database(name, store, spark)
        db.register_table("cpu", CPU)
        dbs.append(db)
    a, b = dbs

    assert a.query("SELECT user FROM cpu").collect()[0].user == 1.0
    assert b.query("SELECT user FROM cpu").collect()[0].user == 2.0
    # the regression: A's catalog hasn't changed, but B overwrote the views
    assert a.query("SELECT user FROM cpu").collect()[0].user == 1.0


def test_system_chunk_columns(spark, tmp_path):
    """system.chunk_columns (ref system_tables.rs:373-461): one row per
    (chunk, column) with PK min/max stats and per-column compressed sizes
    from parquet footers."""
    store = TableStore(str(tmp_path / "cc"))
    df = spark.createDataFrame(
        [("west", 1.0, 100), ("east", 2.0, 200)],
        "region string, user double, time long",
    )
    store.write_chunk(df, "cpu", CPU, partition_key="p1")
    db = Database("db", store, spark)
    db.register_table("cpu", CPU)

    rows = db.query(
        "SELECT column_name, partition_key, row_count, min_value, max_value, "
        "estimated_bytes FROM system_chunk_columns ORDER BY column_name"
    ).collect()
    by_col = {r.column_name: r for r in rows}
    assert set(by_col) == {"region", "user", "time"}
    assert all(r.partition_key == "p1" and r.row_count == 2 for r in rows)
    assert all(r.estimated_bytes > 0 for r in rows)
    # every column carries manifest min/max (fields included, since the
    # field-stat pruning change records all-column stats)
    assert by_col["region"].min_value == "east" and by_col["region"].max_value == "west"
    assert by_col["time"].min_value == "100" and by_col["time"].max_value == "200"
    assert by_col["user"].min_value == "1.0" and by_col["user"].max_value == "2.0"


def test_system_chunks_estimated_bytes(spark, tmp_path):
    """system.chunks carries estimated_bytes (ChunkSummary; ref sql.rs:277
    selects it) recorded at write time from the chunk's parquet files."""
    store = TableStore(str(tmp_path / "eb"))
    df = spark.createDataFrame(
        [("west", 1.0, 100)], "region string, user double, time long"
    )
    store.write_chunk(df, "cpu", CPU)
    db = Database("db", store, spark)
    db.register_table("cpu", CPU)
    r = db.query(
        "SELECT estimated_bytes, row_count FROM system_chunks"
    ).collect()[0]
    assert r.estimated_bytes > 0 and r.row_count == 1
