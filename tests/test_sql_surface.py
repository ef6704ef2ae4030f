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


# -- information_schema goldens (sql.rs:183-235 + all_chunks_dropped) --------


def _two_measurements_many_fields(spark, tmp_path):
    """TwoMeasurementsManyFields (scenarios.rs:345-358): h2o + o2 with the
    reference's exact line protocol across two chunks."""
    from influxdb_iox_spark.streaming.ingest import LineProtocolIngest

    store = TableStore(str(tmp_path / "tmmf"))
    db = Database("db", store, spark)
    h2o = IoxSchema.build(
        ["state", "city"],
        {
            "temp": InfluxColumnType.FIELD_FLOAT,
            "other_temp": InfluxColumnType.FIELD_FLOAT,
            "moisture": InfluxColumnType.FIELD_FLOAT,
        },
    )
    o2 = IoxSchema.build(
        ["state", "city"],
        {
            "temp": InfluxColumnType.FIELD_FLOAT,
            "reading": InfluxColumnType.FIELD_FLOAT,
        },
    )
    db.register_table("h2o", h2o)
    db.register_table("o2", o2)
    lines1 = [
        "h2o,state=MA,city=Boston temp=70.4 50",
        "h2o,state=MA,city=Boston other_temp=70.4 250",
        "h2o,state=CA,city=Boston other_temp=72.4 350",
    ]
    lines2 = [
        "o2,state=MA,city=Boston temp=53.4,reading=51 50",
        "o2,state=CA temp=79.0 300",
    ]
    lines3 = ["h2o,state=MA,city=Boston temp=70.4,moisture=43.0 100000"]
    ih, io = LineProtocolIngest(store, "h2o", h2o), LineProtocolIngest(store, "o2", o2)
    for ing, lines in ((ih, lines1), (io, lines2), (ih, lines3)):
        ing.ingest_lines_df(spark.createDataFrame([(ln,) for ln in lines], ["value"]))
    return db


def test_information_schema_tables_golden(spark, tmp_path):
    """sql_select_from_information_schema_tables (sql.rs:183-207): the
    catalog lists user tables (iox), system tables, and the
    information_schema views — value-exact rows."""
    db = _two_measurements_many_fields(spark, tmp_path)
    rows = {
        tuple(r)
        for r in db.query(
            "SELECT * FROM information_schema_tables ORDER BY table_schema, table_name"
        ).collect()
    }
    assert rows == {
        ("public", "information_schema", "columns", "VIEW"),
        ("public", "information_schema", "tables", "VIEW"),
        ("public", "iox", "h2o", "BASE TABLE"),
        ("public", "iox", "o2", "BASE TABLE"),
        ("public", "system", "chunk_columns", "BASE TABLE"),
        ("public", "system", "chunks", "BASE TABLE"),
        ("public", "system", "columns", "BASE TABLE"),
        ("public", "system", "operations", "BASE TABLE"),
    }


def test_information_schema_columns_golden(spark, tmp_path):
    """sql_select_from_information_schema_columns (sql.rs:209-235):
    columns in canonical order with the reference's Arrow type renderings
    — tags as Dictionary(Int32, Utf8), floats as Float64, time as
    non-nullable Timestamp(Nanosecond, None)."""
    db = _two_measurements_many_fields(spark, tmp_path)
    got = [
        tuple(r)
        for r in db.query(
            "SELECT table_name, column_name, ordinal_position, is_nullable, data_type "
            "FROM information_schema_columns "
            "WHERE table_name = 'h2o' OR table_name = 'o2' "
            "ORDER BY table_name, ordinal_position"
        ).collect()
    ]
    assert got == [
        ("h2o", "city", 0, "YES", "Dictionary(Int32, Utf8)"),
        ("h2o", "moisture", 1, "YES", "Float64"),
        ("h2o", "other_temp", 2, "YES", "Float64"),
        ("h2o", "state", 3, "YES", "Dictionary(Int32, Utf8)"),
        ("h2o", "temp", 4, "YES", "Float64"),
        ("h2o", "time", 5, "NO", "Timestamp(Nanosecond, None)"),
        ("o2", "city", 0, "YES", "Dictionary(Int32, Utf8)"),
        ("o2", "reading", 1, "YES", "Float64"),
        ("o2", "state", 2, "YES", "Dictionary(Int32, Utf8)"),
        ("o2", "temp", 3, "YES", "Float64"),
        ("o2", "time", 4, "NO", "Timestamp(Nanosecond, None)"),
    ]


def test_all_chunks_dropped_keeps_table(spark, tmp_path):
    """all_chunks_dropped.sql golden (OneMeasurementAllChunksDropped,
    scenarios.rs:680-701): dropping EVERY chunk keeps the table — it
    still lists in information_schema.tables and queries as an empty
    relation with its full schema."""
    from influxdb_iox_spark.streaming.ingest import LineProtocolIngest

    store = TableStore(str(tmp_path / "acd"))
    db = Database("db", store, spark)
    h2o = IoxSchema.build(["state"], {"temp": InfluxColumnType.FIELD_FLOAT})
    db.register_table("h2o", h2o)
    ing = LineProtocolIngest(store, "h2o", h2o)
    ing.ingest_lines_df(
        spark.createDataFrame([("h2o,state=MA temp=70.4 50",)], ["value"])
    )
    store.drop_chunks("h2o", [c.chunk_id for c in store.manifest("h2o")])

    names = {
        (r.table_schema, r.table_name)
        for r in db.query("SELECT * FROM information_schema_tables").collect()
    }
    assert ("iox", "h2o") in names
    empty = db.query("SELECT * FROM h2o")
    assert empty.count() == 0
    assert sorted(empty.columns) == ["state", "temp", "time"]
