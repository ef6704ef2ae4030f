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
    assert {"cpu", "system_chunks", "system_columns"} <= tables

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
