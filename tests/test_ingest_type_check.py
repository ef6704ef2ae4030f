"""Write-time type rejection (entry.rs:32-44 TableColumnTypeMismatch)."""

from __future__ import annotations

import pytest

from influxdb_iox_spark.schema import InfluxColumnType, IoxSchema
from influxdb_iox_spark.sources.line_protocol import distributed_parse

CPU = IoxSchema.build(["region"], {"user": InfluxColumnType.FIELD_FLOAT})


def _parse(spark, lines):
    df = spark.createDataFrame([(l,) for l in lines], "value string")
    return distributed_parse(df, CPU, "cpu", 0)


def test_good_lines_parse(spark):
    out = _parse(spark, ["cpu,region=west user=1.5 100"]).collect()
    assert [(r.region, r.user, r.time) for r in out] == [("west", 1.5, 100)]


def test_string_into_float_field_rejected(spark):
    with pytest.raises(Exception) as ei:
        _parse(spark, ['cpu,region=west user="not a number" 100']).collect()
    assert "type mismatch" in str(ei.value)


def test_bool_into_float_field_rejected(spark):
    with pytest.raises(Exception) as ei:
        _parse(spark, ["cpu,region=west user=true 100"]).collect()
    assert "type mismatch" in str(ei.value)


def test_unknown_column_rejected(spark):
    with pytest.raises(Exception) as ei:
        _parse(spark, ["cpu,region=west mystery=1.0 100"]).collect()
    assert "unknown column" in str(ei.value)


def test_int_into_float_field_accepted(spark):
    # line-protocol ints are valid float-field values (widening)
    out = _parse(spark, ["cpu,region=west user=2i 100"]).collect()
    assert out[0].user == 2.0
