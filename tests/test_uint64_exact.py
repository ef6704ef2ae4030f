"""UInt64 exactness mode: FIELD_UINTEGER → DecimalType(20,0).

The reference stores true u64 (internal_types/src/schema.rs:569-592);
Spark has no unsigned type, so the default mapping is LongType with a
documented wrap above 2^63.  ``IoxSchema.build(uint64_exact=True)`` maps
uinteger fields to DECIMAL(20,0) instead — the full [0, 2^64) domain
round-trips exactly through parse → chunk → scan → aggregate, on both
the vectorized fast parse tier and the exact per-line tier.
"""

from __future__ import annotations

from decimal import Decimal

import pytest

from influxdb_iox_spark.schema import (
    UINT64_EXACT_TYPE,
    UINT64_MAX,
    InfluxColumnType,
    IoxSchema,
)
from influxdb_iox_spark.sources.line_protocol import (
    LineProtocolError,
    distributed_parse,
)

U64_MAX = UINT64_MAX  # 18446744073709551615


@pytest.fixture()
def uschema():
    return IoxSchema.build(
        ["host"],
        {"counter": InfluxColumnType.FIELD_UINTEGER},
        uint64_exact=True,
    )


def _parse(spark, uschema, lines: list[str]):
    df = spark.createDataFrame([(ln,) for ln in lines], ["value"])
    return distributed_parse(df, uschema, "m", 0)


def test_schema_maps_uinteger_to_decimal(uschema):
    [counter] = [f for f in uschema.struct if f.name == "counter"]
    assert counter.dataType == UINT64_EXACT_TYPE
    # default mode unchanged: long with documented wrap
    default = IoxSchema.build(["host"], {"counter": InfluxColumnType.FIELD_UINTEGER})
    [c2] = [f for f in default.struct if f.name == "counter"]
    assert c2.dataType.typeName() == "long"


def test_u64_boundary_values_roundtrip_fast_tier(spark, uschema):
    """Escape-free lines take the vectorized tier; u64::MAX and 2^63
    (both unrepresentable in int64) come back exact."""
    rows = _parse(
        spark,
        uschema,
        [
            f"m,host=a counter={U64_MAX}u 100",
            f"m,host=b counter={2**63}u 200",
            "m,host=c counter=0u 300",
            "m,host=d counter=00000000000000000000007u 400",  # slow tier: >20 digits
        ],
    ).collect()
    got = {r.host: r.counter for r in rows}
    assert got == {
        "a": Decimal(U64_MAX),
        "b": Decimal(2**63),
        "c": Decimal(0),
        "d": Decimal(7),
    }


def test_u64_aggregation_is_exact(spark, uschema):
    """sum/min/max over values above 2^63 — exact decimal arithmetic,
    where double would lose low bits and long would overflow."""
    from pyspark.sql import functions as F

    df = _parse(
        spark,
        uschema,
        [
            f"m,host=a counter={U64_MAX}u 100",
            f"m,host=a counter={U64_MAX - 1}u 200",
        ],
    )
    row = df.agg(
        F.sum("counter").alias("s"),
        F.min("counter").alias("lo"),
        F.max("counter").alias("hi"),
    ).first()
    assert row.s == Decimal(2 * U64_MAX - 1)
    assert row.lo == Decimal(U64_MAX - 1)
    assert row.hi == Decimal(U64_MAX)


def test_out_of_domain_values_raise(spark, uschema):
    with pytest.raises(Exception, match="u64 range|uint"):
        _parse(spark, uschema, [f"m,host=a counter={2**64}u 100"]).collect()
    with pytest.raises(Exception, match="negative uint|uint"):
        _parse(spark, uschema, ["m,host=a counter=-5u 100"]).collect()


def test_u64_chunk_roundtrip(spark, uschema, tmp_path):
    """Full store path: write a chunk with u64-exact values, scan it back
    exactly (parquet decimal physical type carries the full domain)."""
    from influxdb_iox_spark.sources.store import TableStore

    store = TableStore(str(tmp_path / "store"))
    df = _parse(
        spark,
        uschema,
        [f"m,host=a counter={U64_MAX}u 100", f"m,host=b counter={2**63 + 5}u 200"],
    ).drop("__seq")
    store.write_chunk(df, "m", uschema)
    out = {r.host: r.counter for r in store.scan(spark, "m", uschema).collect()}
    assert out == {"a": Decimal(U64_MAX), "b": Decimal(2**63 + 5)}
