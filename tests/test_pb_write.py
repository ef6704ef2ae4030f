"""PB columnar write path (write_pb.rs / influxdata.transfer.column.v1)
and the IOxTesting service.

The bridge ports entry.rs pb_to_entry semantics: pb_check_table_batch
validation messages byte-for-byte, MSB-first null masks, values arrays
holding only non-null entries, missing trailing values repeating the
last value."""

from __future__ import annotations

import pytest

from influxdb_iox_spark.entry_fb import EntryError, pb_batch_to_parsed_lines


def _col(name, sem, null_mask=b"", **values):
    return {
        "column_name": name,
        "semantic_type": sem,
        "values": values,
        "null_mask": null_mask,
    }


TAG, FIELD, TIME, IOX = 2, 3, 4, 1


def _lp_batch(**over):
    batch = {
        "table_name": "cpu",
        "row_count": 3,
        "columns": [
            # row 1's region is null: MSB-first mask, bit 128>>1
            _col("region", TAG, null_mask=b"\x40",
                 string_values=["west", "east"]),
            _col("user", FIELD, f64_values=[1.5, 2.5, 3.5]),
            _col("time", TIME, i64_values=[100, 200, 300]),
        ],
    }
    batch.update(over)
    return batch


def test_pb_bridge_lp_set_with_nulls():
    lines = list(pb_batch_to_parsed_lines({"table_batches": [_lp_batch()]}))
    assert [pl.timestamp for pl in lines] == [100, 200, 300]
    assert lines[0].tags == {"region": "west"}
    assert lines[1].tags == {}  # masked null
    assert lines[2].tags == {"region": "east"}
    assert lines[1].fields == {"user": 2.5}
    assert all(pl.measurement == "cpu" for pl in lines)


def test_pb_missing_trailing_values_repeat_last():
    """entry.rs:452 missing_values padding: rows beyond mask+values get
    the LAST value, not null."""
    batch = _lp_batch(columns=[
        _col("user", FIELD, f64_values=[1.5, 2.5]),  # 3 rows, 2 values
        _col("time", TIME, i64_values=[100, 200, 300]),
    ])
    lines = list(pb_batch_to_parsed_lines({"table_batches": [batch]}))
    assert [pl.fields["user"] for pl in lines] == [1.5, 2.5, 2.5]


@pytest.mark.parametrize(
    "columns,msg",
    [
        ([_col("user", FIELD, f64_values=[1.0])],
         "line protocol field column requires time column named 'time'"),
        ([_col("region", TAG, string_values=["w"])],
         "line protocol tag column requires at least one line protocol "
         "field column"),
        ([_col("native", IOX, i64_values=[1]),
          _col("region", TAG, string_values=["w"])],
         "IOx column incompatible with line protocol tag column"),
        ([_col("native", IOX, i64_values=[1]),
          _col("user", FIELD, f64_values=[1.0])],
         "IOx column incompatible with line protocol field column"),
        ([_col("user", FIELD, f64_values=[1.0]),
          _col("t2", TIME, i64_values=[5])],
         "line protocol field column incompatible with time column not "
         "named 'time'"),
    ],
)
def test_pb_validation_messages(columns, msg):
    batch = {"table_name": "t", "row_count": 1, "columns": columns}
    with pytest.raises(EntryError, match=msg.replace("(", "\\(")):
        list(pb_batch_to_parsed_lines({"table_batches": [batch]}))


def test_pb_only_null_column_rejected():
    batch = {
        "table_name": "t",
        "row_count": 1,
        "columns": [
            _col("user", FIELD, null_mask=b"\x80"),
            _col("time", TIME, i64_values=[1]),
        ],
    }
    with pytest.raises(EntryError, match="contains only null values"):
        list(pb_batch_to_parsed_lines({"table_batches": [batch]}))


def test_pb_tag_with_numeric_values_rejected():
    batch = {
        "table_name": "t",
        "row_count": 1,
        "columns": [
            _col("region", TAG, i64_values=[7]),
            _col("user", FIELD, f64_values=[1.0]),
            _col("time", TIME, i64_values=[1]),
        ],
    }
    with pytest.raises(EntryError, match="invalid semantic type"):
        list(pb_batch_to_parsed_lines({"table_batches": [batch]}))


def test_pb_u64_above_int64_rejected():
    batch = {
        "table_name": "t",
        "row_count": 1,
        "columns": [
            _col("big", FIELD, u64_values=[2**63]),
            _col("time", TIME, i64_values=[1]),
        ],
    }
    with pytest.raises(EntryError, match="u64 values above int64 range"):
        list(pb_batch_to_parsed_lines({"table_batches": [batch]}))


def test_pb_iox_set_time_under_other_name_becomes_field():
    batch = {
        "table_name": "t",
        "row_count": 1,
        "columns": [
            _col("native", IOX, i64_values=[7]),
            _col("created", TIME, i64_values=[400]),
        ],
    }
    (pl,) = pb_batch_to_parsed_lines({"table_batches": [batch]})
    assert pl.fields == {"native": 7, "created": 400}
    assert pl.timestamp is None


# -- wire + service end-to-end ----------------------------------------------


@pytest.fixture(scope="module")
def h2_server(spark, tmp_path_factory):
    from influxdb_iox_spark.rpc_h2 import GrpcH2Client, GrpcH2Server
    from influxdb_iox_spark.rpc_management import IoxServer

    iox = IoxServer(spark, str(tmp_path_factory.mktemp("pbsrv")))
    srv = GrpcH2Server(iox)
    client = GrpcH2Client(srv.port)
    yield iox, srv, client
    client.close()
    srv.shutdown()


PBWRITE = "influxdata.transfer.column.v1.WriteService"
TESTING = "influxdata.platform.storage.IOxTesting"


def test_pb_write_end_to_end_over_h2(h2_server):
    from influxdb_iox_spark import management_proto as mp

    iox, srv, c = h2_server
    c.call(
        f"/influxdata.iox.management.v1.ManagementService/CreateDatabase",
        {"rules": {"name": "pbdb", "partition_template": {"parts": [{"table": {}}]}}},
        mp.CREATE_DATABASE_REQUEST,
        mp.CREATE_DATABASE_RESPONSE,
    )
    req = {"database_batch": {
        "database_name": "pbdb",
        "table_batches": [_lp_batch()],
    }}
    out = c.call(f"/{PBWRITE}/Write", req, mp.PB_WRITE_REQUEST, mp.PB_WRITE_RESPONSE)
    assert out == {}
    rows = iox.databases["pbdb"].database.table("cpu").orderBy("time").collect()
    assert [r.time for r in rows] == [100, 200, 300]
    assert [r.region for r in rows] == ["west", None, "east"]
    assert [r.user for r in rows] == [1.5, 2.5, 3.5]


def test_pb_write_requires_database_batch(h2_server):
    from influxdb_iox_spark.rpc_h2 import GRPC_STATUS

    _, _, c = h2_server
    msgs, trailers = c.call_raw(f"/{PBWRITE}/Write", b"")
    assert msgs == []
    assert int(trailers["grpc-status"]) == GRPC_STATUS["InvalidArgument"]
    assert "database_batch" in trailers["grpc-message"]


def test_pb_write_round_trips_the_wire_schema():
    """encode_message/decode_message are inverses on a full WriteRequest
    (packed repeated scalars + strings + mask bytes)."""
    from influxdb_iox_spark import management_proto as mp
    from influxdb_iox_spark.protowire import decode_message, encode_message

    req = {"database_batch": {
        "database_name": "db",
        "table_batches": [_lp_batch()],
    }}
    back = decode_message(encode_message(req, mp.PB_WRITE_REQUEST), mp.PB_WRITE_REQUEST)
    tb = back["database_batch"]["table_batches"][0]
    assert tb["row_count"] == 3
    by_name = {c["column_name"]: c for c in tb["columns"]}
    assert by_name["user"]["values"]["f64_values"] == [1.5, 2.5, 3.5]
    assert bytes(by_name["region"]["null_mask"]) == b"\x40"
    assert by_name["time"]["values"]["i64_values"] == [100, 200, 300]


def test_testing_service_test_error(h2_server):
    from influxdb_iox_spark.rpc_h2 import GRPC_STATUS

    _, _, c = h2_server
    msgs, trailers = c.call_raw(f"/{TESTING}/TestError", b"")
    assert msgs == []
    assert int(trailers["grpc-status"]) == GRPC_STATUS["Internal"]
    assert "This is a test panic" in trailers["grpc-message"]


def test_pb_wire_round_trip_property():
    """Hypothesis: encode/decode are inverses over arbitrary well-formed
    DatabaseBatch messages (all six value kinds, masks, multiple tables)."""
    from hypothesis import given, settings, strategies as st

    from influxdb_iox_spark import management_proto as mp
    from influxdb_iox_spark.protowire import decode_message, encode_message

    name = st.text(
        alphabet=st.characters(exclude_categories=("Cs",)), max_size=12
    )
    values = st.fixed_dictionaries(
        {},
        optional={
            "i64_values": st.lists(st.integers(-(2**63), 2**63 - 1), max_size=4),
            "f64_values": st.lists(
                st.floats(allow_nan=False, width=64), max_size=4
            ),
            "u64_values": st.lists(st.integers(0, 2**64 - 1), max_size=4),
            "string_values": st.lists(name, max_size=4),
            "bool_values": st.lists(st.booleans(), max_size=4),
            "bytes_values": st.lists(st.binary(max_size=6), max_size=3),
        },
    )
    column = st.fixed_dictionaries(
        {
            "column_name": name,
            "semantic_type": st.integers(0, 4),
            "values": values,
            "null_mask": st.binary(max_size=4),
        }
    )
    batch = st.fixed_dictionaries(
        {
            "database_name": name,
            "table_batches": st.lists(
                st.fixed_dictionaries(
                    {
                        "table_name": name,
                        "columns": st.lists(column, max_size=3),
                        "row_count": st.integers(0, 2**32 - 1),
                    }
                ),
                max_size=2,
            ),
        }
    )

    def norm(v):
        # decode fills proto3 defaults; compare only fields the input set
        # to non-default values
        if isinstance(v, dict):
            out = {}
            for k, x in v.items():
                nx = norm(x)
                if nx in ([], "", b"", 0, {}, None, False):
                    continue
                out[k] = nx
            return out
        if isinstance(v, list):
            return [norm(x) for x in v]
        if isinstance(v, (bytes, bytearray)):
            return bytes(v)
        return v

    @settings(max_examples=200, deadline=None)
    @given(req=st.fixed_dictionaries({"database_batch": batch}))
    def check(req):
        back = decode_message(
            encode_message(req, mp.PB_WRITE_REQUEST), mp.PB_WRITE_REQUEST
        )
        assert norm(back) == norm(req)

    check()
