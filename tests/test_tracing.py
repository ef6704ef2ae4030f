"""Tracing spans + wire-context extraction (the repo's twin of the
reference's trogging/logfmt span plumbing, logfmt/src/lib.rs)."""

from __future__ import annotations

import urllib.request

from influxdb_iox_spark.tracing import (
    Span,
    current_trace_id,
    extract_trace_context,
)

TRACE = "4bf92f3577b34da6a3ce929d0e0e4736"
SPAN = "00f067aa0ba902b7"


def test_extract_w3c_traceparent():
    h = {"traceparent": f"00-{TRACE}-{SPAN}-01"}
    assert extract_trace_context(h) == (TRACE, SPAN)


def test_extract_jaeger_uber_trace_id():
    h = {"uber-trace-id": "ABC123:DEF456:0:1"}
    assert extract_trace_context(h) == ("abc123", "def456")


def test_extract_rejects_garbage():
    for bad in (
        {},
        {"traceparent": "nope"},
        {"traceparent": "00-zz-xx-01"},
        {"traceparent": f"00-{'0' * 32}-{SPAN}-01"},  # all-zero trace id
        {"uber-trace-id": "0:0:0:0"},
        {"uber-trace-id": "onlyonepart"},
    ):
        assert extract_trace_context(bad) is None, bad


def test_span_nesting_and_emission():
    lines: list[str] = []
    with Span("parent", log=lines.append) as p:
        assert current_trace_id() == p.trace_id
        with Span("child", log=lines.append) as c:
            assert c.trace_id == p.trace_id
            assert c.parent_id == p.span_id
    assert current_trace_id() is None
    # child emitted first (exits first), both carry the same trace
    assert "name=child" in lines[0] and "name=parent" in lines[1]
    assert all(f"trace_id={p.trace_id}" in ln for ln in lines)
    assert "status=ok" in lines[0]


def test_span_error_status():
    lines: list[str] = []
    try:
        with Span("boom", log=lines.append):
            raise RuntimeError("x")
    except RuntimeError:
        pass
    assert "status=error" in lines[0]


def test_wire_context_flows_into_span():
    lines: list[str] = []
    with Span("rooted", trace_id=TRACE, parent_id=SPAN, log=lines.append):
        pass
    assert f"trace_id={TRACE}" in lines[0]
    assert f"parent_id={SPAN}" in lines[0]


def test_http_query_carries_trace_id(spark, tmp_path):
    """A traceparent header on /query flows into the span AND the
    tracker's query_end line (shared trace id = correlated logs)."""
    import logging

    from influxdb_iox_spark.database import Database
    from influxdb_iox_spark.http_api import IoxHttpServer
    from influxdb_iox_spark.schema import InfluxColumnType, IoxSchema
    from influxdb_iox_spark.sources.store import TableStore

    records: list[str] = []

    class _Cap(logging.Handler):
        def emit(self, rec):
            records.append(rec.getMessage())

    h = _Cap()
    for lname in ("influxdb_iox_spark.query", "influxdb_iox_spark.trace"):
        lg = logging.getLogger(lname)
        lg.addHandler(h)
        lg.setLevel(logging.INFO)
    try:
        cpu = IoxSchema.build(
            ["region"], {"user": InfluxColumnType.FIELD_FLOAT}
        )
        store = TableStore(str(tmp_path / "trace_store"))
        db = Database("db0", store, spark)
        db.register_table("cpu", cpu)
        store.write_chunk(
            spark.createDataFrame(
                [("west", 1.0, 100)], "region string, user double, time long"
            ),
            "cpu", cpu, partition_key="p",
        )
        api = IoxHttpServer(db, {}, db_name="db0")
        port = api.start()
        try:
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/query?q=SELECT+user+FROM+cpu&db=db0",
                headers={"traceparent": f"00-{TRACE}-{SPAN}-01"},
            )
            with urllib.request.urlopen(req, timeout=120) as r:
                assert r.status == 200
        finally:
            api.stop()
        spans = [r for r in records if "event=span" in r]
        ends = [r for r in records if "event=query_end" in r]
        assert spans and f"trace_id={TRACE}" in spans[-1]
        assert f"parent_id={SPAN}" in spans[-1]
        assert "name=http_query_get" in spans[-1]
        assert ends and f"trace_id={TRACE}" in ends[-1]
    finally:
        for lname in ("influxdb_iox_spark.query", "influxdb_iox_spark.trace"):
            logging.getLogger(lname).removeHandler(h)
