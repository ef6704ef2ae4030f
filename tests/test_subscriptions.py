"""Subscriptions: statement surface + REAL best-effort write forwarding
between two live servers (stock 1.x subscription semantics; the v0
reference fans out via the Kafka write buffer instead — subscriptions.py
docstring)."""

from __future__ import annotations

import json
import time
import urllib.parse
import urllib.request

import pytest

from influxdb_iox_spark.influxql.ast_nodes import (
    CreateSubscription,
    DropSubscription,
)
from influxdb_iox_spark.influxql.parser import InfluxQLParseError, parse
from influxdb_iox_spark.subscriptions import SubscriptionRegistry


def test_parse_subscription_statements():
    s = parse(
        "CREATE SUBSCRIPTION \"sub0\" ON db0.autogen "
        "DESTINATIONS ALL 'http://h1:9092', 'http://h2:9092'"
    )
    assert s == CreateSubscription(
        "sub0", "db0", "autogen", "ALL",
        ("http://h1:9092", "http://h2:9092"),
    )
    s = parse('CREATE SUBSCRIPTION sub1 ON "db0"."autogen" '
              "DESTINATIONS ANY 'http://h:1'")
    assert s.mode == "ANY" and s.db == "db0" and s.rp == "autogen"
    assert parse('DROP SUBSCRIPTION sub0 ON db0.autogen') == (
        DropSubscription("sub0", "db0", "autogen")
    )
    with pytest.raises(InfluxQLParseError):
        parse("CREATE SUBSCRIPTION s ON db0.autogen DESTINATIONS SOME 'x'")
    s = parse("SHOW SUBSCRIPTIONS")
    assert s.what == "subscriptions"


def test_registry_validation():
    reg = SubscriptionRegistry()
    with pytest.raises(ValueError):
        reg.create("s", "db", "rp", "ALL", ["udp://h:1"])  # http(s) only
    with pytest.raises(ValueError):
        reg.create("s", "db", "rp", "ALL", [])
    reg.create("s", "db", "rp", "ANY", ["http://h:1", "http://h:2"])
    with pytest.raises(ValueError):
        reg.create("s", "db", "rp", "ALL", ["http://h:3"])  # duplicate
    assert reg.list_rows() == {
        "db": [["rp", "s", "ANY", ["http://h:1", "http://h:2"]]]
    }
    reg.drop("s", "db", "rp")
    with pytest.raises(ValueError):
        reg.drop("s", "db", "rp")
    reg.stop()


def _mk_server(spark, path, db_name):
    from influxdb_iox_spark.database import Database
    from influxdb_iox_spark.http_api import IoxHttpServer
    from influxdb_iox_spark.schema import InfluxColumnType, IoxSchema
    from influxdb_iox_spark.sources.store import TableStore
    from influxdb_iox_spark.streaming.ingest import LineProtocolIngest

    cpu = IoxSchema.build(["region"], {"user": InfluxColumnType.FIELD_FLOAT})
    store = TableStore(str(path))
    db = Database(db_name, store, spark)
    db.register_table("cpu", cpu)
    ing = LineProtocolIngest(store, "cpu", cpu)
    api = IoxHttpServer(db, {"cpu": ing}, db_name=db_name)
    port = api.start()
    return api, db, f"http://127.0.0.1:{port}"


def _post_query(base, q, **params):
    data = urllib.parse.urlencode({"q": q, **params}).encode()
    req = urllib.request.Request(f"{base}/query", data=data)
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def test_write_forwarding_between_servers(spark, tmp_path):
    pub_api, _, pub = _mk_server(spark, tmp_path / "pub", "db0")
    sub_api, sub_db, sub = _mk_server(spark, tmp_path / "sub", "db0")
    try:
        env = _post_query(
            pub,
            f"CREATE SUBSCRIPTION mirror ON db0.autogen "
            f"DESTINATIONS ALL '{sub}'",
        )
        assert "error" not in env["results"][0]
        env = _post_query(pub, "SHOW SUBSCRIPTIONS")
        series = env["results"][0]["series"]
        assert series[0]["name"] == "db0"
        assert series[0]["values"][0][:3] == ["autogen", "mirror", "ALL"]

        # a write accepted by the publisher lands on the subscriber
        lines = b"cpu,region=west user=1.5 100000000000"
        req = urllib.request.Request(f"{pub}/write?db=db0", data=lines)
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.status == 204
        deadline = time.monotonic() + 60
        rows = []
        while time.monotonic() < deadline:
            rows = sub_db.table("cpu").collect()
            if rows:
                break
            time.sleep(0.25)
        assert [(r["region"], r["user"], r["time"]) for r in rows] == [
            ("west", 1.5, 100000000000)
        ]
        assert pub_api.subscriptions.metrics[
            "subscriptions_forwarded_total"
        ] == 1

        # dropped subscription stops forwarding
        _post_query(pub, "DROP SUBSCRIPTION mirror ON db0.autogen")
        req = urllib.request.Request(f"{pub}/write?db=db0", data=b"cpu,region=east user=2.0 200000000000")
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.status == 204
        assert pub_api.subscriptions.flush(30)
        assert sub_db.table("cpu").count() == 1
    finally:
        pub_api.stop()
        sub_api.stop()


def test_unreachable_destination_never_fails_the_write(spark, tmp_path):
    pub_api, pub_db, pub = _mk_server(spark, tmp_path / "pub2", "db0")
    try:
        _post_query(
            pub,
            "CREATE SUBSCRIPTION dead ON db0.autogen "
            "DESTINATIONS ALL 'http://127.0.0.1:1'",
        )
        lines = b"cpu,region=west user=1.0 100"
        req = urllib.request.Request(f"{pub}/write?db=db0", data=lines)
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.status == 204  # writer never sees subscriber failures
        assert pub_db.table("cpu").count() == 1
        assert pub_api.subscriptions.flush(30)
        deadline = time.monotonic() + 30
        while time.monotonic() < deadline:
            if pub_api.subscriptions.metrics["subscriptions_errors_total"]:
                break
            time.sleep(0.1)
        assert pub_api.subscriptions.metrics["subscriptions_errors_total"] >= 1
    finally:
        pub_api.stop()


def test_show_stats_includes_subscriber_and_query_executor(spark, tmp_path):
    pub_api, _, pub = _mk_server(spark, tmp_path / "pub3", "db0")
    try:
        env = _post_query(pub, "SHOW STATS")
        names = {s["name"] for s in env["results"][0]["series"]}
        assert {"subscriber", "queryExecutor"} <= names
        env = _post_query(pub, "SHOW STATS FOR 'subscriber'")
        (s,) = env["results"][0]["series"]
        assert s["columns"] == [
            "pointsForwarded", "writeFailures", "pointsDropped",
        ]
        # the queryExecutor row counts THIS request as active
        env = _post_query(pub, "SHOW STATS FOR 'queryExecutor'")
        (s,) = env["results"][0]["series"]
        assert s["values"][0][0] >= 1
    finally:
        pub_api.stop()
