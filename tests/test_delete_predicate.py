"""Predicate deletes (tombstones): parse → register → scan anti-filter →
compaction fold → GC, plus the WriteEntry and HTTP wire paths.

Reference: entry/src/entry.fbs:18-44 declares per-table
Delete{table_name, predicate} operations (v0 never executes them); the
execution here follows the tombstone design — deletes are metadata,
data files stay immutable, compaction folds them physically.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from influxdb_iox_spark.database import Database
from influxdb_iox_spark.plans.predicate import DeleteExpr, DeletePredicate
from influxdb_iox_spark.schema import InfluxColumnType, IoxSchema
from influxdb_iox_spark.sources.store import TableStore

CPU = IoxSchema.build(["host"], {"usage": InfluxColumnType.FIELD_FLOAT})
S = 1_000_000_000


# -- parsing -----------------------------------------------------------------


def test_parse_influx2_grammar():
    dp = DeletePredicate.parse(
        """host = 'h1' AND "region" != "west" AND n = 3 AND f = 1.5 AND b = true""",
        start=10,
        stop=20,
    )
    assert (dp.start, dp.stop) == (10, 20)
    assert dp.exprs == [
        DeleteExpr("host", "=", "h1"),
        DeleteExpr("region", "!=", "west"),
        DeleteExpr("n", "=", 3),
        DeleteExpr("f", "=", 1.5),
        DeleteExpr("b", "=", True),
    ]


def test_parse_json_and_roundtrip():
    dp = DeletePredicate(start=5, stop=50, exprs=[DeleteExpr("host", "=", "h1")])
    assert DeletePredicate.parse(json.dumps(dp.to_dict())) == dp
    assert DeletePredicate.from_dict(dp.to_dict()) == dp


def test_parse_rejects_garbage_and_empty():
    with pytest.raises(ValueError, match="cannot parse"):
        DeletePredicate.parse("host > 'h1'", start=0, stop=1)
    with pytest.raises(ValueError, match="empty delete predicate"):
        DeletePredicate.parse("")
    with pytest.raises(ValueError, match="op must be"):
        DeleteExpr("c", ">", 1)


# -- store semantics ---------------------------------------------------------


def _df(spark, rows):
    return spark.createDataFrame(rows, "host string, usage double, time long")


def _scan(spark, store):
    return sorted(
        (r.host, r.usage, r.time) for r in store.scan(spark, "cpu", CPU).collect()
    )


def test_scan_applies_tombstone_anti_filter(spark, tmp_path):
    store = TableStore(str(tmp_path / "d"))
    store.write_chunk(
        _df(spark, [("h1", 1.0, 10), ("h1", 2.0, 20), ("h2", 3.0, 20)]), "cpu", CPU
    )
    store.delete_predicate(
        "cpu", DeletePredicate(start=15, stop=25, exprs=[DeleteExpr("host", "=", "h1")])
    )
    # only (h1, t=20) matches BOTH the range and the tag conjunct
    assert _scan(spark, store) == [("h1", 1.0, 10), ("h2", 3.0, 20)]


def test_tombstone_scopes_to_snapshot_chunks(spark, tmp_path):
    """A row re-inserted AFTER the delete is visible: the tombstone
    binds to the chunks registered when it was created (sequence
    semantics at chunk granularity)."""
    store = TableStore(str(tmp_path / "d"))
    store.write_chunk(_df(spark, [("h1", 1.0, 10)]), "cpu", CPU)
    store.delete_predicate("cpu", DeletePredicate(exprs=[DeleteExpr("host", "=", "h1")]))
    assert _scan(spark, store) == []
    store.write_chunk(_df(spark, [("h1", 9.0, 10)]), "cpu", CPU)
    assert _scan(spark, store) == [("h1", 9.0, 10)]


def test_delete_applies_before_dedup_not_after(spark, tmp_path):
    """The anti-filter runs PER CHUNK before the last-non-null merge.
    Chunk A holds (h1, usage=1.0, t=10); the tombstone (created before B
    existed) targets only A; chunk B overlays (h1, usage=NULL, t=10).

    - pre-dedup (correct): A's row is gone, so the merge sees only B's
      null-usage row → the output row EXISTS with usage NULL.
    - post-dedup (wrong): the merged row (usage=1.0, host=h1) would
      match host='h1' and vanish entirely.
    """
    store = TableStore(str(tmp_path / "d"))
    store.write_chunk(_df(spark, [("h1", 1.0, 10)]), "cpu", CPU)
    store.delete_predicate(
        "cpu", DeletePredicate(exprs=[DeleteExpr("host", "=", "h1")])
    )
    store.write_chunk(_df(spark, [("h1", None, 10)]), "cpu", CPU)
    assert _scan(spark, store) == [("h1", None, 10)]


def test_null_tag_never_matches_delete(spark, tmp_path):
    """NULL tags match neither = nor != (the delete/keep partition must
    be exact); a NULL-host row survives any host-conjunct delete."""
    store = TableStore(str(tmp_path / "d"))
    store.write_chunk(
        _df(spark, [(None, 1.0, 10), ("h1", 2.0, 10)]), "cpu", CPU
    )
    store.delete_predicate("cpu", DeletePredicate(exprs=[DeleteExpr("host", "!=", "zzz")]))
    assert _scan(spark, store) == [(None, 1.0, 10)]


def test_compaction_folds_tombstones_physically(spark, tmp_path):
    from influxdb_iox_spark.plans.reorg import compact_chunks

    store = TableStore(str(tmp_path / "d"))
    store.write_chunk(_df(spark, [("h1", 1.0, 10), ("h2", 2.0, 10)]), "cpu", CPU)
    store.write_chunk(_df(spark, [("h1", 5.0, 10), ("h3", 3.0, 30)]), "cpu", CPU)
    store.delete_predicate("cpu", DeletePredicate(exprs=[DeleteExpr("host", "=", "h1")]))
    assert _scan(spark, store) == [("h2", 2.0, 10), ("h3", 3.0, 30)]
    meta = compact_chunks(spark, store, "cpu", CPU)
    # the compacted chunk physically lacks h1's rows
    raw = spark.read.parquet(f"{store.base_dir}/{meta.path}")
    assert sorted((r.host, r.time) for r in raw.collect()) == [("h2", 10), ("h3", 30)]
    # every snapshot chunk is gone -> the tombstone was GC'd
    assert store.tombstones("cpu") == []
    assert _scan(spark, store) == [("h2", 2.0, 10), ("h3", 3.0, 30)]


def test_persist_split_folds_tombstones(spark, tmp_path):
    from influxdb_iox_spark.plans.reorg import persist_split

    store = TableStore(str(tmp_path / "d"))
    store.write_chunk(
        _df(spark, [("h1", 1.0, 10), ("h2", 2.0, 90)]), "cpu", CPU
    )
    store.delete_predicate("cpu", DeletePredicate(exprs=[DeleteExpr("host", "=", "h1")]))
    cold, hot = persist_split(spark, store, "cpu", CPU, split_time_ns=50)
    assert cold is None  # the only cold row (h1@10) was tombstoned
    raw = spark.read.parquet(f"{store.base_dir}/{hot.path}")
    assert [(r.host, r.time) for r in raw.collect()] == [("h2", 90)]
    assert store.tombstones("cpu") == []


def test_multiple_tombstones_and_gc_partial(spark, tmp_path):
    store = TableStore(str(tmp_path / "d"))
    a = store.write_chunk(_df(spark, [("h1", 1.0, 10)]), "cpu", CPU)
    store.delete_predicate("cpu", DeletePredicate(exprs=[DeleteExpr("host", "=", "h1")]))
    b = store.write_chunk(_df(spark, [("h2", 2.0, 20)]), "cpu", CPU)
    store.delete_predicate("cpu", DeletePredicate(exprs=[DeleteExpr("host", "=", "h2")]))
    assert len(store.tombstones("cpu")) == 2
    assert _scan(spark, store) == []
    # drop only chunk a: tombstone 1's snapshot is dead, tombstone 2's
    # (which includes a AND b) still has b live
    store.drop_chunks("cpu", [a.chunk_id])
    assert store.gc_tombstones("cpu") == 1
    assert len(store.tombstones("cpu")) == 1


def test_metadata_fast_paths_respect_tombstones(spark, tmp_path):
    """Deletes must be visible through the METADATA ops, not just scans:
    the write-time tag catalogs of tombstone-targeted chunks cannot
    answer (the deleted rows' values would leak), so both fast paths
    fall back to the tombstone-filtered scan."""
    from influxdb_iox_spark.database import Database
    from influxdb_iox_spark.operators import metadata as md

    store = TableStore(str(tmp_path / "d"))
    db = Database("db", store, spark)
    db.register_table("cpu", CPU)
    store.write_chunk(
        _df(spark, [("h1", 1.0, 10), ("h2", 2.0, 20)]), "cpu", CPU
    )
    assert store.catalog_tag_values("cpu", "host") == ["h1", "h2"]
    store.delete_predicate(
        "cpu", DeletePredicate(exprs=[DeleteExpr("host", "=", "h1")])
    )
    # catalog fast path declines (None -> caller scans); the scan answers
    assert store.catalog_tag_values("cpu", "host") is None
    assert md.tag_values(db, "cpu", "host") == ["h2"]
    # tag_keys: every row of a one-tag table could be deleted
    store.delete_predicate(
        "cpu", DeletePredicate(exprs=[DeleteExpr("host", "=", "h2")])
    )
    assert md.tag_keys(db, "cpu") == []  # no surviving non-null rows
    # after compaction folds the tombstones, the fast path answers again
    from influxdb_iox_spark.plans.reorg import compact_chunks

    store2 = TableStore(str(tmp_path / "d2"))
    db2 = Database("db2", store2, spark)
    db2.register_table("cpu", CPU)
    store2.write_chunk(_df(spark, [("h1", 1.0, 10), ("h2", 2.0, 20)]), "cpu", CPU)
    store2.write_chunk(_df(spark, [("h3", 3.0, 30)]), "cpu", CPU)
    store2.delete_predicate(
        "cpu", DeletePredicate(exprs=[DeleteExpr("host", "=", "h1")])
    )
    compact_chunks(spark, store2, "cpu", CPU)
    assert store2.tombstones("cpu") == []
    assert store2.catalog_tag_values("cpu", "host") == ["h2", "h3"]


# -- wire paths --------------------------------------------------------------


def test_write_entry_delete_operations(spark, tmp_path, management_server=None):
    """A flatbuffers DeleteOperations entry lands as store tombstones via
    the WriteEntry RPC service object."""
    from influxdb_iox_spark.entry_fb import encode_delete_entry
    from influxdb_iox_spark.rpc_management import IoxServer, WriteService

    server = IoxServer(spark, str(tmp_path / "srv"))
    server.create_database({"name": "db"})
    server.write_lp("db", "cpu,host=h1 usage=1 10\ncpu,host=h2 usage=2 20")
    svc = WriteService(server)
    buf = encode_delete_entry(
        [{"table_name": "cpu", "predicate": "host = 'h1'"}]
    )
    svc.WriteEntry({"db_name": "db", "entry": buf})
    md = server.databases["db"]
    rows = md.database.table("cpu").collect()
    assert [(r.host,) for r in rows] == [("h2",)]
    # unknown table: NotFound, nothing applied
    from influxdb_iox_spark.rpc_management import GrpcStatusError

    buf2 = encode_delete_entry([{"table_name": "nope", "predicate": "host = 'x'"}])
    with pytest.raises(GrpcStatusError, match="NotFound|not found"):
        svc.WriteEntry({"db_name": "db", "entry": buf2})


def test_delete_replicates_through_write_buffer(spark, tmp_path):
    """Deletes are entries: a writing-configured database produces the
    DeleteOperations ENTRY BYTES to the topic (store_entry routing), and
    the reading side's drain applies them as tombstones — the replicated
    topology deletes on both ends."""
    from influxdb_iox_spark.entry_fb import encode_delete_entry
    from influxdb_iox_spark.rpc_management import GrpcStatusError, IoxServer, WriteService

    topic = str(tmp_path / "topic")
    writer = IoxServer(spark, str(tmp_path / "w"))
    writer.create_database({"name": "db", "writing": topic})
    reader = IoxServer(spark, str(tmp_path / "r"))
    reader.create_database({"name": "db", "reading": topic})

    lp = "cpu,host=h1 v=1 10\ncpu,host=h2 v=2 20"
    writer.write_lp("db", lp)
    reader.drain_write_buffer("db")
    buf = encode_delete_entry([{"table_name": "cpu", "predicate": "host = 'h1'"}])
    WriteService(writer).WriteEntry({"db_name": "db", "entry": buf})
    # writer applied locally...
    assert [r.host for r in writer.databases["db"].database.table("cpu").collect()] == ["h2"]
    # ...and the reading side gets it from the topic
    reader.drain_write_buffer("db")
    assert [r.host for r in reader.databases["db"].database.table("cpu").collect()] == ["h2"]
    assert len(reader.databases["db"].database.store.tombstones("cpu")) == 1
    # direct deletes to a reading-configured database are rejected like writes
    with pytest.raises(GrpcStatusError, match="configured to only read"):
        WriteService(reader).WriteEntry({"db_name": "db", "entry": buf})


def test_http_delete_endpoint(spark, tmp_path):
    from influxdb_iox_spark.http_api import IoxHttpServer
    from influxdb_iox_spark.streaming.ingest import LineProtocolIngest

    store = TableStore(str(tmp_path / "d"))
    db = Database("org_bucket", store, spark)
    db.register_table("cpu", CPU)
    store.write_chunk(
        _df(spark, [("h1", 1.0, 10 * S), ("h2", 2.0, 3_000_000_000 * S)]),
        "cpu", CPU,
    )
    ing = LineProtocolIngest(store, "cpu", CPU)
    api = IoxHttpServer(db, {"cpu": ing})
    port = api.start()
    try:
        body = json.dumps(
            {
                "start": "1970-01-01T00:00:00Z",
                "stop": "1970-02-01T00:00:00Z",
                "predicate": '_measurement="cpu" AND host="h1"',
            }
        ).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/v2/delete?org=org&bucket=bucket",
            data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as resp:
            assert resp.status == 204
        left = sorted(r.host for r in db.table("cpu").collect())
        assert left == ["h2"]  # h1@10s deleted; h2 outside the range anyway
        # missing start -> 400
        bad = json.dumps({"stop": "1970-02-01T00:00:00Z"}).encode()
        req2 = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/v2/delete?org=org&bucket=bucket",
            data=bad,
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req2)
        assert ei.value.code == 400
    finally:
        api.stop()


def test_delete_fans_out_to_all_shards(spark, tmp_path):
    """A predicate delete spans shards by design (entry.fbs:20-21) —
    the router forwards the DELETE ENTRY to EVERY shard's node group,
    deduped per connection, and each downstream node applies it to its
    own rows via the normal drain."""
    from influxdb_iox_spark.entry_fb import encode_delete_entry
    from influxdb_iox_spark.rpc_management import IoxServer, WriteService

    router = IoxServer(spark, str(tmp_path / "router"))
    bufs = {2: str(tmp_path / "r2"), 3: str(tmp_path / "r3")}
    router.remotes.update(bufs)
    cfg = {
        "specific_targets": [
            {"matcher": {"table_name_regex": "^cpu$"}, "shard": 1},
            {"matcher": {"table_name_regex": "^mem$"}, "shard": 2},
        ],
        "shards": [
            {"key": 1, "value": {"iox": {"nodes": [{"id": 2}]}}},
            {"key": 2, "value": {"iox": {"nodes": [{"id": 3}]}}},
        ],
    }
    router.create_database({
        "name": "routed",
        "partition_template": {"parts": [{"table": {}}]},
        "shard_config": cfg,
    })
    router.write_lp("routed", "cpu,host=h1 v=1 10\nmem,host=h1 u=1 10")
    buf = encode_delete_entry([{"table_name": "cpu", "predicate": "host = 'h1'"}])
    WriteService(router).WriteEntry({"db_name": "routed", "entry": buf})

    # both shards' topics received the delete entry
    from influxdb_iox_spark.streaming.write_buffer import FileWriteBuffer

    for conn in bufs.values():
        payloads = FileWriteBuffer(conn).fetch("routed")
        assert any(isinstance(p, bytes) for _, p in payloads), conn

    # a downstream node holding cpu rows applies it; one holding only mem
    # rows skips it harmlessly (unknown table on that shard)
    node2 = IoxServer(spark, str(tmp_path / "n2"))
    node2.create_database({"name": "routed", "reading": bufs[2]})
    node2.drain_write_buffer("routed")
    assert node2.databases["routed"].database.table("cpu").count() == 0
    node3 = IoxServer(spark, str(tmp_path / "n3"))
    node3.create_database({"name": "routed", "reading": bufs[3]})
    node3.drain_write_buffer("routed")
    assert node3.databases["routed"].database.table("mem").count() == 1


def test_mid_compaction_delete_survives_via_retarget(spark, tmp_path):
    """Review finding: a delete registered WHILE a compaction runs
    snapshots the compaction's inputs; after the inputs drop, the
    tombstone must be re-pointed at the compacted output (not GC'd) so
    the delete still takes effect."""
    from influxdb_iox_spark.plans import reorg

    store = TableStore(str(tmp_path / "d"))
    store.write_chunk(_df(spark, [("h1", 1.0, 10), ("h2", 2.0, 10)]), "cpu", CPU)
    store.write_chunk(_df(spark, [("h1", 5.0, 10), ("h3", 3.0, 30)]), "cpu", CPU)

    # simulate "delete arrives mid-job": the compaction loads tombstones
    # first; the delete registers between that load and the drop
    orig = store._tombstones_for_chunks
    fired = []

    def racing(table, chunks):
        tomb = orig(table, chunks)
        if not fired:
            fired.append(1)
            store.delete_predicate(
                "cpu", DeletePredicate(exprs=[DeleteExpr("host", "=", "h1")])
            )
        return tomb  # the job itself never sees the new tombstone

    store._tombstones_for_chunks = racing
    try:
        reorg.compact_chunks(spark, store, "cpu", CPU)
    finally:
        store._tombstones_for_chunks = orig

    # the tombstone survived (retargeted at the compacted chunk), the
    # delete is effective, and a follow-up compaction folds+retires it
    assert len(store.tombstones("cpu")) == 1
    [t] = store.tombstones("cpu")
    live = {c.chunk_id for c in store.manifest("cpu")}
    assert set(t["chunk_ids"]) & live, "retargeted snapshot must be live"
    assert _scan(spark, store) == [("h2", 2.0, 10), ("h3", 3.0, 30)]
    reorg.compact_chunks(spark, store, "cpu", CPU)
    assert store.tombstones("cpu") == []
    assert _scan(spark, store) == [("h2", 2.0, 10), ("h3", 3.0, 30)]


def test_table_names_respects_tombstones(spark, tmp_path):
    """Review finding: a table whose every row was deleted must drop out
    of the metadata-only table_names answer."""
    from influxdb_iox_spark.database import Database
    from influxdb_iox_spark.operators.metadata import table_names

    store = TableStore(str(tmp_path / "d"))
    db = Database("db", store, spark)
    db.register_table("cpu", CPU)
    store.write_chunk(_df(spark, [("h1", 1.0, 10)]), "cpu", CPU)
    assert table_names(db) == ["cpu"]
    store.delete_predicate(
        "cpu", DeletePredicate(exprs=[DeleteExpr("host", "=", "h1")])
    )
    assert table_names(db) == []
    # a partial delete keeps the table listed
    store.write_chunk(_df(spark, [("h2", 2.0, 20)]), "cpu", CPU)
    assert table_names(db) == ["cpu"]


def test_http_measurement_conjunction_semantics(spark, tmp_path):
    """Review finding: `_measurement="a" AND _measurement="b"` matches
    no row (a row has ONE measurement) — it must delete NOTHING, not the
    union; pick+exclude of the same measurement cancels too."""
    from influxdb_iox_spark.http_api import IoxHttpServer
    from influxdb_iox_spark.streaming.ingest import LineProtocolIngest

    store = TableStore(str(tmp_path / "d"))
    db = Database("org_bucket", store, spark)
    db.register_table("cpu", CPU)
    store.write_chunk(_df(spark, [("h1", 1.0, 10 * S)]), "cpu", CPU)
    api = IoxHttpServer(db, {"cpu": LineProtocolIngest(store, "cpu", CPU)})
    port = api.start()
    try:
        def post(predicate):
            body = json.dumps({
                "start": "1970-01-01T00:00:00Z",
                "stop": "1970-02-01T00:00:00Z",
                "predicate": predicate,
            }).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/api/v2/delete?org=org&bucket=bucket",
                data=body,
            )
            with urllib.request.urlopen(req) as resp:
                return resp.status

        assert post('_measurement="cpu" AND _measurement="mem"') == 204
        assert db.table("cpu").count() == 1  # contradiction deleted nothing
        assert post('_measurement="cpu" AND _measurement!="cpu"') == 204
        assert db.table("cpu").count() == 1  # cancel deleted nothing
        assert post('_measurement="cpu"') == 204
        assert db.table("cpu").count() == 0  # a plain pick still works
    finally:
        api.stop()


def test_rfc3339_ns_full_precision():
    """Review finding: sub-µs fractions must not truncate — a delete
    boundary off by 999 ns deletes rows the user excluded."""
    from influxdb_iox_spark.http_api import _rfc3339_ns

    assert _rfc3339_ns("1970-01-01T00:00:01.123456789Z", "start") == (
        1_123_456_789
    )
    assert _rfc3339_ns("1970-01-01T00:00:01Z", "start") == 1_000_000_000
    assert _rfc3339_ns("1970-01-01T00:00:01.5Z", "start") == 1_500_000_000


def test_parse_and_inside_quoted_literal():
    """AND inside a quoted string value must not split the conjunct —
    the /api/v2/delete grammar allows any characters in a quoted
    literal (review finding)."""
    dp = DeletePredicate.parse("host = 'foo and bar' AND region = \"up AND down\"")
    assert dp.exprs == [
        DeleteExpr("host", "=", "foo and bar"),
        DeleteExpr("region", "=", "up AND down"),
    ]


def test_unknown_column_tombstone_is_noop_not_poison(spark, tmp_path):
    """A delete predicate referencing a column this table lacks (HTTP
    deletes fan out to every table) deletes NOTHING — the absent column
    reads as all-NULL and NULL never matches — and must not break scans
    or the compaction that could fold it away (review finding)."""
    from influxdb_iox_spark.plans.reorg import compact_chunks

    store = TableStore(str(tmp_path / "d"))
    store.write_chunk(_df(spark, [("h1", 1.0, 10), ("h2", 2.0, 20)]), "cpu", CPU)
    store.delete_predicate(
        "cpu", DeletePredicate(exprs=[DeleteExpr("no_such_col", "=", "x")])
    )
    # scan unaffected, no AnalysisException
    assert _scan(spark, store) == [("h1", 1.0, 10), ("h2", 2.0, 20)]
    # compaction also survives and can then GC the no-op tombstone
    compact_chunks(spark, store, "cpu", CPU)
    assert _scan(spark, store) == [("h1", 1.0, 10), ("h2", 2.0, 20)]
    assert store.tombstones("cpu") == []
    # a MIXED predicate (known column + unknown column) is one AND
    # conjunction -> still matches nothing
    store.delete_predicate(
        "cpu",
        DeletePredicate(
            exprs=[DeleteExpr("host", "=", "h1"), DeleteExpr("ghost", "=", "y")]
        ),
    )
    assert _scan(spark, store) == [("h1", 1.0, 10), ("h2", 2.0, 20)]


def test_delete_is_barrier_behind_parked_sequence(spark, tmp_path):
    """Parking (apply-late) is sound only for commuting WRITES; a delete
    behind an unresolved parked sequence must stop the drain, or the
    late write's rows dodge the tombstone and the topic diverges from a
    from-scratch replay (review finding)."""
    import os
    import time as _t

    from influxdb_iox_spark.entry_fb import encode_delete_entry
    from influxdb_iox_spark.rpc_management import IoxServer
    from influxdb_iox_spark.streaming.write_buffer import FileWriteBuffer

    topic = str(tmp_path / "topic")
    buf = FileWriteBuffer(topic)
    reader = IoxServer(spark, str(tmp_path / "r"))
    reader.create_database({"name": "db", "reading": topic})

    assert buf.produce("db", "cpu,host=h1 v=1 10") == 0
    reader.drain_write_buffer("db")

    # seq 1: a producer claims and stalls (aged empty claim -> parked)
    d = buf._topic_dir("db")
    claim = os.path.join(d, f"{1:012d}-0.lp")
    open(claim, "w").close()
    old = _t.time() - 60
    os.utime(claim, (old, old))

    # seq 2: a delete lands behind the stalled claim
    entry = encode_delete_entry(
        [{"table_name": "cpu", "predicate": "host = 'h1'"}]
    )
    assert buf.produce_entry("db", entry) == 2
    reader.drain_write_buffer("db")
    db = reader.databases["db"].database
    # barrier: the delete did NOT apply (h1 still visible, no tombstone)
    assert [r.host for r in db.table("cpu").collect()] == ["h1"]
    assert db.store.tombstones("cpu") == []

    # the slow producer completes seq 1 with rows MATCHING the predicate
    final = os.path.join(d, f"{1:012d}-0.lp")
    tmp = final + ".tmp"
    with open(tmp, "w") as f:
        f.write("cpu,host=h1 v=9 30")
    os.replace(tmp, final)

    reader.drain_write_buffer("db")
    # order restored: write 1 applied first, THEN the delete — h1 gone,
    # exactly what a from-scratch replay of seqs 0,1,2 produces
    assert db.table("cpu").collect() == []
    assert len(db.store.tombstones("cpu")) == 1

    replay = IoxServer(spark, str(tmp_path / "r2"))
    replay.create_database({"name": "db", "reading": topic})
    replay.drain_write_buffer("db")
    assert replay.databases["db"].database.table("cpu").collect() == []
