"""Object-store manifest backend: the POSIX concurrency battery re-run
over conditional-put primitives, plus object-store-specific semantics.

The reference abstracts persistence behind object_store/src/{lib,memory,
throttle}.rs so the same protocol runs on S3/GCS/Azure/disk; these tests
prove our manifest protocol holds when the ONLY primitives are PUT /
conditional-PUT / LIST / DELETE — no O_APPEND, no O_CREAT|O_EXCL files,
no renames.  A guard fixture makes any POSIX manifest I/O under the
store's base_dir fail the test, so the object-store backend cannot
quietly lean on the filesystem.

THE WHOLE BATTERY IS PARAMETRIZED over four ObjectStore implementations
(the ``backend`` autouse fixture): the in-memory double (memory.rs
shape) AND the real S3 / GCS / Azure REST clients (sources/{s3rest,
gcsrest,azurerest}.py) each pointed at an in-process protocol stub —
every contract test, including the multi-writer races, also runs over
genuine HTTP conditional-PUT/LIST round trips in all three cloud
dialects (If-None-Match/If-Match etags, ifGenerationMatch generations,
blob 409/412 preconditions).
"""

from __future__ import annotations

import os
import threading
import uuid

import pytest

from influxdb_iox_spark.sources.objstore import (
    InMemoryObjectStore,
    ObjectStoreManifestBackend,
    ThrottledObjectStore,
)
from influxdb_iox_spark.sources.store import ChunkMeta, TableStore

_MODE = "memory"
_STUB = None


@pytest.fixture(scope="module")
def _s3_stub():
    from tests.s3_stub import S3Stub

    stub = S3Stub()
    yield stub
    stub.stop()


@pytest.fixture(scope="module")
def _gcs_stub():
    from tests.gcs_stub import GcsStub

    stub = GcsStub()
    yield stub
    stub.stop()


@pytest.fixture(scope="module")
def _azure_stub():
    from tests.azure_stub import AzureStub

    stub = AzureStub()
    yield stub
    stub.stop()


@pytest.fixture(
    autouse=True, params=["memory", "s3rest", "gcsrest", "azurerest"]
)
def backend(request):
    """Every test in this module runs once per ObjectStore impl."""
    global _MODE, _STUB
    _MODE = request.param
    _STUB = {
        "s3rest": lambda: request.getfixturevalue("_s3_stub"),
        "gcsrest": lambda: request.getfixturevalue("_gcs_stub"),
        "azurerest": lambda: request.getfixturevalue("_azure_stub"),
    }.get(_MODE, lambda: None)()
    yield
    _MODE, _STUB = "memory", None


def _new_obj():
    # fresh prefix per store-universe: test isolation on a shared stub
    pfx = f"t-{uuid.uuid4().hex[:12]}/"
    if _MODE == "s3rest":
        from influxdb_iox_spark.sources.s3rest import S3RestObjectStore

        return S3RestObjectStore(_STUB.endpoint, _STUB.bucket, prefix=pfx)
    if _MODE == "gcsrest":
        from influxdb_iox_spark.sources.gcsrest import GcsRestObjectStore

        return GcsRestObjectStore(
            _STUB.bucket, prefix=pfx, endpoint=_STUB.endpoint
        )
    if _MODE == "azurerest":
        from influxdb_iox_spark.sources.azurerest import AzureRestObjectStore

        return AzureRestObjectStore(
            _STUB.endpoint, _STUB.container, prefix=pfx
        )
    return InMemoryObjectStore()


def _make_store(tmp_path, obj=None, throttle=0.0):
    obj = obj if obj is not None else _new_obj()
    inner = ThrottledObjectStore(obj, throttle) if throttle else obj
    return (
        TableStore(str(tmp_path / "data"), backend=ObjectStoreManifestBackend(inner)),
        obj,
    )


def _meta(store: TableStore, table: str, part_key: str, writer: str) -> ChunkMeta:
    cid = store._alloc_chunk_id(table)
    return ChunkMeta(
        chunk_id=cid,
        path=f"{table}/chunk-{cid:06d}-{writer}",
        table=table,
        partition_key=part_key,
        row_count=1,
    )


@pytest.fixture()
def no_posix_manifest(tmp_path, monkeypatch):
    """Fail the test if anything writes a file under the data dir's
    _manifest path — the POSIX backend's home.  The object-store backend
    must never touch it."""
    forbidden = str(tmp_path / "data" / "_manifest")
    real_open = os.open

    def guarded_open(path, flags, *a, **kw):
        if str(path).startswith(forbidden):
            raise AssertionError(f"POSIX manifest I/O attempted: {path}")
        return real_open(path, flags, *a, **kw)

    monkeypatch.setattr(os, "open", guarded_open)
    yield


# -- behavioral battery (mirror of test_manifest_concurrency) ---------------


def test_roundtrip_append_read(tmp_path, no_posix_manifest):
    store, _ = _make_store(tmp_path)
    metas = [_meta(store, "cpu", f"p{i % 3}", "w") for i in range(10)]
    for m in metas:
        store._append_manifest("cpu", m)
    got = store.manifest("cpu")
    assert [c.chunk_id for c in got] == [m.chunk_id for m in metas]
    assert store.manifest_partition("cpu", "p1")
    assert store.tables() == ["cpu"]
    # nothing landed on the filesystem's manifest tree
    assert not os.path.isdir(os.path.join(str(tmp_path / "data"), "_manifest"))


def test_two_writers_one_compactor_no_lost_chunks(tmp_path, no_posix_manifest):
    """Two appender instances + one compactor instance over ONE shared
    object store, all concurrent: every appended chunk id is present
    exactly once afterwards."""
    obj = _new_obj()
    n_per_writer = 120
    written: dict[str, list[int]] = {"w1": [], "w2": []}
    errors: list[BaseException] = []

    def appender(writer: str):
        try:
            store, _ = _make_store(tmp_path, obj)  # own instance
            for i in range(n_per_writer):
                m = _meta(store, "cpu", f"p{i % 3}", writer)
                store._append_manifest("cpu", m)
                written[writer].append(m.chunk_id)
        except BaseException as e:  # noqa: BLE001 — surfaced below
            errors.append(e)

    stop = threading.Event()

    def compactor():
        try:
            store, _ = _make_store(tmp_path, obj)
            while not stop.is_set():
                store.compact_manifest("cpu")
        except BaseException as e:  # noqa: BLE001
            errors.append(e)

    threads = [
        threading.Thread(target=appender, args=("w1",)),
        threading.Thread(target=appender, args=("w2",)),
        threading.Thread(target=compactor),
    ]
    for t in threads:
        t.start()
    for t in threads[:2]:
        t.join()
    stop.set()
    threads[2].join()

    assert not errors, errors
    reader, _ = _make_store(tmp_path, obj)
    manifest_ids = [c.chunk_id for c in reader.manifest("cpu")]
    expected = sorted(written["w1"] + written["w2"])
    assert sorted(manifest_ids) == expected  # nothing lost
    assert len(manifest_ids) == len(set(manifest_ids))  # nothing duplicated
    assert not set(written["w1"]) & set(written["w2"])  # disjoint id blocks


def test_id_blocks_disjoint_across_instances(tmp_path, no_posix_manifest):
    obj = _new_obj()
    stores = [_make_store(tmp_path, obj)[0] for _ in range(4)]
    seen: set[int] = set()
    for i in range(4 * TableStore.ID_BLOCK + 8):
        cid = stores[i % 4]._alloc_chunk_id("t")
        assert cid not in seen
        seen.add(cid)


def test_drops_concurrent_with_appends(tmp_path, no_posix_manifest):
    obj = _new_obj()
    store_a, _ = _make_store(tmp_path, obj)
    first = [_meta(store_a, "t", "p", "a") for _ in range(40)]
    for m in first:
        store_a._append_manifest("t", m)
    to_drop = [m.chunk_id for m in first[::2]]

    late: list[int] = []
    errors: list[BaseException] = []

    def appender():
        try:
            s, _ = _make_store(tmp_path, obj)
            for _ in range(60):
                m = _meta(s, "t", "p", "b")
                s._append_manifest("t", m)
                late.append(m.chunk_id)
        except BaseException as e:  # noqa: BLE001
            errors.append(e)

    def dropper():
        try:
            s, _ = _make_store(tmp_path, obj)
            s.drop_chunks("t", to_drop, delete_files=False)
            s.compact_manifest("t")
        except BaseException as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=appender), threading.Thread(target=dropper)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors

    remaining = {c.chunk_id for c in _make_store(tmp_path, obj)[0].manifest("t")}
    expected = ({m.chunk_id for m in first} - set(to_drop)) | set(late)
    assert remaining == expected


def test_compaction_folds_records_into_base(tmp_path, no_posix_manifest):
    store, obj = _make_store(tmp_path)
    metas = [_meta(store, "t", "p", "x") for _ in range(10)]
    for m in metas:
        store._append_manifest("t", m)
    store.drop_chunks("t", [metas[0].chunk_id], delete_files=False)
    assert store.compact_manifest("t") == 1
    # chain is now exactly one base object, zero record objects
    fname = store._part_file("p")
    assert obj.list(f"manifest/t/{fname}/r-") == []
    assert obj.get(f"manifest/t/{fname}/base") is not None
    ids = [c.chunk_id for c in store.manifest("t")]
    assert ids == [m.chunk_id for m in metas[1:]]
    # appends after compaction land as fresh record objects and are visible
    m2 = _meta(store, "t", "p", "y")
    store._append_manifest("t", m2)
    assert m2.chunk_id in {c.chunk_id for c in store.manifest("t")}
    # nothing left to fold → reports 0, like the lock-contended POSIX return
    store.compact_manifest("t")
    assert store.compact_manifest("t") == 0


def test_tombstones_survive_log_compaction(tmp_path, no_posix_manifest):
    """A delayed duplicate re-append must NOT resurrect a chunk dropped
    between two compactions: tombstone ids persist into base snapshots."""
    store, obj = _make_store(tmp_path)
    m1 = _meta(store, "t", "p", "x")
    store._append_manifest("t", m1)
    store.drop_chunks("t", [m1.chunk_id], delete_files=False)
    assert store.manifest("t") == []
    store.compact_manifest("t")
    store._append_manifest("t", m1)  # delayed duplicate
    assert store.manifest("t") == []
    store.compact_manifest("t")
    store._append_manifest("t", m1)
    assert store.manifest("t") == []


def test_readers_race_compaction_without_losing_records(tmp_path, no_posix_manifest):
    """Readers hammering manifest() during continuous compaction + appends
    must never see a lost or duplicated record — the retry-on-deleted-
    record path (the object-store twin of the POSIX inode check), under
    throttled ops so interleavings actually happen."""
    obj = _new_obj()
    written: list[int] = []
    stop = threading.Event()
    errors: list = []

    def appender():
        try:
            s, _ = _make_store(tmp_path, obj, throttle=0.0002)
            for _ in range(150):
                m = _meta(s, "t", "p", "w")
                s._append_manifest("t", m)
                written.append(m.chunk_id)
        except BaseException as e:  # noqa: BLE001
            errors.append(("append", e))

    def compactor():
        try:
            s, _ = _make_store(tmp_path, obj, throttle=0.0002)
            while not stop.is_set():
                s.compact_manifest("t")
        except BaseException as e:  # noqa: BLE001
            errors.append(("compact", e))

    def reader():
        try:
            s, _ = _make_store(tmp_path, obj, throttle=0.0002)
            while not stop.is_set():
                snapshot = list(written)
                ids = [c.chunk_id for c in s.manifest("t")]
                assert len(ids) == len(set(ids)), "duplicate ids"
                missing = set(snapshot) - set(ids)
                assert not missing, f"reader lost records: {sorted(missing)[:5]}"
        except BaseException as e:  # noqa: BLE001
            errors.append(("read", e))

    threads = [
        threading.Thread(target=appender),
        threading.Thread(target=compactor),
        threading.Thread(target=reader),
        threading.Thread(target=reader),
    ]
    for t in threads:
        t.start()
    threads[0].join()
    stop.set()
    for t in threads[1:]:
        t.join()
    assert not errors, errors
    final = sorted(c.chunk_id for c in _make_store(tmp_path, obj)[0].manifest("t"))
    assert final == sorted(written)


def test_reader_base_swap_between_get_and_list_is_detected(
    tmp_path, no_posix_manifest
):
    """Deterministic forcing of the narrowest lost-record window: a
    compactor CAS-writes the new base and deletes the folded record
    objects BETWEEN the reader's base GET and its LIST.  Every record
    GET the reader still issues succeeds (the deleted ones simply never
    appear in the LIST), so the GET-returns-None retry never fires —
    only the post-scan base-etag re-check catches the swap.  Without it
    the reader silently returns old-base + surviving-records (here: an
    empty manifest, losing all three chunks)."""
    obj = _new_obj()
    store, _ = _make_store(tmp_path, obj)
    metas = [_meta(store, "t", "p", "x") for _ in range(3)]
    for m in metas:
        store._append_manifest("t", m)

    class BaseSwapStore(ThrottledObjectStore):
        """Delegate that runs ONE full compaction (via the raw store)
        the first time the record prefix is LISTed — i.e. exactly after
        the reader's base GET and before its LIST."""

        def __init__(self, inner):
            super().__init__(inner, 0.0)
            self.fired = False

        def list(self, prefix):
            if not self.fired and "/r-" in prefix:
                self.fired = True
                compact_side, _ = _make_store(tmp_path, obj)
                assert compact_side.compact_manifest("t") == 1
            return self.inner.list(prefix)

    hooked = BaseSwapStore(obj)
    reader, _ = _make_store(tmp_path, hooked)
    ids = sorted(c.chunk_id for c in reader.manifest("t"))
    assert hooked.fired, "interleaving hook never triggered"
    assert ids == sorted(m.chunk_id for m in metas)


def test_racing_compactors_exactly_one_wins_per_round(tmp_path, no_posix_manifest):
    """The conditional PUT is the serialization: N compactors folding the
    same partition concurrently never lose a record — a loser's CAS fails
    and it deletes nothing."""
    obj = _new_obj()
    seed, _ = _make_store(tmp_path, obj)
    metas = [_meta(seed, "t", "p", "s") for _ in range(50)]
    for m in metas:
        seed._append_manifest("t", m)

    errors: list = []

    def compactor():
        try:
            s, _ = _make_store(tmp_path, obj, throttle=0.0002)
            for _ in range(5):
                s.compact_manifest("t")
        except BaseException as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=compactor) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    ids = [c.chunk_id for c in _make_store(tmp_path, obj)[0].manifest("t")]
    assert sorted(ids) == sorted(m.chunk_id for m in metas)
    assert len(ids) == len(set(ids))


# -- object-store semantics (memory.rs test battery shape) ------------------


def test_conditional_put_semantics():
    s = _new_obj()
    e1 = s.put("k", b"a", if_not_exists=True)
    assert e1 is not None
    assert s.put("k", b"b", if_not_exists=True) is None  # CAS: already exists
    assert s.get("k")[0] == b"a"
    assert s.put("k", b"c", if_match="bogus") is None  # etag mismatch
    e2 = s.put("k", b"c", if_match=e1)
    assert e2 is not None and e2 != e1
    assert s.get("k")[0] == b"c"
    # unconditional put always succeeds
    assert s.put("k", b"d") is not None
    # delete is idempotent
    s.delete("k")
    s.delete("k")
    assert s.get("k") is None


def test_list_by_prefix():
    s = _new_obj()
    for k in ("a/1", "a/2", "b/1"):
        s.put(k, b"x")
    assert s.list("a/") == ["a/1", "a/2"]
    assert s.list("") == ["a/1", "a/2", "b/1"]
    assert s.list("c/") == []


def test_corrupt_record_object_raises(tmp_path, no_posix_manifest):
    """A malformed record object is real corruption (PUT is atomic, torn
    appends cannot exist) → loud failure, never a silently smaller
    manifest."""
    store, obj = _make_store(tmp_path)
    store._append_manifest("t", _meta(store, "t", "p", "x"))
    fname = store._part_file("p")
    [rec_key] = obj.list(f"manifest/t/{fname}/r-")
    obj.put(rec_key, b'{"chunk_id!: oops')
    with pytest.raises(ValueError, match="corrupt manifest record"):
        store.manifest("t")


def test_operations_and_retired_blobs(tmp_path, no_posix_manifest):
    """Operations log and retired-chunk parking ride the backend's JSON
    blobs — no POSIX tmp+rename."""
    store, obj = _make_store(tmp_path)
    rec = store.record_operation("CompactChunks", "t", "p", [1, 2], "Complete", 5)
    assert [o["id"] for o in store.operations()] == [rec["id"]]
    # park + reclaim uses the blob, not a filesystem JSON
    data_dir = os.path.join(str(tmp_path / "data"), "t", "chunk-x")
    os.makedirs(data_dir)
    store._park_retired("t", [os.path.join("t", "chunk-x")])
    assert store.gc_retired("t", grace_seconds=3600) == 0
    assert store.gc_retired("t", grace_seconds=0) == 1
    assert not os.path.isdir(data_dir)


def test_catalog_version_tracks_changes(tmp_path, no_posix_manifest):
    store, obj = _make_store(tmp_path)
    v0 = store.catalog_version()
    store._append_manifest("t", _meta(store, "t", "p", "x"))
    v1 = store.catalog_version()
    assert v1 != v0
    # a fresh instance over the same object store sees the same version
    again, _ = _make_store(tmp_path, obj)
    assert again.catalog_version() == v1
    store.compact_manifest("t")
    assert store.catalog_version() != v1  # fold changed the key set


# -- whole-engine integration over the object-store backend ------------------


def test_full_lifecycle_on_object_store_backend(spark, tmp_path, no_posix_manifest):
    """The entire chunk lifecycle — ingest, dedup-correct scan,
    compaction, persist-split, drop+GC — composed over the object-store
    manifest backend: proves every store consumer (ingest, scan planner,
    reorg plans, lifecycle policy, system tables) is backend-agnostic,
    not just the manifest battery."""
    import time as _time

    from influxdb_iox_spark.database import Database
    from influxdb_iox_spark.schema import InfluxColumnType, IoxSchema
    from influxdb_iox_spark.streaming.ingest import LineProtocolIngest
    from influxdb_iox_spark.streaming.lifecycle import (
        LifecyclePolicy,
        LifecycleRules,
    )

    store, obj = _make_store(tmp_path)
    schema = IoxSchema.build(["region"], {"user": InfluxColumnType.FIELD_FLOAT})
    db = Database("objdb", store, spark)
    db.register_table("cpu", schema)
    ing = LineProtocolIngest(store, "cpu", schema)

    now = _time.time_ns()
    old = now - 7200 * 10**9
    # the default partition template is %Y-%m-%d of the data time: when the
    # suite runs within 2h of UTC midnight, now-2h lands on YESTERDAY and the
    # "one partition" premise (compact_manifest in (0,1)) breaks — clamp the
    # older point into now's UTC day (broke at 00:33 UTC, round 8)
    day_ns = 86400 * 10**9
    if old // day_ns != now // day_ns:
        old = (now // day_ns) * day_ns + 10**9
    # two overlapping chunks (same key, same times -> dedup on read)
    for lines in (
        [f"cpu,region=west user=1.0 {old}", f"cpu,region=west user=2.0 {now}"],
        [f"cpu,region=west user=9.0 {old}"],
    ):
        ing.ingest_lines_df(
            spark.createDataFrame([(ln,) for ln in lines], ["value"])
        )

    rows = sorted((r.region, r.user, r.time) for r in db.table("cpu").collect())
    assert rows == [("west", 2.0, now), ("west", 9.0, old)]  # last-write wins

    policy = LifecyclePolicy(
        spark, store, {"cpu": schema},
        LifecycleRules(late_arrive_window_seconds=3600),
    )
    report = policy.check_for_work()
    assert report["cpu"]["compacted"] or report["cpu"]["persisted"]
    # results identical after reorg; manifest still objstore-only
    rows2 = sorted((r.region, r.user, r.time) for r in db.table("cpu").collect())
    assert rows2 == rows
    assert not os.path.isdir(os.path.join(str(tmp_path / "data"), "_manifest"))
    # manifest fold leaves one base per partition
    assert store.compact_manifest("cpu") in (0, 1)
    rows3 = sorted((r.region, r.user, r.time) for r in db.table("cpu").collect())
    assert rows3 == rows
    # system tables ride the same backend
    assert db.system_chunks().count() == len(store.manifest("cpu"))
    # drop everything; deferred GC reclaims the parked directories
    store.drop_chunks(
        "cpu",
        [c.chunk_id for c in store.manifest("cpu")],
        defer_delete_seconds=3600,
    )
    assert db.table("cpu").count() == 0
    assert store.gc_retired("cpu", grace_seconds=0) >= 1
