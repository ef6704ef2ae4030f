"""Concurrent-writer manifest safety.

The reference runs lifecycle concurrently with ingest
(/root/reference/lifecycle/src/policy.rs:448 check_for_work against live
writes; /root/reference/server/src/db.rs:627-699); a 100 TB deployment has
N ingest writers + a compactor by construction.  These tests hammer the
TableStore manifest protocol with multiple TableStore INSTANCES (as two
processes would see it — nothing is shared but the filesystem):

- O_APPEND single-write appends never interleave or vanish
- O_CREAT|O_EXCL id-block claims never hand out one id twice
- log compaction concurrent with appends loses no record
- tombstone drops concurrent with appends drop exactly the asked ids

Pure filesystem tests — no SparkSession needed, so the whole battery runs
in well under a second.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading

import pytest

from influxdb_iox_spark.sources.store import ChunkMeta, TableStore


def _meta(store: TableStore, table: str, part_key: str, writer: str) -> ChunkMeta:
    cid = store._alloc_chunk_id(table)
    return ChunkMeta(
        chunk_id=cid,
        path=f"{table}/chunk-{cid:06d}-{writer}",
        table=table,
        partition_key=part_key,
        row_count=1,
    )


def test_two_writers_one_compactor_no_lost_chunks(tmp_path):
    """Two appender instances + one compactor instance, all concurrent:
    every appended chunk id is present exactly once afterwards."""
    base = str(tmp_path / "store")
    n_per_writer = 120
    written: dict[str, list[int]] = {"w1": [], "w2": []}
    errors: list[BaseException] = []

    def appender(writer: str):
        try:
            store = TableStore(base)  # own instance, like a separate process
            for i in range(n_per_writer):
                m = _meta(store, "cpu", f"p{i % 3}", writer)
                store._append_manifest("cpu", m)
                written[writer].append(m.chunk_id)
        except BaseException as e:  # noqa: BLE001 — surfaced below
            errors.append(e)

    stop = threading.Event()

    def compactor():
        try:
            store = TableStore(base)
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
    reader = TableStore(base)
    manifest_ids = [c.chunk_id for c in reader.manifest("cpu")]
    expected = sorted(written["w1"] + written["w2"])
    assert sorted(manifest_ids) == expected  # nothing lost
    assert len(manifest_ids) == len(set(manifest_ids))  # nothing duplicated
    # the two writers' id blocks never overlapped
    assert not set(written["w1"]) & set(written["w2"])


def test_id_blocks_disjoint_across_instances(tmp_path):
    base = str(tmp_path / "store")
    stores = [TableStore(base) for _ in range(4)]
    seen: set[int] = set()
    # interleave allocations round-robin across instances
    for i in range(4 * TableStore.ID_BLOCK + 8):
        cid = stores[i % 4]._alloc_chunk_id("t")
        assert cid not in seen
        seen.add(cid)


def test_drops_concurrent_with_appends(tmp_path):
    """One instance appends while another drops already-registered chunks;
    afterwards exactly the un-dropped chunks remain."""
    base = str(tmp_path / "store")
    store_a = TableStore(base)
    first = [_meta(store_a, "t", "p", "a") for _ in range(40)]
    for m in first:
        store_a._append_manifest("t", m)
    to_drop = [m.chunk_id for m in first[::2]]

    late: list[int] = []
    errors: list[BaseException] = []

    def appender():
        try:
            s = TableStore(base)
            for _ in range(60):
                m = _meta(s, "t", "p", "b")
                s._append_manifest("t", m)
                late.append(m.chunk_id)
        except BaseException as e:  # noqa: BLE001
            errors.append(e)

    def dropper():
        try:
            s = TableStore(base)
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

    remaining = {c.chunk_id for c in TableStore(base).manifest("t")}
    expected = ({m.chunk_id for m in first} - set(to_drop)) | set(late)
    assert remaining == expected


def test_compaction_folds_chain_to_single_base(tmp_path):
    base = str(tmp_path / "store")
    store = TableStore(base)
    metas = [_meta(store, "t", "p", "x") for _ in range(10)]
    for m in metas:
        store._append_manifest("t", m)
    store.drop_chunks("t", [metas[0].chunk_id], delete_files=False)
    assert store.compact_manifest("t") == 1
    d = store._manifest_dir("t")
    fname = store._part_file("p")
    assert os.path.exists(os.path.join(d, fname + ".base"))
    assert not os.path.exists(os.path.join(d, fname))  # live folded away
    assert not os.path.exists(os.path.join(d, fname + ".merge"))
    ids = [c.chunk_id for c in store.manifest("t")]
    assert ids == [m.chunk_id for m in metas[1:]]
    # appends after compaction land in a fresh live file and are visible
    m2 = _meta(store, "t", "p", "y")
    store._append_manifest("t", m2)
    assert m2.chunk_id in {c.chunk_id for c in store.manifest("t")}


def test_compact_lock_excludes_second_compactor(tmp_path):
    base = str(tmp_path / "store")
    store = TableStore(base)
    store._append_manifest("t", _meta(store, "t", "p", "x"))
    d = store._manifest_dir("t")
    lock = os.path.join(d, "_compact.lock")
    with open(lock, "w") as f:
        f.write("9999")
    assert store.compact_manifest("t") == 0  # fresh lock held elsewhere
    old = os.stat(lock)
    os.utime(lock, (old.st_atime - 3600, old.st_mtime - 3600))
    assert store.compact_manifest("t") == 1  # stale lock stolen


def test_torn_appends_tolerated_corruption_raises(tmp_path):
    """Truncated records (torn appends) are tolerated ANYWHERE — with
    concurrent appenders the next writer's record follows a torn one, so a
    torn line is not necessarily trailing.  A malformed line that still
    ends with '}' cannot be a torn append (torn writes never reach the
    closing brace) and raises loudly instead of silently shrinking query
    results."""
    base = str(tmp_path / "store")
    store = TableStore(base)
    m1, m2 = (_meta(store, "t", "p", "x") for _ in range(2))
    store._append_manifest("t", m1)
    store._append_manifest("t", m2)
    p = os.path.join(store._manifest_dir("t"), store._part_file("p"))
    # torn TRAILING append (crashed writer) → tolerated
    with open(p, "a") as f:
        f.write('{"chunk_id": 99, "pa')
    assert [c.chunk_id for c in store.manifest("t")] == [m1.chunk_id, m2.chunk_id]
    # torn append followed by ANOTHER writer's good record (the torn line
    # is now interior) → still tolerated, good record visible
    m3 = _meta(store, "t", "p", "x")
    store._append_manifest("t", m3)
    assert [c.chunk_id for c in store.manifest("t")] == [
        m1.chunk_id, m2.chunk_id, m3.chunk_id
    ]
    # mid-line corruption of a COMPLETE record → loud failure
    lines = open(p).read().splitlines()
    idx = next(i for i, ln in enumerate(lines) if ln.strip().endswith("}"))
    lines[idx] = lines[idx].replace('"chunk_id"', '"chunk_id!', 1)
    with open(p, "w") as f:
        f.write("\n".join(lines))
    with pytest.raises(ValueError, match="corrupt manifest record"):
        store.manifest("t")


def test_catalog_version_stable_across_processes(tmp_path):
    """catalog_version must be a stable digest (not salted Python hash):
    the same manifest tree yields the same value in a fresh interpreter."""
    base = str(tmp_path / "store")
    store = TableStore(base)
    store._append_manifest("t", _meta(store, "t", "p", "x"))
    here = store.catalog_version()
    code = (
        "import sys, json; sys.path.insert(0, %r); "
        "from influxdb_iox_spark.sources.store import TableStore; "
        "print(TableStore(%r).catalog_version())"
        % (os.path.dirname(os.path.dirname(os.path.abspath(__file__))), base)
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, check=True
    )
    assert int(out.stdout.strip()) == here
    # and it changes when the manifest changes
    store._append_manifest("t", _meta(store, "t", "p", "y"))
    assert store.catalog_version() != here


def test_tombstone_record_roundtrip(tmp_path):
    """Drop tombstones are plain JSONL records readable next to adds."""
    base = str(tmp_path / "store")
    store = TableStore(base)
    m = _meta(store, "t", "p", "x")
    store._append_manifest("t", m)
    store.drop_chunks("t", [m.chunk_id], delete_files=False)
    p = os.path.join(store._manifest_dir("t"), store._part_file("p"))
    recs = [json.loads(ln) for ln in open(p).read().splitlines() if ln.strip()]
    assert recs[-1] == {"__drop__": [m.chunk_id]}
    assert store.manifest("t") == []


def test_tombstones_survive_log_compaction(tmp_path):
    """A delayed duplicate re-append (the _append_record inode-race path)
    must NOT resurrect a chunk dropped between two log compactions:
    tombstone ids are persisted into .base snapshots, not folded away."""
    base = str(tmp_path / "store")
    store = TableStore(base)
    m1 = _meta(store, "t", "p", "x")
    store._append_manifest("t", m1)
    store.drop_chunks("t", [m1.chunk_id], delete_files=False)
    assert store.manifest("t") == []
    store.compact_manifest("t")  # folds add+tombstone into .base
    # the delayed appender re-appends the original add record
    store._append_manifest("t", m1)
    assert store.manifest("t") == []  # tombstone still applies
    store.compact_manifest("t")  # and survives ANOTHER fold
    store._append_manifest("t", m1)
    assert store.manifest("t") == []


def test_stale_lock_steal_is_atomic(tmp_path):
    """The stale-lock steal renames (atomic claim) rather than unlinking:
    only one stealer can win, and a fresh lock is never stolen."""
    import time as _t

    base = str(tmp_path / "store")
    store = TableStore(base)
    lock = str(tmp_path / "l.lock")
    # stale lock -> stolen and acquired
    open(lock, "w").write("1")
    os.utime(lock, (0, 0))
    assert store._acquire_lock(lock)
    # fresh lock (just created by us) -> NOT stolen by a second acquirer
    assert not store._acquire_lock(lock)
    os.unlink(lock)


def test_readers_race_compaction_without_losing_records(tmp_path):
    """The round-5 review finding: a reader interleaving with a fold could
    see .base before the fold and .merge after its deletion — silently
    dropping every record that was in the live log.  Reads now validate
    the chain's inode version (with a locked-read fallback under hot
    compaction): two readers hammering manifest() during continuous
    compaction + appends must never see a lost or duplicated record."""
    base = str(tmp_path / "store")
    written: list[int] = []
    stop = threading.Event()
    errors: list = []

    def appender():
        try:
            s = TableStore(base)
            for _ in range(150):
                m = _meta(s, "t", "p", "w")
                s._append_manifest("t", m)
                written.append(m.chunk_id)
        except BaseException as e:  # noqa: BLE001
            errors.append(("append", e))

    def compactor():
        try:
            s = TableStore(base)
            while not stop.is_set():
                s.compact_manifest("t")
        except BaseException as e:  # noqa: BLE001
            errors.append(("compact", e))

    def reader():
        try:
            s = TableStore(base)
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
    final = sorted(c.chunk_id for c in TableStore(base).manifest("t"))
    assert final == sorted(written)
