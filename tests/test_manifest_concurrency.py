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


def test_interior_corruption_raises_trailing_tolerated(tmp_path):
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
    # INTERIOR corruption → loud failure, not silently shrunken results
    lines = open(p).read().splitlines()
    lines[1] = '{"chunk_id": 98, "corrupt'  # first record line (index 0 is blank)
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
