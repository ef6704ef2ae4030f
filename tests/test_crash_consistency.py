"""Crash consistency: SIGKILL a writer/compactor subprocess at random
moments, then verify every manifest invariant from the survivor's view.

The manifest protocol's crash story (sources/store.py docstrings): a
torn append is skipped, a mid-compaction crash leaves a .base/.merge
chain readers fold, id blocks are claimed durably before use, and a
dropped chunk can never resurrect.  These tests enforce it with REAL
SIGKILL — no cooperative shutdown — across several kill points.

No SparkSession needed (manifest-only operations), so the battery is
cheap enough to run several kill rounds per invocation.
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time

from influxdb_iox_spark.sources.store import ChunkMeta, TableStore

#: subprocess body: appends chunks (and periodically drops + compacts)
#: forever; the parent kills it mid-flight.  Writes one status line per
#: registered chunk id to stdout so the parent knows what SHOULD exist.
_WRITER = r"""
import json, os, sys
sys.path.insert(0, {repo!r})
from influxdb_iox_spark.sources.store import ChunkMeta, TableStore

store = TableStore({base!r})
i = 0
while True:
    cid = store._alloc_chunk_id("t")
    meta = ChunkMeta(
        chunk_id=cid, path=f"t/chunk-{{cid:06d}}", table="t",
        partition_key=f"p{{i % 3}}", row_count=1,
    )
    store._append_manifest("t", meta)
    print(cid, flush=True)
    if i % 25 == 24:
        store.drop_chunks("t", [cid], delete_files=False)
        print(f"drop {{cid}}", flush=True)
        store.compact_manifest("t")
    i += 1
"""


def _run_killed_writer(base: str, run_seconds: float) -> tuple[set[int], set[int]]:
    """(acknowledged chunk ids, acknowledged dropped ids)."""
    proc = subprocess.Popen(
        [sys.executable, "-c", _WRITER.format(repo=os.path.dirname(os.path.dirname(os.path.abspath(__file__))), base=base)],
        stdout=subprocess.PIPE,
        text=True,
    )
    time.sleep(run_seconds)
    proc.send_signal(signal.SIGKILL)
    out, _ = proc.communicate()
    acked: set[int] = set()
    dropped: set[int] = set()
    for ln in out.splitlines():
        if ln.startswith("drop "):
            dropped.add(int(ln.split()[1]))
        elif ln.strip():
            acked.add(int(ln))
    return acked, dropped


def test_sigkill_mid_write_loses_nothing_acknowledged(tmp_path):
    """Whatever the writer printed BEFORE the kill must be present
    afterwards (minus acknowledged drops); ids never duplicate; the
    manifest parses without error; and a fresh writer continues with
    strictly larger ids."""
    base = str(tmp_path / "store")
    all_acked: set[int] = set()
    all_dropped: set[int] = set()
    ambiguous: set[int] = set()
    for round_ in range(3):  # several kill points
        acked, dropped = _run_killed_writer(base, 0.6 + 0.25 * round_)
        all_acked |= acked
        all_dropped |= dropped
        if acked:
            # the kill can land between drop_chunks() and its ack print:
            # only the LAST registered chunk is ever the drop target, so
            # only it may legitimately be absent without a drop ack
            ambiguous.add(max(acked))

        survivor = TableStore(base)
        manifest = survivor.manifest("t")  # must parse (torn appends skipped)
        ids = [c.chunk_id for c in manifest]
        assert len(ids) == len(set(ids)), "duplicate chunk ids after crash"
        visible = set(ids)
        missing = (all_acked - all_dropped) - visible - ambiguous
        assert not missing, f"acknowledged chunks lost after SIGKILL: {sorted(missing)[:5]}"
        resurrected = visible & all_dropped
        assert not resurrected, f"dropped chunks resurrected: {sorted(resurrected)[:5]}"

    # a fresh writer's ids never collide with anything ever acknowledged
    fresh = TableStore(base)
    new_id = fresh._alloc_chunk_id("t")
    assert new_id > max(all_acked)
    # compaction after all the carnage folds cleanly and preserves content
    before = {c.chunk_id for c in fresh.manifest("t")}
    fresh.compact_manifest("t")
    assert {c.chunk_id for c in TableStore(base).manifest("t")} == before


def test_sigkill_mid_compaction_chain_recovers(tmp_path):
    """Kill a dedicated compactor loop while a separate process keeps
    appending; afterwards the chain (whatever mix of .base/.merge/live
    the kill left) folds to the complete record set."""
    base = str(tmp_path / "store")
    store = TableStore(base)
    metas = []
    for i in range(60):
        cid = store._alloc_chunk_id("t")
        m = ChunkMeta(
            chunk_id=cid, path=f"t/chunk-{cid:06d}", table="t",
            partition_key=f"p{i % 3}", row_count=1,
        )
        store._append_manifest("t", m)
        metas.append(m)

    compactor = subprocess.Popen(
        [
            sys.executable,
            "-c",
            "import sys; sys.path.insert(0, %r); "
            "from influxdb_iox_spark.sources.store import TableStore; "
            "s = TableStore(%r)\n"
            "while True: s.compact_manifest('t')"
            % (os.path.dirname(os.path.dirname(os.path.abspath(__file__))), base),
        ]
    )
    time.sleep(0.7)
    compactor.send_signal(signal.SIGKILL)
    compactor.wait()

    # stale compaction lock (if the kill left one) must not wedge future
    # compactions: steal happens after the stale window, so force it
    lock = os.path.join(store._manifest_dir("t"), "_compact.lock")
    if os.path.exists(lock):
        past = time.time() - 3600
        os.utime(lock, (past, past))

    survivor = TableStore(base)
    got = {c.chunk_id for c in survivor.manifest("t")}
    assert got == {m.chunk_id for m in metas}
    assert survivor.compact_manifest("t") >= 1  # lock stolen if stale
    assert {c.chunk_id for c in TableStore(base).manifest("t")} == got
