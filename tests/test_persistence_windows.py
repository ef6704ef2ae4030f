"""Per-window sequence bookkeeping (streaming/persistence_windows.py) —
the port of persistence_windows.rs: open→closed→persistable rotation,
per-sequencer min/max sequences, flush truncation — and the lifecycle
integration where a lagging shard defers persistence of exactly its
unflushed window."""

from __future__ import annotations

import pytest

from influxdb_iox_spark.streaming.persistence_windows import (
    MinMaxSequence,
    PersistenceWindows,
)

S = 1_000_000_000  # ns


def test_min_max_sequence_invariant():
    mm = MinMaxSequence(10, 20)
    assert (mm.min, mm.max) == (10, 20)
    assert mm.extend(5) == MinMaxSequence(5, 20)
    assert mm.extend(25) == MinMaxSequence(10, 25)
    with pytest.raises(ValueError):
        MinMaxSequence(20, 10)


def test_rotation_open_closed_persistable():
    w = PersistenceWindows(late_arrival_seconds=120, closed_window_seconds=30)
    t0 = 1000.0
    w.add_range(0, 1, 10, 100 * S, 200 * S, received_at=t0)
    assert w.open is not None and w.persistable is None
    # 30s later: open rotates closed, new open for the incoming batch
    w.add_range(0, 2, 5, 150 * S, 300 * S, received_at=t0 + 31)
    assert len(w.closed) == 1 and w.open is not None
    # 120s after t0: the first window ages into persistable
    w.rotate(t0 + 121)
    assert w.persistable is not None
    assert w.persistable.row_count == 10
    assert w.max_persistable_timestamp() == 200 * S
    assert w.persistable_row_count() == 10
    # second window is still closed (created at t0+31)
    assert len(w.closed) == 1


def test_minimum_unpersisted_sequence_tracks_oldest_window():
    w = PersistenceWindows(late_arrival_seconds=120, closed_window_seconds=30)
    t0 = 0.0
    w.add_range(0, 7, 1, 10 * S, 10 * S, received_at=t0)
    w.add_range(1, 3, 1, 11 * S, 11 * S, received_at=t0 + 1)  # same open window
    w.add_range(0, 8, 1, 12 * S, 12 * S, received_at=t0 + 40)  # next window
    seqs = w.minimum_unpersisted_sequence()
    # the OLDEST window (now closed) carries both sequencers' ranges
    assert seqs == {0: MinMaxSequence(7, 7), 1: MinMaxSequence(3, 3)}
    w.rotate(t0 + 130)  # first window becomes persistable — still the minimum
    assert w.minimum_unpersisted_sequence() == {
        0: MinMaxSequence(7, 7),
        1: MinMaxSequence(3, 3),
    }
    w.flush()
    # after flush the minimum moves to the remaining window
    assert w.minimum_unpersisted_sequence() == {0: MinMaxSequence(8, 8)}


def test_flush_truncates_closed_windows():
    """persistence_windows.rs flush: once [.., persistable.max_time] is
    on disk, closed windows' overlap is truncated so it cannot re-drive
    persistence accounting."""
    w = PersistenceWindows(late_arrival_seconds=60, closed_window_seconds=10)
    t0 = 0.0
    w.add_range(0, 1, 10, 100 * S, 500 * S, received_at=t0)
    # overlapping late data in a newer window
    w.add_range(0, 2, 4, 300 * S, 600 * S, received_at=t0 + 11)
    w.rotate(t0 + 61)  # first window persistable, second still closed
    assert w.max_persistable_timestamp() == 500 * S
    flushed = w.flush()
    assert flushed.row_count == 10
    assert w.persistable is None
    [closed] = w.closed
    assert closed.min_time == 500 * S + 1  # truncated below the boundary
    assert closed.max_time == 600 * S


def test_persistable_absorbs_multiple_aged_windows():
    w = PersistenceWindows(late_arrival_seconds=50, closed_window_seconds=10)
    for i in range(3):
        w.add_range(0, i, 1, (100 + i) * S, (100 + i) * S, received_at=i * 11.0)
    w.rotate(200.0)
    assert w.persistable.row_count == 3
    assert w.persistable.sequencer_numbers == {0: MinMaxSequence(0, 2)}
    assert w.max_persistable_timestamp() == 102 * S


def test_lagging_shard_defers_exactly_the_unflushed_window(spark, tmp_path):
    """The VERDICT r6 #9 done-gate: two shards feed one table; shard 1
    lags (its recent window has not aged out).  The sequence-exact
    persist decision caps the split at the persistable boundary, so the
    lagging shard's window stays hot — by sequence, not by guessing
    from data times (the laggard's data times are OLD, so a time-based
    split would wrongly persist them)."""
    from influxdb_iox_spark.database import Database
    from influxdb_iox_spark.schema import InfluxColumnType, IoxSchema
    from influxdb_iox_spark.sources.store import TableStore
    from influxdb_iox_spark.streaming.lifecycle import (
        LifecyclePolicy,
        LifecycleRules,
    )

    schema = IoxSchema.build(["host"], {"v": InfluxColumnType.FIELD_FLOAT})
    store = TableStore(str(tmp_path / "d"))
    db = Database("db", store, spark)
    db.register_table("cpu", schema)
    import time as _t
    import os

    now = _t.time()
    now_ns = _t.time_ns()
    # shard 0's data spans the table's newest times; shard 1's data is
    # ANCIENT but arrived JUST NOW — a pure data-time split
    # (newest - 300s) would persist the laggard's rows: the wrong call
    t0_old, t0_new = now_ns - 1000 * S, now_ns - 350 * S
    t1 = now_ns - 7200 * S

    def _write_at(rows, created_ago):
        # write_chunk stamps created_at=now; backdate to the simulated
        # arrival instant before registering
        m = store.write_chunk(
            spark.createDataFrame(rows, "host string, v double, time long"),
            "cpu", schema, register=False,
        )
        m.created_at = now - created_ago
        store.register_chunks("cpu", [m])
        return m

    # shard 0: delivered 400s ago (window aged out of late_arrival=300)
    _write_at([("h0", 1.0, t0_old), ("h0", 1.5, t0_new)], created_ago=400)
    db.record_ingest("cpu", 0, 100, 2, t0_old, t0_new,
                     late_arrival_seconds=300, received_at=now - 400)
    # shard 1 (laggard): ancient data arrived JUST NOW — open window
    _write_at([("h1", 2.0, t1)], created_ago=0)
    db.record_ingest("cpu", 1, 5, 1, t1, t1,
                     late_arrival_seconds=300, received_at=now)

    # premise check: the data-time-only split WOULD take the laggard
    control = LifecyclePolicy(
        spark, store, {"cpu": schema},
        LifecycleRules(late_arrive_window_seconds=300),
    )
    split = control.max_seen_time_ns("cpu") - 300 * S
    assert t1 <= split, "test premise: time-only split would take the laggard"

    policy = LifecyclePolicy(
        spark, store, {"cpu": schema},
        LifecycleRules(late_arrive_window_seconds=300),
        windows=db.persistence_windows,
    )
    out = policy.maybe_persist("cpu")
    assert out, "aged shard-0 data must persist"
    persisted = [c for c in store.manifest("cpu") if c.persisted]
    hot = [c for c in store.manifest("cpu") if not c.persisted]
    # the split is the windows' persistable boundary (mp = t0_new), so
    # BOTH shard-0 rows persist; exactly the laggard's chunk (fresh
    # ARRIVAL, ancient data) stays hot
    assert sum(c.row_count for c in persisted) == 2
    assert sum(c.row_count for c in hot) == 1
    hot_rows = [
        (r.host, r.time)
        for c in hot
        for r in spark.read.parquet(os.path.join(store.base_dir, c.path)).collect()
    ]
    assert hot_rows == [("h1", t1)]  # the laggard, untouched
    # flush fired EXACTLY: every sequence in the flushed window is on
    # disk (split == mp), and the laggard's sequence — living in its
    # open window, not the flushed one — is now the minimum unpersisted
    w = db.persistence_windows["cpu"]
    assert w.persistable is None
    assert w.minimum_unpersisted_sequence() == {1: MinMaxSequence(5, 5)}
    # system table surfaces the laggard's open window
    rows = db.system_persistence_windows().collect()
    assert any(
        r.sequencer_id == 1 and r.min_sequence == 5 and r.state == "open"
        for r in rows
    )


def test_flush_exact_split_is_persistable_max(spark, tmp_path):
    """The windows-driven persist splits AT the persistable window's max
    data time (the reference's flush boundary) — so flush() is exact:
    every flushed sequence's rows are on disk, and the bookkeeping
    clears completely when nothing else is in flight."""
    from influxdb_iox_spark.database import Database
    from influxdb_iox_spark.schema import InfluxColumnType, IoxSchema
    from influxdb_iox_spark.sources.store import TableStore
    from influxdb_iox_spark.streaming.lifecycle import (
        LifecyclePolicy,
        LifecycleRules,
    )
    import time as _t

    schema = IoxSchema.build(["host"], {"v": InfluxColumnType.FIELD_FLOAT})
    store = TableStore(str(tmp_path / "d"))
    db = Database("db", store, spark)
    db.register_table("cpu", schema)
    now = _t.time()
    now_ns = _t.time_ns()
    # one aged window whose max data time is WELL below newest-300s, and
    # newer aged data raising the table's newest time
    t_lo, t_hi = now_ns - 9000 * S, now_ns - 8000 * S

    m = store.write_chunk(
        spark.createDataFrame(
            [("h0", 1.0, t_lo), ("h0", 2.0, t_hi)],
            "host string, v double, time long",
        ),
        "cpu", schema, register=False,
    )
    m.created_at = now - 400
    store.register_chunks("cpu", [m])
    db.record_ingest("cpu", 0, 11, 2, t_lo, t_hi,
                     late_arrival_seconds=300, received_at=now - 400)
    policy = LifecyclePolicy(
        spark, store, {"cpu": schema},
        LifecycleRules(late_arrive_window_seconds=300),
        windows=db.persistence_windows,
    )
    out = policy.maybe_persist("cpu")
    assert out
    w = db.persistence_windows["cpu"]
    # split = min(newest-300, mp) = mp (t_hi) -> everything persisted,
    # flush fired, sequence bookkeeping cleared
    assert w.persistable is None
    assert w.minimum_unpersisted_sequence() is None
    assert all(c.persisted for c in store.manifest("cpu"))


def test_drain_feeds_windows(spark, tmp_path):
    """The write-buffer consumer records every applied payload into the
    database's windows — sequence numbers included."""
    from influxdb_iox_spark.rpc_management import IoxServer
    from influxdb_iox_spark.streaming.write_buffer import FileWriteBuffer

    topic = str(tmp_path / "topic")
    srv = IoxServer(spark, str(tmp_path / "srv"))
    srv.create_database({"name": "db", "reading": topic})
    buf = FileWriteBuffer(topic)
    buf.produce("db", "cpu,host=a v=1 100\ncpu,host=b v=2 200")
    buf.produce("db", "cpu,host=c v=3 300\nmem,host=a u=1 50")
    n = srv.drain_write_buffer("db")
    assert n == 4
    pw = srv.databases["db"].database.persistence_windows
    assert set(pw) == {"cpu", "mem"}
    cpu = pw["cpu"].open
    assert cpu.row_count == 3
    assert (cpu.min_time, cpu.max_time) == (100, 300)
    assert cpu.sequencer_numbers == {0: MinMaxSequence(0, 1)}
    assert pw["mem"].open.sequencer_numbers == {0: MinMaxSequence(1, 1)}
    # a second producer on ANOTHER partition (shard): its sequences key
    # under its own sequencer id in the same window
    buf.produce("db", "cpu,host=d v=4 400", partition=7)
    srv.drain_write_buffer("db")
    cpu = pw["cpu"].open
    assert cpu.sequencer_numbers == {
        0: MinMaxSequence(0, 1),
        7: MinMaxSequence(2, 2),
    }
    assert cpu.max_time == 400


def test_flush_deferred_while_skew_zone_chunk_unpersisted(spark, tmp_path):
    """Window age runs on the WINDOW's created_at, up to closed_window
    ahead of a late batch's chunk arrival.  A chunk inside that skew
    zone (arrival-gated but with its sequences already folded into the
    persistable window) must DEFER the flush — flushing would erase
    exactly the sequence ranges a crash replay needs (review finding)."""
    import os
    import time as _t

    from influxdb_iox_spark.database import Database
    from influxdb_iox_spark.schema import InfluxColumnType, IoxSchema
    from influxdb_iox_spark.sources.store import TableStore
    from influxdb_iox_spark.streaming.lifecycle import (
        LifecyclePolicy,
        LifecycleRules,
    )

    schema = IoxSchema.build(["host"], {"v": InfluxColumnType.FIELD_FLOAT})
    store = TableStore(str(tmp_path / "d"))
    db = Database("db", store, spark)
    db.register_table("cpu", schema)
    now = _t.time()
    now_ns = _t.time_ns()
    t0 = now_ns - 1000 * S
    t1 = now_ns - 900 * S

    def _write_at(rows, created_ago):
        m = store.write_chunk(
            spark.createDataFrame(rows, "host string, v double, time long"),
            "cpu", schema, register=False,
        )
        m.created_at = now - created_ago
        store.register_chunks("cpu", [m])
        return m

    # shard 0: aged normally (arrival 400s ago, window 400s ago)
    _write_at([("h0", 1.0, t0)], created_ago=400)
    db.record_ingest("cpu", 0, 100, 1, t0, t0,
                     late_arrival_seconds=300, received_at=now - 400)
    # shard 1: the SKEW case — its window was created 300s ago (aged
    # into persistable: late_arrival=300) but the batch itself arrived
    # 280s ago (window was 20s old then, < closed_window=30), so the
    # chunk is still arrival-gated for another 20s
    _write_at([("h1", 2.0, t1)], created_ago=280)
    db.record_ingest("cpu", 1, 7, 1, t1, t1,
                     late_arrival_seconds=300, received_at=now - 300)
    w = db.persistence_windows["cpu"]
    # make the batch itself ride the 300s-old window: re-create the
    # bookkeeping with explicit received_at inside that window's life
    policy = LifecyclePolicy(
        spark, store, {"cpu": schema},
        LifecycleRules(late_arrive_window_seconds=300),
        windows=db.persistence_windows,
    )
    out = policy.maybe_persist("cpu")
    assert out, "aged shard-0 chunk must still persist"
    persisted = [c for c in store.manifest("cpu") if c.persisted]
    hot = [c for c in store.manifest("cpu") if not c.persisted]
    assert sum(c.row_count for c in persisted) == 1
    assert sum(c.row_count for c in hot) == 1  # skew-zone chunk held
    # the flush was DEFERRED: the persistable window (holding shard 1's
    # sequence range) survives, and replay still covers sequence 7
    assert w.persistable is not None
    mus = w.minimum_unpersisted_sequence()
    assert mus is not None and mus.get(1) == MinMaxSequence(7, 7)
