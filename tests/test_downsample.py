"""Continuous downsampling (streaming/downsample.py): rollup correctness,
incremental tail processing, and late-arrival refresh via PK upsert."""

from __future__ import annotations

import pytest

from influxdb_iox_spark.database import Database
from influxdb_iox_spark.schema import InfluxColumnType, IoxSchema
from influxdb_iox_spark.sources.store import TableStore
from influxdb_iox_spark.streaming.downsample import downsample_table

CPU = IoxSchema.build(["region"], {"user": InfluxColumnType.FIELD_FLOAT})
S = 1_000_000_000  # ns


def _db(spark, tmp_path):
    store = TableStore(str(tmp_path / "ds"))
    db = Database("db", store, spark)
    db.register_table("cpu", CPU)
    return db


def _write(db, rows):
    df = db.spark.createDataFrame(rows, "region string, user double, time long")
    db.store.write_chunk(df, "cpu", CPU)


def test_downsample_rollup_and_stop_boundary(spark, tmp_path):
    db = _db(spark, tmp_path)
    _write(db, [("west", 1.0, 10 * S), ("west", 3.0, 50 * S),
                ("east", 8.0, 70 * S)])
    meta = downsample_table(db, "cpu", "cpu_1m", every_seconds=60)
    assert meta is not None and meta.table == "cpu_1m"
    got = {(r.region, r.time): r.user for r in db.table("cpu_1m").collect()}
    # bucket STOP boundary (GetEarliestBounds convention)
    assert got == {("west", 60 * S): 2.0, ("east", 120 * S): 8.0}


def test_downsample_incremental_tail_only(spark, tmp_path):
    db = _db(spark, tmp_path)
    _write(db, [("west", 1.0, 10 * S), ("west", 5.0, 70 * S)])
    downsample_table(db, "cpu", "cpu_1m", every_seconds=60,
                     late_arrive_window_seconds=0)
    # new data lands two buckets later; the sweep must not re-emit the
    # untouched first bucket
    _write(db, [("west", 9.0, 200 * S)])
    meta2 = downsample_table(db, "cpu", "cpu_1m", every_seconds=60,
                             late_arrive_window_seconds=0)
    assert meta2.row_count == 2  # hwm bucket (120s) + new bucket (240s)
    got = {r.time: r.user for r in db.table("cpu_1m").filter("region='west'").collect()}
    assert got == {60 * S: 1.0, 120 * S: 5.0, 240 * S: 9.0}


def test_downsample_late_arrival_refreshes_bucket(spark, tmp_path):
    db = _db(spark, tmp_path)
    _write(db, [("west", 1.0, 10 * S)])
    downsample_table(db, "cpu", "cpu_1m", every_seconds=60)
    # a late point lands in the ALREADY-downsampled bucket
    _write(db, [("west", 3.0, 20 * S)])
    downsample_table(db, "cpu", "cpu_1m", every_seconds=60)
    rows = db.table("cpu_1m").collect()
    # PK dedup upserts the refreshed mean — one logical row, new value
    assert [(r.region, r.time, r.user) for r in rows] == [("west", 60 * S, 2.0)]
    # physically two chunks until compaction collapses them
    assert len(db.store.manifest("cpu_1m")) == 2


def test_hwm_is_metadata_only_no_dst_reads(spark, tmp_path):
    """The sweep's high-water-mark probe answers from the manifest's
    per-chunk time stats — an N-chunk destination must trigger ZERO
    destination data reads (the former ``max("time")`` scan was O(dst
    size) and grew every sweep)."""
    db = _db(spark, tmp_path)
    _write(db, [("west", 1.0, 10 * S), ("west", 5.0, 70 * S)])
    downsample_table(db, "cpu", "cpu_1m", every_seconds=60)
    _write(db, [("west", 9.0, 200 * S)])
    downsample_table(db, "cpu", "cpu_1m", every_seconds=60)
    assert len(db.store.manifest("cpu_1m")) >= 2  # N-chunk destination

    dst_scans = []
    orig_table = db.table

    def spy_table(name, predicate=None):
        if name == "cpu_1m":
            dst_scans.append(name)
        return orig_table(name, predicate)

    db.table = spy_table
    _write(db, [("west", 2.0, 400 * S)])
    meta = downsample_table(db, "cpu", "cpu_1m", every_seconds=60,
                            late_arrive_window_seconds=0)
    assert meta is not None
    assert dst_scans == [], "hwm probe read destination data"
    db.table = orig_table
    got = {r.time: r.user for r in db.table("cpu_1m").filter("region='west'").collect()}
    assert got[420 * S] == 2.0  # sweep still lands the new bucket


def test_hwm_scan_fallback_when_stats_missing(spark, tmp_path):
    """A destination chunk with no time stats (e.g. imported foreign
    parquet) forces the one legitimate scan fallback; an empty manifest
    means no rows AND no scan."""
    db = _db(spark, tmp_path)
    _write(db, [("west", 1.0, 10 * S)])
    downsample_table(db, "cpu", "cpu_1m", every_seconds=60)
    from influxdb_iox_spark.streaming.downsample import _manifest_time_hwm

    hwm, needs_scan = _manifest_time_hwm(db.store, "cpu_1m")
    assert hwm == 60 * S and needs_scan is False  # bucket stop time

    class StatlessStore:
        def manifest(self, table):
            metas = db.store.manifest(table)
            for m in metas:
                m.stats.pop("time", None)
            return metas

    hwm, needs_scan = _manifest_time_hwm(StatlessStore(), "cpu_1m")
    assert hwm is None and needs_scan is True
    # empty manifest: no rows, no scan either
    assert _manifest_time_hwm(db.store, "nonexistent") == (None, False)


def test_downsample_count_and_empty_tail(spark, tmp_path):
    db = _db(spark, tmp_path)
    _write(db, [("west", 1.0, 10 * S), ("west", 3.0, 20 * S)])
    downsample_table(db, "cpu", "cpu_counts", every_seconds=60, agg="count")
    (row,) = db.table("cpu_counts").collect()
    assert (row.region, row.time, row.user) == ("west", 60 * S, 2)
    with pytest.raises(ValueError, match="unknown agg"):
        downsample_table(db, "cpu", "x", 60, agg="median")


def test_lifecycle_sweep_runs_downsample_rules(spark, tmp_path):
    """Server-level continuous queries: rules['downsample'] entries run on
    every lifecycle sweep, tail-incrementally."""
    from influxdb_iox_spark.rpc_management import IoxServer

    iox = IoxServer(spark, str(tmp_path / "dsrv"))
    iox.create_database(
        {"name": "m", "partition_template": {"parts": [{"table": {}}]}}
    )
    iox.databases["m"].rules["downsample"] = [
        {"src": "cpu", "dst": "cpu_1m", "every_seconds": 60, "agg": "mean"}
    ]
    iox.write_lp("m", f"cpu,region=west user=1.0 {10 * S}\n"
                      f"cpu,region=west user=3.0 {50 * S}")
    report = iox.run_lifecycle("m")
    assert report["downsampled"] == {"cpu_1m": 1}
    (row,) = iox.databases["m"].database.table("cpu_1m").collect()
    assert (row.region, row.time, row.user) == ("west", 60 * S, 2.0)
    # second sweep with no new data re-emits at most the hwm bucket
    report2 = iox.run_lifecycle("m")
    assert report2["downsampled"]["cpu_1m"] <= 1


def test_incremental_cut_never_splits_a_bucket(spark, tmp_path):
    """Regression (review finding): a tail cut INSIDE a bucket would
    re-aggregate it from a subset of rows and the partial mean would
    permanently overwrite the correct value via PK upsert.  With a late
    window that is NOT a multiple of `every`, the refreshed bucket must
    still aggregate ALL of its rows."""
    db = _db(spark, tmp_path)
    # bucket (120s,180s]: rows at 130s and 155s -> mean 6.0
    _write(db, [("west", 2.0, 130 * S), ("west", 10.0, 155 * S)])
    downsample_table(db, "cpu", "cpu_1m", every_seconds=60,
                     late_arrive_window_seconds=30)
    # advance the hwm two buckets, then sweep with late=30s (mid-bucket
    # cut at 240-60-30=150s if unaligned)
    _write(db, [("west", 7.0, 200 * S)])
    downsample_table(db, "cpu", "cpu_1m", every_seconds=60,
                     late_arrive_window_seconds=30)
    got = {r.time: r.user for r in db.table("cpu_1m").collect()}
    assert got[180 * S] == 6.0  # NOT 10.0 (the partial re-aggregate)
    assert got[240 * S] == 7.0


def test_multi_agg_rollup_one_pass(spark, tmp_path):
    """agg=[...] produces one <field>_<agg> column per pair in a single
    aggregation (the `SELECT mean(v), max(v), count(v) INTO ...` CQ
    shape), with count staying integer."""
    db = _db(spark, tmp_path)
    _write(db, [("west", 1.0, 10 * S), ("west", 3.0, 50 * S),
                ("east", 8.0, 70 * S)])
    meta = downsample_table(db, "cpu", "cpu_1m", every_seconds=60,
                            agg=["mean", "max", "count"])
    assert meta is not None
    rows = {(r.region, r.time): r for r in db.table("cpu_1m").collect()}
    w = rows[("west", 60 * S)]
    assert (w.user_mean, w.user_max, w.user_count) == (2.0, 3.0, 2)
    assert isinstance(w.user_count, int)
    e = rows[("east", 120 * S)]
    assert (e.user_mean, e.user_max, e.user_count) == (8.0, 8.0, 1)
    # incremental sweep with the same agg list keeps working (PK upsert)
    _write(db, [("west", 9.0, 200 * S)])
    downsample_table(db, "cpu", "cpu_1m", every_seconds=60,
                     agg=["mean", "max", "count"],
                     late_arrive_window_seconds=0)
    rows = {(r.region, r.time): r for r in db.table("cpu_1m").collect()}
    assert rows[("west", 240 * S)].user_max == 9.0
    with pytest.raises(ValueError, match="unknown agg"):
        downsample_table(db, "cpu", "cpu_x", every_seconds=60, agg=["median"])
    with pytest.raises(ValueError, match="must not be empty"):
        downsample_table(db, "cpu", "cpu_x", every_seconds=60, agg=[])
