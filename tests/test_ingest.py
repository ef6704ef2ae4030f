"""Ingest path: distributed line-protocol parse → chunks → queryable,
including the streaming wrapper (availableNow trigger) and replay safety."""

from __future__ import annotations

import os

from influxdb_iox_spark.schema import InfluxColumnType, IoxSchema
from influxdb_iox_spark.sources.store import TableStore
from influxdb_iox_spark.streaming.ingest import (
    LineProtocolIngest,
    PartitionTemplate,
    _strftime_to_spark,
)

CPU = IoxSchema.build(["region"], {"user": InfluxColumnType.FIELD_FLOAT})

# Times on two different days → two partition keys under %Y-%m-%d
NS_DAY1 = 1_600_000_000 * 10**9
NS_DAY2 = NS_DAY1 + 86_400 * 10**9
LINES = [
    f"cpu,region=west user=23.2 {NS_DAY1}",
    f"cpu,region=west user=21.0 {NS_DAY1 + 50}",
    f"cpu,region=east user=5.0 {NS_DAY2}",
    f"cpu,region=west user=99.0 {NS_DAY1}",  # same PK as line 1 → later wins
]


def test_strftime_mapping():
    assert _strftime_to_spark("%Y-%m-%d %H") == "yyyy-MM-dd HH"


def test_batch_ingest_partitions_and_dedup(spark, tmp_path):
    store = TableStore(str(tmp_path / "store"))
    ing = LineProtocolIngest(store, "cpu", CPU)
    lines_df = spark.createDataFrame([(l,) for l in LINES], "value string")
    metas = ing.ingest_lines_df(lines_df)
    assert sorted(m.partition_key for m in metas) == ["2020-09-13", "2020-09-14"]

    out = store.scan(spark, "cpu", CPU)
    rows = sorted(tuple(r) for r in out.select("region", "user", "time").collect())
    assert rows == [
        ("east", 5.0, NS_DAY2),
        ("west", 21.0, NS_DAY1 + 50),
        ("west", 99.0, NS_DAY1),  # within-batch dedup: later line won
    ]


def test_stream_ingest_available_now(spark, tmp_path):
    src = tmp_path / "incoming"
    os.makedirs(src)
    with open(src / "batch1.txt", "w") as f:
        f.write("\n".join(LINES[:2]) + "\n")
    store = TableStore(str(tmp_path / "store"))
    ing = LineProtocolIngest(store, "cpu", CPU)
    q = ing.start_stream(
        spark, str(src), str(tmp_path / "ckpt"), trigger_once=True
    )
    q.awaitTermination(120)
    # second file arrives; restart stream (same checkpoint) → only new data read
    with open(src / "batch2.txt", "w") as f:
        f.write(LINES[2] + "\n")
    q = ing.start_stream(spark, str(src), str(tmp_path / "ckpt"), trigger_once=True)
    q.awaitTermination(120)

    out = store.scan(spark, "cpu", CPU)
    rows = sorted(tuple(r) for r in out.select("region", "user", "time").collect())
    assert rows == [
        ("east", 5.0, NS_DAY2),
        ("west", 23.2, NS_DAY1),
        ("west", 21.0, NS_DAY1 + 50),
    ] or rows == sorted(
        [("east", 5.0, NS_DAY2), ("west", 23.2, NS_DAY1), ("west", 21.0, NS_DAY1 + 50)]
    )


def test_batch_ingest_parses_once_regardless_of_key_count(spark, tmp_path):
    """The parse stage must physically execute once per input partition, not
    once per partition key (the batch spans 2 days = 2 keys + the distinct
    scan + per-chunk tag catalogs; without the localCheckpoint the mapInArrow
    stage would re-run for every consumer)."""
    store = TableStore(str(tmp_path / "store"))
    ing = LineProtocolIngest(store, "cpu", CPU)
    lines_df = spark.createDataFrame([(l,) for l in LINES], "value string").coalesce(1)
    acc = spark.sparkContext.accumulator(0)
    metas = ing.ingest_lines_df(lines_df, parse_counter=acc)
    assert len(metas) == 2
    assert acc.value == 1, f"parse executed {acc.value} times for 1 input partition"


def test_backfill_many_keys_is_one_write_job(spark, tmp_path):
    """A 30-key backfill batch must run ONE partitioned write job + one
    tag-catalog job — not one write + one catalog job per key (the round-3
    shape).  Asserted by counting Spark jobs in a dedicated job group."""
    store = TableStore(str(tmp_path / "store"))
    ing = LineProtocolIngest(store, "cpu", CPU)
    day_ns = 86_400 * 10**9
    lines = [
        (f"cpu,region=r{i % 3} user={float(i)} {i * day_ns}",) for i in range(30)
    ]
    keyed = ing.parse_lines_df(spark.createDataFrame(lines, "value string"))

    sc = spark.sparkContext
    sc.setJobGroup("bulk-backfill", "bulk write", False)
    try:
        metas = ing.write_parsed(keyed)
    finally:
        sc.setJobGroup("", "", False)
    jobs = sc.statusTracker().getJobIdsForGroup("bulk-backfill")
    assert len(metas) == 30
    assert {m.partition_key for m in metas} == {
        m.partition_key for m in store.manifest("cpu")
    }
    # 2 actions (1 partitionBy write + 1 grouped tag-catalog collect); AQE
    # materializes shuffle stages as their own jobs, so allow a small
    # constant — the round-3 shape ran ~60 jobs (2 per key) here.
    assert len(jobs) <= 6, f"expected O(1) jobs for 30 keys, ran {len(jobs)}"

    # chunks are readable and PK-sorted rows round-trip
    total = sum(m.row_count for m in metas)
    assert total == 30
    one = [m for m in metas if m.partition_key == "1970-01-05"]
    assert len(one) == 1
    rows = store.read_chunk(spark, one[0]).collect()
    assert len(rows) == 1 and rows[0].user == 4.0
