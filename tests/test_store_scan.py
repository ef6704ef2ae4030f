"""TableStore write/scan: manifest stats, chunk pruning, overlap-aware dedup,
compaction and persist-split — the scenario-dual pattern from the reference
(query_tests/src/scenarios.rs): the same logical data in several physical
arrangements must answer queries identically."""

from __future__ import annotations

import pytest

from influxdb_iox_spark.database import Database
from influxdb_iox_spark.operators.overlap import group_potential_duplicates
from influxdb_iox_spark.plans.predicate import Predicate
from influxdb_iox_spark.plans.reorg import compact_overlapping, persist_split
from influxdb_iox_spark.schema import InfluxColumnType, IoxSchema
from influxdb_iox_spark.sources.store import TableStore

CPU = IoxSchema.build(["region"], {"user": InfluxColumnType.FIELD_FLOAT})


def make_store(spark, tmp_path):
    store = TableStore(str(tmp_path))
    # chunk 0: west rows at t=100,150
    c0 = spark.createDataFrame(
        [("west", 23.2, 100), ("west", 21.0, 150)], "region string, user double, time long"
    )
    store.write_chunk(c0, "cpu", CPU, partition_key="p1")
    # chunk 1: overlaps (west,100) with a new value; plus east row
    c1 = spark.createDataFrame(
        [("west", 99.9, 100), ("east", 5.0, 120)], "region string, user double, time long"
    )
    store.write_chunk(c1, "cpu", CPU, partition_key="p1")
    # chunk 2: far-future, non-overlapping clean chunk
    c2 = spark.createDataFrame(
        [("north", 1.0, 10_000)], "region string, user double, time long"
    )
    store.write_chunk(c2, "cpu", CPU, partition_key="p2")
    return store


def scan_rows(spark, store, predicate=None):
    df = store.scan(spark, "cpu", CPU, predicate)
    return sorted(tuple(r) for r in df.select("region", "user", "time").collect())


EXPECTED_ALL = [
    ("east", 5.0, 120),
    ("north", 1.0, 10_000),
    ("west", 21.0, 150),
    ("west", 99.9, 100),  # chunk 1 upserted chunk 0's (west,100)
]


def test_manifest_stats_and_overlap(spark, tmp_path):
    store = make_store(spark, tmp_path)
    chunks = store.manifest("cpu")
    assert [c.row_count for c in chunks] == [2, 2, 1]
    assert chunks[0].column_range("time") == (100, 150)
    groups = group_potential_duplicates(chunks, CPU.primary_key)
    # chunks 0,1 overlap on (region,time); chunk 2 is clean
    assert groups == [[0, 1], [2]]


def test_scan_dedups_overlapping_only(spark, tmp_path):
    store = make_store(spark, tmp_path)
    assert scan_rows(spark, store) == EXPECTED_ALL


def test_scan_time_pruning(spark, tmp_path):
    store = make_store(spark, tmp_path)
    pred = Predicate().with_range(0, 1000)
    pruned = store.prune_chunks("cpu", pred)
    assert [c.chunk_id for c in pruned] == [0, 1]  # far-future chunk pruned
    assert scan_rows(spark, store, pred) == [r for r in EXPECTED_ALL if r[2] < 1000]


def test_scan_partition_key_pruning(spark, tmp_path):
    store = make_store(spark, tmp_path)
    pred = Predicate(partition_key="p2")
    assert [c.chunk_id for c in store.prune_chunks("cpu", pred)] == [2]


def test_compaction_preserves_results(spark, tmp_path):
    store = make_store(spark, tmp_path)
    before = scan_rows(spark, store)
    compact_overlapping(spark, store, "cpu", CPU)
    chunks = store.manifest("cpu")
    assert len(chunks) == 2  # [0,1] merged; clean chunk untouched
    groups = group_potential_duplicates(chunks, CPU.primary_key)
    assert all(len(g) == 1 for g in groups)  # nothing overlaps after compact
    assert scan_rows(spark, store) == before  # scenario-dual equality


def test_persist_split(spark, tmp_path):
    store = make_store(spark, tmp_path)
    before = scan_rows(spark, store)
    cold, hot = persist_split(spark, store, "cpu", CPU, split_time_ns=120)
    assert cold is not None and hot is not None
    assert cold.row_count == 2  # (west,100),(east,120) — time <= 120
    assert hot.row_count == 2  # (west,150),(north,10000)
    assert scan_rows(spark, store) == before


def test_database_sql_surface(spark, tmp_path):
    store = make_store(spark, tmp_path)
    db = Database("db", store, spark)
    db.register_table("cpu", CPU)
    out = db.query(
        "SELECT region, sum(user) AS total FROM cpu GROUP BY region ORDER BY region"
    ).collect()
    assert [(r.region, r.total) for r in out] == [
        ("east", 5.0),
        ("north", 1.0),
        ("west", pytest.approx(120.9)),
    ]
    sys_rows = db.query("SELECT count(*) AS n FROM system_chunks").first()
    assert sys_rows.n == 3


def test_manifest_scales_to_many_chunks(tmp_path):
    """10^4 chunk registrations stay O(partition) per append: the partitioned
    manifest rewrites one partition file per write, so total time is seconds,
    and partition-scoped reads touch exactly one file."""
    import time as _t

    from influxdb_iox_spark.sources.store import ChunkMeta, TableStore

    store = TableStore(str(tmp_path / "store"))
    n_parts, per_part = 100, 100
    t0 = _t.perf_counter()
    for p in range(n_parts):
        key = f"2024-01-{p:03d}"
        for i in range(per_part):
            cid = store._alloc_chunk_id("events")
            store._append_manifest(
                "events",
                ChunkMeta(
                    chunk_id=cid,
                    path=f"events/chunk-{cid:06d}",
                    table="events",
                    partition_key=key,
                    row_count=1000,
                    stats={"time": [p * 1000, p * 1000 + 999]},
                ),
            )
    elapsed = _t.perf_counter() - t0
    assert elapsed < 30, f"10^4 manifest appends took {elapsed:.1f}s"

    all_chunks = store.manifest("events")
    assert len(all_chunks) == n_parts * per_part
    assert len({c.chunk_id for c in all_chunks}) == n_parts * per_part

    # partition-scoped read: exactly the one partition, without a full read
    one = store.manifest_partition("events", "2024-01-007")
    assert len(one) == per_part
    assert {c.partition_key for c in one} == {"2024-01-007"}

    # drop a partition's chunks: only that file rewritten, rest intact
    store.drop_chunks("events", [c.chunk_id for c in one], delete_files=False)
    assert len(store.manifest("events")) == (n_parts - 1) * per_part
    assert store.manifest_partition("events", "2024-01-007") == []

    # time-range pruning over the full 10^4-chunk manifest is metadata-fast
    from influxdb_iox_spark.plans.predicate import Predicate

    t0 = _t.perf_counter()
    pruned = store.prune_chunks("events", Predicate().with_range(5000, 6000))
    assert _t.perf_counter() - t0 < 2
    assert {c.partition_key for c in pruned} == {"2024-01-005"}


def test_partition_key_none_literal_does_not_collide_with_empty(tmp_path):
    """A literal '__none__' partition key and the empty key must live in
    separate manifest files."""
    from influxdb_iox_spark.sources.store import ChunkMeta, TableStore

    store = TableStore(str(tmp_path / "collide"))
    for key in ("", "__none__"):
        cid = store._alloc_chunk_id("t")
        store._append_manifest(
            "t",
            ChunkMeta(chunk_id=cid, path=f"t/c{cid}", table="t",
                      partition_key=key, row_count=1),
        )
    assert len(store.manifest("t")) == 2
    assert [c.partition_key for c in store.manifest_partition("t", "")] == [""]
    assert [c.partition_key for c in store.manifest_partition("t", "__none__")] == ["__none__"]


def test_overlap_sweep_equals_bruteforce_randomized():
    """The interval-sweep grouping must produce exactly the all-pairs
    transitive closure for random range layouts (incl. unknown bounds)."""
    import random

    from influxdb_iox_spark.operators.overlap import (
        chunks_overlap,
        group_potential_duplicates,
    )
    from influxdb_iox_spark.sources.store import ChunkMeta

    rng = random.Random(7)
    for trial in range(30):
        n = rng.randint(1, 40)
        chunks = []
        for i in range(n):
            if rng.random() < 0.1:
                stats = {}  # unknown everything -> overlaps all
            else:
                lo = rng.randint(0, 200)
                hi = lo + rng.randint(0, 60)
                tag_lo = rng.choice("abcd")
                # include half-bounded stats: ranges_overlap treats any None
                # bound as overlap-everything, and the sweep must never
                # retire those chunks
                roll = rng.random()
                if roll < 0.05:
                    time_stats = [None, None]
                elif roll < 0.12:
                    time_stats = [None, hi]
                elif roll < 0.19:
                    time_stats = [lo, None]
                else:
                    time_stats = [lo, hi]
                stats = {
                    "time": time_stats,
                    "region": [tag_lo, chr(ord(tag_lo) + rng.randint(0, 1))],
                }
            chunks.append(
                ChunkMeta(chunk_id=i, path="x", table="t", partition_key="",
                          row_count=1, stats=stats)
            )
        got = group_potential_duplicates(chunks, ["region", "time"])
        # brute-force reference closure
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for i in range(n):
            for j in range(i + 1, n):
                if chunks_overlap(chunks[i], chunks[j], ["region", "time"]):
                    ri, rj = find(i), find(j)
                    if ri != rj:
                        parent[rj] = ri
        want = {}
        for i in range(n):
            want.setdefault(find(i), []).append(i)
        want_groups = sorted(want.values(), key=lambda g: g[0])
        assert got == want_groups, (trial, n)


def test_overlap_grouping_fast_at_10k_disjoint_chunks():
    """10^4 time-disjoint chunks must group in ~linear time (the sweep), not
    the 40+ seconds of the naive all-pairs loop."""
    import time as _t

    from influxdb_iox_spark.operators.overlap import group_potential_duplicates
    from influxdb_iox_spark.sources.store import ChunkMeta

    chunks = [
        ChunkMeta(chunk_id=i, path="x", table="t", partition_key=f"p{i % 200}",
                  row_count=1,
                  stats={"time": [i * 1000, i * 1000 + 999],
                         "region": ["west", "west"]})
        for i in range(10_000)
    ]
    t0 = _t.perf_counter()
    groups = group_potential_duplicates(chunks, ["region", "time"])
    elapsed = _t.perf_counter() - t0
    assert len(groups) == 10_000  # all disjoint -> all clean singletons
    assert elapsed < 5, f"overlap grouping took {elapsed:.1f}s"


def test_field_stat_chunk_pruning(spark, tmp_path):
    """query_tests/src/pruning.rs chunk_pruning_sql: a clean chunk whose
    field stats are disjoint with the predicate (bar:[3,3] vs bar < 3) is
    dropped before Spark lists a single file."""
    schema = IoxSchema.build([], {"bar": InfluxColumnType.FIELD_FLOAT})
    store = TableStore(str(tmp_path / "fp"))
    m0 = store.write_chunk(
        spark.createDataFrame([(1.0, 10), (2.0, 20)], "bar double, time long"),
        "cpu", schema,
    )
    m1 = store.write_chunk(
        spark.createDataFrame(
            [(3.0, 100), (3.0, 1000)], "bar double, time long"
        ),
        "cpu", schema,
    )
    assert m1.stats["bar"] == [3.0, 3.0]  # field stats recorded

    pred = Predicate().with_col_range("bar", hi=3.0, hi_open=True)  # bar < 3
    out = store.scan(spark, "cpu", schema, pred)
    files = out.inputFiles()
    assert any(m0.path in f for f in files)
    assert not any(m1.path in f for f in files), "bar:[3,3] chunk not pruned"
    assert sorted(r.bar for r in out.collect()) == [1.0, 2.0]

    # predicate excluding every chunk -> empty frame, correct schema
    none = store.scan(
        spark, "cpu", schema, Predicate().with_col_range("bar", lo=100.0)
    )
    assert none.count() == 0 and set(none.columns) == {"bar", "time"}


def test_field_stat_pruning_never_touches_overlapping_chunks(spark, tmp_path):
    """Field-stat pruning must NOT drop a chunk that overlaps others on the
    PK: its fields survive into last-non-null merged rows, so dropping it
    would corrupt the merge (b=7 passes the filter, but a=5 lives only in
    the chunk whose own b stats fail it)."""
    schema = IoxSchema.build(
        ["t"],
        {"a": InfluxColumnType.FIELD_FLOAT, "b": InfluxColumnType.FIELD_FLOAT},
    )
    store = TableStore(str(tmp_path / "ov"))
    ddl = "t string, a double, b double, time long"
    store.write_chunk(
        spark.createDataFrame([("x", 5.0, 2.0, 100)], ddl), "m", schema
    )
    store.write_chunk(
        spark.createDataFrame([("x", None, 7.0, 100)], ddl), "m", schema
    )
    pred = Predicate().with_col_range("b", lo=5.0)  # chunk1's b:[2,2] fails it
    rows = store.scan(spark, "m", schema, pred).collect()
    assert len(rows) == 1
    assert rows[0].a == 5.0 and rows[0].b == 7.0  # merge saw BOTH chunks


def test_rpc_expr_lifts_comparisons_to_col_ranges():
    """Simple `col OP literal` conjuncts become structured bounds the chunk
    pruner can read; the flipped literal-first form normalizes."""
    from influxdb_iox_spark.plans.rpc_expr import rpc_predicate_to_predicate

    tree = {
        "node_type": "logical", "op": "and",
        "children": [
            {"node_type": "comparison", "op": "lt",
             "children": [{"node_type": "field_ref", "value": "bar"},
                          {"node_type": "literal", "value": 3.0}]},
            {"node_type": "comparison", "op": "lte",
             "children": [{"node_type": "literal", "value": 1.0},
                          {"node_type": "field_ref", "value": "bar"}]},
        ],
    }
    pred = rpc_predicate_to_predicate(tree)
    assert ("bar", None, 3.0, False, True) in pred.col_ranges
    assert ("bar", 1.0, None, False, False) in pred.col_ranges
    assert pred.excludes_stats({"bar": [3.0, 3.0]})       # bar < 3 disjoint
    assert pred.excludes_stats({"bar": [0.0, 0.5]})       # bar >= 1 disjoint
    assert not pred.excludes_stats({"bar": [1.0, 2.0]})
    assert not pred.excludes_stats({"bar": [None, None]})  # unknown keeps


def test_chunk_pruning_metrics_sql(spark, tmp_path):
    """pruning.rs:54-106 chunk_pruning_sql, with disjoint chunks so the
    field-stat pruner may act: bar<3 prunes the bar:[3,5] chunk, and the
    access metrics record 1 pruned chunk / 3 pruned rows (the
    query_access_pruned_{chunks,rows}_total counters)."""
    schema = IoxSchema.build([], {"bar": InfluxColumnType.FIELD_FLOAT})
    store = TableStore(str(tmp_path / "prune"))
    ddl = "bar double, time long"
    store.write_chunk(
        spark.createDataFrame([(1.0, 10), (2.0, 20)], ddl), "cpu", schema
    )
    store.write_chunk(
        spark.createDataFrame([(3.0, 30), (4.0, 40), (5.0, 50)], ddl),
        "cpu", schema,
    )
    pred = Predicate().with_col_range("bar", hi=3.0, hi_open=True)
    out = store.scan(spark, "cpu", schema, pred)
    assert [(r.bar, r.time) for r in out.orderBy("time").collect()] == [
        (1.0, 10),
        (2.0, 20),
    ]
    m = store.prune_metrics["cpu"]
    assert m["query_access_pruned_chunks_total"] == 1
    assert m["query_access_pruned_rows_total"] == 3


def test_chunk_pruning_metrics_time_range(spark, tmp_path):
    """Time-range pruning counts into the same metric families (the
    influxrpc access path of pruning.rs:109+ hits prune_chunks)."""
    schema = IoxSchema.build([], {"bar": InfluxColumnType.FIELD_FLOAT})
    store = TableStore(str(tmp_path / "trange"))
    ddl = "bar double, time long"
    store.write_chunk(
        spark.createDataFrame([(1.0, 10), (2.0, 20)], ddl), "cpu", schema
    )
    store.write_chunk(
        spark.createDataFrame([(3.0, 1000), (4.0, 2000)], ddl), "cpu", schema
    )
    kept = store.prune_chunks("cpu", Predicate().with_range(0, 100))
    assert len(kept) == 1
    m = store.prune_metrics["cpu"]
    assert m["query_access_pruned_chunks_total"] == 1
    assert m["query_access_pruned_rows_total"] == 2


def test_chunk_pruning_dirty_chunks_stay_merge_correct(spark, tmp_path):
    """The EXACT pruning.rs fixture: chunk0 bar=[1,2]@{10,20}, chunk1
    bar=3@{10,100,1000} — the chunks OVERLAP on the primary key (no tags,
    t=10 in both), so the reference's stats-only pruning of chunk1 changes
    the merged answer (its expected table keeps bar=1@10 even though
    chunk1's later bar=3@10 should win last-non-null before the filter).
    Our pruner deliberately EXEMPTS dirty chunks (sources/store.py scan):
    the dedup-correct answer filters the merged rows, so only bar=2@20
    survives bar<3 — and nothing is counted as pruned."""
    schema = IoxSchema.build([], {"bar": InfluxColumnType.FIELD_FLOAT})
    store = TableStore(str(tmp_path / "dirty"))
    ddl = "bar double, time long"
    store.write_chunk(
        spark.createDataFrame([(1.0, 10), (2.0, 20)], ddl), "cpu", schema
    )
    store.write_chunk(
        spark.createDataFrame([(3.0, 10), (3.0, 100), (3.0, 1000)], ddl),
        "cpu", schema,
    )
    pred = Predicate().with_col_range("bar", hi=3.0, hi_open=True)
    out = store.scan(spark, "cpu", schema, pred)
    assert [(r.bar, r.time) for r in out.orderBy("time").collect()] == [(2.0, 20)]
    assert "cpu" not in store.prune_metrics


def test_write_chunk_bloom_filter_columns(spark, tmp_path):
    """bloom_columns writes real parquet bloom filters (verified in the
    file footer via the JVM parquet reader: a bloom-filter offset is
    recorded for the named column and absent otherwise), the data reads
    back identically, and unknown columns are refused."""
    import os

    from influxdb_iox_spark.schema import InfluxColumnType, IoxSchema
    from influxdb_iox_spark.sources.store import TableStore

    sch = IoxSchema.build(["tag"], {"v": InfluxColumnType.FIELD_FLOAT})
    store = TableStore(str(tmp_path / "bloomstore"))
    df = spark.createDataFrame(
        [(f"u{i}", float(i), i) for i in range(2_000)],
        "tag string, v double, time long",
    )
    meta = store.write_chunk(df, "m", sch, bloom_columns=["tag"])

    def bloom_offsets(chunk_rel):
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        d = os.path.join(store.base_dir, chunk_rel)
        offs = {}
        for fn in os.listdir(d):
            if not fn.endswith(".parquet"):
                continue
            in_file = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
                jvm.org.apache.hadoop.fs.Path(os.path.join(d, fn)), conf
            )
            rdr = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(in_file)
            try:
                for rg in rdr.getRowGroups():
                    for col in rg.getColumns():
                        name = col.getPath().toDotString()
                        offs[name] = max(
                            offs.get(name, -1), col.getBloomFilterOffset()
                        )
            finally:
                rdr.close()
        return offs

    offs = bloom_offsets(meta.path)
    assert offs["tag"] > 0  # bloom filter present
    assert offs["v"] == -1 and offs["time"] == -1  # only where asked
    # contents unaffected; an equality probe still answers exactly
    got = store.scan(spark, "m", sch).filter("tag = 'u1234'").collect()
    assert len(got) == 1 and got[0]["v"] == 1234.0
    # default write: no blooms anywhere
    meta2 = store.write_chunk(df, "m2", sch)
    assert all(v == -1 for v in bloom_offsets(meta2.path).values())
    import pytest as _pytest

    with _pytest.raises(ValueError, match="bloom column"):
        store.write_chunk(df, "m3", sch, bloom_columns=["nope"])
