"""SparkSession construction with the engine's required configuration.

Design notes (100 TB scale):
- AQE on: runtime coalescing of shuffle partitions, skew-join splitting, and
  dynamic join-strategy switching replace most hand-tuning.
- ``nanosAsLong``: the reference stores time as nanosecond i64
  (/root/reference/internal_types/src/schema.rs:36-40); Spark's TimestampType
  is microsecond, so we keep the canonical ``time`` column as LongType ns and
  derive timestamp views only for humans.  This also makes parquet files with
  TIMESTAMP(NANOS) readable.
- Session timezone pinned to UTC so collected timestamps are reproducible and
  comparable against external engines.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults are sized for the local[32] test harness; on a real cluster the
# submitter overrides master/shuffle partitions (rule of thumb: 2-3x total
# cores, or rely on AQE coalescing from a high initial value).
DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "influxdb_iox_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession configured for this engine."""
    cpus = DEFAULT_CPUS
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions if shuffle_partitions is not None else cpus),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # Hash joins over sort-merge when no broadcast applies: the
        # reference stack (DataFusion/read_buffer) is a hash-join engine,
        # and the two per-side sorts SMJ inserts buy nothing here — fact
        # joins shuffle either way, AQE skew-split covers the skew case
        # (works for SHJ since Spark 3.2), and the build side is the
        # smaller relation per partition.  Measured on the 60M-row sf10
        # star joins: q5 ~17.0 -> ~15.0 s (BENCH_NOTES §13); sf0.1 rows
        # unaffected (dims broadcast there).
        .config("spark.sql.join.preferSortMergeJoin", "false")
        # Bucketed scans report their per-bucket sort order again
        # (SPARK-28595 turned this off by default because the one-file-
        # per-bucket check costs a file listing): the store's bucketed
        # projections ENFORCE one file per bucket at write time
        # (sources/bucketed.py), so a sort-merge join over them skips
        # both the Exchange and the Sort.  No effect on non-bucketed
        # reads; multi-file buckets still (correctly) re-sort.
        .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
        .config("spark.sql.files.maxPartitionBytes", "256m")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        # Whole-stage codegen emits one class per stage; wide plans (multi-agg
        # signatures, decimal trees) exhaust the default 240m JIT code cache
        # mid-session, silently de-optimizing EVERYTHING to interpreter speed
        # (observed 5-10x degradation).  Reserve enough for long sessions.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:+UseG1GC",
        )
        .config(
            "spark.executor.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:+UseG1GC",
        )
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
