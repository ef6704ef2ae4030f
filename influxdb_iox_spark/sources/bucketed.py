"""Bucketed table layout for shuffle-free AND sort-free co-located joins.

At 100 TB, repeated joins on the same high-cardinality key (tag hash, doc
id, user id) should not re-shuffle either side every query.  Spark's
bucketing persists the hash-partitioning INTO the table layout: both sides
bucketed by the join key into the same bucket count join with zero
exchanges.  The round-10 sf10 experiment (scripts/bench_bucketed_sf10.py,
BENCH_NOTES §17b) established the load-bearing refinement promoted here:

    **one file per bucket** — the reader only trusts bucket SORTEDNESS
    when each bucket is a single file (multiple files per bucket would
    need a merge, so Spark re-sorts); aligning the write with
    ``repartition(n_buckets, *bucket_cols)`` (repartition's murmur3-pmod
    is the same function bucketing uses) makes every bucket land in
    exactly one file, and the join drops the Sort as well as the
    Exchange.  Measured locally at sf10: q5 −18% — the floor of the win;
    on a real cluster the removed Exchange is a network shuffle of the
    fact side per query vs a write-once layout cost.

Bucket metadata only survives via the session catalog, so a bare parquet
path read would silently lose co-location.  ``write_bucketed`` therefore
persists a ``_bucket_spec.json`` sidecar (schema DDL + bucket spec) next
to the data, and ``register_bucketed`` re-creates the catalog entry from
it in ANY later session — the layout is durable, not a session artifact.

This is the columnar analogue of the reference keeping chunks organized by
series key (read_buffer row groups are sorted by the series-key prefix so
per-series operators never re-sort; read_buffer/src/row_group.rs): the
organization is paid once at write time and every subsequent
join/aggregation on that key rides it for free.
"""

from __future__ import annotations

import glob
import json
import os
import re

from pyspark.sql import DataFrame, SparkSession

SPEC_FILE = "_bucket_spec.json"

#: bucketed data files look like part-00000-<uuid>_00003.c000.snappy.parquet
#: where _00003 is the BUCKET id (not the task id)
_BUCKET_ID_RE = re.compile(r"_(\d{5})(?:\.c\d+)?\.[^/]*parquet$")


def ensure_bucket_ordering_conf(spark: SparkSession) -> None:
    """Make the one-file-per-bucket Sort-elision contract hold in THIS
    session.  Single-file buckets only report their sort order under
    SPARK-28595's ``spark.sql.legacy.bucketedTableScan.outputOrdering``
    — a RUNTIME SQL conf, so setting it here (rather than only in
    session.get_spark's builder) makes the layout self-contained in any
    session: driver harness, bare spark-submit, a fresh notebook.
    Without it the reader re-Sorts both sides of every co-located join
    (the round-11 gate red row)."""
    spark.conf.set(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "true"
    )


def _hadoop_fs(spark: SparkSession, path: str):
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    bucket_columns: list[str],
    n_buckets: int = 16,
    sort_columns: list[str] | None = None,
    one_file_per_bucket: bool = True,
) -> None:
    """Persist ``df`` as an external bucketed (and bucket-sorted) table,
    plus a ``_bucket_spec.json`` sidecar so later sessions can re-register
    it (see ``register_bucketed``).

    ``one_file_per_bucket`` pre-aligns the write with
    ``repartition(n_buckets, *bucket_columns)`` — repartition's
    murmur3-pmod hash is the same function the bucket id uses, so each
    task holds exactly one bucket's rows and writes exactly one file.
    The resulting layout is verified after the write (a violated
    invariant would silently re-introduce the per-query Sort)."""
    spark = df.sparkSession
    ensure_bucket_ordering_conf(spark)
    sort_columns = list(sort_columns or bucket_columns)
    if one_file_per_bucket:
        from pyspark.sql import functions as F

        df = df.repartition(n_buckets, *[F.col(c) for c in bucket_columns])
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, *bucket_columns)
        .sortBy(*sort_columns)
        .option("path", path)
        .format("parquet")
        .saveAsTable(name)
    )
    if one_file_per_bucket:
        counts = bucket_file_counts(path, spark)
        if not counts:
            raise RuntimeError(
                f"bucketed write to {path!r} left no listable data files "
                "— cannot verify the one-file-per-bucket invariant"
            )
        multi = {b: c for b, c in counts.items() if c > 1}
        if multi:
            raise RuntimeError(
                f"bucketed write to {path!r} produced multiple files for "
                f"buckets {sorted(multi)} — the repartition/bucket hash "
                "alignment broke; the reader would re-Sort every join"
            )
    spec = {
        "name": name,
        "schema_ddl": df._jdf.schema().toDDL(),
        "bucket_columns": list(bucket_columns),
        "n_buckets": n_buckets,
        "sort_columns": sort_columns,
        "one_file_per_bucket": one_file_per_bucket,
    }
    _write_text(os.path.join(path, SPEC_FILE), json.dumps(spec), spark)


def bucket_file_counts(
    path: str, spark: SparkSession | None = None
) -> dict[int, int]:
    """bucket id -> number of data files (layout invariant check).

    Local directories list via glob; any other scheme (s3a://, hdfs://)
    lists via the Hadoop FS API — quietly returning {} for a path we
    cannot glob would let the one-file-per-bucket check pass vacuously
    and silently reintroduce the per-query Sort on every join."""
    if os.path.isdir(path):
        names = [
            os.path.basename(p)
            for p in glob.glob(os.path.join(path, "part-*"))
        ]
    else:
        spark = spark or SparkSession.getActiveSession()
        if spark is None:
            raise RuntimeError(
                f"cannot verify bucket layout of non-local path {path!r}: "
                "no active SparkSession for a Hadoop FS listing"
            )
        fs, jpath = _hadoop_fs(spark, path)
        names = [
            st.getPath().getName()
            for st in fs.listStatus(jpath)
            if st.getPath().getName().startswith("part-")
        ]
    counts: dict[int, int] = {}
    for nm in names:
        m = _BUCKET_ID_RE.search(nm)
        if m:
            b = int(m.group(1))
            counts[b] = counts.get(b, 0) + 1
    return counts


def _write_text(path: str, data: str, spark: SparkSession) -> None:
    """Sidecar write that works on any Hadoop-visible filesystem (the
    spec is what makes the layout durable beyond one session — it must
    not silently require POSIX)."""
    if os.path.isdir(os.path.dirname(path)):
        with open(path, "w") as f:
            f.write(data)
        return
    fs, jpath = _hadoop_fs(spark, path)
    out = fs.create(jpath, True)
    try:
        out.write(bytearray(data.encode()))
    finally:
        out.close()


def read_spec(path: str, spark: SparkSession | None = None) -> dict:
    full = os.path.join(path, SPEC_FILE)
    if os.path.isfile(full):
        with open(full) as f:
            return json.load(f)
    spark = spark or SparkSession.getActiveSession()
    if spark is None:
        raise FileNotFoundError(full)
    fs, jpath = _hadoop_fs(spark, full)
    stream = fs.open(jpath)
    try:
        data = bytes(stream.readAllBytes())
    finally:
        stream.close()
    return json.loads(data.decode())


def register_bucketed(
    spark: SparkSession, path: str, name: str | None = None
) -> DataFrame:
    """(Re-)register a bucketed table from its on-disk spec and return it.

    Safe in a fresh session: the catalog entry is re-created from the
    sidecar (``CREATE TABLE … CLUSTERED BY … INTO n BUCKETS LOCATION``),
    which is what preserves the bucket metadata a bare
    ``spark.read.parquet(path)`` would lose."""
    ensure_bucket_ordering_conf(spark)
    spec = read_spec(path, spark)
    name = name or spec["name"]
    if not spark.catalog.tableExists(name):
        cluster = ", ".join(f"`{c}`" for c in spec["bucket_columns"])
        sort = ", ".join(f"`{c}`" for c in spec["sort_columns"])
        spark.sql(
            f"CREATE TABLE `{name}` ({spec['schema_ddl']}) USING PARQUET "
            f"CLUSTERED BY ({cluster}) SORTED BY ({sort}) "
            f"INTO {spec['n_buckets']} BUCKETS "
            f"LOCATION '{os.path.abspath(path)}'"
        )
    return spark.table(name)


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Read a bucketed table already registered in this session's catalog
    (bucket metadata only survives via the catalog table, not a bare
    parquet path read)."""
    ensure_bucket_ordering_conf(spark)
    return spark.table(name)


def plan_of(df: DataFrame) -> str:
    """Formatted physical plan of a FRESH (uncollected) DataFrame — a
    collected one prints both Final and Initial AQE plans and operator
    counts double (round-7 gotcha)."""
    jmode = df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(jmode)


def assert_colocated_join(df: DataFrame) -> None:
    """Raise unless ``df``'s WHOLE plan is Exchange-free AND Sort-free —
    the invariant the one-file-per-bucket layout buys.  Pass the BARE
    join (plus narrow projections/filters), not a downstream aggregate or
    orderBy: those legitimately shuffle on their own keys, and a text
    split can't reliably carve them out of a formatted AQE plan (the tree
    section leads with the aggregate, so "everything before HashAggregate"
    is vacuously empty — the round-11 lesson).  Use in tests and as a
    deploy-time guard after layout migrations."""
    plan = plan_of(df)
    if "Exchange" in plan:
        raise AssertionError(f"co-located join still shuffles:\n{plan}")
    if re.search(r"\bSort\b", plan):
        raise AssertionError(
            f"co-located join still sorts (multi-file buckets?):\n{plan}"
        )
