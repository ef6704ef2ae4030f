"""Bucketed table layout for shuffle-free co-located joins.

At 100 TB, repeated joins on the same high-cardinality key (tag hash, doc
id, user id) should not re-shuffle either side every query.  Spark's
bucketing persists the hash-partitioning INTO the table layout: both sides
bucketed by the join key into the same bucket count join with zero
exchanges (the physical plan shows SortMergeJoin directly over the scans).

This is the columnar analogue of the reference keeping chunks organized by
series key — the organization is paid once at write time and every
subsequent join/aggregation on that key rides it for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    bucket_columns: list[str],
    n_buckets: int = 16,
    sort_columns: list[str] | None = None,
) -> None:
    """Persist ``df`` as an external bucketed (and bucket-sorted) table."""
    writer = (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, *bucket_columns)
        .sortBy(*(sort_columns or bucket_columns))
        .option("path", path)
        .format("parquet")
    )
    writer.saveAsTable(name)


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Read a bucketed table (bucket metadata only survives via the catalog
    table, not a bare parquet path read)."""
    return spark.table(name)
