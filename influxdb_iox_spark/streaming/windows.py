"""Streaming windowed aggregation with late-data handling.

The reference has no streaming query engine — its "streaming" is continuous
ingest + dedup-on-read + a late-arrival window (SURVEY.md §2.12).  Spark's
Structured Streaming gives true streaming windows for free; this module
exposes them with the engine's conventions (ns-long time column, tag/field
categories, window STOP boundary reported as ``time``).

``windowed_aggregate`` works on both batch and streaming DataFrames (the
Spark unified model); on a stream, ``late_arrive_window`` becomes a
watermark — the exact counterpart of the reference's
persistence_windows late-arrival handling (late rows inside the window
still update their bucket; older ones are dropped from state).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from influxdb_iox_spark.schema import TIME_COLUMN_NAME


def windowed_aggregate(
    df: DataFrame,
    tag_columns: list[str],
    agg_exprs: list[Column],
    every_seconds: int,
    late_arrive_window_seconds: int = 300,
    time_column: str = TIME_COLUMN_NAME,
) -> DataFrame:
    """Tumbling event-time windows per series, stop boundary as ``time`` (µs).

    The ns-long canonical time is converted to a µs TimestampType column for
    Spark's window/watermark machinery (watermarks require TimestampType);
    the output time is the window END in epoch-µs, matching
    read_window_aggregate's stop-boundary convention.
    """
    from influxdb_iox_spark.schema import ns_to_us_floor

    ts = F.timestamp_micros(ns_to_us_floor(time_column))
    with_ts = df.withColumn("__event_ts", ts)
    if with_ts.isStreaming:
        with_ts = with_ts.withWatermark(
            "__event_ts", f"{late_arrive_window_seconds} seconds"
        )
    win = F.window("__event_ts", f"{every_seconds} seconds")
    return (
        with_ts.groupBy(*tag_columns, win.alias("__w"))
        .agg(*agg_exprs)
        .withColumn("time", F.unix_micros(F.col("__w.end")))
        .drop("__w")
    )
