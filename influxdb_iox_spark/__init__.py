"""influxdb_iox_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of influxdata/influxdb_iox (v0).

The reference (/root/reference) is a Rust time-series engine built on Arrow +
DataFusion.  This package re-expresses its entire query surface — SQL frontend,
the InfluxRPC time-series menu (read_filter / read_group /
read_window_aggregate / tag_keys / tag_values / table_names / field_columns),
primary-key deduplication, partition lifecycle (compact / persist-split), and
line-protocol ingest — as idiomatic Spark DataFrame plans so that Catalyst /
Tungsten / AQE pick the physical strategy.

Layout:
    schema      — Influx column categories (tag/field/time), ns-time convention
    plans       — Predicate model → Column expressions; reorg (compact/split)
    operators   — dedup (the signature IOx operator), selectors, window aggs,
                  metadata ops (SchemaPivot equivalent), series framing
    sources     — line-protocol parser, partitioned Parquet store + manifest
    functions   — window_bounds (ns), regex match, time helpers
    streaming   — Structured Streaming ingest (foreachBatch append + manifest)
    pipeline    — large-scale training-data ops: dedup (exact/minhash/simhash),
                  similarity search, text analysis, multimodal columns
"""

__version__ = "0.1.0"
