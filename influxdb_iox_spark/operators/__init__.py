from influxdb_iox_spark.operators.asof import asof_join
from influxdb_iox_spark.operators.dedup import deduplicate
from influxdb_iox_spark.operators import transforms
from influxdb_iox_spark.operators.selectors import (
    selector_first,
    selector_last,
    selector_max,
    selector_min,
)

__all__ = ["asof_join", "deduplicate", "transforms", "selector_first", "selector_last", "selector_min", "selector_max"]
