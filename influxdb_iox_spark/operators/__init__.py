from influxdb_iox_spark.operators.dedup import deduplicate
from influxdb_iox_spark.operators.selectors import (
    selector_first,
    selector_last,
    selector_max,
    selector_min,
)

__all__ = ["deduplicate", "selector_first", "selector_last", "selector_min", "selector_max"]
