from influxdb_iox_spark.plans.predicate import Predicate, TimestampRange

__all__ = ["Predicate", "TimestampRange"]
