from influxdb_iox_spark.functions.time import window_bounds, window_start, month_window_bounds

__all__ = ["window_bounds", "window_start", "month_window_bounds"]
