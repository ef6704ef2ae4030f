from influxdb_iox_spark.sources.line_protocol import ParsedLine, parse_line, parse_lines
from influxdb_iox_spark.sources.store import TableStore

__all__ = ["ParsedLine", "parse_line", "parse_lines", "TableStore"]
