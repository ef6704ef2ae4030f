"""InfluxQL front-end: a lexer/parser for the public InfluxQL grammar
(SELECT + SHOW subset) and a planner that lowers statements onto this
engine's existing Spark operators (series aggregates, selectors,
transforms, gapfill, series limit, metadata ops).

The reference repo at this vintage exposes SQL and the InfluxRPC gRPC
menu, not InfluxQL (src/influxdb_ioxd/rpc.rs routes SQL/Flight/storage) —
but the storage RPC menu exists precisely to serve InfluxQL-shaped reads,
and every lowering target here is one of those already-implemented
operators.  The grammar follows the public InfluxQL specification
(https://docs.influxdata.com/influxdb/v1/query_language/spec/).
"""

from influxdb_iox_spark.influxql.ast_nodes import (
    Call,
    FillOption,
    Measurement,
    SelectStatement,
    ShowStatement,
    VarRef,
)
from influxdb_iox_spark.influxql.parser import InfluxQLParseError, parse
from influxdb_iox_spark.influxql.planner import execute, plan_select, plan_show

__all__ = [
    "Call",
    "FillOption",
    "InfluxQLParseError",
    "Measurement",
    "SelectStatement",
    "ShowStatement",
    "VarRef",
    "execute",
    "parse",
    "plan_select",
    "plan_show",
]
