"""InfluxDB line-protocol parser.

Grammar (reference: /root/reference/influxdb_line_protocol/src/lib.rs —
``ParsedLine`` :152-156, ``FieldValue`` :337):

    measurement[,tag_key=tag_value...] field_key=field_value[,...] [timestamp]

- measurement: escapes ``\\,`` and ``\\ `` (comma, space)
- tag keys/values, field keys: escape ``\\,`` ``\\=`` ``\\ ``
- field values: float (default), ``42i`` int64, ``42u`` uint64,
  ``"str"`` (escapes ``\\"`` and ``\\\\``), booleans t/T/true/True/TRUE/f/…
- timestamp: optional i64 nanoseconds; absent → writer fills wall clock
  (entry/src/entry.rs:85 path — here the caller supplies ``default_time``)

This is a fresh Python implementation of the public line-protocol grammar
(the reference is a nom combinator parser; nothing is translated from it).

Two surfaces:
- ``parse_line`` / ``parse_lines``: pure-Python, driver-side or testing.
- ``parse_lines_to_pandas`` + ``distributed_parse``: Arrow-batched parse for
  Structured Streaming / bulk ingest — runs inside ``mapInPandas`` so 100 TB
  of line protocol parses across executors, never on the driver.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from dataclasses import dataclass, field


class LineProtocolError(ValueError):
    pass


@dataclass
class ParsedLine:
    measurement: str
    tags: dict[str, str] = field(default_factory=dict)
    fields: dict[str, float | int | str | bool] = field(default_factory=dict)
    timestamp: int | None = None  # ns


_ESCAPABLE_MEASUREMENT = {",": ",", " ": " ", "\\": "\\"}
_ESCAPABLE_KEY = {",": ",", "=": "=", " ": " ", "\\": "\\"}


def _scan_escaped(s: str, i: int, terminators: str, escapable: dict[str, str]) -> tuple[str, int]:
    """Scan until an unescaped terminator; return (token, index-of-terminator)."""
    out: list[str] = []
    n = len(s)
    while i < n:
        c = s[i]
        if c == "\\" and i + 1 < n and s[i + 1] in escapable:
            out.append(escapable[s[i + 1]])
            i += 2
            continue
        if c in terminators:
            break
        out.append(c)
        i += 1
    return "".join(out), i


def _parse_field_value(tok: str) -> float | int | str | bool:
    if not tok:
        raise LineProtocolError("empty field value")
    if tok[0] == '"':
        raise LineProtocolError("internal: quoted strings handled by caller")
    last = tok[-1]
    if last == "i":
        return int(tok[:-1])
    if last == "u":
        v = int(tok[:-1])
        if v < 0:
            raise LineProtocolError(f"negative uint: {tok}")
        return v
    if tok in ("t", "T", "true", "True", "TRUE"):
        return True
    if tok in ("f", "F", "false", "False", "FALSE"):
        return False
    try:
        return float(tok)
    except ValueError as e:
        raise LineProtocolError(f"bad field value {tok!r}") from e


def parse_line(line: str) -> ParsedLine:
    s = line.strip()
    if not s or s.startswith("#"):
        raise LineProtocolError("empty or comment line")

    # measurement
    measurement, i = _scan_escaped(s, 0, ", ", _ESCAPABLE_MEASUREMENT)
    if not measurement:
        raise LineProtocolError(f"missing measurement: {line!r}")

    # tag set
    tags: dict[str, str] = {}
    while i < len(s) and s[i] == ",":
        k, i = _scan_escaped(s, i + 1, "=", _ESCAPABLE_KEY)
        if i >= len(s) or s[i] != "=":
            raise LineProtocolError(f"tag without value: {line!r}")
        v, i = _scan_escaped(s, i + 1, ", ", _ESCAPABLE_KEY)
        if not k or not v:
            raise LineProtocolError(f"empty tag key/value: {line!r}")
        tags[k] = v

    if i >= len(s) or s[i] != " ":
        raise LineProtocolError(f"missing field set: {line!r}")
    while i < len(s) and s[i] == " ":
        i += 1

    # field set
    fields: dict[str, float | int | str | bool] = {}
    while True:
        k, i = _scan_escaped(s, i, "=", _ESCAPABLE_KEY)
        if i >= len(s) or s[i] != "=":
            raise LineProtocolError(f"field without value: {line!r}")
        if not k:
            raise LineProtocolError(f"empty field key: {line!r}")
        i += 1
        if i < len(s) and s[i] == '"':
            out: list[str] = []
            i += 1
            while i < len(s) and s[i] != '"':
                if s[i] == "\\" and i + 1 < len(s) and s[i + 1] in ('"', "\\"):
                    out.append(s[i + 1])
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            if i >= len(s):
                raise LineProtocolError(f"unterminated string: {line!r}")
            i += 1  # closing quote
            fields[k] = "".join(out)
        else:
            tok, i = _scan_escaped(s, i, ", ", {})
            fields[k] = _parse_field_value(tok)
        if i < len(s) and s[i] == ",":
            i += 1
            # tolerate a trailing comma before the timestamp ("f=1, 250") —
            # accepted by the reference parser (fixture scenarios.rs:476)
            if i >= len(s) or s[i] == " ":
                break
            continue
        break

    if not fields:
        raise LineProtocolError(f"no fields: {line!r}")

    # timestamp
    ts: int | None = None
    while i < len(s) and s[i] == " ":
        i += 1
    if i < len(s):
        tok = s[i:].strip()
        try:
            ts = int(tok)
        except ValueError as e:
            raise LineProtocolError(f"bad timestamp {tok!r}") from e

    return ParsedLine(measurement, tags, fields, ts)


def _escape(s: str, escapable: dict[str, str]) -> str:
    out = []
    for c in s:
        if c in escapable or c == "\\":
            out.append("\\")
        out.append(c)
    return "".join(out)


def format_line(pl: ParsedLine) -> str:
    """Inverse of ``parse_line`` — serialize back to line protocol."""
    parts = [_escape(pl.measurement, _ESCAPABLE_MEASUREMENT)]
    for k, v in pl.tags.items():
        parts.append(f",{_escape(k, _ESCAPABLE_KEY)}={_escape(v, _ESCAPABLE_KEY)}")
    fields = []
    for k, v in pl.fields.items():
        key = _escape(k, _ESCAPABLE_KEY)
        if isinstance(v, bool):
            fields.append(f"{key}={'true' if v else 'false'}")
        elif isinstance(v, int):
            fields.append(f"{key}={v}i")
        elif isinstance(v, float):
            fields.append(f"{key}={v!r}")
        else:
            esc = v.replace("\\", "\\\\").replace('"', '\\"')
            fields.append(f'{key}="{esc}"')
    parts.append(" " + ",".join(fields))
    if pl.timestamp is not None:
        parts.append(f" {pl.timestamp}")
    return "".join(parts)


def parse_lines(text: str | Iterable[str]) -> Iterator[ParsedLine]:
    lines = text.splitlines() if isinstance(text, str) else text
    for ln in lines:
        if ln.strip() and not ln.strip().startswith("#"):
            yield parse_line(ln)


# ---------------------------------------------------------------------------
# Distributed parse (mapInPandas)
# ---------------------------------------------------------------------------


def lines_to_tables(
    parsed: Iterable[ParsedLine], default_time: int
) -> dict[str, "object"]:
    """Group parsed lines per measurement into pandas DataFrames.

    Columns = union of tags + fields + ``time`` (ns long); missing values are
    None; rows keep input order (the within-batch sequence that later feeds
    ``deduplicate_within``).
    """
    import pandas as pd

    per_table: dict[str, list[dict]] = {}
    for pl in parsed:
        row: dict = {**pl.tags, **pl.fields}
        row["time"] = pl.timestamp if pl.timestamp is not None else default_time
        per_table.setdefault(pl.measurement, []).append(row)
    return {t: pd.DataFrame(rows) for t, rows in per_table.items()}


def distributed_parse(lines_df, iox_schema, measurement: str, default_time: int):
    """Parse a DataFrame of raw lines into typed rows of one measurement.

    ``lines_df`` has a single string column ``value`` (the shape of
    ``spark.read.text`` / the text streaming source).  Output schema is the
    measurement's ``IoxSchema`` plus ``__seq`` (within-partition line number,
    the dedup ordering).  Runs as ``mapInPandas`` — Arrow-batched, executes on
    executors, scales with input splits.
    """
    from pyspark.sql.types import (
        BooleanType,
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    out_struct = StructType(
        list(iox_schema.struct.fields) + [StructField("__seq", LongType(), False)]
    )
    colnames = [f.name for f in out_struct.fields]
    # Declared python type per column, for write-time type checking — the
    # reference rejects mismatched writes (entry/src/entry.rs:32-44
    # TableColumnTypeMismatch, mutable_buffer/src/column.rs:25-29).
    _ok_types = {
        DoubleType: (float, int),
        LongType: (int,),
        StringType: (str,),
        BooleanType: (bool,),
    }
    expected = {
        f.name: _ok_types.get(type(f.dataType), (object,)) for f in out_struct.fields
    }

    def parse_batches(batches):
        import pandas as pd

        seq = 0
        for pdf in batches:
            rows = []
            for raw in pdf["value"]:
                if not raw or not raw.strip() or raw.strip().startswith("#"):
                    continue
                pl = parse_line(raw)
                if pl.measurement != measurement:
                    continue
                row = {**pl.tags, **pl.fields}
                for k, v in row.items():
                    if k not in expected:
                        raise LineProtocolError(
                            f"unknown column {k!r} for measurement {measurement!r}: {raw!r}"
                        )
                    # bool is an int subclass — check it first and exactly
                    if isinstance(v, bool) != (expected[k] == (bool,)) or not isinstance(
                        v, expected[k]
                    ):
                        raise LineProtocolError(
                            f"type mismatch for column {k!r}: got "
                            f"{type(v).__name__}, expected {expected[k]}: {raw!r}"
                        )
                row["time"] = pl.timestamp if pl.timestamp is not None else default_time
                row["__seq"] = seq
                seq += 1
                rows.append(row)
            out = pd.DataFrame(rows, columns=colnames)
            yield out

    parsed = lines_df.mapInPandas(parse_batches, schema=out_struct)
    # Make __seq a total order: (partition_id << 40) | within-partition seq.
    # Partition order reflects input-split order, matching "later line wins".
    from pyspark.sql import functions as F

    return parsed.withColumn(
        "__seq", F.spark_partition_id().cast("long") * F.lit(1 << 40) + F.col("__seq")
    )
