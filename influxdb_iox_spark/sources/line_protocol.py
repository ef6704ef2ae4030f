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


def render_line(pl: "ParsedLine") -> str:
    """ParsedLine → canonical line-protocol text (the parser's exact
    inverse — parse(render(x)) == x).  Used to route decoded flatbuffers
    Entry / PB column-batch payloads (entry_fb) through the same write
    path as client line protocol.  Alias of :func:`format_line` — one
    serializer, so escaping or numeric-rendering fixes can never
    diverge between the two entry points."""
    return format_line(pl)


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
    """Inverse of ``parse_line`` — serialize back to line protocol.
    Floats render via repr (round-trips every finite double); a line
    with no fields or a non-finite float has no LP spelling and raises."""
    if not pl.fields:
        raise LineProtocolError(
            f"line for measurement {pl.measurement!r} has no field values"
        )
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
            if v != v or v in (float("inf"), float("-inf")):
                raise LineProtocolError(f"non-finite float field {k}={v}")
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


# Boolean literals of the field-value grammar (lib.rs:337 FieldValue).
_BOOL_LITERALS = {
    "t": True, "T": True, "true": True, "True": True, "TRUE": True,
    "f": False, "F": False, "false": False, "False": False, "FALSE": False,
}
# One k=v field piece with an escape-free key; values may contain '='.
_FIELD_PIECE_RE = r"(^|,)[^,=]+=[^,]*"
# Conservative full-field-set validity for lines of OTHER measurements the
# fast path drops without schema knowledge: every value must be an obviously
# valid int/uint/bool/float token.  Anything fancier (signed ints like "+5i",
# underscore floats) falls through to the exact per-line parser.
_VALUE_RE = (
    r"(?:-?\d+i|\d+u|t|T|true|True|TRUE|f|F|false|False|FALSE|"
    r"[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?|"
    r"[-+]?(?:[iI][nN][fF](?:[iI][nN][iI][tT][yY])?|[nN][aA][nN]))"
)
_GENERIC_FIELDS_RE = rf"^[^,=]+={_VALUE_RE}(?:,[^,=]+={_VALUE_RE})*$"
# Tag-set validity for dropped other-measurement lines: every piece must be
# key=value with nonempty key (no '='/',') and nonempty value.
_GENERIC_TAGS_RE = r"^[^,=]+=[^,]+(?:,[^,=]+=[^,]+)*$"
_INT_FIELD_RE = r"^-?\d{1,18}i$|^\d{1,18}u$"
# Strict float shapes Arrow's string->double cast definitely parses; anything
# outside (inf/nan literals, underscores) routes to the exact parser.
_FLOAT_RE = r"^[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?$"
_TRUE_LITERALS = [k for k, v in _BOOL_LITERALS.items() if v]
_FALSE_LITERALS = [k for k, v in _BOOL_LITERALS.items() if not v]


@dataclass
class _ParseSpec:
    """Precomputed per-measurement parse plan for ``_parse_batch``."""

    measurement: str
    colnames: list[str]
    tag_cols: list[str]
    field_kinds: dict[str, str]  # name -> double|long|bool|string
    time_col: str
    default_time: int
    expected: dict[str, tuple]  # slow-path type check (entry.rs:32-44)


def _build_spec(iox_schema, measurement: str, default_time: int) -> "_ParseSpec":
    from pyspark.sql.types import (
        BooleanType,
        DecimalType,
        DoubleType,
        LongType,
        StringType,
    )

    colnames = [f.name for f in iox_schema.struct.fields]
    _ok_types = {
        DoubleType: (float, int),
        LongType: (int,),
        StringType: (str,),
        BooleanType: (bool,),
        DecimalType: (int,),  # u64-exact uinteger fields (schema.UINT64_EXACT_TYPE)
    }
    expected = {
        f.name: _ok_types.get(type(f.dataType), (object,))
        for f in iox_schema.struct.fields
    }
    _kind = {
        DoubleType: "double",
        LongType: "long",
        BooleanType: "bool",
        StringType: "string",
        DecimalType: "udecimal",  # exact u64 carrier
    }
    field_kinds = {
        f.name: _kind[type(f.dataType)]
        for f in iox_schema.struct.fields
        if f.name in set(iox_schema.field_columns)
    }
    return _ParseSpec(
        measurement=measurement,
        colnames=colnames,
        tag_cols=list(iox_schema.tag_columns),
        field_kinds=field_kinds,
        time_col=iox_schema.time_column,
        default_time=default_time,
        expected=expected,
    )


def _parse_batch_arrow(arr, spec: "_ParseSpec"):
    """Parse one Arrow array of raw lines into typed Arrow columns.

    Two tiers, split per line:
    - FAST (C++-vectorized): escape-free lines (no ``\\`` or ``"``) whose
      structure matches the strict shape ``head fields [ts]`` are parsed
      entirely with ``pyarrow.compute`` kernels (RE2 regex, one extract per
      schema column) — zero Python work per line.  This is the hot shape of
      machine-generated telemetry, i.e. ~all of a 100 TB ingest.
    - SLOW (exact): lines with escapes/quoted strings, structural anomalies,
      or any fast-path type surprise fall through to ``parse_line``, which
      implements the full grammar and raises the exact errors.

    Returns ``(cols, n)`` where ``cols`` maps each ``spec.colnames`` entry to
    a typed ``pa.Array`` of length ``n``, rows in input order.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import re as _re

    def _b(x):  # null -> False (kleene masks to plain booleans)
        return pc.fill_null(x, False)

    st = pc.utf8_trim_whitespace(arr.cast(pa.string()))
    valid = _b(
        pc.and_(pc.invert(pc.equal(st, "")), pc.invert(pc.starts_with(st, "#")))
    )
    noesc = _b(pc.invert(pc.match_substring_regex(st, r'[\\"]')))
    collapsed = pc.replace_substring_regex(st, "  +", " ")
    parts = pc.extract_regex(
        collapsed, r"^(?P<head>\S+) (?P<fs>\S+)(?P<o> (?P<ts>-?\d{1,19}))?$"
    )
    head = pc.struct_field(parts, "head")
    fs = pc.replace_substring_regex(pc.struct_field(parts, "fs"), ",$", "")
    ts = pc.struct_field(parts, "ts")  # null = no match; "" = ts absent
    shape_ok = _b(
        pc.equal(pc.replace_substring_regex(fs, _FIELD_PIECE_RE, ""), "")
    )
    meas = pc.struct_field(pc.extract_regex(head, r"^(?P<m>[^,]+)"), "m")
    tagstr = pc.struct_field(
        pc.extract_regex(head, r"^[^,]+,(?P<t>.*)$"), "t"
    )  # null when the line has no tags
    meas_eq = _b(pc.equal(meas, spec.measurement))
    target = pc.and_(pc.and_(valid, noesc), pc.and_(shape_ok, meas_eq))
    # Escape-free lines of OTHER measurements: drop silently only when BOTH
    # their tag set and field values are self-evidently valid; otherwise let
    # parse_line raise the exact error.
    tags_ok = pc.or_(
        pc.invert(pc.is_valid(tagstr)),  # no tags at all
        _b(pc.match_substring_regex(tagstr, _GENERIC_TAGS_RE)),
    )
    other_ok = pc.and_(
        pc.and_(valid, noesc),
        pc.and_(
            pc.and_(shape_ok, pc.invert(meas_eq)),
            pc.and_(
                _b(pc.match_substring_regex(fs, _GENERIC_FIELDS_RE)), _b(tags_ok)
            ),
        ),
    )

    # ---- typed conversion (computed over the whole batch, masked by target)
    bad = pc.invert(target)  # start from "non-target is not fast"
    typed: dict[str, object] = {}

    ntags = pc.fill_null(pc.add(pc.count_substring(tagstr, ","), 1), 0)
    tag_hits = pa.array(np.zeros(len(st), dtype="int64"))
    for tk in spec.tag_cols:
        pat = r"(?:^|,)" + _re.escape(tk) + r"=(?P<v>[^,]+)"
        v = pc.struct_field(pc.extract_regex(tagstr, pat), "v")
        typed[tk] = v
        tag_hits = pc.add(tag_hits, pc.cast(pc.is_valid(v), pa.int64()))
    bad = pc.or_(bad, pc.invert(_b(pc.equal(tag_hits, pc.cast(ntags, pa.int64())))))

    nfields = pc.fill_null(pc.add(pc.count_substring(fs, ","), 1), 0)
    field_hits = pa.array(np.zeros(len(st), dtype="int64"))
    for fk, kind in spec.field_kinds.items():
        pat = r"(?:^|,)" + _re.escape(fk) + r"=(?P<v>[^,]+)"
        tok = pc.struct_field(pc.extract_regex(fs, pat), "v")
        present = pc.is_valid(tok)
        field_hits = pc.add(field_hits, pc.cast(present, pa.int64()))
        if kind == "double":
            int_ok = _b(pc.match_substring_regex(tok, _INT_FIELD_RE))
            endsiu = _b(pc.match_substring_regex(tok, r"[iu]$"))
            bad = pc.or_(bad, pc.and_(endsiu, pc.invert(int_ok)))
            boolish = pc.is_in(tok, value_set=pa.array(list(_BOOL_LITERALS)))
            bad = pc.or_(bad, boolish)  # bool literal into a float column
            core = pc.replace_substring_regex(tok, r"[iu]$", "")
            float_ok = _b(pc.match_substring_regex(core, _FLOAT_RE))
            # not obviously numeric (incl. inf/nan literals) -> exact parser
            bad = pc.or_(bad, pc.and_(present, pc.invert(float_ok)))
            typed[fk] = pc.cast(
                pc.if_else(float_ok, core, pa.scalar(None, pa.string())),
                pa.float64(),
            )
        elif kind == "long":
            ok = _b(pc.match_substring_regex(tok, _INT_FIELD_RE))
            bad = pc.or_(bad, pc.and_(present, pc.invert(ok)))
            core = pc.replace_substring_regex(tok, r"[iu]$", "")
            typed[fk] = pc.cast(
                pc.if_else(ok, core, pa.scalar(None, pa.string())), pa.int64()
            )
        elif kind == "udecimal":
            # exact u64 (schema uint64_exact mode): only canonical
            # ``<digits>u`` tokens take the fast tier; everything else —
            # including out-of-domain values — falls to the exact parser
            # for its precise error.  20-digit values are bound-checked
            # against u64::MAX lexicographically (equal length).
            ok = _b(pc.match_substring_regex(tok, r"^\d{1,20}u$"))
            bad = pc.or_(bad, pc.and_(present, pc.invert(ok)))
            core = pc.replace_substring_regex(tok, r"u$", "")
            is20 = _b(pc.equal(pc.utf8_length(core), 20))
            over = pc.and_(is20, _b(pc.greater(core, str(2**64 - 1))))
            bad = pc.or_(bad, over)
            typed[fk] = pc.cast(
                pc.if_else(
                    pc.and_(ok, pc.invert(over)),
                    core,
                    pa.scalar(None, pa.string()),
                ),
                pa.decimal128(20, 0),
            )
        elif kind == "bool":
            is_t = pc.is_in(tok, value_set=pa.array(_TRUE_LITERALS))
            is_f = pc.is_in(tok, value_set=pa.array(_FALSE_LITERALS))
            bad = pc.or_(
                bad, pc.and_(present, pc.invert(pc.or_(is_t, is_f)))
            )
            typed[fk] = pc.if_else(
                pc.and_(present, pc.or_(is_t, is_f)),
                is_t,
                pa.scalar(None, pa.bool_()),
            )
        else:  # string fields require quotes -> always the slow path
            bad = pc.or_(bad, present)
            typed[fk] = tok
    bad = pc.or_(bad, pc.invert(_b(pc.equal(field_hits, pc.cast(nfields, pa.int64())))))

    # Timestamps: "" means absent (default_time); 19-digit values (every ns
    # epoch since 2001) are bound-checked against int64 lexicographically.
    ts_present = _b(pc.invert(pc.equal(ts, "")))
    neg = _b(pc.starts_with(ts, "-"))
    digits = pc.if_else(neg, pc.utf8_slice_codeunits(ts, 1, 2**30), ts)
    is19 = _b(pc.equal(pc.utf8_length(digits), 19))
    over = pc.and_(
        is19,
        _b(
            pc.if_else(
                neg,
                pc.greater(digits, "9223372036854775808"),
                pc.greater(digits, "9223372036854775807"),
            )
        ),
    )
    bad = pc.or_(bad, over)
    ts_val = pc.cast(
        pc.if_else(
            pc.and_(ts_present, pc.invert(over)), ts, pa.scalar(None, pa.string())
        ),
        pa.int64(),
    )
    typed[spec.time_col] = pc.fill_null(ts_val, spec.default_time)

    good = pc.and_(target, pc.invert(bad))
    fast_pos = pc.indices_nonzero(good).to_numpy().astype("int64")

    # ---- slow tier: exact parser for everything else ---------------------
    slow_mask = pc.and_(
        valid, pc.invert(pc.or_(good, other_ok))
    )
    slow_idx = pc.indices_nonzero(slow_mask).to_numpy().astype("int64")
    slow_pos: list[int] = []
    slow_rows: list[dict] = []
    if len(slow_idx):
        for pos, raw in zip(slow_idx, pc.take(st, pa.array(slow_idx)).to_pylist()):
            pl = parse_line(raw)
            if pl.measurement != spec.measurement:
                continue
            row = {**pl.tags, **pl.fields}
            for k, v in row.items():
                if k not in spec.expected:
                    raise LineProtocolError(
                        f"unknown column {k!r} for measurement "
                        f"{spec.measurement!r}: {raw!r}"
                    )
                # bool is an int subclass — check it first and exactly
                if isinstance(v, bool) != (
                    spec.expected[k] == (bool,)
                ) or not isinstance(v, spec.expected[k]):
                    raise LineProtocolError(
                        f"type mismatch for column {k!r}: got "
                        f"{type(v).__name__}, expected {spec.expected[k]}: {raw!r}"
                    )
                if spec.field_kinds.get(k) == "udecimal" and not (
                    0 <= v < 2**64
                ):
                    raise LineProtocolError(
                        f"uinteger out of u64 range for column {k!r}: {v}: {raw!r}"
                    )
            ts_ns = pl.timestamp if pl.timestamp is not None else spec.default_time
            if not (-(2**63) <= ts_ns < 2**63):
                raise LineProtocolError(
                    f"timestamp out of i64 range: {pl.timestamp}: {raw!r}"
                )
            row[spec.time_col] = ts_ns
            slow_pos.append(int(pos))
            slow_rows.append(row)

    # ---- merge both tiers back into input order --------------------------
    n_fast, n_slow = len(fast_pos), len(slow_pos)
    arrow_types = _arrow_types(spec)
    cols: dict[str, object] = {}
    if n_slow == 0:
        # pure fast path: one filter per column, no Python rows
        for c in spec.colnames:
            cols[c] = pc.filter(typed[c], good)
        return cols, n_fast
    order = np.argsort(
        np.concatenate([fast_pos, np.asarray(slow_pos, dtype="int64")]), kind="stable"
    )
    take_idx = pa.array(order)
    for c in spec.colnames:
        fast_part = pc.filter(typed[c], good)
        slow_part = pa.array(
            [row.get(c) for row in slow_rows], type=arrow_types[c], from_pandas=True
        )
        cols[c] = pc.take(pa.concat_arrays([fast_part, slow_part]), take_idx)
    return cols, n_fast + n_slow


def _arrow_types(spec: "_ParseSpec"):
    import pyarrow as pa

    kinds = {
        "double": pa.float64(),
        "long": pa.int64(),
        "bool": pa.bool_(),
        "string": pa.string(),
        "udecimal": pa.decimal128(20, 0),
    }
    out = {c: pa.string() for c in spec.tag_cols}
    out.update({fk: kinds[kind] for fk, kind in spec.field_kinds.items()})
    out[spec.time_col] = pa.int64()
    return out


def _parse_batch(values, spec: "_ParseSpec"):
    """pandas-Series convenience wrapper over ``_parse_batch_arrow`` (used by
    unit tests and non-Spark callers).  Returns object-dtype columns so ints
    stay exact and missing values are ``None``."""
    import pandas as pd
    import pyarrow as pa

    arr = pa.array(values, type=pa.string(), from_pandas=True)
    cols, n = _parse_batch_arrow(arr, spec)
    return pd.DataFrame(
        {c: pd.Series(cols[c].to_pylist(), dtype=object) for c in spec.colnames},
        columns=spec.colnames,
    )


def distributed_parse(
    lines_df, iox_schema, measurement: str, default_time: int, batch_counter=None
):
    """Parse a DataFrame of raw lines into typed rows of one measurement.

    ``lines_df`` has a single string column ``value`` (the shape of
    ``spark.read.text`` / the text streaming source).  Output schema is the
    measurement's ``IoxSchema`` plus ``__seq`` (within-partition line number,
    the dedup ordering).  Runs as ``mapInArrow`` — Arrow-batched, executes on
    executors, scales with input splits.  Escape-free lines take the RE2
    C++-vectorized fast tier (see ``_parse_batch_arrow``); only lines
    containing ``\\`` or ``"`` or structural anomalies pay the per-line
    Python parser.

    ``batch_counter``: optional Spark accumulator incremented once per Arrow
    batch actually parsed — lets callers assert how many times the parse
    physically executed (e.g. that a multi-consumer plan parses once).
    """
    from pyspark.sql.types import LongType, StructField, StructType

    spec = _build_spec(iox_schema, measurement, default_time)
    out_struct = StructType(
        list(iox_schema.struct.fields) + [StructField("__seq", LongType(), False)]
    )

    def parse_batches(batches):
        import numpy as np
        import pyarrow as pa

        seq = 0
        for rb in batches:
            if batch_counter is not None:
                batch_counter.add(1)
            col = rb.column(rb.schema.get_field_index("value"))
            cols, n = _parse_batch_arrow(col, spec)
            arrays = [cols[c] for c in spec.colnames]
            arrays.append(pa.array(np.arange(seq, seq + n, dtype="int64")))
            seq += n
            yield pa.RecordBatch.from_arrays(
                arrays, names=[*spec.colnames, "__seq"]
            )

    parsed = lines_df.mapInArrow(parse_batches, schema=out_struct)
    # Make __seq a total order: (partition_id << 40) | within-partition seq.
    # Partition order reflects input-split order, matching "later line wins".
    from pyspark.sql import functions as F

    return parsed.withColumn(
        "__seq", F.spark_partition_id().cast("long") * F.lit(1 << 40) + F.col("__seq")
    )
