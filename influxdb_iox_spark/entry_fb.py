"""FlatBuffers ``Entry`` codec — the reference's replicated-write payload.

Schema: /root/reference/entry/src/entry.fbs (namespace
influxdata.iox.write.v1); semantics from entry/src/entry.rs:

- an Entry is one Operation: WriteOperations (partition writes) or
  DeleteOperations
- a PartitionWrite holds per-table column-oriented batches
- a Column is (name, logical type Tag/Field/Time, values union,
  null_mask); the values array holds ONLY non-null values in row order,
  and the null mask is MSB-first per byte (entry.rs NullMaskBuilder:
  row r is bit ``128 >> (r % 8)`` of byte ``r // 8``).  A column may be
  SHORTER than the batch (rows written before the column existed):
  missing trailing rows are null (entry.rs:441-471 missing_values).

Decode returns plain Python rows; encode builds byte-level
interoperable buffers (see fbwire).  ``entry_to_parsed_lines`` bridges
into the engine's ingest path: each decoded row becomes a ParsedLine,
so WriteEntry payloads flow through the same schema-inference +
chunk-write apply as line protocol.
"""

from __future__ import annotations

from influxdb_iox_spark.fbwire import FBBuilder, FBTable, root_table

# Operation union (declaration order; 0 = NONE)
OP_WRITE = 1
OP_DELETE = 2

# ColumnValues union
VAL_I64 = 1
VAL_F64 = 2
VAL_U64 = 3
VAL_STRING = 4
VAL_BOOL = 5
VAL_BYTES = 6

# LogicalColumnType enum
LOGICAL_IOX = 0
LOGICAL_TAG = 1
LOGICAL_FIELD = 2
LOGICAL_TIME = 3

_VALUE_FMT = {VAL_I64: "q", VAL_F64: "d", VAL_U64: "Q", VAL_BOOL: "?"}


class EntryError(ValueError):
    pass


# -- decode ------------------------------------------------------------------


def _null_flags(mask: bytes, n_rows: int) -> list[bool]:
    """Row-is-null flags for n_rows, MSB-first per byte.

    Matches entry.rs is_null_value (entry.rs:1299-1317): with NO mask
    every row is non-null; with a non-empty mask, any row PAST the mask's
    coverage is null (``byte >= mask.len() -> true``).  Reference-built
    masks (NullMaskBuilder) always cover the whole batch, so the
    past-the-mask rule only fires for client-supplied short masks — but
    it must fire the same way here for wire parity."""
    if not mask:
        return [False] * n_rows
    out = []
    for r in range(n_rows):
        byte = r // 8
        out.append(True if byte >= len(mask) else bool(mask[byte] & (128 >> (r % 8))))
    return out


def _decode_column(col: FBTable) -> dict:
    name = col.string(0)
    logical = col.scalar(1, "<b", 0)
    vtype = col.scalar(2, "<B", 0)
    if vtype == VAL_STRING:
        vals = col.table(3)
        values = vals.vector_strings(0) if vals else []
    elif vtype == VAL_BYTES:
        vals = col.table(3)
        values = [t.vector_bytes(0) for t in vals.vector_tables(0)] if vals else []
    elif vtype in _VALUE_FMT:
        vals = col.table(3)
        values = vals.vector_scalars(0, _VALUE_FMT[vtype]) if vals else []
    else:
        raise EntryError(f"unknown ColumnValues union type {vtype}")
    return {
        "name": name,
        "logical": logical,
        "values_type": vtype,
        "values": values,
        "null_mask": col.vector_bytes(4),
    }


def _column_rows(col: dict, n_rows: int) -> list:
    """Expand (values, null_mask) to one entry per row (None = null);
    rows past mask+values are null (missing trailing rows)."""
    flags = _null_flags(col["null_mask"], n_rows)
    out, it = [], iter(col["values"])
    for r in range(n_rows):
        if flags[r]:
            out.append(None)
        else:
            try:
                out.append(next(it))
            except StopIteration:
                out.append(None)  # column shorter than the batch
    return out


def decode_entry(buf: bytes) -> dict:
    """Entry bytes → {"writes": [partition_write]} or
    {"deletes": [{"table_name", "predicate"}]}.

    partition_write = {"key": str|None, "batches": [{"name": str,
    "rows": [ {column: value|None} ], "logical": {column: int}}]}.
    Row count per batch = max over columns of mask-bits + values
    (entry.rs: every column's mask has the same bit count)."""
    entry = root_table(buf)
    op_type = entry.scalar(0, "<B", 0)
    op = entry.table(1)
    if op_type == OP_DELETE:
        return {
            "deletes": [
                {"table_name": d.string(0), "predicate": d.string(1)}
                for d in (op.vector_tables(0) if op else [])
            ]
        }
    if op_type != OP_WRITE:
        raise EntryError(f"unknown Operation union type {op_type}")
    writes = []
    for pw in op.vector_tables(0) if op else []:
        batches = []
        for tb in pw.vector_tables(1):
            cols = [_decode_column(c) for c in tb.vector_tables(1)]
            n_rows = 0
            for c in cols:
                nulls = sum(bin(b).count("1") for b in c["null_mask"])
                n_rows = max(n_rows, nulls + len(c["values"]))
            rows = []
            per_col = {c["name"]: _column_rows(c, n_rows) for c in cols}
            for r in range(n_rows):
                rows.append({name: vals[r] for name, vals in per_col.items()})
            batches.append(
                {
                    "name": tb.string(0),
                    "rows": rows,
                    "logical": {c["name"]: c["logical"] for c in cols},
                    "values_types": {c["name"]: c["values_type"] for c in cols},
                }
            )
        writes.append({"key": pw.string(0), "batches": batches})
    return {"writes": writes}


# -- encode ------------------------------------------------------------------


def _build_null_mask(flags: list[bool]) -> bytes:
    """entry.rs NullMaskBuilder: MSB-first bits, one byte per 8 rows."""
    if not any(flags):
        return b""
    mask = bytearray((len(flags) + 7) // 8)
    for r, is_null in enumerate(flags):
        if is_null:
            mask[r // 8] |= 128 >> (r % 8)
    return bytes(mask)


def _encode_column(
    b: FBBuilder, name: str, logical: int, vtype: int, rows: list
) -> int:
    """rows: one entry per batch row, None = null."""
    flags = [v is None for v in rows]
    values = [v for v in rows if v is not None]
    if vtype == VAL_STRING:
        offs = [b.create_string(v) for v in values]
        vec = b.create_offset_vector(offs)
    elif vtype == VAL_BYTES:
        inner = []
        for v in values:
            data = b.create_byte_vector(v)
            b.start_table()
            b.add_offset(0, data)
            inner.append(b.end_table())
        vec = b.create_offset_vector(inner)
    elif vtype in _VALUE_FMT:
        fmt = _VALUE_FMT[vtype]
        size = 1 if vtype == VAL_BOOL else 8
        vec = b.create_scalar_vector(fmt, size, values)
    else:
        raise EntryError(f"unknown ColumnValues union type {vtype}")
    b.start_table()
    b.add_offset(0, vec)
    values_tbl = b.end_table()

    mask = _build_null_mask(flags)
    name_off = b.create_string(name)
    mask_off = b.create_byte_vector(mask) if mask else None
    b.start_table()
    b.add_offset(0, name_off)
    b.add_scalar(1, "<b", 1, logical, default=0)
    b.add_scalar(2, "<B", 1, vtype, default=0)
    b.add_offset(3, values_tbl)
    b.add_offset(4, mask_off)
    return b.end_table()


def encode_write_entry(partition_writes: list[dict]) -> bytes:
    """[{"key": str|None, "batches": [{"name", "columns": [(name,
    logical, vtype, rows)]}]}] → Entry bytes."""
    b = FBBuilder()
    pw_offs = []
    for pw in partition_writes:
        tb_offs = []
        for batch in pw["batches"]:
            col_offs = [
                _encode_column(b, name, logical, vtype, rows)
                for name, logical, vtype, rows in batch["columns"]
            ]
            cols_vec = b.create_offset_vector(col_offs)
            name_off = b.create_string(batch["name"])
            b.start_table()
            b.add_offset(0, name_off)
            b.add_offset(1, cols_vec)
            tb_offs.append(b.end_table())
        tbs_vec = b.create_offset_vector(tb_offs)
        key_off = b.create_string(pw["key"]) if pw.get("key") is not None else None
        b.start_table()
        b.add_offset(0, key_off)
        b.add_offset(1, tbs_vec)
        pw_offs.append(b.end_table())
    pws_vec = b.create_offset_vector(pw_offs)
    b.start_table()
    b.add_offset(0, pws_vec)
    write_ops = b.end_table()
    b.start_table()
    b.add_scalar(0, "<B", 1, OP_WRITE, default=0)
    b.add_offset(1, write_ops)
    return b.finish(b.end_table())


def encode_delete_entry(deletes: list[dict]) -> bytes:
    """[{"table_name", "predicate"}] → Entry bytes."""
    b = FBBuilder()
    d_offs = []
    for d in deletes:
        t = b.create_string(d["table_name"])
        p = b.create_string(d["predicate"])
        b.start_table()
        b.add_offset(0, t)
        b.add_offset(1, p)
        d_offs.append(b.end_table())
    vec = b.create_offset_vector(d_offs)
    b.start_table()
    b.add_offset(0, vec)
    del_ops = b.end_table()
    b.start_table()
    b.add_scalar(0, "<B", 1, OP_DELETE, default=0)
    b.add_offset(1, del_ops)
    return b.finish(b.end_table())


# -- bridge into the engine's ingest path ------------------------------------


def entry_to_parsed_lines(buf):
    """Decode an Entry and yield ParsedLine rows, ready for the same
    schema-inference + chunk-write apply as line protocol.  Tag columns
    become tags (string), Field columns become typed fields, the Time
    column supplies the ns timestamp.  Delete entries are rejected HERE
    (this is the row bridge) — the WriteEntry service routes them to the
    store's predicate-tombstone path instead (rpc_management.WriteEntry,
    store.delete_predicate).

    ``buf`` is Entry bytes, or the dict ``decode_entry`` already
    produced — callers that decoded once to check for deletes pass the
    dict and skip a second full pure-Python flatbuffer walk."""
    from influxdb_iox_spark.sources.line_protocol import ParsedLine

    decoded = buf if isinstance(buf, dict) else decode_entry(buf)
    if "deletes" in decoded:
        raise EntryError("delete entries are not writable payloads")
    for pw in decoded["writes"]:
        for batch in pw["batches"]:
            logical = batch["logical"]
            for name, vt in (batch.get("values_types") or {}).items():
                if vt != VAL_U64:
                    continue
                for row in batch["rows"]:
                    v = row.get(name)
                    if v is not None and v > 2**63 - 1:
                        # same guard as the PB path: unguarded, the
                        # overflow surfaces deep in the Arrow write as an
                        # uncatchable class (Internal instead of
                        # InvalidArgument; bypasses the drain quarantine)
                        raise EntryError(
                            f"column {name!r}: u64 values above int64 "
                            "range need the uinteger line-protocol path "
                            "(uint64-exact mode)"
                        )
            for row in batch["rows"]:
                tags = {
                    k: v
                    for k, v in row.items()
                    if logical.get(k) == LOGICAL_TAG and v is not None
                }
                fields = {
                    k: v
                    for k, v in row.items()
                    if logical.get(k) == LOGICAL_FIELD and v is not None
                }
                ts = None
                for k, v in row.items():
                    if logical.get(k) == LOGICAL_TIME and v is not None:
                        ts = int(v)
                yield ParsedLine(
                    measurement=batch["name"], tags=tags, fields=fields, timestamp=ts
                )


def lines_to_entry(parsed, partition_key: str = "") -> bytes:
    """ParsedLine rows → a single-partition write Entry (the inverse
    bridge, used to produce reference-compatible write-buffer payloads).
    Field value types map per entry.rs: bool→BoolValues, int→I64Values,
    float→F64Values, str→StringValues."""
    parsed = list(parsed)
    by_table: dict[str, list] = {}
    for pl in parsed:
        by_table.setdefault(pl.measurement, []).append(pl)
    batches = []
    for table, rows in sorted(by_table.items()):
        col_rows: dict[str, list] = {}
        col_kind: dict[str, tuple[int, int]] = {}  # name -> (logical, vtype)

        def _claim(name: str, kind: tuple[int, int], table=table) -> None:
            # one column, one type: a name used as both tag and field, or
            # a field with mixed value types, is a type conflict — the
            # reference's entry builder rejects it (entry.rs
            # ColumnTypeMismatch), and so do we
            prev = col_kind.setdefault(name, kind)
            if prev != kind:
                raise EntryError(
                    f"column type conflict for {table}.{name}: {prev} vs {kind}"
                )

        for i, pl in enumerate(rows):
            for k, v in pl.tags.items():
                _claim(k, (LOGICAL_TAG, VAL_STRING))
                col_rows.setdefault(k, [None] * len(rows))[i] = v
            for k, v in pl.fields.items():
                if isinstance(v, bool):
                    vt = VAL_BOOL
                elif isinstance(v, int):
                    vt = VAL_I64
                elif isinstance(v, float):
                    vt = VAL_F64
                else:
                    vt = VAL_STRING
                _claim(k, (LOGICAL_FIELD, vt))
                col_rows.setdefault(k, [None] * len(rows))[i] = v
            _claim("time", (LOGICAL_TIME, VAL_I64))
            col_rows.setdefault("time", [None] * len(rows))[i] = pl.timestamp
        columns = [
            (name, col_kind[name][0], col_kind[name][1], col_rows[name])
            for name in sorted(col_rows)
        ]
        batches.append({"name": table, "columns": columns})
    return encode_write_entry([{"key": partition_key, "batches": batches}])


# -- PB columnar write bridge (write_pb.rs / transfer/column/v1) -------------
#
# The reference's third write path: protobuf column batches
# (generated_types/protos/influxdata/transfer/column/v1/write.proto) are
# converted to Entry flatbuffers by entry/src/entry.rs pb_to_entry:306 and
# stored like any other write.  Here the same batches convert straight to
# ParsedLine rows for the shared line-protocol apply path; the validation
# table and null-mask/value mapping port pb_check_table_batch_column_types
# (entry.rs:347) and pb_column_to_fb (entry.rs:436 — values hold only
# non-null entries, MSB-first mask, missing trailing values repeat the
# last value).

PB_SEM_IOX, PB_SEM_TAG, PB_SEM_FIELD, PB_SEM_TIME = 1, 2, 3, 4

#: value-list name -> semantic types entry.rs accepts for that value type
_PB_VALUE_SEMANTICS = {
    "i64_values": {PB_SEM_IOX, PB_SEM_FIELD, PB_SEM_TIME},
    "f64_values": {PB_SEM_IOX, PB_SEM_FIELD},
    "u64_values": {PB_SEM_IOX, PB_SEM_FIELD},
    "string_values": {PB_SEM_IOX, PB_SEM_FIELD, PB_SEM_TAG},
    "bool_values": {PB_SEM_IOX, PB_SEM_FIELD},
    "bytes_values": {PB_SEM_IOX, PB_SEM_FIELD},
}
_PB_VALUE_ORDER = list(_PB_VALUE_SEMANTICS)  # entry.rs if-chain order


def _pb_check_table_batch(batch: dict) -> None:
    """Port of pb_check_table_batch_column_types (entry.rs:347-409),
    error messages byte-for-byte."""
    iox = tag = field = time_nontime = time_time = False
    for col in batch.get("columns") or []:
        sem = col.get("semantic_type") or 0
        if sem == PB_SEM_IOX:
            iox = True
        elif sem == PB_SEM_FIELD:
            field = True
        elif sem == PB_SEM_TAG:
            tag = True
        elif sem == PB_SEM_TIME:
            if (col.get("column_name") or "") == "time":
                time_time = True
            else:
                time_nontime = True
        else:
            raise EntryError(
                f"column {col.get('column_name')!r} has invalid semantic "
                f"type {sem}"
            )
    key = (iox, tag, field, time_nontime, time_time)
    if key[0] and not key[1] and not key[2]:
        return  # expected IOx column set
    if not key[0] and key[2] and not key[3] and key[4]:
        return  # expected line protocol column set
    if iox and tag:
        msg = "IOx column incompatible with line protocol tag column"
    elif iox and field:
        msg = "IOx column incompatible with line protocol field column"
    elif field and time_nontime:
        msg = (
            "line protocol field column incompatible with time column "
            "not named 'time'"
        )
    elif field and not time_time:
        msg = "line protocol field column requires time column named 'time'"
    elif tag and not field:
        msg = (
            "line protocol tag column requires at least one line protocol "
            "field column"
        )
    else:  # no columns at all / only time columns
        msg = "table batch has no usable column set"
    raise EntryError(msg)


def _pb_column_rows(col: dict, n_rows: int) -> tuple[list, int]:
    """(one value per row with None = null, semantic_type).  Values list
    is whichever pb Values field is non-empty (entry.rs if-chain).  Rows
    past a NON-EMPTY mask are null (entry.rs is_null_value:1299-1317 —
    the reference's repeat-last ``missing_values`` padding is written at
    encode but never decoded for those rows, so null is what the engine
    stores).  With no mask, rows past the values repeat the LAST value
    (the padding IS consumed, entry.rs:441-471)."""
    name = col.get("column_name") or ""
    sem = col.get("semantic_type") or 0
    values_msg = col.get("values") or {}
    chosen = None
    for vfield in _PB_VALUE_ORDER:
        vals = values_msg.get(vfield) or []
        if vals:
            chosen = (vfield, vals)
            break
    if chosen is None:
        raise EntryError(f"column {name!r} contains only null values")
    vfield, vals = chosen
    if sem not in _PB_VALUE_SEMANTICS[vfield]:
        raise EntryError(
            f"column {name!r} has invalid semantic type {sem} for "
            f"{vfield}"
        )
    if vfield == "bytes_values":
        raise EntryError(
            f"column {name!r}: bytes columns are not supported by this "
            "engine (no line-protocol / schema carrier for binary fields)"
        )
    if vfield == "u64_values" and any(v > 2**63 - 1 for v in vals):
        raise EntryError(
            f"column {name!r}: u64 values above int64 range need the "
            "uinteger line-protocol path (uint64-exact mode)"
        )
    flags = _null_flags(bytes(col.get("null_mask") or b""), n_rows)
    out, i = [], 0
    for r in range(n_rows):
        if flags[r]:
            out.append(None)
        else:
            out.append(vals[i] if i < len(vals) else vals[-1])
            i = min(i + 1, len(vals))
    return out, sem


def pb_batch_to_parsed_lines(db_batch: dict):
    """Decoded transfer/column/v1 DatabaseBatch dict → ParsedLine rows
    for the shared write path.  Tag columns become tags, Field/IOx
    columns become fields, the TIME column named 'time' supplies the ns
    timestamp (an IOx-set TIME column under another name lands as an i64
    field — documented divergence: this engine's row model has a single
    time column).  Rows whose every field is null are rejected (the
    columnar reference can store them; the row bridge cannot)."""
    from influxdb_iox_spark.sources.line_protocol import ParsedLine

    for batch in db_batch.get("table_batches") or []:
        _pb_check_table_batch(batch)
        n_rows = int(batch.get("row_count") or 0)
        table = batch.get("table_name") or ""
        cols = []
        for col in batch.get("columns") or []:
            rows, sem = _pb_column_rows(col, n_rows)
            cols.append((col.get("column_name") or "", sem, rows))
        for r in range(n_rows):
            tags, fields, ts = {}, {}, None
            for name, sem, rows in cols:
                v = rows[r]
                if v is None:
                    continue
                if sem == PB_SEM_TAG:
                    tags[name] = str(v)
                elif sem == PB_SEM_TIME and name == "time":
                    ts = int(v)
                else:
                    fields[name] = v
            if not fields:
                raise EntryError(
                    f"row {r} of table {table!r} has no non-null field "
                    "values (not representable as a row write)"
                )
            yield ParsedLine(
                measurement=table, tags=tags, fields=fields, timestamp=ts
            )
