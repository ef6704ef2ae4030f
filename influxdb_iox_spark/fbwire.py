"""Minimal FlatBuffers wire codec (hand-rolled, no dependency).

The reference's replicated-write payload is a FlatBuffers ``Entry``
(/root/reference/entry/src/entry.fbs, generated accessors in
entry_generated.rs).  The sandbox has no ``flatbuffers`` package, so —
exactly like ``protowire.py`` hand-rolls proto3 — this module implements
the public FlatBuffers binary format (flatbuffers.dev/internals):

- buffer: ``uint32`` root-table offset at position 0
- table: ``int32`` soffset to its vtable; vtable = ``uint16`` vtable
  size, ``uint16`` table size, then one ``uint16`` per field slot
  holding the field's offset from the table start (0 = absent)
- scalars inline; strings/vectors/tables referenced by ``uint32``
  relative offsets; strings are length-prefixed and NUL-terminated;
  vectors are length-prefixed
- unions occupy two adjacent slots: ``uint8`` type then value offset

The builder writes back-to-front (prepending), the standard FlatBuffers
construction order, with per-write alignment (``prep``) matching the
canonical builders so buffers interoperate byte-level with any
conforming reader.  Vtables are not deduplicated — valid per the spec,
marginally larger buffers.

Only the features entry.fbs needs are implemented: tables, scalars,
strings, vectors of scalars/offsets, unions, enums.  No structs, no
file identifiers, no shared strings.
"""

from __future__ import annotations

import struct


def _u16(buf, pos: int) -> int:
    return struct.unpack_from("<H", buf, pos)[0]


def _u32(buf, pos: int) -> int:
    return struct.unpack_from("<I", buf, pos)[0]


def _i32(buf, pos: int) -> int:
    return struct.unpack_from("<i", buf, pos)[0]


# -- reader ------------------------------------------------------------------


def root_table(buf) -> "FBTable":
    return FBTable(buf, _u32(buf, 0))


class FBTable:
    """Cursor over one table; field ids are the .fbs declaration order
    (a union member consumes TWO ids: type, then value)."""

    def __init__(self, buf, pos: int):
        self.buf = buf
        self.pos = pos

    def _field(self, slot: int) -> int:
        """Offset of a field from the table start; 0 when absent."""
        vt = self.pos - _i32(self.buf, self.pos)
        entry = 4 + 2 * slot
        if entry >= _u16(self.buf, vt):
            return 0
        return _u16(self.buf, vt + entry)

    def scalar(self, slot: int, fmt: str, default=0):
        o = self._field(slot)
        if not o:
            return default
        return struct.unpack_from(fmt, self.buf, self.pos + o)[0]

    def indirect(self, slot: int) -> int | None:
        """Target position of an offset field (string/vector/table)."""
        o = self._field(slot)
        if not o:
            return None
        p = self.pos + o
        return p + _u32(self.buf, p)

    def string(self, slot: int) -> str | None:
        p = self.indirect(slot)
        if p is None:
            return None
        n = _u32(self.buf, p)
        return bytes(self.buf[p + 4 : p + 4 + n]).decode("utf-8")

    def table(self, slot: int) -> "FBTable | None":
        p = self.indirect(slot)
        return None if p is None else FBTable(self.buf, p)

    def vector_len(self, slot: int) -> int:
        p = self.indirect(slot)
        return 0 if p is None else _u32(self.buf, p)

    def vector_scalars(self, slot: int, fmt: str) -> list:
        p = self.indirect(slot)
        if p is None:
            return []
        n = _u32(self.buf, p)
        return list(struct.unpack_from(f"<{n}{fmt}", self.buf, p + 4)) if n else []

    def vector_tables(self, slot: int) -> "list[FBTable]":
        p = self.indirect(slot)
        if p is None:
            return []
        n = _u32(self.buf, p)
        out = []
        for i in range(n):
            ep = p + 4 + 4 * i
            out.append(FBTable(self.buf, ep + _u32(self.buf, ep)))
        return out

    def vector_strings(self, slot: int) -> list[str]:
        p = self.indirect(slot)
        if p is None:
            return []
        n = _u32(self.buf, p)
        out = []
        for i in range(n):
            ep = p + 4 + 4 * i
            sp = ep + _u32(self.buf, ep)
            sn = _u32(self.buf, sp)
            out.append(bytes(self.buf[sp + 4 : sp + 4 + sn]).decode("utf-8"))
        return out

    def vector_bytes(self, slot: int) -> bytes:
        p = self.indirect(slot)
        if p is None:
            return b""
        n = _u32(self.buf, p)
        return bytes(self.buf[p + 4 : p + 4 + n])


# -- builder -----------------------------------------------------------------


class FBBuilder:
    """Back-to-front builder.  ``offset`` values are distances from the
    END of the finished buffer (the canonical builders' convention)."""

    def __init__(self):
        self.buf = bytearray()
        self.minalign = 1
        self._slots: list[tuple[int, int]] | None = None  # (slot, end-offset)
        self._object_start = 0

    def offset(self) -> int:
        return len(self.buf)

    def _pad(self, n: int) -> None:
        if n:
            self.buf[:0] = b"\x00" * n

    def prep(self, size: int, additional: int) -> None:
        """Pad so that after writing ``additional`` bytes, a ``size``-byte
        write lands aligned (relative to the final buffer end)."""
        if size > self.minalign:
            self.minalign = size
        align_size = (~(len(self.buf) + additional)) + 1 & (size - 1)
        self._pad(align_size)

    def _place(self, data: bytes) -> None:
        self.buf[:0] = data

    def prepend_scalar(self, fmt: str, size: int, value) -> None:
        self.prep(size, 0)
        self._place(struct.pack(fmt, value))

    def prepend_uoffset(self, target: int) -> None:
        self.prep(4, 0)
        assert target <= self.offset(), "offset points forward"
        self._place(struct.pack("<I", self.offset() - target + 4))

    def create_string(self, s: str) -> int:
        data = s.encode("utf-8")
        self.prep(4, len(data) + 1)
        self._place(b"\x00")
        self._place(data)
        self._place(struct.pack("<I", len(data)))
        return self.offset()

    def create_scalar_vector(self, fmt: str, size: int, values) -> int:
        values = list(values)
        self.prep(4, size * len(values))
        self.prep(size, size * len(values))  # element alignment
        if values:
            self._place(struct.pack(f"<{len(values)}{fmt}", *values))
        self._place(struct.pack("<I", len(values)))
        return self.offset()

    def create_byte_vector(self, data: bytes) -> int:
        self.prep(4, len(data))
        self._place(bytes(data))
        self._place(struct.pack("<I", len(data)))
        return self.offset()

    def create_offset_vector(self, offsets: list[int]) -> int:
        self.prep(4, 4 * len(offsets))
        for off in reversed(offsets):
            self.prepend_uoffset(off)
        self._place(struct.pack("<I", len(offsets)))
        return self.offset()

    # -- tables ------------------------------------------------------------
    def start_table(self) -> None:
        assert self._slots is None, "nested table construction"
        self._slots = []
        self._object_start = self.offset()

    def add_scalar(self, slot: int, fmt: str, size: int, value, default=0) -> None:
        if value == default:
            return
        self.prepend_scalar(fmt, size, value)
        self._slots.append((slot, self.offset()))

    def add_offset(self, slot: int, target: int | None) -> None:
        if target is None:
            return
        self.prepend_uoffset(target)
        self._slots.append((slot, self.offset()))

    def end_table(self) -> int:
        slots = self._slots
        self._slots = None
        # soffset placeholder at the table start
        self.prep(4, 0)
        self._place(b"\x00\x00\x00\x00")
        table_off = self.offset()
        n_slots = (max(s for s, _ in slots) + 1) if slots else 0
        entries = [0] * n_slots
        for slot, field_off in slots:
            entries[slot] = table_off - field_off
        vt_size = 4 + 2 * n_slots
        table_size = table_off - self._object_start
        vtable = struct.pack(f"<HH{n_slots}H", vt_size, table_size, *entries)
        self.prep(2, len(vtable))
        self._place(vtable)
        vtable_off = self.offset()
        # patch the placeholder: soffset = vtable_off - table_off (reader
        # computes vtable_pos = table_pos - soffset)
        struct.pack_into(
            "<i", self.buf, len(self.buf) - table_off, vtable_off - table_off
        )
        return table_off

    def finish(self, root: int) -> bytes:
        self.prep(self.minalign, 4)
        self.prepend_uoffset(root)
        return bytes(self.buf)
