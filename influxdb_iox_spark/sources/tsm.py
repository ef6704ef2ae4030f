"""TSM import: read legacy InfluxDB TSM files into the Spark store.

The reference ships TSM tooling as its migration path from InfluxDB 1.x/2.x
(``influxdb_tsm/src/{lib,reader,key,mapper}.rs`` and
``influxdb_tsm/src/encoders/*.rs``).  This module re-expresses it for Spark:

- pure-Python codecs for the five TSM block encodings, byte-compatible with
  the formats the reference decodes (timestamps: delta + scaled
  simple8b/RLE, ``encoders/timestamp.rs``; integers: zigzag-delta +
  simple8b/RLE, ``encoders/integer.rs``; floats: Gorilla XOR,
  ``encoders/float.rs``; booleans: bit-packed, ``encoders/boolean.rs``;
  strings: snappy over varint-framed values, ``encoders/string.rs``;
  unsigned: integer codec over the raw bits, ``encoders/unsigned.rs``),
- a TSM index/block reader (footer → index → CRC-checked block decode,
  ``reader.rs:65-152,585-668``) and a writer used both as the test fixture
  generator and as an export tool,
- series-key parsing (org/bucket prefix, measurement under the ``\\x00``
  tag, field under ``\\xff`` with the ``#!~#`` delimiter, ``key.rs``),
- the Spark-side import: files are read distributed via the ``binaryFile``
  source and decoded per-file inside ``mapInPandas`` (one task per TSM
  file — the same unit of parallelism the reference uses, one reader per
  file, ``mapper.rs:21-33``), producing a long-format DataFrame that is
  pivoted into one wide table per measurement (``mapper.rs:106-205``
  ``MeasurementTable``) and written through the normal ingest path.

Scale notes: a TSM generation is many independent files; ``binaryFile``
gives one input split per file, so decode parallelism = file count with no
shuffle.  The pivot groups by (tags, time) — the same key the dedup scan
uses — and duplicate points across files/blocks resolve later-block-wins
via ``max_by(value, src_order)``, matching ``reader.rs:470-506``
(``BlockData::merge`` keeps the value from the highest reader index for a
repeated timestamp).
"""

from __future__ import annotations

import io
import os
import struct
import zlib
from dataclasses import dataclass, field

TSM_MAGIC = 0x16D116D1
TSM_VERSION = 1
MAX_BLOCK_VALUES = 1000  # lib.rs:73

# Block types (lib.rs:22-45)
BLOCK_FLOAT = 0
BLOCK_INTEGER = 1
BLOCK_BOOL = 2
BLOCK_STR = 3
BLOCK_UNSIGNED = 4

_M64 = (1 << 64) - 1

# Gorilla terminators (float.rs:6-7): the reference's own encoder uses the
# first, InfluxDB-written files use the second.  Our decoder accepts either;
# our encoder writes the InfluxDB one so real Go tooling can read our files.
SENTINEL = 0x7FF8_0000_0000_00FF
SENTINEL_INFLUXDB = 0x7FF8_0000_0000_0001

SIMPLE8B_MAX = (1 << 60) - 1
# (ints per word, bits per int) for selectors 2..15 (simple8b.rs NUM_BITS)
_S8B_CODES = [
    (60, 1), (30, 2), (20, 3), (15, 4), (12, 5), (10, 6), (8, 7),
    (7, 8), (6, 10), (5, 12), (4, 15), (3, 20), (2, 30), (1, 60),
]


class TsmError(Exception):
    pass


# ---------------------------------------------------------------------------
# varint (unsigned LEB128 — the integer_encoding crate's u64 wire format).
# Deliberately standalone from protowire.encode_varint/decode_varint: this
# module is executor-shipped import tooling with its own error type and
# 64-bit overflow bound; keep the two codecs' tests in sync if either gains
# bounds handling.


def _varint_encode(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _varint_decode(buf, i: int) -> tuple[int, int]:
    """Returns (value, next_index)."""
    shift = 0
    v = 0
    while True:
        b = buf[i]
        i += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, i
        shift += 7
        if shift > 63:
            raise TsmError("varint overflow")


def _zigzag(v: int) -> int:
    return ((v << 1) ^ (v >> 63)) & _M64


def _unzigzag(u: int) -> int:
    v = (u >> 1) ^ (-(u & 1) & _M64)
    return v - (1 << 64) if v >= (1 << 63) else v


def _as_i64(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


# ---------------------------------------------------------------------------
# simple8b (simple8b.rs)


def simple8b_encode(values: list[int]) -> bytes:
    out = bytearray()
    i = 0
    n = len(values)
    while i < n:
        remain = n - i
        if remain >= 120:
            window = values[i : i + (240 if remain >= 240 else 120)]
            ones = 0
            for x in window:
                if x != 1:
                    break
                ones += 1
            if ones == 240:
                out += b"\x00" * 8  # selector 0: 240 ones
                i += 240
                continue
            if ones >= 120:
                out += struct.pack(">Q", 1 << 60)  # selector 1: 120 ones
                i += 120
                continue
        packed = None
        for sel_idx, (int_n, bit_n) in enumerate(_S8B_CODES):
            if int_n > remain:
                continue
            max_val = 1 << bit_n
            word = (sel_idx + 2) << 60
            ok = True
            for k in range(int_n):
                x = values[i + k]
                if x >= max_val:
                    ok = False
                    break
                word |= x << (k * bit_n)
            if ok:
                packed = word
                i += int_n
                break
        if packed is None:
            raise TsmError("simple8b: value out of bounds")
        out += struct.pack(">Q", packed)
    return bytes(out)


def simple8b_decode(buf: bytes) -> list[int]:
    out: list[int] = []
    for (word,) in struct.iter_unpack(">Q", buf):
        sel = word >> 60
        if sel == 0:
            out += [1] * 240
        elif sel == 1:
            out += [1] * 120
        else:
            int_n, bit_n = _S8B_CODES[sel - 2]
            mask = (1 << bit_n) - 1
            out += [(word >> (k * bit_n)) & mask for k in range(int_n)]
    return out


# ---------------------------------------------------------------------------
# timestamps (encoders/timestamp.rs): deltas; RLE / scaled simple8b /
# uncompressed.  High nibble of byte 0 = encoding, low nibble = log10 scale.


def _scale_divisor(deltas: list[int], start: int = 1) -> int:
    div = 1_000_000_000_000
    for d in deltas[start:]:
        if div <= 1:
            break
        while div > 1 and d % div != 0:
            div //= 10
    return div


def encode_timestamps(src: list[int]) -> bytes:
    if not src:
        return b""
    deltas = [v & _M64 for v in src]
    mx = 0
    for i in range(len(deltas) - 1, 0, -1):
        deltas[i] = (deltas[i] - deltas[i - 1]) & _M64
        mx = max(mx, deltas[i])
    if len(deltas) > 1 and all(d == deltas[1] for d in deltas[2:]):
        # RLE: scaler byte | first value | varint(delta/scale) | varint(count)
        delta = deltas[1]
        div = 1_000_000_000_000
        while div > 1 and delta % div != 0:
            div //= 10
        out = bytearray([0x20 | (len(str(div)) - 1 if div > 1 else 0)])
        out += struct.pack(">Q", deltas[0])
        out += _varint_encode(delta // div if div > 1 else delta)
        out += _varint_encode(len(deltas))
        return bytes(out)
    if mx > SIMPLE8B_MAX:
        return bytes([0x00]) + b"".join(struct.pack(">Q", d) for d in deltas)
    div = _scale_divisor(deltas)
    if div > 1:
        for i in range(1, len(deltas)):
            deltas[i] //= div
    out = bytearray([0x10 | (len(str(div)) - 1 if div > 1 else 0)])
    out += struct.pack(">Q", deltas[0])
    out += simple8b_encode(deltas[1:])
    return bytes(out)


def decode_timestamps(src: bytes) -> list[int]:
    if not src:
        return []
    enc = src[0] >> 4
    if enc == 0:  # uncompressed deltas
        body = src[1:]
        if not body or len(body) % 8:
            raise TsmError("invalid uncompressed timestamp block")
        out: list[int] = []
        prev = 0
        for (d,) in struct.iter_unpack(">Q", body):
            prev = (prev + d) & _M64
            out.append(_as_i64(prev))
        return out
    if enc == 2:  # RLE
        if len(src) < 9:
            raise TsmError("short RLE timestamp block")
        scale = 10 ** (src[0] & 0x0F)
        (first,) = struct.unpack_from(">q", src, 1)
        delta, i = _varint_decode(src, 9)
        delta *= scale
        count, _ = _varint_decode(src, i)
        out = []
        cur = first
        for _ in range(count):
            out.append(cur)
            cur = _as_i64((cur + delta) & _M64)
        return out
    if enc == 1:  # simple8b
        if len(src) < 9:
            raise TsmError("short packed timestamp block")
        scale = 10 ** (src[0] & 0x0F)
        (first,) = struct.unpack_from(">q", src, 1)
        out = [first]
        cur = first
        for d in simple8b_decode(src[9:]):
            cur = _as_i64((cur + d * scale) & _M64)
            out.append(cur)
        return out
    raise TsmError("invalid timestamp block encoding")


# ---------------------------------------------------------------------------
# integers (encoders/integer.rs): zigzag deltas; RLE / simple8b /
# uncompressed.  Unlike timestamps, RLE carries no scaler and the decoder
# strips the header byte before dispatch.


def encode_integers(src: list[int]) -> bytes:
    if not src:
        return b""
    raw = [v & _M64 for v in src]
    deltas = list(raw)
    mx = 0
    for i in range(len(deltas) - 1, 0, -1):
        deltas[i] = _zigzag(_as_i64((deltas[i] - deltas[i - 1]) & _M64))
        mx = max(mx, deltas[i])
    deltas[0] = _zigzag(_as_i64(raw[0]))
    if len(deltas) > 2 and all(d == deltas[1] for d in deltas[2:]):
        out = bytearray([0x20])
        out += struct.pack(">Q", deltas[0])
        out += _varint_encode(deltas[1])
        out += _varint_encode(len(deltas) - 1)  # repeats EXCLUDING first
        return bytes(out)
    if mx > SIMPLE8B_MAX:
        return bytes([0x00]) + b"".join(struct.pack(">Q", d) for d in deltas)
    out = bytearray([0x10])
    out += struct.pack(">Q", deltas[0])
    out += simple8b_encode(deltas[1:])
    return bytes(out)


def decode_integers(src: bytes) -> list[int]:
    if not src:
        return []
    enc = src[0] >> 4
    body = src[1:]
    if enc == 0:
        if not body or len(body) % 8:
            raise TsmError("invalid uncompressed integer block")
        out: list[int] = []
        prev = 0
        for (u,) in struct.iter_unpack(">Q", body):
            prev = _as_i64((prev + _unzigzag(u)) & _M64)
            out.append(prev)
        return out
    if enc == 2:
        if len(body) < 8:
            raise TsmError("short RLE integer block")
        (first_z,) = struct.unpack_from(">Q", body, 0)
        delta, i = _varint_decode(body, 8)
        count, _ = _varint_decode(body, i)
        cur = _unzigzag(first_z)
        dz = _unzigzag(delta)
        out = [cur]
        for _ in range(count):
            cur = _as_i64((cur + dz) & _M64)
            out.append(cur)
        return out
    if enc == 1:
        if len(body) < 8:
            raise TsmError("short packed integer block")
        (first_z,) = struct.unpack_from(">Q", body, 0)
        cur = _unzigzag(first_z)
        out = [cur]
        for u in simple8b_decode(body[8:]):
            cur = _as_i64((cur + _unzigzag(u)) & _M64)
            out.append(cur)
        return out
    raise TsmError("invalid integer block encoding")


def encode_unsigned(src: list[int]) -> bytes:
    # unsigned.rs: reinterpret the u64 bits as i64 and use the integer codec
    return encode_integers([_as_i64(v & _M64) for v in src])


def decode_unsigned(src: bytes) -> list[int]:
    return [v & _M64 for v in decode_integers(src)]


# ---------------------------------------------------------------------------
# floats (encoders/float.rs): Gorilla XOR, sentinel-terminated bitstream.


class _BitWriter:
    """MSB-first bit stream over a bytearray (the layout float.rs writes with
    manual shifts: bit n lives at byte n>>3, mask 128>>(n&7))."""

    __slots__ = ("buf", "n")

    def __init__(self, buf: bytearray):
        self.buf = buf
        self.n = len(buf) * 8

    def write_bit(self, bit: int) -> None:
        if self.n >> 3 >= len(self.buf):
            self.buf.append(0)
        if bit:
            self.buf[self.n >> 3] |= 128 >> (self.n & 7)
        self.n += 1

    def write_bits(self, value: int, width: int) -> None:
        for shift in range(width - 1, -1, -1):
            self.write_bit((value >> shift) & 1)


class _BitReader:
    __slots__ = ("buf", "n", "end")

    def __init__(self, buf: bytes, start_byte: int):
        self.buf = buf
        self.n = start_byte * 8
        self.end = len(buf) * 8

    def read_bit(self) -> int:
        if self.n >= self.end:
            raise TsmError("unexpected end of float block")
        b = (self.buf[self.n >> 3] >> (7 - (self.n & 7))) & 1
        self.n += 1
        return b

    def read_bits(self, width: int) -> int:
        v = 0
        for _ in range(width):
            v = (v << 1) | self.read_bit()
        return v


def encode_floats(src: list[float], sentinel: int = SENTINEL_INFLUXDB) -> bytes:
    if not src:
        return b""
    out = bytearray([0x10])  # compression type: gorilla
    first_bits = struct.unpack(">Q", struct.pack(">d", src[0]))[0]
    out += struct.pack(">Q", first_bits)
    w = _BitWriter(out)
    prev = first_bits
    prev_leading = None
    prev_trailing = 0
    for i in range(1, len(src) + 1):
        if i < len(src):
            cur = struct.unpack(">Q", struct.pack(">d", src[i]))[0]
            if cur in (SENTINEL, SENTINEL_INFLUXDB):
                raise TsmError("unsupported value (gorilla sentinel bits)")
        else:
            cur = sentinel  # terminator
        delta = cur ^ prev
        if delta == 0:
            w.write_bit(0)
            prev = cur
            continue
        w.write_bit(1)
        # float.rs:77-81: leading capped by masking to 5 bits (NOT min());
        # over-long runs alias to a smaller count, which only widens the
        # significant window — safe, and required for byte compatibility.
        leading = ((64 - delta.bit_length()) if delta else 64) & 0x1F
        trailing = (delta & -delta).bit_length() - 1
        if (
            prev_leading is not None
            and leading >= prev_leading
            and trailing >= prev_trailing
        ):
            w.write_bit(0)
            width = 64 - prev_leading - prev_trailing
            w.write_bits((delta >> prev_trailing) & ((1 << width) - 1), width)
        else:
            prev_leading, prev_trailing = leading, trailing
            w.write_bit(1)
            w.write_bits(leading, 5)
            sig = 64 - leading - trailing  # sig==64 is written as 0
            w.write_bits(sig & 0x3F, 6)
            w.write_bits(delta >> trailing, sig)
        prev = cur
    return bytes(out)


def decode_floats(src: bytes) -> list[float]:
    if len(src) < 9:
        return []
    (val,) = struct.unpack_from(">Q", src, 1)
    out = [struct.unpack(">d", struct.pack(">Q", val))[0]]
    r = _BitReader(src, 9)
    leading = 0
    meaningful = 64
    trailing = 0
    while True:
        if r.read_bit() == 0:
            out.append(struct.unpack(">d", struct.pack(">Q", val))[0])
            continue
        if r.read_bit() == 1:
            leading = r.read_bits(5)
            meaningful = r.read_bits(6)
            if meaningful == 0:
                meaningful = 64
                trailing = 0
            else:
                trailing = 64 - leading - meaningful
        sig = r.read_bits(meaningful)
        val ^= sig << trailing
        if val in (SENTINEL, SENTINEL_INFLUXDB):
            return out
        out.append(struct.unpack(">d", struct.pack(">Q", val))[0])


# ---------------------------------------------------------------------------
# booleans (encoders/boolean.rs): header 0x10, varint count, bit-packed.


def encode_booleans(src: list[bool]) -> bytes:
    if not src:
        return b""
    out = bytearray([0x10])
    out += _varint_encode(len(src))
    w = _BitWriter(out)
    for v in src:
        w.write_bit(1 if v else 0)
    return bytes(out)


def decode_booleans(src: bytes) -> list[bool]:
    if not src:
        return []
    if src[0] != 0x10:
        raise TsmError("invalid boolean block encoding")
    count, i = _varint_decode(src, 1)
    count = min(count, (len(src) - i) * 8)
    out: list[bool] = []
    for byte in src[i:]:
        for bit in range(7, -1, -1):
            if len(out) >= count:
                return out
            out.append(bool((byte >> bit) & 1))
    return out


# ---------------------------------------------------------------------------
# strings (encoders/string.rs): header 0x10, snappy(varint-length-framed
# byte strings).  Raw snappy via pyarrow (the stream's own varint preamble
# carries the uncompressed size pyarrow requires).


def _snappy_compress(data: bytes) -> bytes:
    import pyarrow as pa

    return bytes(pa.Codec("snappy").compress(data))


def _snappy_decompress(data: bytes) -> bytes:
    import pyarrow as pa

    size, _ = _varint_decode(data, 0)
    return bytes(pa.Codec("snappy").decompress(data, size))


def encode_strings(src: list[bytes]) -> bytes:
    if not src:
        return b""
    framed = bytearray()
    for s in src:
        framed += _varint_encode(len(s))
        framed += s
    return bytes([0x10]) + _snappy_compress(bytes(framed))


def decode_strings(src: bytes) -> list[bytes]:
    if not src:
        return []
    data = _snappy_decompress(src[1:])
    out: list[bytes] = []
    i = 0
    while i < len(data):
        length, i = _varint_decode(data, i)
        if i + length > len(data):
            raise TsmError("short string buffer")
        out.append(bytes(data[i : i + length]))
        i += length
    return out


_ENCODERS = {
    BLOCK_FLOAT: encode_floats,
    BLOCK_INTEGER: encode_integers,
    BLOCK_BOOL: encode_booleans,
    BLOCK_STR: encode_strings,
    BLOCK_UNSIGNED: encode_unsigned,
}
_DECODERS = {
    BLOCK_FLOAT: decode_floats,
    BLOCK_INTEGER: decode_integers,
    BLOCK_BOOL: decode_booleans,
    BLOCK_STR: decode_strings,
    BLOCK_UNSIGNED: decode_unsigned,
}


# ---------------------------------------------------------------------------
# series keys (key.rs): org(8) + bucket(8) + ',' + escaped tagset where
# measurement is tag \x00 and the field is tag \xff valued "<field>#!~#<field>".


def _escape_key_part(s: str) -> bytes:
    out = bytearray()
    for ch in s.encode():
        if ch in b", =":
            out.append(ord("\\"))
        out.append(ch)
    return bytes(out)


def make_tsm_key(
    org_id: int, bucket_id: int, measurement: str, tags: dict[str, str], fld: str
) -> bytes:
    parts = [b"\x00=" + _escape_key_part(measurement)]
    for k in sorted(tags):
        parts.append(_escape_key_part(k) + b"=" + _escape_key_part(tags[k]))
    fe = _escape_key_part(fld)
    parts.append(b"\xff=" + fe + b"#!~#" + fld.encode())
    return (
        struct.pack(">QQ", org_id & _M64, bucket_id & _M64)
        + b","
        + b",".join(parts)
    )


def parse_tsm_key(key: bytes) -> tuple[str, dict[str, str], str]:
    """(measurement, tags, field) from a TSM index key (key.rs:88-137).

    A single pass over the escaped tagset; the measurement is the value of
    the special \\x00 tag, the field is the \\xff value truncated at the
    first unescaped ``#!~#`` (key.rs:158-171 — the suffix after the
    delimiter repeats the field name unescaped and is ignored).
    """
    if len(key) < 17:
        raise TsmError("TSM key too short")
    body = key[17:]  # skip org, bucket, comma
    measurement = None
    fld = None
    tags: dict[str, str] = {}
    i = 0
    n = len(body)

    def read_part(i: int, stop: bytes) -> tuple[bytes, int]:
        """Unescape up to (not consuming) the first unescaped stop byte."""
        out = bytearray()
        while i < n:
            c = body[i]
            if c == ord("\\"):
                if i + 1 >= n:
                    raise TsmError("dangling escape in TSM key")
                out.append(body[i + 1])
                i += 2
                continue
            if c in stop:
                return bytes(out), i
            out.append(c)
            i += 1
        return bytes(out), i

    while i < n:
        k, i = read_part(i, b"=")
        if i >= n:
            raise TsmError("TSM key missing '='")
        i += 1  # consume '='
        if k == b"\x00":
            v, i = read_part(i, b",")
            measurement = v.decode()
            i += 1  # consume ','
            continue
        if k == b"\xff":
            # field value: unescape up to the first unescaped #!~#
            # delimiter; the suffix after it repeats the field name
            # unescaped and is ignored (key.rs:158-171)
            out = bytearray()
            while i < n:
                c = body[i]
                if c == ord("\\") and i + 1 < n:
                    out.append(body[i + 1])
                    i += 2
                    continue
                if c == ord("#") and body[i : i + 4] == b"#!~#":
                    break
                out.append(c)
                i += 1
            fld = bytes(out).decode()
            break
        v, i = read_part(i, b",")
        tags[k.decode()] = v.decode()
        i += 1
    if measurement is None:
        raise TsmError("no measurement (\\x00 tag) in TSM key")
    if not fld:
        raise TsmError("no field key (\\xff tag) in TSM key")
    return measurement, tags, fld


# ---------------------------------------------------------------------------
# file writer / reader


@dataclass
class TsmBlockMeta:
    key: bytes
    block_type: int
    min_time: int
    max_time: int
    offset: int
    size: int


@dataclass
class TsmWriter:
    """Builds a TSM file: data blocks then the sorted index and the footer
    pointing at it (reader.rs:65-81 reads the layout back).

    Series data longer than MAX_BLOCK_VALUES points is split into multiple
    blocks, each indexed with its own time range (lib.rs:73).
    """

    org_id: int = 0xA
    bucket_id: int = 0xB
    _series: dict[bytes, tuple[int, list[int], list]] = field(default_factory=dict)

    def add(
        self,
        measurement: str,
        tags: dict[str, str],
        fld: str,
        block_type: int,
        times: list[int],
        values: list,
    ) -> None:
        if len(times) != len(values):
            raise TsmError("times/values length mismatch")
        key = make_tsm_key(self.org_id, self.bucket_id, measurement, tags, fld)
        typ, ts, vs = self._series.setdefault(key, (block_type, [], []))
        if typ != block_type:
            raise TsmError(f"type conflict for series {key!r}")
        ts.extend(times)
        vs.extend(values)

    def write(self, path: str) -> None:
        buf = io.BytesIO()
        buf.write(struct.pack(">IB", TSM_MAGIC, TSM_VERSION))
        index: list[TsmBlockMeta] = []
        for key in sorted(self._series):
            block_type, ts, vs = self._series[key]
            pairs = sorted(zip(ts, vs), key=lambda p: p[0])
            for i in range(0, len(pairs), MAX_BLOCK_VALUES):
                chunk = pairs[i : i + MAX_BLOCK_VALUES]
                btimes = [t for t, _ in chunk]
                bvalues = [v for _, v in chunk]
                body = bytearray([block_type])
                ts_block = encode_timestamps(btimes)
                body += _varint_encode(len(ts_block))
                body += ts_block
                body += _ENCODERS[block_type](bvalues)
                offset = buf.tell()
                crc = zlib.crc32(bytes(body)) & 0xFFFFFFFF
                buf.write(struct.pack(">I", crc))
                buf.write(body)
                index.append(
                    TsmBlockMeta(
                        key, block_type, btimes[0], btimes[-1],
                        offset, 4 + len(body),
                    )
                )
        index_offset = buf.tell()
        # index entries grouped per key, sorted (reader.rs:87-152)
        i = 0
        while i < len(index):
            j = i
            while j < len(index) and index[j].key == index[i].key:
                j += 1
            blocks = index[i:j]
            buf.write(struct.pack(">H", len(blocks[0].key)))
            buf.write(blocks[0].key)
            buf.write(struct.pack(">BH", blocks[0].block_type, len(blocks)))
            for b in blocks:
                buf.write(struct.pack(">qqQI", b.min_time, b.max_time, b.offset, b.size))
            i = j
        buf.write(struct.pack(">Q", index_offset))
        tmp = f"{path}.tmp-{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(buf.getvalue())
        os.replace(tmp, path)


def read_tsm_index(data: bytes) -> list[TsmBlockMeta]:
    if len(data) < 13 or struct.unpack_from(">I", data, 0)[0] != TSM_MAGIC:
        raise TsmError("not a TSM file (bad magic)")
    (index_offset,) = struct.unpack_from(">Q", data, len(data) - 8)
    i = index_offset
    end = len(data) - 8
    out: list[TsmBlockMeta] = []
    while i < end:
        (key_len,) = struct.unpack_from(">H", data, i)
        i += 2
        key = data[i : i + key_len]
        i += key_len
        block_type, count = struct.unpack_from(">BH", data, i)
        i += 3
        for _ in range(count):
            min_t, max_t, offset, size = struct.unpack_from(">qqQI", data, i)
            i += 28
            out.append(TsmBlockMeta(key, block_type, min_t, max_t, offset, size))
    return out


def decode_tsm_block(
    data: bytes, meta: TsmBlockMeta, verify_crc: bool = True
) -> tuple[list[int], list]:
    """(timestamps, values) for one indexed block (reader.rs:585-668).

    The reference skips the CRC (reader.rs:593 TODO); we verify by default —
    a torn TSM copy should fail the import, not silently truncate data.
    """
    raw = data[meta.offset : meta.offset + meta.size]
    if len(raw) < 5:
        raise TsmError("short block")
    (crc,) = struct.unpack_from(">I", raw, 0)
    body = raw[4:]
    if verify_crc and zlib.crc32(body) & 0xFFFFFFFF != crc:
        raise TsmError(f"block CRC mismatch at offset {meta.offset}")
    block_type = body[0]
    if block_type != meta.block_type:
        raise TsmError("block type disagrees with index")
    ts_len, i = _varint_decode(body, 1)
    ts = decode_timestamps(body[i : i + ts_len])
    values = _DECODERS[block_type](body[i + ts_len :])
    if len(values) != len(ts):
        raise TsmError("timestamp/value count mismatch")
    return ts, values


def read_tsm(data: bytes, verify_crc: bool = True):
    """Yield (measurement, tags, field, block_type, offset, times, values)
    for every block in a TSM byte string."""
    for meta in read_tsm_index(data):
        measurement, tags, fld = parse_tsm_key(meta.key)
        ts, values = decode_tsm_block(data, meta, verify_crc=verify_crc)
        yield measurement, tags, fld, meta.block_type, meta.offset, ts, values


# ---------------------------------------------------------------------------
# Spark import (mapper.rs re-expressed): binaryFile -> per-file decode ->
# long format -> per-measurement pivot -> normal ingest path.

_TSM_DECODE_SCHEMA = (
    "measurement string, tags map<string,string>, field string,"
    " block_type int, time long, value_f double, value_i long,"
    " value_b boolean, value_s string, path string, offset long"
)

_VALUE_COL = {
    BLOCK_FLOAT: "value_f",
    BLOCK_INTEGER: "value_i",
    BLOCK_BOOL: "value_b",
    BLOCK_STR: "value_s",
    BLOCK_UNSIGNED: "value_i",  # no u64 in Spark: LongType, >= 2^63 wraps
}

# 2^40 bytes of block offsets per file rank — TSM files are capped at 2 GiB
# by the writer that produced them, so rank*2^40 + offset never collides.
_FILE_RANK_SHIFT = 40


def tsm_long_df(spark, paths, verify_crc: bool = True):
    """Distributed TSM decode: one `binaryFile` row per file, decoded inside
    mapInPandas (one task per file — the reference's reader-per-file unit,
    mapper.rs:21-33) into long-format rows.

    ``src_order`` encodes (file rank by sorted path, block offset): TSM
    generations sort lexicographically oldest-first, so a bigger src_order
    is a later write — the merge key for duplicate points
    (reader.rs:470-506 keeps the highest reader index).  Ranks come from a
    broadcast-joined (path, rank) table — one row per FILE (a window over
    the tiny distinct-path set), never a driver-side dict captured in the
    decode closure, so a million-file generation ships no per-path state
    to the executors.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    bf = spark.read.format("binaryFile").load(paths).select("path", "content")

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                rows: dict[str, list] = {
                    k: []
                    for k in (
                        "measurement", "tags", "field", "block_type", "time",
                        "value_f", "value_i", "value_b", "value_s",
                        "path", "offset",
                    )
                }
                for m, tags, fld, bt, offset, ts, vals in read_tsm(
                    bytes(content), verify_crc=verify_crc
                ):
                    vcol = _VALUE_COL[bt]
                    for t, v in zip(ts, vals):
                        rows["measurement"].append(m)
                        rows["tags"].append(tags)
                        rows["field"].append(fld)
                        rows["block_type"].append(bt)
                        rows["time"].append(t)
                        rows["value_f"].append(None)
                        rows["value_i"].append(None)
                        rows["value_b"].append(None)
                        rows["value_s"].append(None)
                        rows["path"].append(path)
                        rows["offset"].append(offset)
                        if bt == BLOCK_UNSIGNED:
                            rows[vcol][-1] = _as_i64(v)
                        elif bt == BLOCK_STR:
                            rows[vcol][-1] = v.decode(errors="replace")
                        else:
                            rows[vcol][-1] = v
                yield pd.DataFrame(rows)

    ranks = bf.select("path").distinct().select(
        "path",
        (F.row_number().over(Window.orderBy("path")) - 1).alias("__rank"),
    )
    return (
        bf.mapInPandas(decode, _TSM_DECODE_SCHEMA)
        .join(F.broadcast(ranks), "path")
        .withColumn(
            "src_order",
            F.shiftleft(F.col("__rank").cast("long"), _FILE_RANK_SHIFT)
            + F.col("offset"),
        )
        .drop("path", "offset", "__rank")
    )


_FIELD_TYPE_BY_BLOCK = {
    BLOCK_FLOAT: "field::float",
    BLOCK_INTEGER: "field::integer",
    BLOCK_BOOL: "field::boolean",
    BLOCK_STR: "field::string",
    BLOCK_UNSIGNED: "field::uinteger",
}


def tsm_catalog(long_df) -> dict[str, tuple[list[str], dict[str, int]]]:
    """{measurement: (tag keys, {field: block_type})} — one small aggregate
    over the long frame (the schema the mapper accumulates,
    mapper.rs:106-158).  Conflicting block types for one field are a type
    conflict, rejected exactly like the reference's ingest
    (entry.rs:32-44 TableColumnTypeMismatch)."""
    from pyspark.sql import functions as F

    rows = (
        long_df.groupBy("measurement")
        .agg(
            F.array_distinct(F.flatten(F.collect_list(F.map_keys("tags")))).alias("tag_keys"),
            F.collect_set(F.struct("field", "block_type")).alias("fields"),
        )
        .collect()
    )
    out: dict[str, tuple[list[str], dict[str, int]]] = {}
    for r in rows:
        fields: dict[str, int] = {}
        for fr in r["fields"]:
            prev = fields.setdefault(fr["field"], fr["block_type"])
            if prev != fr["block_type"]:
                raise TsmError(
                    f"field type conflict for {r['measurement']}.{fr['field']}"
                )
        out[r["measurement"]] = (sorted(r["tag_keys"]), fields)
    return out


def tsm_measurement_df(long_df, measurement: str, tag_keys: list[str], fields: dict[str, int]):
    """Pivot one measurement's long rows into the wide (tags…, fields…,
    time) shape (mapper.rs:205-330 TableSection construction).  Duplicate
    points collapse later-block-wins via max_by(value, src_order)."""
    from pyspark.sql import functions as F

    src = long_df.filter(F.col("measurement") == measurement)
    keys = [F.col("tags")[k].alias(k) for k in tag_keys]
    aggs = []
    for fld in sorted(fields):
        vcol = _VALUE_COL[fields[fld]]
        cond = F.col("field") == fld
        aggs.append(
            F.max_by(
                F.when(cond, F.col(vcol)), F.when(cond, F.col("src_order"))
            ).alias(fld)
        )
    return (
        src.select(*keys, F.col("time"), F.col("field"), F.col("src_order"),
                   *[F.col(c) for c in set(_VALUE_COL.values())])
        .groupBy(*tag_keys, "time")
        .agg(*aggs)
    )


def import_tsm(spark, store, paths, template=None, verify_crc: bool = True) -> dict:
    """Import TSM files into the table store: decode distributed, pivot per
    measurement, write sorted chunks through the normal partitioned bulk
    path.  Returns {measurement: (IoxSchema, [ChunkMeta])} — the schema a
    caller needs to scan or register the imported tables.

    The long frame is localCheckpointed once — it feeds the catalog
    aggregate plus one pivot-write per measurement, and re-decoding every
    TSM file for each consumer would multiply the Python decode cost.
    """
    from influxdb_iox_spark.schema import InfluxColumnType, IoxSchema
    from influxdb_iox_spark.streaming.ingest import PartitionTemplate

    long_df = tsm_long_df(spark, paths, verify_crc=verify_crc).localCheckpoint(
        eager=True
    )
    template = template or PartitionTemplate()
    out: dict[str, list] = {}
    for measurement, (tag_keys, fields) in sorted(tsm_catalog(long_df).items()):
        schema = IoxSchema.build(
            tag_keys,
            {f: InfluxColumnType(_FIELD_TYPE_BY_BLOCK[bt]) for f, bt in fields.items()},
        )
        wide = tsm_measurement_df(long_df, measurement, tag_keys, fields)
        keyed = wide.withColumn(
            "__part_key", template.key_column(measurement, schema.time_column)
        )
        # the pivot's groupBy(*tags, time) IS primary-key dedup -> skip the
        # writer's dedup pass
        metas = store.write_chunks_partitioned(
            keyed, measurement, schema, key_col="__part_key", dedup_batch=False
        )
        out[measurement] = (schema, metas)
    return out


_BLOCK_BY_FIELD_TYPE = {
    "field::float": BLOCK_FLOAT,
    "field::integer": BLOCK_INTEGER,
    "field::boolean": BLOCK_BOOL,
    "field::string": BLOCK_STR,
    "field::uinteger": BLOCK_UNSIGNED,
}


def export_tsm(
    df,
    measurement: str,
    schema,
    out_dir: str,
    org_id: int = 0xA,
    bucket_id: int = 0xB,
    num_files: int | None = None,
) -> None:
    """Export one measurement DataFrame to TSM files — the reverse of
    import_tsm (fixture generation at scale, or handing data back to legacy
    InfluxDB tooling).

    TSM is a sequential single-writer format (blocks, then index, then
    footer), so each FILE is built by one task; distribution comes from
    writing one file per partition, with rows repartitioned on the tag set
    so a series never straddles files more than necessary (TSM readers
    merge multi-file series anyway, reader.rs:470-506).  Null fields are
    skipped — TSM blocks carry no nulls; the dedup scan's last-non-null
    semantics reconstruct sparse rows on re-import.

    ``out_dir`` must be a filesystem path reachable from the executors
    (local mode or a shared mount; for object stores, export locally and
    upload).

    Memory: each task accumulates its partition's series in memory before
    the sequential file write (the index needs every block's location), so
    size ``num_files`` such that rows/num_files fits an executor — the
    same sizing rule as any partitioned file write.
    """
    import uuid as _uuid

    from influxdb_iox_spark.schema import column_type

    tags = list(schema.tag_columns)
    time_col = schema.time_column
    fields = {}
    for f in schema.struct.fields:
        ct = column_type(f)
        if ct is not None and ct.value in _BLOCK_BY_FIELD_TYPE:
            fields[f.name] = _BLOCK_BY_FIELD_TYPE[ct.value]
    os.makedirs(out_dir, exist_ok=True)
    time_dtype = dict(df.dtypes).get(time_col)
    if time_dtype not in ("bigint", "int", "long"):
        raise TsmError(
            f"time column {time_col!r} must be integral ns (got {time_dtype});"
            " convert TimestampType with unix_micros(col)*1000 first"
        )
    n = num_files or df.sparkSession.sparkContext.defaultParallelism
    part = df.repartition(n, *tags) if tags else df.repartition(n)

    def write_part(rows):
        # accumulate per series locally so the TSM key is built once per
        # series, not once per point
        series: dict[tuple, tuple[list[int], list]] = {}
        for row in rows:
            # TSM tag values are strings; stringify non-string tag columns
            # (the importer reads them back as string tags, like any legacy
            # line-protocol round trip would)
            tagvals = tuple(
                (t, row[t] if isinstance(row[t], str) else str(row[t]))
                for t in tags
                if row[t] is not None
            )
            ts = row[time_col]
            for fld, btype in fields.items():
                v = row[fld]
                if v is None:
                    continue
                if btype == BLOCK_STR:
                    v = v.encode() if isinstance(v, str) else bytes(v)
                elif btype == BLOCK_UNSIGNED:
                    v = int(v) & _M64
                ts_list, v_list = series.setdefault((tagvals, fld), ([], []))
                ts_list.append(ts)
                v_list.append(v)
        if not series:
            return
        w = TsmWriter(org_id=org_id, bucket_id=bucket_id)
        for (tagvals, fld), (ts_list, v_list) in series.items():
            w.add(measurement, dict(tagvals), fld, fields[fld], ts_list, v_list)
        w.write(os.path.join(out_dir, f"{_uuid.uuid4().hex}-000001.tsm"))

    part.foreachPartition(write_part)
