"""HTTP/2 (h2c) framing + HPACK — hand-rolled, no dependency.

The reference serves its gRPC services on a plain HTTP/2 socket (tonic,
src/influxdb_ioxd/rpc.rs); the sandbox has no grpcio, so — continuing
the protowire/fbwire pattern — this module implements the public wire
formats a gRPC endpoint needs:

- RFC 7540 framing: the 9-byte frame header, DATA / HEADERS /
  SETTINGS / PING / GOAWAY / WINDOW_UPDATE / RST_STREAM /
  CONTINUATION, padding/priority stripping, flow-control accounting.
- RFC 7541 HPACK: full decoder (static + dynamic tables, all four
  literal representations, dynamic-table size updates, Huffman
  decoding with the canonical Appendix B code table) and a
  conservative encoder (static-table exact matches, literals without
  indexing, optional Huffman) — a decoder must accept everything, an
  encoder may emit any valid subset.

Conformance is pinned by RFC 7541's own worked examples (Appendix C)
in tests/test_h2wire.py.  The gRPC layer over these frames lives in
rpc_h2.py.
"""

from __future__ import annotations

import struct

# -- RFC 7541 Appendix B: the canonical Huffman code, (code, bits) per
# symbol 0..255 plus EOS (index 256) --------------------------------------
HUFFMAN_TABLE = [
    (0x1ff8,13), (0x7fffd8,23), (0xfffffe2,28), (0xfffffe3,28), (0xfffffe4,28), (0xfffffe5,28), (0xfffffe6,28), (0xfffffe7,28),
    (0xfffffe8,28), (0xffffea,24), (0x3ffffffc,30), (0xfffffe9,28), (0xfffffea,28), (0x3ffffffd,30), (0xfffffeb,28), (0xfffffec,28),
    (0xfffffed,28), (0xfffffee,28), (0xfffffef,28), (0xffffff0,28), (0xffffff1,28), (0xffffff2,28), (0x3ffffffe,30), (0xffffff3,28),
    (0xffffff4,28), (0xffffff5,28), (0xffffff6,28), (0xffffff7,28), (0xffffff8,28), (0xffffff9,28), (0xffffffa,28), (0xffffffb,28),
    (0x14,6), (0x3f8,10), (0x3f9,10), (0xffa,12), (0x1ff9,13), (0x15,6), (0xf8,8), (0x7fa,11),
    (0x3fa,10), (0x3fb,10), (0xf9,8), (0x7fb,11), (0xfa,8), (0x16,6), (0x17,6), (0x18,6),
    (0x0,5), (0x1,5), (0x2,5), (0x19,6), (0x1a,6), (0x1b,6), (0x1c,6), (0x1d,6),
    (0x1e,6), (0x1f,6), (0x5c,7), (0xfb,8), (0x7ffc,15), (0x20,6), (0xffb,12), (0x3fc,10),
    (0x1ffa,13), (0x21,6), (0x5d,7), (0x5e,7), (0x5f,7), (0x60,7), (0x61,7), (0x62,7),
    (0x63,7), (0x64,7), (0x65,7), (0x66,7), (0x67,7), (0x68,7), (0x69,7), (0x6a,7),
    (0x6b,7), (0x6c,7), (0x6d,7), (0x6e,7), (0x6f,7), (0x70,7), (0x71,7), (0x72,7),
    (0xfc,8), (0x73,7), (0xfd,8), (0x1ffb,13), (0x7fff0,19), (0x1ffc,13), (0x3ffc,14), (0x22,6),
    (0x7ffd,15), (0x3,5), (0x23,6), (0x4,5), (0x24,6), (0x5,5), (0x25,6), (0x26,6),
    (0x27,6), (0x6,5), (0x74,7), (0x75,7), (0x28,6), (0x29,6), (0x2a,6), (0x7,5),
    (0x2b,6), (0x76,7), (0x2c,6), (0x8,5), (0x9,5), (0x2d,6), (0x77,7), (0x78,7),
    (0x79,7), (0x7a,7), (0x7b,7), (0x7ffe,15), (0x7fc,11), (0x3ffd,14), (0x1ffd,13), (0xffffffc,28),
    (0xfffe6,20), (0x3fffd2,22), (0xfffe7,20), (0xfffe8,20), (0x3fffd3,22), (0x3fffd4,22), (0x3fffd5,22), (0x7fffd9,23),
    (0x3fffd6,22), (0x7fffda,23), (0x7fffdb,23), (0x7fffdc,23), (0x7fffdd,23), (0x7fffde,23), (0xffffeb,24), (0x7fffdf,23),
    (0xffffec,24), (0xffffed,24), (0x3fffd7,22), (0x7fffe0,23), (0xffffee,24), (0x7fffe1,23), (0x7fffe2,23), (0x7fffe3,23),
    (0x7fffe4,23), (0x1fffdc,21), (0x3fffd8,22), (0x7fffe5,23), (0x3fffd9,22), (0x7fffe6,23), (0x7fffe7,23), (0xffffef,24),
    (0x3fffda,22), (0x1fffdd,21), (0xfffe9,20), (0x3fffdb,22), (0x3fffdc,22), (0x7fffe8,23), (0x7fffe9,23), (0x1fffde,21),
    (0x7fffea,23), (0x3fffdd,22), (0x3fffde,22), (0xfffff0,24), (0x1fffdf,21), (0x3fffdf,22), (0x7fffeb,23), (0x7fffec,23),
    (0x1fffe0,21), (0x1fffe1,21), (0x3fffe0,22), (0x1fffe2,21), (0x7fffed,23), (0x3fffe1,22), (0x7fffee,23), (0x7fffef,23),
    (0xfffea,20), (0x3fffe2,22), (0x3fffe3,22), (0x3fffe4,22), (0x7ffff0,23), (0x3fffe5,22), (0x3fffe6,22), (0x7ffff1,23),
    (0x3ffffe0,26), (0x3ffffe1,26), (0xfffeb,20), (0x7fff1,19), (0x3fffe7,22), (0x7ffff2,23), (0x3fffe8,22), (0x1ffffec,25),
    (0x3ffffe2,26), (0x3ffffe3,26), (0x3ffffe4,26), (0x7ffffde,27), (0x7ffffdf,27), (0x3ffffe5,26), (0xfffff1,24), (0x1ffffed,25),
    (0x7fff2,19), (0x1fffe3,21), (0x3ffffe6,26), (0x7ffffe0,27), (0x7ffffe1,27), (0x3ffffe7,26), (0x7ffffe2,27), (0xfffff2,24),
    (0x1fffe4,21), (0x1fffe5,21), (0x3ffffe8,26), (0x3ffffe9,26), (0xffffffd,28), (0x7ffffe3,27), (0x7ffffe4,27), (0x7ffffe5,27),
    (0xfffec,20), (0xfffff3,24), (0xfffed,20), (0x1fffe6,21), (0x3fffe9,22), (0x1fffe7,21), (0x1fffe8,21), (0x7ffff3,23),
    (0x3fffea,22), (0x3fffeb,22), (0x1ffffee,25), (0x1ffffef,25), (0xfffff4,24), (0xfffff5,24), (0x3ffffea,26), (0x7ffff4,23),
    (0x3ffffeb,26), (0x7ffffe6,27), (0x3ffffec,26), (0x3ffffed,26), (0x7ffffe7,27), (0x7ffffe8,27), (0x7ffffe9,27), (0x7ffffea,27),
    (0x7ffffeb,27), (0xffffffe,28), (0x7ffffec,27), (0x7ffffed,27), (0x7ffffee,27), (0x7ffffef,27), (0x7fffff0,27), (0x3ffffee,26),
    (0x3fffffff,30),
]


_EOS = 256

#: decode map: (bits, code) -> symbol
_HUFF_DECODE = {(l, c): i for i, (c, l) in enumerate(HUFFMAN_TABLE)}


def huffman_decode(data: bytes) -> bytes:
    """Bitwise walk of the canonical code (max 30 bits).  Trailing bits
    must be the EOS prefix (all ones, <= 7 bits) per RFC 7541 §5.2."""
    out = bytearray()
    code = 0
    bits = 0
    for byte in data:
        for shift in range(7, -1, -1):
            code = (code << 1) | ((byte >> shift) & 1)
            bits += 1
            sym = _HUFF_DECODE.get((bits, code))
            if sym is not None:
                if sym == _EOS:
                    raise ValueError("EOS symbol inside Huffman string")
                out.append(sym)
                code = 0
                bits = 0
    if bits > 7 or code != (1 << bits) - 1:
        raise ValueError("invalid Huffman padding")
    return bytes(out)


def huffman_encode(data: bytes) -> bytes:
    code_acc = 0
    bits_acc = 0
    out = bytearray()
    for b in data:
        c, l = HUFFMAN_TABLE[b]
        code_acc = (code_acc << l) | c
        bits_acc += l
        while bits_acc >= 8:
            bits_acc -= 8
            out.append((code_acc >> bits_acc) & 0xFF)
    if bits_acc:
        out.append(((code_acc << (8 - bits_acc)) | ((1 << (8 - bits_acc)) - 1)) & 0xFF)
    return bytes(out)


# -- RFC 7541 Appendix A: the static table --------------------------------

STATIC_TABLE = [
    (":authority", ""),
    (":method", "GET"),
    (":method", "POST"),
    (":path", "/"),
    (":path", "/index.html"),
    (":scheme", "http"),
    (":scheme", "https"),
    (":status", "200"),
    (":status", "204"),
    (":status", "206"),
    (":status", "304"),
    (":status", "400"),
    (":status", "404"),
    (":status", "500"),
    ("accept-charset", ""),
    ("accept-encoding", "gzip, deflate"),
    ("accept-language", ""),
    ("accept-ranges", ""),
    ("accept", ""),
    ("access-control-allow-origin", ""),
    ("age", ""),
    ("allow", ""),
    ("authorization", ""),
    ("cache-control", ""),
    ("content-disposition", ""),
    ("content-encoding", ""),
    ("content-language", ""),
    ("content-length", ""),
    ("content-location", ""),
    ("content-range", ""),
    ("content-type", ""),
    ("cookie", ""),
    ("date", ""),
    ("etag", ""),
    ("expect", ""),
    ("expires", ""),
    ("from", ""),
    ("host", ""),
    ("if-match", ""),
    ("if-modified-since", ""),
    ("if-none-match", ""),
    ("if-range", ""),
    ("if-unmodified-since", ""),
    ("last-modified", ""),
    ("link", ""),
    ("location", ""),
    ("max-forwards", ""),
    ("proxy-authenticate", ""),
    ("proxy-authorization", ""),
    ("range", ""),
    ("referer", ""),
    ("refresh", ""),
    ("retry-after", ""),
    ("server", ""),
    ("set-cookie", ""),
    ("strict-transport-security", ""),
    ("transfer-encoding", ""),
    ("user-agent", ""),
    ("vary", ""),
    ("via", ""),
    ("www-authenticate", ""),
]
_STATIC_EXACT = {pair: i + 1 for i, pair in enumerate(STATIC_TABLE)}

#: per-entry overhead in the dynamic-table size calculus (RFC 7541 §4.1)
_ENTRY_OVERHEAD = 32


def _decode_int(data: bytes, pos: int, prefix_bits: int) -> tuple[int, int]:
    """RFC 7541 §5.1 prefix-coded integer → (value, next_pos)."""
    mask = (1 << prefix_bits) - 1
    value = data[pos] & mask
    pos += 1
    if value < mask:
        return value, pos
    shift = 0
    while True:
        b = data[pos]
        pos += 1
        value += (b & 0x7F) << shift
        shift += 7
        if not b & 0x80:
            return value, pos


def _encode_int(value: int, prefix_bits: int, first_byte_flags: int = 0) -> bytes:
    mask = (1 << prefix_bits) - 1
    if value < mask:
        return bytes([first_byte_flags | value])
    out = bytearray([first_byte_flags | mask])
    value -= mask
    while value >= 0x80:
        out.append((value & 0x7F) | 0x80)
        value >>= 7
    out.append(value)
    return bytes(out)


def _decode_string(data: bytes, pos: int) -> tuple[str, int]:
    huff = bool(data[pos] & 0x80)
    length, pos = _decode_int(data, pos, 7)
    raw = data[pos : pos + length]
    pos += length
    if huff:
        raw = huffman_decode(raw)
    return raw.decode("utf-8", "surrogateescape"), pos


def _encode_string(s: str, huffman: bool = False) -> bytes:
    raw = s.encode("utf-8", "surrogateescape")
    if huffman:
        enc = huffman_encode(raw)
        return _encode_int(len(enc), 7, 0x80) + enc
    return _encode_int(len(raw), 7, 0x00) + raw


class HpackDecoder:
    """Full HPACK decoder: one instance per connection direction."""

    def __init__(self, max_table_size: int = 4096):
        self.max_size = max_table_size
        self.dynamic: list[tuple[str, str]] = []  # newest first
        self.size = 0

    def _entry(self, index: int) -> tuple[str, str]:
        if index == 0:
            raise ValueError("HPACK index 0")
        if index <= len(STATIC_TABLE):
            return STATIC_TABLE[index - 1]
        di = index - len(STATIC_TABLE) - 1
        if di >= len(self.dynamic):
            raise ValueError(f"HPACK index {index} out of range")
        return self.dynamic[di]

    def _add(self, name: str, value: str) -> None:
        entry_size = len(name.encode()) + len(value.encode()) + _ENTRY_OVERHEAD
        self.dynamic.insert(0, (name, value))
        self.size += entry_size
        while self.size > self.max_size and self.dynamic:
            n, v = self.dynamic.pop()
            self.size -= len(n.encode()) + len(v.encode()) + _ENTRY_OVERHEAD

    def decode(self, block: bytes) -> list[tuple[str, str]]:
        out: list[tuple[str, str]] = []
        pos = 0
        while pos < len(block):
            b = block[pos]
            if b & 0x80:  # indexed header field
                index, pos = _decode_int(block, pos, 7)
                out.append(self._entry(index))
            elif b & 0x40:  # literal with incremental indexing
                index, pos = _decode_int(block, pos, 6)
                name = self._entry(index)[0] if index else None
                if name is None:
                    name, pos = _decode_string(block, pos)
                value, pos = _decode_string(block, pos)
                self._add(name, value)
                out.append((name, value))
            elif b & 0x20:  # dynamic table size update
                new_size, pos = _decode_int(block, pos, 5)
                self.max_size = new_size
                while self.size > self.max_size and self.dynamic:
                    n, v = self.dynamic.pop()
                    self.size -= len(n.encode()) + len(v.encode()) + _ENTRY_OVERHEAD
            else:  # literal without indexing (0x00) / never indexed (0x10)
                index, pos = _decode_int(block, pos, 4)
                name = self._entry(index)[0] if index else None
                if name is None:
                    name, pos = _decode_string(block, pos)
                value, pos = _decode_string(block, pos)
                out.append((name, value))
        return out


class HpackEncoder:
    """Conservative encoder: exact static-table matches by index,
    everything else a literal WITHOUT indexing (no dynamic-table state
    to keep in sync).  ``huffman`` selects string encoding — useful in
    tests to exercise the peer's Huffman decode path."""

    def __init__(self, huffman: bool = False):
        self.huffman = huffman

    def encode(self, headers: list[tuple[str, str]]) -> bytes:
        out = bytearray()
        for name, value in headers:
            idx = _STATIC_EXACT.get((name, value))
            if idx is not None:
                out += _encode_int(idx, 7, 0x80)
                continue
            out += b"\x00"
            out += _encode_string(name, self.huffman)
            out += _encode_string(value, self.huffman)
        return bytes(out)


# -- RFC 7540 frames -------------------------------------------------------

DATA, HEADERS, PRIORITY, RST_STREAM, SETTINGS, PUSH_PROMISE, PING, GOAWAY, WINDOW_UPDATE, CONTINUATION = range(10)

FLAG_END_STREAM = 0x1
FLAG_ACK = 0x1
FLAG_END_HEADERS = 0x4
FLAG_PADDED = 0x8
FLAG_PRIORITY = 0x20

CONNECTION_PREFACE = b"PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n"
DEFAULT_WINDOW = 65535


def encode_frame(ftype: int, flags: int, stream_id: int, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))[1:]
        + bytes([ftype, flags])
        + struct.pack(">I", stream_id & 0x7FFFFFFF)
        + payload
    )


def read_exact(sock, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed")
        buf += chunk
    return bytes(buf)


def read_frame(sock) -> tuple[int, int, int, bytes]:
    """(type, flags, stream_id, payload)."""
    head = read_exact(sock, 9)
    length = int.from_bytes(head[:3], "big")
    ftype, flags = head[3], head[4]
    stream_id = int.from_bytes(head[5:9], "big") & 0x7FFFFFFF
    payload = read_exact(sock, length) if length else b""
    return ftype, flags, stream_id, payload


def strip_padding_priority(flags: int, payload: bytes, ftype: int) -> bytes:
    """Remove PADDED/PRIORITY envelope from HEADERS/DATA payloads."""
    pos = 0
    pad = 0
    if flags & FLAG_PADDED:
        pad = payload[pos]
        pos += 1
    if ftype == HEADERS and flags & FLAG_PRIORITY:
        pos += 5
    end = len(payload) - pad
    return payload[pos:end]
