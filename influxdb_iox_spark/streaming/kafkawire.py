"""Minimal Kafka wire-protocol client — stdlib sockets, no client lib.

The reference's write buffer IS Kafka (server/src/write_buffer.rs); this
sandbox has neither a broker nor kafka-python, so round 12 shipped the
adapter's pure parts unit-tested and the transport import-gated.  This
module closes the transport gap the same way the repo closed gRPC and
S3 (``h2wire.py``, ``sources/s3rest.py``): implement the public wire
protocol from scratch and exercise it over real sockets against an
in-process protocol stub (tests/kafka_stub.py).

Scope — exactly what the write-buffer adapter needs, at fixed versions:

- **ApiVersions v0** (key 18) — handshake sanity.
- **Metadata v0** (key 3) — topic → partition ids.
- **Produce v3** (key 0) — record-batch v2 payloads (magic 2), the
  first version carrying record HEADERS (the adapter's ``fmt`` header
  distinguishes line protocol from flatbuffers Entry payloads).
- **Fetch v4** (key 1) — record-batch v2 responses.
- **ListOffsets v1** (key 2) — earliest/latest log-end offsets.

Record batches are encoded/decoded per the public spec (KIP-98 message
format v2): zigzag-varint record fields, CRC32C (Castagnoli — NOT
zlib's CRC32) over the batch body, big-endian fixed-width primitives.
The CRC32C implementation is the standard reflected table algorithm and
is pinned against the RFC 3720 check value in tests.  No compression,
no transactions, no consumer groups — the adapter manages offsets
itself (the contract's ``from_seq`` IS the consumer state).

Thread safety: one socket per client, one in-flight request at a time
(a lock serializes request/response pairs) — correct and simple; the
adapter's concurrency is across producers, not within a connection.
"""

from __future__ import annotations

import socket
import struct
import threading

# ---------------------------------------------------------------------------
# CRC32C (Castagnoli, reflected poly 0x82F63B78) — record batch v2 checksum
# ---------------------------------------------------------------------------

_CRC32C_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC32C_TABLE.append(_c)


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ _CRC32C_TABLE[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


# ---------------------------------------------------------------------------
# primitive codecs
# ---------------------------------------------------------------------------


def zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def wvarint(n: int) -> bytes:
    """Unsigned LEB128 of zigzag(n) — the record-field varint."""
    u = zigzag(n) & 0xFFFFFFFFFFFFFFFF
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def rvarint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = u = 0
    while True:
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            return unzigzag(u), pos
        shift += 7


class _W:
    def __init__(self):
        self.b = bytearray()

    def i8(self, v):
        self.b += struct.pack(">b", v)
        return self

    def i16(self, v):
        self.b += struct.pack(">h", v)
        return self

    def i32(self, v):
        self.b += struct.pack(">i", v)
        return self

    def i64(self, v):
        self.b += struct.pack(">q", v)
        return self

    def u32(self, v):
        self.b += struct.pack(">I", v)
        return self

    def string(self, s: "str | None"):
        if s is None:
            return self.i16(-1)
        raw = s.encode()
        self.i16(len(raw))
        self.b += raw
        return self

    def raw(self, data: bytes):
        self.b += data
        return self

    def nbytes(self, data: "bytes | None"):
        if data is None:
            return self.i32(-1)
        self.i32(len(data))
        self.b += data
        return self

    def bytes(self) -> bytes:
        return bytes(self.b)


class _R:
    def __init__(self, data: bytes):
        self.d = data
        self.p = 0

    def i8(self):
        v = struct.unpack_from(">b", self.d, self.p)[0]
        self.p += 1
        return v

    def i16(self):
        v = struct.unpack_from(">h", self.d, self.p)[0]
        self.p += 2
        return v

    def i32(self):
        v = struct.unpack_from(">i", self.d, self.p)[0]
        self.p += 4
        return v

    def i64(self):
        v = struct.unpack_from(">q", self.d, self.p)[0]
        self.p += 8
        return v

    def u32(self):
        v = struct.unpack_from(">I", self.d, self.p)[0]
        self.p += 4
        return v

    def string(self) -> "str | None":
        n = self.i16()
        if n < 0:
            return None
        v = self.d[self.p : self.p + n].decode()
        self.p += n
        return v

    def nbytes(self) -> "bytes | None":
        n = self.i32()
        if n < 0:
            return None
        v = self.d[self.p : self.p + n]
        self.p += n
        return v

    def varint(self) -> int:
        v, self.p = rvarint(self.d, self.p)
        return v


# ---------------------------------------------------------------------------
# record batch v2 (magic 2) — KIP-98 message format
# ---------------------------------------------------------------------------

#: (key, value, headers) with headers as [(str, bytes), ...]
Record = "tuple[bytes | None, bytes, list[tuple[str, bytes]]]"


def encode_record_batch(
    base_offset: int, records: list, base_timestamp: int = 0
) -> bytes:
    """One uncompressed record batch holding ``records`` at offsets
    base_offset..base_offset+n-1."""
    recs = bytearray()
    for i, (key, value, headers) in enumerate(records):
        body = bytearray()
        body += b"\x00"  # record attributes
        body += wvarint(0)  # timestampDelta
        body += wvarint(i)  # offsetDelta
        if key is None:
            body += wvarint(-1)
        else:
            body += wvarint(len(key)) + key
        body += wvarint(len(value)) + value
        body += wvarint(len(headers))
        for hk, hv in headers:
            hkr = hk.encode()
            body += wvarint(len(hkr)) + hkr
            body += wvarint(len(hv)) + hv
        recs += wvarint(len(body)) + body
    n = len(records)
    after_crc = (
        struct.pack(">h", 0)  # batch attributes: no compression
        + struct.pack(">i", n - 1)  # lastOffsetDelta
        + struct.pack(">q", base_timestamp)
        + struct.pack(">q", base_timestamp)  # maxTimestamp
        + struct.pack(">q", -1)  # producerId
        + struct.pack(">h", -1)  # producerEpoch
        + struct.pack(">i", -1)  # baseSequence
        + struct.pack(">i", n)
        + bytes(recs)
    )
    body = (
        struct.pack(">i", 0)  # partitionLeaderEpoch
        + b"\x02"  # magic
        + struct.pack(">I", crc32c(after_crc))
        + after_crc
    )
    return struct.pack(">q", base_offset) + struct.pack(">i", len(body)) + body


def decode_record_batches(data: bytes) -> list:
    """All (abs_offset, key, value, headers) records across the batches
    in a fetch-response record set (a set may hold several batches, and
    the final batch may be truncated by the broker's byte limit — a
    truncated tail is skipped, matching client behavior)."""
    out = []
    pos = 0
    while pos + 12 <= len(data):
        base_offset = struct.unpack_from(">q", data, pos)[0]
        batch_len = struct.unpack_from(">i", data, pos + 8)[0]
        start, end = pos + 12, pos + 12 + batch_len
        if end > len(data):
            break  # truncated tail batch
        r = _R(data[start:end])
        r.i32()  # partitionLeaderEpoch
        magic = r.i8()
        if magic != 2:
            raise ValueError(f"unsupported record batch magic {magic}")
        crc = r.u32()
        if crc32c(r.d[r.p :]) != crc:
            raise ValueError("record batch CRC32C mismatch")
        r.i16()  # attributes (no compression supported)
        r.i32()  # lastOffsetDelta
        r.i64()  # baseTimestamp
        r.i64()  # maxTimestamp
        r.i64()  # producerId
        r.i16()  # producerEpoch
        r.i32()  # baseSequence
        n = r.i32()
        for _ in range(n):
            rec_len = r.varint()
            rec_end = r.p + rec_len
            r.i8()  # record attributes
            r.varint()  # timestampDelta
            off_delta = r.varint()
            klen = r.varint()
            key = None
            if klen >= 0:
                key = r.d[r.p : r.p + klen]
                r.p += klen
            vlen = r.varint()
            value = r.d[r.p : r.p + vlen]
            r.p += vlen
            headers = []
            for _h in range(r.varint()):
                hklen = r.varint()
                hk = r.d[r.p : r.p + hklen].decode()
                r.p += hklen
                hvlen = r.varint()
                hv = r.d[r.p : r.p + hvlen]
                r.p += hvlen
                headers.append((hk, hv))
            r.p = rec_end
            out.append((base_offset + off_delta, key, value, headers))
        pos = end
    return out


# ---------------------------------------------------------------------------
# client
# ---------------------------------------------------------------------------

API_PRODUCE = 0
API_FETCH = 1
API_LIST_OFFSETS = 2
API_METADATA = 3
API_VERSIONS = 18


class KafkaWireError(RuntimeError):
    def __init__(self, api: str, code: int):
        super().__init__(f"{api} failed with Kafka error code {code}")
        self.code = code


class KafkaWireClient:
    def __init__(self, host: str, port: int, client_id: str = "iox-spark",
                 timeout: float = 10.0):
        self.client_id = client_id
        self._sock = socket.create_connection((host, port), timeout=timeout)
        self._corr = 0
        self._lock = threading.Lock()

    def close(self) -> None:
        try:
            self._sock.close()
        except OSError:
            pass

    # -- framing -----------------------------------------------------------

    def _request(self, api_key: int, api_version: int, body: bytes) -> _R:
        with self._lock:
            self._corr += 1
            corr = self._corr
            header = (
                _W().i16(api_key).i16(api_version).i32(corr)
                .string(self.client_id).bytes()
            )
            frame = header + body
            self._sock.sendall(struct.pack(">i", len(frame)) + frame)
            size = struct.unpack(">i", self._recv_exact(4))[0]
            resp = self._recv_exact(size)
        r = _R(resp)
        got = r.i32()
        if got != corr:
            raise RuntimeError(f"correlation id mismatch: {got} != {corr}")
        return r

    def _recv_exact(self, n: int) -> bytes:
        out = bytearray()
        while len(out) < n:
            chunk = self._sock.recv(n - len(out))
            if not chunk:
                raise ConnectionError("broker closed the connection")
            out += chunk
        return bytes(out)

    # -- APIs --------------------------------------------------------------

    def api_versions(self) -> dict[int, tuple[int, int]]:
        r = self._request(API_VERSIONS, 0, b"")
        err = r.i16()
        if err:
            raise KafkaWireError("ApiVersions", err)
        return {
            k: (lo, hi)
            for k, lo, hi in (
                (r.i16(), r.i16(), r.i16()) for _ in range(r.i32())
            )
        }

    def metadata(self, topics: list[str]) -> dict[str, list[int]]:
        """topic -> sorted live partition ids (Metadata v0).

        A topic with a non-zero topic-level error code RAISES
        ``KafkaWireError`` (``.code`` carries the Kafka error, e.g. 5 =
        LEADER_NOT_AVAILABLE during auto-create) instead of being
        silently omitted — callers must be able to tell "topic in error
        state" from "empty topic" (round-13 advice).  The one
        exception: UNKNOWN_TOPIC_OR_PARTITION (3) means the topic
        genuinely does not exist, which IS absence — omitted."""
        w = _W().i32(len(topics))
        for t in topics:
            w.string(t)
        r = self._request(API_METADATA, 0, w.bytes())
        for _ in range(r.i32()):  # brokers
            r.i32(), r.string(), r.i32()
        out: dict[str, list[int]] = {}
        for _ in range(r.i32()):
            terr = r.i16()
            name = r.string()
            parts = []
            for _p in range(r.i32()):
                r.i16()  # partition error
                pid = r.i32()
                r.i32()  # leader
                for _x in range(r.i32()):
                    r.i32()  # replicas
                for _x in range(r.i32()):
                    r.i32()  # isr
                parts.append(pid)
            if terr == 0:
                out[name] = sorted(parts)
            elif terr != 3:  # 3 = UNKNOWN_TOPIC_OR_PARTITION -> absent
                raise KafkaWireError(f"Metadata[{name}]", terr)
        return out

    def produce(self, topic: str, partition: int, records: list) -> int:
        """Append records (one batch) — returns the base offset
        (Produce v3, acks=-1)."""
        batch = encode_record_batch(0, records)
        w = (
            _W().string(None).i16(-1).i32(30_000).i32(1)
            .string(topic).i32(1).i32(partition).nbytes(batch)
        )
        r = self._request(API_PRODUCE, 3, w.bytes())
        base_offset, err = -1, 0
        for _ in range(r.i32()):
            r.string()
            for _p in range(r.i32()):
                r.i32()  # partition
                err = r.i16()
                base_offset = r.i64()
                r.i64()  # log append time
        r.i32()  # throttle
        if err:
            raise KafkaWireError("Produce", err)
        return base_offset

    def fetch(self, topic: str, partition: int, offset: int,
              max_bytes: int = 1 << 20) -> list:
        """(abs_offset, key, value, headers) from ``offset`` (Fetch v4)."""
        w = (
            _W().i32(-1).i32(100).i32(0).i32(max_bytes).i8(0).i32(1)
            .string(topic).i32(1).i32(partition).i64(offset).i32(max_bytes)
        )
        r = self._request(API_FETCH, 4, w.bytes())
        r.i32()  # throttle
        records: list = []
        for _ in range(r.i32()):
            r.string()
            for _p in range(r.i32()):
                r.i32()  # partition
                err = r.i16()
                r.i64()  # high watermark
                r.i64()  # last stable offset
                for _a in range(max(0, r.i32())):  # aborted txns
                    r.i64(), r.i64()
                record_set = r.nbytes() or b""
                if err:
                    raise KafkaWireError("Fetch", err)
                records.extend(decode_record_batches(record_set))
        return [rec for rec in records if rec[0] >= offset]

    def list_offsets(self, topic: str, partition: int,
                     timestamp: int = -1) -> int:
        """Log-end (-1) or earliest (-2) offset (ListOffsets v1)."""
        w = (
            _W().i32(-1).i32(1).string(topic).i32(1)
            .i32(partition).i64(timestamp)
        )
        r = self._request(API_LIST_OFFSETS, 1, w.bytes())
        offset = 0
        for _ in range(r.i32()):
            r.string()
            for _p in range(r.i32()):
                r.i32()  # partition
                err = r.i16()
                r.i64()  # timestamp
                offset = r.i64()
                if err:
                    raise KafkaWireError("ListOffsets", err)
        return offset
