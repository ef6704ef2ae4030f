"""In-process Kafka broker stub (stdlib only) for KafkaWireClient and the
kafkawire write-buffer backend: speaks the same fixed API versions the
client does (ApiVersions v0, Metadata v0, Produce v3, Fetch v4,
ListOffsets v1) over real TCP sockets, with per-(topic, partition)
in-memory logs.

Honesty note (same status as the S3/GCS/Azure stubs): the stub shares
the record-batch codec with the client, so the codec itself is
additionally pinned by golden byte vectors and the RFC 3720 CRC32C
check value in test_kafkawire.py — the stub verifies FRAMING, request
routing, correlation ids, offset assignment, and multi-partition
semantics over the wire, not the codec against an independent
implementation (no broker or client lib exists in this sandbox).

Topics auto-create on first reference (the common broker deployment
default) with ``n_partitions`` partitions; producing to a higher
partition id extends the topic, which keeps the stub permissive for
contract tests that pick arbitrary partition labels.
"""

from __future__ import annotations

import socket
import socketserver
import struct
import threading

from influxdb_iox_spark.streaming.kafkawire import (
    _R,
    _W,
    decode_record_batches,
    encode_record_batch,
)


class KafkaStub:
    def __init__(self, n_partitions: int = 4):
        self.n_partitions = n_partitions
        self.logs: dict[tuple[str, int], list] = {}
        self.topics: dict[str, int] = {}  # topic -> partition count
        #: error injection: topic -> list of topic-level error codes to
        #: return from successive Metadata responses (popped front-first;
        #: empty list = healthy).  Lets tests simulate transient
        #: LEADER_NOT_AVAILABLE (5) during auto-create.
        self.metadata_errors: dict[str, list[int]] = {}
        self.lock = threading.Lock()
        stub = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self):
                sock = self.request
                try:
                    while True:
                        head = _recv_exact(sock, 4)
                        if head is None:
                            return
                        size = struct.unpack(">i", head)[0]
                        frame = _recv_exact(sock, size)
                        if frame is None:
                            return
                        resp = stub._dispatch(frame)
                        sock.sendall(struct.pack(">i", len(resp)) + resp)
                except (ConnectionError, OSError):
                    return

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = Server(("127.0.0.1", 0), Handler)
        self.host, self.port = self._server.server_address
        self.bootstrap = f"{self.host}:{self.port}"
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()

    def stop(self):
        self._server.shutdown()
        self._server.server_close()

    # -- request dispatch --------------------------------------------------

    def _ensure(self, topic: str, partition: int | None = None) -> None:
        n = self.topics.setdefault(topic, self.n_partitions)
        if partition is not None and partition >= n:
            self.topics[topic] = partition + 1
            n = partition + 1
        for p in range(n):
            self.logs.setdefault((topic, p), [])

    def _dispatch(self, frame: bytes) -> bytes:
        r = _R(frame)
        api_key = r.i16()
        api_version = r.i16()
        corr = r.i32()
        r.string()  # client id
        body = frame[r.p :]
        out = _W().i32(corr)
        with self.lock:
            if api_key == 18:  # ApiVersions v0
                keys = [(0, 0, 3), (1, 0, 4), (2, 0, 1), (3, 0, 0), (18, 0, 0)]
                out.i16(0).i32(len(keys))
                for k, lo, hi in keys:
                    out.i16(k).i16(lo).i16(hi)
            elif api_key == 3:  # Metadata v0
                self._metadata(_R(body), out)
            elif api_key == 0 and api_version == 3:
                self._produce(_R(body), out)
            elif api_key == 1 and api_version == 4:
                self._fetch(_R(body), out)
            elif api_key == 2 and api_version == 1:
                self._list_offsets(_R(body), out)
            else:
                raise AssertionError(
                    f"stub has no handler for api {api_key} v{api_version}"
                )
        return out.bytes()

    def _metadata(self, r: _R, out: _W) -> None:
        topics = [r.string() for _ in range(r.i32())]
        for t in topics:
            self._ensure(t)
        out.i32(1)  # brokers
        out.i32(0).string(self.host).i32(self.port)
        out.i32(len(topics))
        for t in topics:
            n = self.topics[t]
            pending = self.metadata_errors.get(t)
            if pending:
                out.i16(pending.pop(0)).string(t).i32(0)
                continue
            out.i16(0).string(t).i32(n)
            for p in range(n):
                out.i16(0).i32(p).i32(0)  # error, id, leader
                out.i32(1).i32(0)  # replicas [0]
                out.i32(1).i32(0)  # isr [0]

    def _produce(self, r: _R, out: _W) -> None:
        r.string()  # transactional id
        r.i16()  # acks
        r.i32()  # timeout
        results = []
        for _ in range(r.i32()):
            topic = r.string()
            for _p in range(r.i32()):
                partition = r.i32()
                record_set = r.nbytes() or b""
                self._ensure(topic, partition)
                log = self.logs[(topic, partition)]
                base = len(log)
                for _off, key, value, headers in decode_record_batches(
                    record_set
                ):
                    log.append((key, value, headers))
                results.append((topic, partition, base))
        out.i32(len(results))
        for topic, partition, base in results:
            out.string(topic).i32(1)
            out.i32(partition).i16(0).i64(base).i64(-1)
        out.i32(0)  # throttle

    def _fetch(self, r: _R, out: _W) -> None:
        r.i32(), r.i32(), r.i32(), r.i32(), r.i8()  # fetch prelude
        requests = []
        for _ in range(r.i32()):
            topic = r.string()
            for _p in range(r.i32()):
                partition = r.i32()
                offset = r.i64()
                r.i32()  # partition max bytes
                requests.append((topic, partition, offset))
        out.i32(0)  # throttle
        out.i32(len(requests))
        for topic, partition, offset in requests:
            self._ensure(topic, partition)
            log = self.logs[(topic, partition)]
            out.string(topic).i32(1)
            out.i32(partition).i16(0).i64(len(log)).i64(len(log)).i32(0)
            if offset < len(log):
                batch = encode_record_batch(offset, log[offset:])
                out.nbytes(batch)
            else:
                out.nbytes(b"")

    def _list_offsets(self, r: _R, out: _W) -> None:
        r.i32()  # replica id
        requests = []
        for _ in range(r.i32()):
            topic = r.string()
            for _p in range(r.i32()):
                partition = r.i32()
                ts = r.i64()
                requests.append((topic, partition, ts))
        out.i32(len(requests))
        for topic, partition, ts in requests:
            self._ensure(topic, partition)
            n = len(self.logs[(topic, partition)])
            off = 0 if ts == -2 else n
            out.string(topic).i32(1)
            out.i32(partition).i16(0).i64(-1).i64(off)


def _recv_exact(sock: socket.socket, n: int) -> "bytes | None":
    out = bytearray()
    while len(out) < n:
        try:
            chunk = sock.recv(n - len(out))
        except (ConnectionError, OSError):
            return None
        if not chunk:
            return None
        out += chunk
    return bytes(out)
