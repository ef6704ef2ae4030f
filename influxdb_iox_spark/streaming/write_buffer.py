"""Write buffer: a durable, sequenced, per-database payload log.

The reference's write buffer is Kafka — producers append Entry payloads
to a topic named after the database; a database configured with a
`reading` connection consumes the topic instead of accepting direct
writes (server/src/write_buffer.rs, server/src/db.rs store_entry match).

This is the same abstraction over a shared filesystem "topic": one
sequenced line-protocol payload file per produce, in a per-database
subdirectory.  The connection string is a directory path; at deployment
scale the connection string becomes a kafka:/kinesis: URL and the
consumer side becomes the corresponding Structured Streaming source —
the pipeline after the source (parse → shard → chunk) is identical, so
nothing but this adapter changes.

Producer concurrency: the sequence number is claimed with
O_CREAT|O_EXCL (the filesystem arbitrates racing producers, same
pattern as the manifest's id blocks); payloads are written to a temp
name and renamed in, so a consumer never observes a torn payload.
Consumption is at-least-once (offset recorded AFTER apply) — safe here
because replaying identical line-protocol is idempotent through the
store's primary-key deduplication.
"""

from __future__ import annotations

import abc
import json
import os


class WriteBuffer(abc.ABC):
    """The write-buffer contract every backend implements — the seam a
    deployment swaps when the connection string changes from a directory
    path to ``kafka://…``.  Contract (verified by the parametrized
    battery in tests/test_write_buffer_contract.py):

    - ``produce``/``produce_entry`` return a per-database monotonically
      increasing sequence number; concurrent producers never share one.
    - ``poll(db, from_seq)`` returns payloads at-or-past ``from_seq`` in
      sequence order — ``str`` for line protocol, ``bytes`` for Entry —
      plus the parked sequences (aged empty claims to recheck later).
    - ``read_one`` re-reads a single sequence (the parked-recheck path).
    - Delivery is at-least-once; consumers apply idempotently through
      the store's primary-key dedup, so replays are harmless.
    """

    @abc.abstractmethod
    def produce(self, db_name: str, lp_data: str, partition: int = 0) -> int: ...

    @abc.abstractmethod
    def produce_entry(
        self, db_name: str, entry: bytes, partition: int = 0
    ) -> int: ...

    @abc.abstractmethod
    def fetch(self, db_name: str, from_seq: int = 0) -> list[tuple[int, str]]: ...

    @abc.abstractmethod
    def poll(
        self, db_name: str, from_seq: int = 0, with_partitions: bool = False
    ) -> tuple[list[tuple], list[int]]: ...

    @abc.abstractmethod
    def partition_of(self, db_name: str, seq: int) -> int: ...

    @abc.abstractmethod
    def read_one(self, db_name: str, seq: int) -> "str | bytes | None": ...


def open_write_buffer(conn: str) -> "WriteBuffer":
    """Connection string → backend: ``kafka://brokers[/prefix]`` selects
    the Kafka adapter (the reference's write buffer,
    server/src/write_buffer.rs); anything else is a filesystem topic
    directory.  Every engine call site goes through here, so a
    deployment swaps backends by changing ONLY the connection string in
    the database rules — exactly the reference's
    ``write_buffer_connection`` shape."""
    if conn.startswith(("kafkawire:", "kafkawire://")):
        return KafkaWireWriteBuffer(conn)
    if conn.startswith(("kafka:", "kafka://")):
        return KafkaWriteBuffer(conn)
    return FileWriteBuffer(conn)


class FileWriteBuffer(WriteBuffer):
    def __init__(self, conn: str):
        self.root = conn

    def _topic_dir(self, db_name: str) -> str:
        # Percent-encode path separators: any valid DatabaseName (which may
        # contain '/' or even '..') maps to ONE directory entry under the
        # buffer root — a name like '../x' must not escape it (same
        # encoding as IoxServer._db_dir).
        safe = db_name.replace("%", "%25").replace("/", "%2F")
        if safe in (".", ".."):  # a bare dot-name is a valid DatabaseName
            safe = safe.replace(".", "%2E")
        d = os.path.join(self.root, safe)
        os.makedirs(d, exist_ok=True)
        return d

    @staticmethod
    def _seq_of(fname: str) -> int:
        return int(fname.split("-", 1)[0])

    @staticmethod
    def _partition_of(fname: str) -> int:
        """Producer's partition (shard/sequencer id), encoded in the
        payload name ``<seq>-<partition><suffix>`` — the Kafka-partition
        analogue the windows bookkeeping keys sequences by."""
        try:
            return int(fname.split("-", 1)[1].split(".", 1)[0])
        except (IndexError, ValueError):
            return 0

    #: payload suffixes: text line protocol, binary flatbuffers Entry
    #: (the reference topic's native payload — entry_fb decodes it)
    _SUFFIXES = (".lp", ".entry")

    def _is_payload(self, fname: str) -> bool:
        return fname.endswith(self._SUFFIXES)

    def produce(self, db_name: str, lp_data: str, partition: int = 0) -> int:
        """Append one line-protocol payload; returns its sequence number."""
        return self._produce(db_name, lp_data.encode(), ".lp", partition)

    def produce_entry(self, db_name: str, entry: bytes, partition: int = 0) -> int:
        """Append one flatbuffers Entry payload (the reference write
        buffer's native format, entry/src/entry.fbs) — consumed
        byte-for-byte by drain via the entry_fb codec."""
        return self._produce(db_name, bytes(entry), ".entry", partition)

    def _produce(self, db_name: str, data: bytes, suffix: str, partition: int) -> int:
        """Claim a sequence, then fill it.  The CLAIM is always the
        ``.lp`` name (one O_CREAT|O_EXCL path per sequence = a true CAS;
        claiming per-suffix would let an .lp and an .entry producer both
        win the same sequence).  A line-protocol payload renames onto the
        claim; an Entry payload renames in as ``.entry`` — atomically,
        with full content — and then drops the claim, so a ``.entry``
        file is never observed torn or empty."""
        d = self._topic_dir(db_name)
        existing = [
            self._seq_of(f) for f in os.listdir(d) if self._is_payload(f)
        ]
        seq = (max(existing) + 1) if existing else 0
        while True:
            claim = os.path.join(d, f"{seq:012d}-{partition}.lp")
            try:
                fd = os.open(claim, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                break
            except FileExistsError:  # racing producer claimed it
                seq += 1
        try:
            final = os.path.join(d, f"{seq:012d}-{partition}{suffix}")
            tmp = final + ".tmp"
            with open(tmp, "wb") as f:
                f.write(data)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, final)
            if final != claim:
                os.unlink(claim)
        finally:
            os.close(fd)
        return seq

    #: a claimed-but-empty payload younger than this is an in-flight
    #: producer (stop and retry next poll); older is a crashed claim
    #: (skip permanently)
    PENDING_GRACE_SECONDS = 5.0

    def fetch(self, db_name: str, from_seq: int = 0) -> list[tuple[int, str]]:
        """(sequence, payload) for every payload at or past from_seq, in
        sequence order.  Consumption is CONTIGUOUS like a Kafka offset: a
        claimed-but-not-yet-renamed payload (reads empty, recent mtime)
        stops the poll so nothing behind it is skipped; an empty claim
        older than the grace period is passed over THIS poll (see poll()
        for the parked-sequence recheck that keeps at-least-once if the
        slow producer fills it in later)."""
        return self.poll(db_name, from_seq)[0]

    def poll(
        self, db_name: str, from_seq: int = 0, with_partitions: bool = False
    ) -> tuple[list[tuple], list[int]]:
        """(payloads, parked): payloads as fetch() — ``str`` for line
        protocol, ``bytes`` for flatbuffers Entry payloads (triples
        ``(seq, partition, payload)`` when ``with_partitions`` — the
        consumer feeds the partition to the per-sequencer windows);
        parked lists the aged empty claims that were passed over.  A producer paused
        longer than the grace period can still rename its payload in
        AFTER the consumer's offset has advanced past it, so skipping an
        aged claim must not be final: the consumer records parked
        sequences and re-checks them with read_one() on every later
        drain, preserving the at-least-once contract (ordering is
        irrelevant downstream — applying writes is idempotent through
        primary-key dedup).

        Per sequence, a content-bearing file wins over an empty ``.lp``
        claim (an Entry producer drops its claim AFTER renaming the
        ``.entry`` in, so both may coexist briefly)."""
        import time as _time

        d = self._topic_dir(db_name)
        by_seq: dict[int, list[str]] = {}
        for fname in os.listdir(d):
            if self._is_payload(fname):
                by_seq.setdefault(self._seq_of(fname), []).append(fname)
        out: list[tuple[int, str | bytes]] = []
        parked: list[int] = []
        for seq in sorted(by_seq):
            if seq < from_seq:
                continue
            payload = self._read_seq(d, by_seq[seq])
            if payload is None:
                path = os.path.join(d, sorted(by_seq[seq])[0])
                try:
                    age = _time.time() - os.stat(path).st_mtime
                except FileNotFoundError:
                    continue  # claim dropped mid-poll: payload next poll
                if age < self.PENDING_GRACE_SECONDS:
                    break  # in-flight producer; resume here next poll
                parked.append(seq)  # aged claim — recheck on later drains
                continue
            if with_partitions:
                out.append(
                    (seq, self._partition_of(sorted(by_seq[seq])[0]), payload)
                )
            else:
                out.append((seq, payload))
        return out, parked

    def partition_of(self, db_name: str, seq: int) -> int:
        """Partition label of one sequence's payload (parked-recheck
        path); 0 when absent."""
        d = self._topic_dir(db_name)
        for f in os.listdir(d):
            if self._is_payload(f) and self._seq_of(f) == seq:
                return self._partition_of(f)
        return 0

    @staticmethod
    def _read_seq(d: str, fnames: list[str]) -> "str | bytes | None":
        """One sequence's payload, or None when only an empty claim
        exists.  ``.entry`` files are always complete (atomic rename);
        an ``.lp`` may be the empty claim."""
        for fname in fnames:
            if fname.endswith(".entry"):
                with open(os.path.join(d, fname), "rb") as f:
                    return f.read()
        for fname in fnames:
            if fname.endswith(".lp"):
                try:
                    with open(os.path.join(d, fname)) as f:
                        data = f.read()
                except FileNotFoundError:
                    continue  # entry producer dropped its claim mid-read
                if data:
                    return data
        return None

    def read_one(self, db_name: str, seq: int) -> "str | bytes | None":
        """The payload at one sequence, or None if still empty/absent —
        the parked-sequence recheck path."""
        d = self._topic_dir(db_name)
        fnames = [
            f
            for f in os.listdir(d)
            if self._is_payload(f) and self._seq_of(f) == seq
        ]
        return self._read_seq(d, fnames) if fnames else None


class KafkaWriteBuffer(WriteBuffer):
    """Kafka backend for the write-buffer contract — the reference's
    deployment shape (server/src/write_buffer.rs: one topic per
    database, Entry payloads, consumer groups per database server).

    Mapping (1:1 with the file topic's semantics):
    - topic            = the database name (sanitized like _topic_dir)
    - produce          = producer.send(topic, value=payload,
                         partition=partition); the broker-assigned
                         (partition, offset) pair is the sequence —
                         collapsed to ONE int by ``_collapse_seq``
                         (``offset·STRIDE + partition``), because the
                         contract hands out GLOBALLY unique sequences per
                         topic while Kafka offsets are only unique per
                         partition (two partitions both have offset 0).
                         The collapse is monotone within each partition
                         and injective across them; ``_split_seq``
                         inverts it, ``_seek_offset`` maps a from_seq
                         back to each partition's seek position.
    - poll(from_seq)   = consumer.seek(from_seq) + poll(); Kafka's
                         contiguous offsets mean the parked-claim
                         machinery is unnecessary (parked is always []).
    - payload kind     = a header ("fmt": "lp"|"entry") distinguishes
                         line protocol from flatbuffers Entry, replacing
                         the file suffix.
    - at-least-once    = commit AFTER apply, same as the file consumer
                         records its offset after the drain lands.

    The class is a thin adapter over ``kafka-python`` (absent in this
    sandbox, hence the import gate).  Since round 13 the transport gap
    is closed by ``KafkaWireWriteBuffer`` below — the repo's OWN
    wire-protocol client (``streaming/kafkawire.py``, stdlib sockets)
    behind the same pure parts — and the whole contract battery runs
    over it against an in-process broker stub, so the semantics here
    are wire-verified even without kafka-python."""

    def __init__(self, conn: str):
        try:
            import kafka  # noqa: F401  (kafka-python)
        except ImportError as e:  # pragma: no cover - sandbox has no kafka
            raise NotImplementedError(
                "KafkaWriteBuffer requires the kafka-python package; this "
                "environment has no Kafka — use a filesystem topic "
                "(FileWriteBuffer) whose contract is identical"
            ) from e
        from kafka import KafkaConsumer, KafkaProducer  # pragma: no cover

        self.conn = conn  # pragma: no cover
        brokers = conn.split("://", 1)[-1]  # pragma: no cover
        self._producer = KafkaProducer(  # pragma: no cover
            bootstrap_servers=brokers.split(",")
        )
        self._consumer_cls = KafkaConsumer  # pragma: no cover
        self._brokers = brokers  # pragma: no cover

    #: max partitions per topic the sequence collapse supports; Kafka
    #: deployments with more need a wider stride (documented, not silent:
    #: produce() rejects partition >= STRIDE)
    STRIDE = 1024
    #: encoding-version marker (bit 62).  The collapse CHANGED what a
    #: sequence MEANS — raw Kafka offsets before it, offset*STRIDE +
    #: partition after — so a ``from_seq`` cursor persisted by a consumer
    #: of the old encoding, replayed against the new one, would silently
    #: seek ~STRIDE× too early and re-deliver a flood of records.  Every
    #: collapsed sequence therefore carries this bit, and the decode side
    #: REJECTS unversioned cursors loudly instead of mis-seeking
    #: (``from_seq=0`` — "from the beginning" — stays valid by
    #: convention).  Offsets are bounded to keep the payload below the
    #: marker: 2**62/STRIDE = 2**52, far past any real Kafka log.
    SEQ_V1 = 1 << 62

    # -- pure parts (no broker; unit-tested in test_kafka_adapter.py) ------

    @staticmethod
    def _topic(db_name: str) -> str:
        safe = db_name.replace("%", "%25").replace("/", "%2F")
        return safe if safe not in (".", "..") else safe.replace(".", "%2E")

    @classmethod
    def _collapse_seq(cls, offset: int, partition: int) -> int:
        """(partition, offset) -> one globally-unique, per-partition-
        monotone sequence int, tagged with the SEQ_V1 encoding marker."""
        if not 0 <= partition < cls.STRIDE:
            raise ValueError(
                f"partition {partition} outside [0, {cls.STRIDE})"
            )
        if not 0 <= offset < cls.SEQ_V1 // cls.STRIDE:
            raise ValueError(f"offset {offset} outside the encodable range")
        return cls.SEQ_V1 | (offset * cls.STRIDE + partition)

    @classmethod
    def _seq_body(cls, seq: int) -> int:
        """Strip the version marker; reject a cursor that lacks it (a
        raw-offset cursor persisted before the collapse existed)."""
        if not seq & cls.SEQ_V1:
            raise ValueError(
                f"sequence {seq} lacks the v1 encoding marker — this is a "
                "cursor persisted under the old raw-offset encoding; "
                "replaying it against the offset*STRIDE+partition collapse "
                "would seek far too early.  Reset it to 0 (replay from the "
                "beginning) or re-derive it from a current produce()."
            )
        return seq ^ cls.SEQ_V1

    @classmethod
    def _split_seq(cls, seq: int) -> tuple[int, int]:
        """sequence -> (partition, offset); inverse of _collapse_seq."""
        body = cls._seq_body(seq)
        return body % cls.STRIDE, body // cls.STRIDE

    @classmethod
    def _seek_offset(cls, from_seq: int, partition: int) -> int:
        """Smallest offset in ``partition`` whose collapsed sequence is
        >= ``from_seq`` (the per-partition consumer seek position)."""
        if from_seq == 0:
            return 0
        body = cls._seq_body(from_seq)
        return max(0, -(-(body - partition) // cls.STRIDE))

    @staticmethod
    def _decode_payload(headers, value: bytes) -> "str | bytes":
        """Header fmt mapping: ``fmt=entry`` rides as raw flatbuffers
        bytes, anything else (``lp`` or absent) is utf-8 line protocol —
        the Kafka spelling of the file topic's suffix rule."""
        fmt = dict(headers or []).get("fmt", b"lp")
        return value if fmt == b"entry" else value.decode("utf-8")

    # -- broker-facing parts ------------------------------------------------

    def produce(  # pragma: no cover - needs broker
        self, db_name: str, lp_data: str, partition: int = 0
    ) -> int:
        # validate BEFORE the send: rejecting after the broker accepted
        # the message would leave a record every later poll() chokes on
        self._collapse_seq(0, partition)
        fut = self._producer.send(
            self._topic(db_name), value=lp_data.encode(),
            partition=partition, headers=[("fmt", b"lp")],
        )
        md = fut.get(timeout=30)
        self._producer.flush()
        return self._collapse_seq(md.offset, md.partition)

    def produce_entry(  # pragma: no cover - needs broker
        self, db_name: str, entry: bytes, partition: int = 0
    ) -> int:
        self._collapse_seq(0, partition)  # pre-send range check
        fut = self._producer.send(
            self._topic(db_name), value=bytes(entry),
            partition=partition, headers=[("fmt", b"entry")],
        )
        md = fut.get(timeout=30)
        self._producer.flush()
        return self._collapse_seq(md.offset, md.partition)

    def fetch(  # pragma: no cover - needs broker
        self, db_name: str, from_seq: int = 0
    ) -> list[tuple[int, str]]:
        return self.poll(db_name, from_seq)[0]

    def poll(  # pragma: no cover - needs broker
        self, db_name: str, from_seq: int = 0, with_partitions: bool = False
    ) -> tuple[list[tuple], list[int]]:
        from kafka import TopicPartition

        consumer = self._consumer_cls(
            bootstrap_servers=self._brokers.split(","),
            enable_auto_commit=False,
            consumer_timeout_ms=1000,
        )
        topic = self._topic(db_name)
        parts = consumer.partitions_for_topic(topic) or {0}
        tps = [TopicPartition(topic, p) for p in sorted(parts)]
        consumer.assign(tps)
        for tp in tps:
            consumer.seek(tp, self._seek_offset(from_seq, tp.partition))
        out: list[tuple] = []
        for msg in consumer:
            seq = self._collapse_seq(msg.offset, msg.partition)
            if seq < from_seq:
                continue  # seek was per-partition exact, but be safe
            payload = self._decode_payload(msg.headers, msg.value)
            if with_partitions:
                out.append((seq, msg.partition, payload))
            else:
                out.append((seq, payload))
        consumer.close()
        out.sort(key=lambda t: t[0])
        return out, []  # contiguous Kafka offsets: nothing ever parks

    def partition_of(self, db_name: str, seq: int) -> int:
        # the collapse encodes the partition — no broker round-trip
        return self._split_seq(seq)[0]

    def read_one(  # pragma: no cover - needs broker
        self, db_name: str, seq: int
    ) -> "str | bytes | None":
        for s, payload in self.poll(db_name, seq)[0]:
            if s == seq:
                return payload
        return None


class KafkaWireWriteBuffer(KafkaWriteBuffer):
    """Kafka backend over the repo's OWN wire-protocol client
    (``streaming/kafkawire.py`` — stdlib sockets, record-batch v2 with
    headers, no client lib), selected by ``kafkawire://host:port``.

    Closes round 12's standing transport gap the h2wire/s3rest way: the
    adapter's pure parts (sequence collapse, topic mapping, payload
    headers) are IDENTICAL to ``KafkaWriteBuffer`` — this subclass only
    swaps kafka-python calls for KafkaWireClient requests — and the
    whole write-buffer CONTRACT battery runs against it over real
    sockets to an in-process broker stub (tests/kafka_stub.py), so
    produce/poll/read_one semantics are wire-verified end-to-end.

    Offset management is client-side (the contract's ``from_seq`` is
    the consumer state — no consumer groups), and ``poll`` walks each
    partition from its ``_seek_offset`` to the ListOffsets log end.
    ``read_one`` treats an undecodable (unversioned) sequence as absent
    rather than raising: such a cursor cannot have been handed out by
    this encoding, and read_one's contract is the parked-recheck probe.
    """

    def __init__(self, conn: str):
        from influxdb_iox_spark.streaming.kafkawire import KafkaWireClient

        self.conn = conn
        brokers = conn.split("://", 1)[-1]
        host, _, port = brokers.split(",")[0].partition(":")
        self._client = KafkaWireClient(host, int(port or 9092))

    def close(self) -> None:
        self._client.close()

    def produce(self, db_name: str, lp_data: str, partition: int = 0) -> int:
        return self._produce_wire(
            db_name, lp_data.encode(), b"lp", partition
        )

    def produce_entry(
        self, db_name: str, entry: bytes, partition: int = 0
    ) -> int:
        return self._produce_wire(db_name, bytes(entry), b"entry", partition)

    def _produce_wire(
        self, db_name: str, value: bytes, fmt: bytes, partition: int
    ) -> int:
        self._collapse_seq(0, partition)  # pre-send range check
        base = self._client.produce(
            self._topic(db_name), partition,
            [(None, value, [("fmt", fmt)])],
        )
        return self._collapse_seq(base, partition)

    def fetch(self, db_name: str, from_seq: int = 0) -> list[tuple[int, str]]:
        return self.poll(db_name, from_seq)[0]

    def _partitions(
        self, topic: str, absent: tuple = (0,)
    ) -> list[int]:
        """Live partition ids, retrying TRANSIENT topic errors (5 =
        LEADER_NOT_AVAILABLE during auto-create, 6 = NOT_LEADER) with a
        short backoff; any other broker error propagates so a topic in
        error state is never mistaken for an empty topic (round-13
        advice).  A topic the broker reports UNKNOWN yields ``absent``
        — [0] (the pre-first-produce default partition) for poll, []
        for read_one's existence probe."""
        import time as _time

        from influxdb_iox_spark.streaming.kafkawire import KafkaWireError

        delay = 0.05
        for attempt in range(6):
            try:
                return self._client.metadata([topic]).get(
                    topic, list(absent)
                )
            except KafkaWireError as e:
                if e.code not in (5, 6) or attempt == 5:
                    raise
                _time.sleep(delay)
                delay = min(delay * 2, 1.0)
        raise AssertionError("unreachable")

    def poll(
        self, db_name: str, from_seq: int = 0, with_partitions: bool = False
    ) -> tuple[list[tuple], list[int]]:
        topic = self._topic(db_name)
        parts = self._partitions(topic)
        out: list[tuple] = []
        for p in sorted(parts):
            offset = self._seek_offset(from_seq, p)
            end = self._client.list_offsets(topic, p, -1)
            while offset < end:
                records = self._client.fetch(topic, p, offset)
                if not records:
                    break  # log truncated under us; end is stale
                for off, _key, value, headers in records:
                    seq = self._collapse_seq(off, p)
                    if seq < from_seq:
                        continue
                    payload = self._decode_payload(headers, value)
                    if with_partitions:
                        out.append((seq, p, payload))
                    else:
                        out.append((seq, payload))
                offset = records[-1][0] + 1
        out.sort(key=lambda t: t[0])
        return out, []  # contiguous Kafka offsets: nothing ever parks

    def read_one(self, db_name: str, seq: int) -> "str | bytes | None":
        try:
            partition, offset = self._split_seq(seq)
        except ValueError:
            return None  # not a sequence this encoding ever handed out
        topic = self._topic(db_name)
        if partition not in self._partitions(topic, absent=()):
            return None
        for off, _key, value, headers in self._client.fetch(
            topic, partition, offset
        ):
            if off == offset:
                return self._decode_payload(headers, value)
        return None
