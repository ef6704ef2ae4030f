"""Object-store abstraction + object-store manifest backend.

The reference abstracts its persistence behind an object-store interface
with cloud and local implementations (/root/reference/object_store/src/
{lib,aws,gcp,azure,disk,memory,throttle}.rs).  Our chunk DATA already
rides any Hadoop-compatible filesystem (Spark reads/writes parquet by
URI), but the MANIFEST concurrency protocol in ``store.py`` is built on
POSIX primitives — O_APPEND same-inode appends, O_CREAT|O_EXCL CAS
files, atomic renames — none of which exist on S3/GCS/Azure.  This
module provides the object-store-native twin of that protocol, built
ONLY on primitives every major object store offers:

- **PUT** (atomic, never torn — an object is fully visible or absent)
- **conditional PUT** — put-if-absent (S3 ``If-None-Match: *``, GCS
  ``ifGenerationMatch=0``) and put-if-match (etag / generation)
- **LIST** by prefix
- **DELETE** (idempotent)

Protocol mapping (one concept per POSIX primitive replaced):

- *Manifest appends* (POSIX: one O_APPEND write) become **one object
  per record** under the partition's prefix — a unique key per append,
  so concurrent appenders never contend and a crashed appender leaves
  either a whole record or nothing (PUT is atomic; torn appends cannot
  exist).  This is the Delta-log / Iceberg-metadata pattern.
- *Chunk-id block claims* (POSIX: O_CREAT|O_EXCL) become
  **put-if-absent** — the same CAS, arbitrated by the store.
- *Log compaction* (POSIX: rename-aside + fold under an O_EXCL lock)
  becomes **read base + records → put-if-match the folded base →
  delete exactly the folded record objects**.  The conditional PUT is
  the serialization: of N racing compactors exactly one's etag still
  matches; losers delete nothing.  No lock object, no stealing — a
  crashed compactor leaves at most an already-folded base plus record
  objects that the next round re-folds (records are idempotent by
  chunk id).
- *Readers* fetch the base, list the record objects, fetch each, then
  re-check the base's etag: a record deleted mid-read OR a base that
  changed under the read means a compactor folded records into a NEWER
  base, so the read retries from the base.  (The optimistic-retry twin
  of the POSIX backend's inode-version check — without the final etag
  re-check, a compactor that CAS-writes the base and deletes the folded
  records between the reader's base GET and its LIST makes the reader
  silently return old-base + surviving-records.)

The in-memory store models object-store semantics exactly (per-object
etags, atomic conditional ops) the way ``memory.rs`` backs the
reference's tests; ``ThrottledObjectStore`` adds per-op latency like
``throttle.rs`` so races that need real interleaving actually
interleave under test.
"""

from __future__ import annotations

import json
import threading
import time as _time
import uuid


class ObjectStore:
    """Minimal object-store interface (object_store/src/lib.rs surface,
    narrowed to what the manifest protocol needs).  Etags are opaque
    strings; every successful put returns the object's new etag."""

    def put(
        self,
        key: str,
        data: bytes,
        *,
        if_not_exists: bool = False,
        if_match: str | None = None,
    ) -> str | None:
        """Write an object.  With ``if_not_exists`` the put succeeds only
        if the key is absent; with ``if_match`` only if the current etag
        matches.  Returns the new etag, or None when the precondition
        failed (the CAS lost)."""
        raise NotImplementedError

    def get(self, key: str) -> tuple[bytes, str] | None:
        """(data, etag), or None if absent."""
        raise NotImplementedError

    def list(self, prefix: str) -> list[str]:
        """All keys with the given prefix, sorted."""
        raise NotImplementedError

    def list_with_etags(self, prefix: str) -> list[tuple[str, str]]:
        """(key, etag) pairs with the given prefix, sorted by key.

        Real object stores return etags in LIST responses, making
        freshness probes one round trip — backends SHOULD override this
        (or :meth:`head`) to keep ``version()`` metadata-priced.  The
        base fallback is one :meth:`head` per key; the base ``head``
        itself falls back to a full GET, so a backend overriding NEITHER
        pays O(total stored bytes) for a freshness probe."""
        out = []
        for k in self.list(prefix):
            etag = self.head(k)
            if etag is not None:
                out.append((k, etag))
        return out

    def head(self, key: str) -> str | None:
        """Etag only (HTTP HEAD), or None if absent.  Base fallback
        downloads the body via :meth:`get`; backends with a metadata
        call should override."""
        got = self.get(key)
        return None if got is None else got[1]

    def delete(self, key: str, *, if_match: str | None = None) -> bool | None:
        """Idempotent delete.  With ``if_match`` (round 16) the delete
        succeeds only while the object's etag still matches — returns
        True on success, False when the precondition failed (etag moved
        or object already gone: the state the caller asserted no longer
        holds).  Unconditional deletes keep the legacy None return.
        Backends without conditional-delete support raise
        NotImplementedError for ``if_match`` (callers fall back to the
        unconditional path)."""
        raise NotImplementedError


class InMemoryObjectStore(ObjectStore):
    """Thread-safe in-memory object store with real conditional-put
    semantics (the test double of object_store/src/memory.rs).  All
    mutations are atomic under one lock — exactly the atomicity an
    object store's API provides per object."""

    def __init__(self):
        self._objects: dict[str, tuple[bytes, str]] = {}
        self._lock = threading.Lock()
        self._etag_counter = 0

    def _next_etag(self) -> str:
        self._etag_counter += 1
        return f"e{self._etag_counter}"

    def put(self, key, data, *, if_not_exists=False, if_match=None):
        with self._lock:
            cur = self._objects.get(key)
            if if_not_exists and cur is not None:
                return None
            if if_match is not None and (cur is None or cur[1] != if_match):
                return None
            etag = self._next_etag()
            self._objects[key] = (bytes(data), etag)
            return etag

    def get(self, key):
        with self._lock:
            return self._objects.get(key)

    def list(self, prefix):
        with self._lock:
            return sorted(k for k in self._objects if k.startswith(prefix))

    def list_with_etags(self, prefix):
        with self._lock:
            return sorted(
                (k, v[1])
                for k, v in self._objects.items()
                if k.startswith(prefix)
            )

    def delete(self, key, *, if_match=None):
        with self._lock:
            if if_match is not None:
                cur = self._objects.get(key)
                if cur is None or cur[1] != if_match:
                    return False
                del self._objects[key]
                return True
            self._objects.pop(key, None)


class ThrottledObjectStore(ObjectStore):
    """Wrap a store with per-operation latency (throttle.rs) so
    concurrency tests exercise real interleavings instead of finishing
    each op inside one GIL slice."""

    def __init__(self, inner: ObjectStore, delay_seconds: float = 0.0005):
        self.inner = inner
        self.delay = delay_seconds

    def _wait(self):
        if self.delay:
            _time.sleep(self.delay)

    def put(self, key, data, *, if_not_exists=False, if_match=None):
        self._wait()
        return self.inner.put(
            key, data, if_not_exists=if_not_exists, if_match=if_match
        )

    def get(self, key):
        self._wait()
        return self.inner.get(key)

    def list(self, prefix):
        self._wait()
        return self.inner.list(prefix)

    def list_with_etags(self, prefix):
        # One delay per LIST call.  Real stores page large listings
        # (e.g. 1000 keys per response), so a huge prefix costs
        # ceil(n/page) round trips, not one — don't read the manifest
        # version() probe's "one round trip" as independent of n.
        self._wait()
        return self.inner.list_with_etags(prefix)

    def head(self, key):
        self._wait()
        return self.inner.head(key)

    def delete(self, key, *, if_match=None):
        self._wait()
        if if_match is None:
            return self.inner.delete(key)
        return self.inner.delete(key, if_match=if_match)


def fold_records(adds: list[dict], drops: set[int]) -> list[dict]:
    """Fold raw manifest records: apply tombstones, dedup re-appended
    records by chunk_id (ids are never reused → records idempotent,
    drops order-independent).  Shared by both manifest backends."""
    seen: set[int] = set()
    out: list[dict] = []
    for r in adds:
        cid = r["chunk_id"]
        if cid in drops or cid in seen:
            continue
        seen.add(cid)
        out.append(r)
    return out


class ObjectStoreManifestBackend:
    """TableStore manifest backend over an ObjectStore (see module
    docstring for the protocol).  Key layout, relative to ``prefix``::

        <table>/<part-file>/base              folded snapshot
                                              {"drops": [...], "adds": [...]}
        <table>/<part-file>/r-<ns>-<uuid>     one appended record
        <table>/_idblock-<base>               chunk-id block claim (CAS)
        <table>/_next_id                      best-effort id hint
        <rel-key>                             whole-object JSON blobs
                                              (operations log, retired list)
    """

    #: bounded optimistic-read retries before declaring starvation
    READ_RETRIES = 64

    def __init__(self, store: ObjectStore, prefix: str = "manifest/"):
        self.store = store
        self.prefix = prefix

    # -- keys --------------------------------------------------------------
    def _part_prefix(self, table: str, fname: str) -> str:
        return f"{self.prefix}{table}/{fname}/"

    def _base_key(self, table: str, fname: str) -> str:
        return self._part_prefix(table, fname) + "base"

    def _rec_prefix(self, table: str, fname: str) -> str:
        return self._part_prefix(table, fname) + "r-"

    # -- record parse ------------------------------------------------------
    @staticmethod
    def _parse_base(data: bytes | None) -> tuple[list[dict], set[int]]:
        if data is None:
            return [], set()
        body = json.loads(data)
        return list(body.get("adds") or []), set(body.get("drops") or [])

    @staticmethod
    def _parse_record(key: str, data: bytes) -> tuple[list[dict], set[int]]:
        """One record object → (adds, drops).  PUT is atomic so a torn
        record cannot exist; any malformed object is real corruption and
        raises loudly (silently skipping would shrink query results)."""
        try:
            rec = json.loads(data)
        except json.JSONDecodeError:
            raise ValueError(f"corrupt manifest record object {key!r}")
        if not isinstance(rec, dict):
            raise ValueError(f"corrupt manifest record object {key!r}")
        if "__drop__" in rec:
            return [], set(rec["__drop__"])
        return [rec], set()

    # -- manifest protocol -------------------------------------------------
    def part_files(self, table: str) -> list[str]:
        keys = self.store.list(f"{self.prefix}{table}/")
        plen = len(f"{self.prefix}{table}/")
        names: set[str] = set()
        for k in keys:
            seg = k[plen:].split("/", 1)[0]
            if seg.startswith("part-"):
                names.add(seg)
        return sorted(names)

    def tables(self) -> list[str]:
        plen = len(self.prefix)
        out: set[str] = set()
        for k in self.store.list(self.prefix):
            rest = k[plen:]
            if "/" in rest:
                table, child = rest.split("/", 1)
                if child.split("/", 1)[0].startswith("part-"):
                    out.add(table)
        return sorted(out)

    def load_part(self, table: str, fname: str) -> tuple[list[dict], set[int]]:
        """Consistent read of one partition's chain: base + every record
        object.  Two compaction races are detected, both retried from the
        base (bounded, with backoff):

        - a record deleted between our LIST and its GET (the GET returns
          None) was folded into a newer base;
        - a compactor that CAS-wrote the new base AND deleted the folded
          records **between our base GET and our LIST** leaves every
          remaining GET succeeding while the folded records simply never
          appear — old base + surviving records silently misses them.
          Caught by re-GETting the base after the record scan: an
          unchanged etag proves base+records was one consistent snapshot
          (the etag twin of the POSIX backend's inode-version check).
          Appends never touch the base, so steady-state appending never
          forces a retry.
        """
        base_key = self._base_key(table, fname)
        rec_prefix = self._rec_prefix(table, fname)
        for attempt in range(self.READ_RETRIES):
            got = self.store.get(base_key)
            base_etag = got[1] if got else None
            adds, drops = self._parse_base(got[0] if got else None)
            ok = True
            for k in self.store.list(rec_prefix):
                obj = self.store.get(k)
                if obj is None:
                    ok = False  # folded away mid-read — retry from base
                    break
                a, d = self._parse_record(k, obj[0])
                adds.extend(a)
                drops |= d
            if ok and self.store.head(base_key) == base_etag:
                return adds, drops
            _time.sleep(0.001 * attempt)
        raise RuntimeError(
            f"manifest read of {fname!r} kept racing log compaction"
        )

    def append_record(self, table: str, fname: str, rec: dict) -> None:
        """One PUT to a unique key — atomic, contention-free, never torn.
        Nothing can rename the record away mid-write, so unlike the POSIX
        backend there is no re-append path."""
        key = (
            self._rec_prefix(table, fname)
            + f"{_time.time_ns():020d}-{uuid.uuid4().hex[:8]}"
        )
        self.store.put(key, json.dumps(rec, default=str).encode())

    def compact(self, table: str) -> int:
        """Fold each partition's record objects into its base snapshot.

        Serialization is the conditional PUT: the new base is written
        if-match the etag read at the start (if-absent for a first base),
        so of N racing compactors exactly one wins per partition; losers
        delete nothing and simply report 0 for that partition.  Records
        appended after our LIST are untouched and survive to the next
        round.  Tombstone ids are persisted INTO the snapshot so a
        delayed duplicate re-append can never resurrect a dropped chunk
        (same invariant as the POSIX backend's .base snapshots)."""
        n = 0
        for fname in self.part_files(table):
            base_key = self._base_key(table, fname)
            cur = self.store.get(base_key)
            etag = cur[1] if cur else None
            adds, drops = self._parse_base(cur[0] if cur else None)
            folded_keys: list[str] = []
            for k in self.store.list(self._rec_prefix(table, fname)):
                obj = self.store.get(k)
                if obj is None:
                    continue  # another compactor folded it; our CAS will lose
                a, d = self._parse_record(k, obj[0])
                adds.extend(a)
                drops |= d
                folded_keys.append(k)
            if not folded_keys:
                continue  # chain already just a base
            body = json.dumps(
                {"drops": sorted(drops), "adds": fold_records(adds, drops)},
                default=str,
            ).encode()
            if etag is None:
                res = self.store.put(base_key, body, if_not_exists=True)
            else:
                res = self.store.put(base_key, body, if_match=etag)
            if res is None:
                continue  # lost the CAS — records stay for the winner/next round
            for k in folded_keys:
                self.store.delete(k)
            n += 1
        return n

    # -- chunk-id allocation ----------------------------------------------
    def claimed_blocks(self, table: str) -> list[int]:
        pre = f"{self.prefix}{table}/_idblock-"
        out = []
        for k in self.store.list(pre):
            try:
                out.append(int(k[len(pre):]))
            except ValueError:
                pass
        return out

    def claim_id_block(self, table: str, base: int) -> bool:
        """Put-if-absent — the object store arbitrates racing claimers
        exactly like O_CREAT|O_EXCL does on POSIX."""
        key = f"{self.prefix}{table}/_idblock-{base:012d}"
        return self.store.put(key, b"", if_not_exists=True) is not None

    def id_hint(self, table: str) -> int:
        got = self.store.get(f"{self.prefix}{table}/_next_id")
        if got is None:
            return 0
        try:
            return int(got[0].decode().strip() or 0)
        except ValueError:
            return 0

    def set_id_hint(self, table: str, value: int) -> None:
        # best-effort hint: racing writers may regress it; the claim
        # objects correct it (same contract as the POSIX _next_id file)
        self.store.put(f"{self.prefix}{table}/_next_id", str(value).encode())

    def wipe_manifest(self, table: str) -> None:
        """Delete every object under the table's manifest prefix — part
        records, base snapshots, id-block claims, hint (rebuild
        precondition; deletes are idempotent so a re-run is safe)."""
        for k in self.store.list(f"{self.prefix}{table}/"):
            self.store.delete(k)

    # -- whole-object JSON blobs (operations log, retired list) ------------
    def get_json(self, rel_key: str):
        got = self.store.get(self.prefix + rel_key)
        return json.loads(got[0]) if got else None

    def put_json(self, rel_key: str, obj) -> None:
        # one PUT — atomic whole-object swap, the tmp+rename twin
        self.store.put(self.prefix + rel_key, json.dumps(obj, default=str).encode())

    # -- catalog fingerprint ----------------------------------------------
    def version(self) -> int:
        """Stable digest over (key, etag) of every manifest object — any
        append, drop, or fold changes some etag or key set.  ONE LIST
        round trip (etags ride the LIST response); never a GET, so the
        probe stays metadata-priced however many record objects exist."""
        import hashlib

        h = hashlib.md5()
        for k, etag in self.store.list_with_etags(self.prefix):
            h.update(f"{k}\x00{etag}\n".encode())
        return int.from_bytes(h.digest()[:8], "big")
