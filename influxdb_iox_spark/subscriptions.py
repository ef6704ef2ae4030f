"""Subscriptions: CREATE/DROP/SHOW SUBSCRIPTION + write forwarding.

Stock 1.x subscriptions mirror every accepted write of a database to
subscriber endpoints (Kapacitor's ingest path).  The v0 reference has no
subscription layer (its fan-out is the Kafka write buffer); this module
implements the stock statement surface with REAL best-effort HTTP
forwarding:

- ``CREATE SUBSCRIPTION "name" ON db.rp DESTINATIONS ALL|ANY 'http://…'``
  registers endpoints; ALL posts every write to every destination, ANY
  round-robins across them (stock semantics).
- Forwarding is asynchronous and best-effort, exactly like stock: a
  bounded queue drains on a daemon thread POSTing the ORIGINAL line
  protocol body to ``<dest>/write?db=…&precision=…``.  A full queue drops
  the oldest entry and counts it (``subscriptions_dropped_total``) —
  subscribers must not be able to stall the ingest hot path.  Delivery
  and drop counts surface through the server's /metrics.

Scale posture: the hook is O(1) per accepted request (an enqueue of the
already-received body — no re-rendering, no per-point work); the drain
thread is pure control-plane I/O.  At 100 TB the equivalent production
fan-out is the write-buffer topic (streaming/write_buffer.py) — this
layer exists for stock-client compatibility, not as the bulk transport.
"""

from __future__ import annotations

import threading
import urllib.parse
import urllib.request
from collections import deque
from dataclasses import dataclass, field


@dataclass(frozen=True)
class Subscription:
    name: str
    db: str
    rp: str
    mode: str  # 'ALL' | 'ANY'
    destinations: tuple[str, ...]


@dataclass
class _Pending:
    body: bytes
    db: str
    precision: str | None


class SubscriptionRegistry:
    """Thread-safe subscription store + async forwarder."""

    MAX_QUEUE = 1024

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._subs: dict[tuple[str, str, str], Subscription] = {}
        self._queue: deque[tuple[Subscription, _Pending]] = deque()
        self._wake = threading.Event()
        self._rr: dict[tuple[str, str, str], int] = {}
        self._thread: threading.Thread | None = None
        self._stop = False
        self.metrics = {
            "subscriptions_forwarded_total": 0,
            "subscriptions_errors_total": 0,
            "subscriptions_dropped_total": 0,
        }

    # -- statements -----------------------------------------------------------
    def create(
        self, name: str, db: str, rp: str, mode: str, destinations: list[str]
    ) -> None:
        mode = mode.upper()
        if mode not in ("ALL", "ANY"):
            raise ValueError("subscription mode must be ALL or ANY")
        if not destinations:
            raise ValueError("subscription needs at least one destination")
        for d in destinations:
            scheme = urllib.parse.urlparse(d).scheme
            if scheme not in ("http", "https"):
                raise ValueError(
                    f"unsupported destination {d!r} (http/https only)"
                )
        key = (db, rp, name)
        with self._lock:
            if key in self._subs:
                raise ValueError(f"subscription already exists: {name}")
            self._subs[key] = Subscription(
                name, db, rp, mode, tuple(destinations)
            )

    def drop(self, name: str, db: str, rp: str) -> None:
        with self._lock:
            if (db, rp, name) not in self._subs:
                raise ValueError(f"subscription not found: {name}")
            del self._subs[(db, rp, name)]

    def list_rows(self) -> dict[str, list[list]]:
        """SHOW SUBSCRIPTIONS: db -> [[rp, name, mode, [destinations]]]."""
        with self._lock:
            out: dict[str, list[list]] = {}
            for (db, rp, name), s in sorted(self._subs.items()):
                out.setdefault(db, []).append(
                    [rp, name, s.mode, list(s.destinations)]
                )
            return out

    # -- forwarding -----------------------------------------------------------
    def notify_write(
        self, db: str, body: bytes, precision: str | None = None
    ) -> None:
        """O(1) hot-path hook: enqueue the accepted write for every
        subscription of ``db`` (any retention policy — retention here is
        lifecycle-driven, so rp is a label, not a router)."""
        with self._lock:
            subs = [s for (d, _, _), s in self._subs.items() if d == db]
            if not subs:
                return
            for s in subs:
                if len(self._queue) >= self.MAX_QUEUE:
                    self._queue.popleft()
                    self.metrics["subscriptions_dropped_total"] += 1
                self._queue.append((s, _Pending(body, db, precision)))
            if self._thread is None:
                self._thread = threading.Thread(
                    target=self._drain, daemon=True
                )
                self._thread.start()
        self._wake.set()

    def _pick_destinations(self, s: Subscription) -> list[str]:
        if s.mode == "ALL":
            return list(s.destinations)
        key = (s.db, s.rp, s.name)
        with self._lock:
            i = self._rr.get(key, 0)
            self._rr[key] = i + 1
        return [s.destinations[i % len(s.destinations)]]

    def _drain(self) -> None:
        while not self._stop:
            self._wake.wait(timeout=0.5)
            self._wake.clear()
            while True:
                with self._lock:
                    if not self._queue:
                        break
                    s, p = self._queue.popleft()
                for dest in self._pick_destinations(s):
                    params = {"db": p.db}
                    if p.precision:
                        params["precision"] = p.precision
                    url = (
                        dest.rstrip("/")
                        + "/write?"
                        + urllib.parse.urlencode(params)
                    )
                    try:
                        req = urllib.request.Request(url, data=p.body)
                        with urllib.request.urlopen(req, timeout=10):
                            pass
                        self.metrics["subscriptions_forwarded_total"] += 1
                    except Exception:
                        # best-effort, like stock: subscriber failures
                        # never surface to the writer
                        self.metrics["subscriptions_errors_total"] += 1

    def flush(self, timeout: float = 10.0) -> bool:
        """Test helper: True once the queue is empty (polls)."""
        import time as _t

        deadline = _t.monotonic() + timeout
        while _t.monotonic() < deadline:
            with self._lock:
                if not self._queue:
                    return True
            self._wake.set()
            _t.sleep(0.02)
        return False

    def stop(self) -> None:
        self._stop = True
        self._wake.set()
