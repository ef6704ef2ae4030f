"""SHOW QUERIES / KILL QUERY — live-query introspection backed by Spark
job groups.

Stock 1.x tracks executing statements in its query executor and KILL QUERY
interrupts them; the Spark-first translation is a job group per tracked
statement: ``begin()`` tags the CALLING thread's Spark jobs with a unique
group id (PySpark's pinned-thread mode maps each Python thread to its own
JVM thread, so groups never leak across the threaded HTTP server's
requests), and ``kill()`` calls ``cancelJobGroup`` — every running stage
of that statement is cancelled cluster-wide, exactly the semantics a
1000-executor deployment needs (driver-side bookkeeping is O(running
statements); nothing per-row anywhere).

A statement between Spark jobs (driver-side planning) is marked killed and
dies at its next job submission; pure-metadata statements that never submit
a job can therefore outrun a kill — same caveat as stock's cooperative
interruption points.
"""

from __future__ import annotations

import threading
import time


def format_duration_ns(ns: int) -> str:
    """Go-style duration rendering (the stock SHOW QUERIES column):
    greedy h/m/s with a fractional seconds tail trimmed, sub-second as
    ms/µs/ns whole units."""
    if ns < 1_000:
        return f"{ns}ns"
    if ns < 1_000_000:
        return f"{ns // 1_000}µs"
    if ns < 1_000_000_000:
        return f"{ns // 1_000_000}ms"
    secs = ns // 1_000_000_000
    h, rem = divmod(secs, 3600)
    m, s = divmod(rem, 60)
    out = ""
    if h:
        out += f"{h}h"
    if m:
        out += f"{m}m"
    return out + f"{s}s"


class QueryTracker:
    """Thread-safe registry of executing InfluxQL requests."""

    def __init__(self, spark) -> None:
        self.spark = spark
        self._lock = threading.Lock()
        self._next = 1
        self._running: dict[int, dict] = {}

    def begin(self, query: str, database: str | None) -> int:
        """Register the request and tag the CALLING thread's Spark jobs
        with its group (interruptOnCancel=True so running tasks get
        thread interrupts, not just scheduler removal)."""
        with self._lock:
            qid = self._next
            self._next += 1
            group = f"influxql-q{qid}"
            self._running[qid] = {
                "query": query,
                "database": database,
                "group": group,
                "started_ns": time.time_ns(),
                "killed": False,
            }
        self.spark.sparkContext.setJobGroup(
            group, query[:200], interruptOnCancel=True
        )
        return qid

    def end(self, qid: int) -> None:
        with self._lock:
            self._running.pop(qid, None)
        # drop the thread's group tag so later requests on a reused
        # thread never inherit it
        self.spark.sparkContext.setLocalProperty("spark.jobGroup.id", None)

    def kill(self, qid: int) -> bool:
        """Cancel every Spark job of the statement; False if unknown."""
        with self._lock:
            info = self._running.get(qid)
            if info is None:
                return False
            info["killed"] = True
            group = info["group"]
        self.spark.sparkContext.cancelJobGroup(group)
        return True

    def list(self) -> list[list]:
        """Rows for SHOW QUERIES: [qid, query, database, duration,
        status], ordered by qid (stock column set)."""
        now = time.time_ns()
        with self._lock:
            return [
                [
                    qid,
                    info["query"],
                    info["database"] or "",
                    format_duration_ns(now - info["started_ns"]),
                    "killed" if info["killed"] else "running",
                ]
                for qid, info in sorted(self._running.items())
            ]
