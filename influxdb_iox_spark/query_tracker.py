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

import logging
import threading
import time


def logfmt(fields: dict) -> str:
    """Render one logfmt line (the reference emits its structured logs in
    this format — logfmt/src/lib.rs; this is the repo's lightweight twin
    of that + the trogging wiring).  None values are dropped; values
    containing spaces/quotes/equals are double-quoted with backslash
    escapes, exactly the form logfmt parsers expect."""
    parts = []
    for k, v in fields.items():
        if v is None:
            continue
        s = str(v)
        if s == "" or any(c in s for c in ' "=\n\r\t'):
            # newlines MUST be escaped, not just quoted: a raw \n would
            # split the record and let a crafted query forge log events
            # on the next line (one-event-per-line is the format's
            # contract)
            s = (
                '"'
                + s.replace("\\", "\\\\")
                .replace('"', '\\"')
                .replace("\n", "\\n")
                .replace("\r", "\\r")
                .replace("\t", "\\t")
                + '"'
            )
        parts.append(f"{k}={s}")
    return " ".join(parts)


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
    """Thread-safe registry of executing InfluxQL requests.

    Every tracked statement also emits ONE structured logfmt line when it
    finishes (``event=query_end`` with id, db, job group, duration, row
    count, status) and one on kill (``event=query_kill``) — the per-query
    observability surface the reference wires through trogging/logfmt.
    ``log``: a callable taking the rendered line; defaults to the
    ``influxdb_iox_spark.query`` stdlib logger at INFO."""

    def __init__(self, spark, log=None) -> None:
        self.spark = spark
        self._lock = threading.Lock()
        self._next = 1
        self._running: dict[int, dict] = {}
        self._log = (
            log
            if log is not None
            else logging.getLogger("influxdb_iox_spark.query").info
        )

    def begin(self, query: str, database: str | None) -> int:
        """Register the request and tag the CALLING thread's Spark jobs
        with its group (interruptOnCancel=True so running tasks get
        thread interrupts, not just scheduler removal)."""
        from influxdb_iox_spark.tracing import current_trace_id

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
                # inherited from the enclosing request span (None when
                # untraced) so log lines correlate with span lines
                "trace_id": current_trace_id(),
            }
        self.spark.sparkContext.setJobGroup(
            group, query[:200], interruptOnCancel=True
        )
        return qid

    def end(
        self, qid: int, rows: int | None = None, status: str | None = None
    ) -> None:
        """Deregister + emit the statement's query_end logfmt line.
        ``status`` None → 'killed' if a kill landed, else 'ok'."""
        with self._lock:
            info = self._running.pop(qid, None)
        # drop the thread's group tag so later requests on a reused
        # thread never inherit it
        self.spark.sparkContext.setLocalProperty("spark.jobGroup.id", None)
        if info is not None:
            dur = time.time_ns() - info["started_ns"]
            self._log(
                logfmt(
                    {
                        "event": "query_end",
                        "qid": qid,
                        "db": info["database"] or "",
                        "group": info["group"],
                        "duration": format_duration_ns(dur),
                        "duration_ns": dur,
                        "rows": rows,
                        "status": status
                        or ("killed" if info["killed"] else "ok"),
                        "trace_id": info.get("trace_id"),
                        "query": info["query"][:200],
                    }
                )
            )

    def kill(self, qid: int) -> bool:
        """Cancel every Spark job of the statement; False if unknown."""
        with self._lock:
            info = self._running.get(qid)
            if info is None:
                return False
            info["killed"] = True
            group = info["group"]
        self.spark.sparkContext.cancelJobGroup(group)
        self._log(
            logfmt(
                {
                    "event": "query_kill",
                    "qid": qid,
                    "db": info["database"] or "",
                    "group": group,
                    "query": info["query"][:200],
                }
            )
        )
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
