"""Lightweight distributed-tracing twin of the reference's span plumbing.

The reference wires tracing-subscriber spans through trogging into
logfmt/Jaeger sinks (trogging/, logfmt/src/lib.rs — its `new_span` writes
span names into logfmt lines; src/influxdb_ioxd.rs installs the stack).
The Spark-side equivalent here keeps the two halves that matter for query
observability and drops the subscriber machinery Python doesn't need:

- ``Span``: a context manager emitting ONE logfmt line per span on exit
  (``event=span name=… trace_id=… span_id=… parent_id=… duration_ns=…
  status=…``), nested via a thread-local so child spans inherit the
  trace and parent ids without explicit threading.
- ``extract_trace_context``: accepts the two wire formats real clients
  send — W3C ``traceparent`` (00-<32hex trace>-<16hex span>-flags) and
  Jaeger ``uber-trace-id`` (trace:span:parent:flags) — so an external
  tracer's ids flow through to every span/query line this process emits.

Emission goes to the ``influxdb_iox_spark.trace`` stdlib logger (INFO) or
any injected callable; a deployment tails/ships the lines like the
reference's logfmt output.  Span ids are random per process; trace ids
are inherited from the wire or minted per root span.
"""

from __future__ import annotations

import logging
import secrets
import threading
import time

from influxdb_iox_spark.query_tracker import logfmt

_local = threading.local()


def _stack() -> list:
    if not hasattr(_local, "stack"):
        _local.stack = []
    return _local.stack


def current_span() -> "Span | None":
    st = _stack()
    return st[-1] if st else None


def current_trace_id() -> str | None:
    s = current_span()
    return s.trace_id if s is not None else None


def extract_trace_context(headers) -> tuple[str, str] | None:
    """(trace_id, parent_span_id) from incoming HTTP headers, or None.

    W3C traceparent: ``00-{32 hex}-{16 hex}-{2 hex}``.
    Jaeger uber-trace-id: ``{trace}:{span}:{parent}:{flags}`` (ids are
    variable-width hex; the SPAN field is the parent of whatever this
    process starts).  Malformed values are ignored, never an error — a
    bad tracing header must not fail a query."""
    get = headers.get if hasattr(headers, "get") else lambda k: None
    tp = get("traceparent")
    if tp:
        parts = tp.strip().split("-")
        if (
            len(parts) == 4
            and len(parts[1]) == 32
            and len(parts[2]) == 16
            and _is_hex(parts[1])
            and _is_hex(parts[2])
            and parts[1] != "0" * 32
            and parts[2] != "0" * 16
        ):
            return parts[1], parts[2]
    ut = get("uber-trace-id")
    if ut:
        parts = ut.strip().split(":")
        if (
            len(parts) == 4
            and parts[0]
            and parts[1]
            and _is_hex(parts[0])
            and _is_hex(parts[1])
            and int(parts[0], 16) != 0
            and int(parts[1], 16) != 0
        ):
            return parts[0].lower(), parts[1].lower()
    return None


def _is_hex(s: str) -> bool:
    try:
        int(s, 16)
        return True
    except ValueError:
        return False


class Span:
    """``with Span("plan_select", db="db0"): …`` — times the block and
    emits its logfmt line on exit.  ``trace_id``/``parent_id`` default to
    the enclosing span's (thread-local); a root span mints a fresh trace
    id.  Extra keyword fields ride on the emitted line verbatim."""

    def __init__(
        self,
        name: str,
        trace_id: str | None = None,
        parent_id: str | None = None,
        log=None,
        **fields,
    ) -> None:
        enclosing = current_span()
        self.name = name
        self.trace_id = trace_id or (
            enclosing.trace_id if enclosing else secrets.token_hex(16)
        )
        self.parent_id = parent_id or (
            enclosing.span_id if enclosing else None
        )
        self.span_id = secrets.token_hex(8)
        self.fields = fields
        self.status = "ok"
        self._log = (
            log
            if log is not None
            else logging.getLogger("influxdb_iox_spark.trace").info
        )
        self._start = 0

    def __enter__(self) -> "Span":
        self._start = time.time_ns()
        _stack().append(self)
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        st = _stack()
        if st and st[-1] is self:
            st.pop()
        if exc_type is not None:
            self.status = "error"
        self._log(
            logfmt(
                {
                    "event": "span",
                    "name": self.name,
                    "trace_id": self.trace_id,
                    "span_id": self.span_id,
                    "parent_id": self.parent_id,
                    "duration_ns": time.time_ns() - self._start,
                    "status": self.status,
                    **self.fields,
                }
            )
        )
