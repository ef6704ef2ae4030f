"""Persistence windows: per-window sequence bookkeeping for exact
persist decisions.

Port of the reference's in-memory ingest tracker
(persistence_windows/src/persistence_windows.rs:24-74 PersistenceWindows,
min_max_sequence.rs MinMaxSequence): writes land in an OPEN window;
after ``closed_window_period`` the open window rotates to CLOSED; a
closed window older than ``late_arrival_period`` folds into the single
PERSISTABLE window.  Each window tracks, per sequencer (shard), the
min/max sequence numbers it contains — so the engine knows EXACTLY
which sequence ranges are safely persistable and which are still inside
the late-arrival window, instead of deciding by time alone.

The payoff under mixed-lag shards: a lagging sequencer keeps its recent
data in open/closed windows, ``max_persistable_timestamp()`` stays at
the boundary of what has actually aged out, and the lifecycle policy
defers persistence of exactly the unflushed window —
``minimum_unpersisted_sequence()`` tells a restarting consumer where
replay must begin (the reference feeds this to its Kafka seek).

Driver-side, pure Python, O(#windows): like the reference this is
metadata bookkeeping, rebuilt from the write buffer on replay — never a
Spark job.
"""

from __future__ import annotations

import time as _time
from dataclasses import dataclass, field

DEFAULT_CLOSED_WINDOW_SECONDS = 30.0


@dataclass(frozen=True)
class MinMaxSequence:
    """Min/max sequence seen for one sequencer (min_max_sequence.rs)."""

    min: int
    max: int

    def __post_init__(self):
        if self.min > self.max:
            raise ValueError(
                f"min ({self.min}) is greater than max ({self.max}) sequence"
            )

    def extend(self, number: int) -> "MinMaxSequence":
        return MinMaxSequence(min(self.min, number), max(self.max, number))

    def union(self, other: "MinMaxSequence") -> "MinMaxSequence":
        return MinMaxSequence(min(self.min, other.min), max(self.max, other.max))


@dataclass
class Window:
    """One ingest window (persistence_windows.rs Window): creation
    instant, row count, data-time range, per-sequencer min/max."""

    created_at: float
    row_count: int
    min_time: int  # ns, data time
    max_time: int
    sequencer_numbers: dict[int, MinMaxSequence] = field(default_factory=dict)

    def add_range(
        self,
        sequencer_id: int | None,
        sequence_number: int | None,
        row_count: int,
        min_time: int,
        max_time: int,
    ) -> None:
        self.row_count += row_count
        self.min_time = min(self.min_time, min_time)
        self.max_time = max(self.max_time, max_time)
        if sequencer_id is not None and sequence_number is not None:
            cur = self.sequencer_numbers.get(sequencer_id)
            self.sequencer_numbers[sequencer_id] = (
                cur.extend(sequence_number)
                if cur is not None
                else MinMaxSequence(sequence_number, sequence_number)
            )

    def add_window(self, other: "Window") -> None:
        """Fold a newer window into this one (persistable absorption)."""
        self.row_count += other.row_count
        self.min_time = min(self.min_time, other.min_time)
        self.max_time = max(self.max_time, other.max_time)
        for sid, mm in other.sequencer_numbers.items():
            cur = self.sequencer_numbers.get(sid)
            self.sequencer_numbers[sid] = cur.union(mm) if cur else mm


class PersistenceWindows:
    """open → closed → persistable rotation with per-window sequences."""

    def __init__(
        self,
        late_arrival_seconds: float,
        closed_window_seconds: float | None = None,
    ):
        self.late_arrival = late_arrival_seconds
        self.closed_window = (
            closed_window_seconds
            if closed_window_seconds is not None
            else min(late_arrival_seconds, DEFAULT_CLOSED_WINDOW_SECONDS)
        )
        self.persistable: Window | None = None
        self.closed: list[Window] = []
        self.open: Window | None = None

    # -- ingest ------------------------------------------------------------
    def add_range(
        self,
        sequencer_id: int | None,
        sequence_number: int | None,
        row_count: int,
        min_time: int,
        max_time: int,
        received_at: float | None = None,
    ) -> None:
        """Record one applied batch (persistence_windows.rs add_range).
        ``received_at`` is injectable for tests, like the reference."""
        now = received_at if received_at is not None else _time.time()
        self.rotate(now)
        if self.open is not None:
            self.open.add_range(
                sequencer_id, sequence_number, row_count, min_time, max_time
            )
        else:
            self.open = Window(now, row_count, min_time, max_time)
            self.open.add_range(
                sequencer_id, sequence_number, 0, min_time, max_time
            )

    def rotate(self, now: float | None = None) -> None:
        """Open → closed after closed_window_period; closed → persistable
        after late_arrival_period (persistence_windows.rs rotate)."""
        now = now if now is not None else _time.time()
        if (
            self.open is not None
            and now - self.open.created_at >= self.closed_window
        ):
            self.closed.append(self.open)
            self.open = None
        while self.closed:
            w = self.closed[0]
            if now - w.created_at < self.late_arrival:
                break
            self.closed.pop(0)
            if self.persistable is None:
                self.persistable = w
            else:
                self.persistable.add_window(w)

    # -- persist decision inputs ------------------------------------------
    def persistable_row_count(self) -> int:
        return self.persistable.row_count if self.persistable else 0

    def persistable_age(self) -> float | None:
        return self.persistable.created_at if self.persistable else None

    def max_persistable_timestamp(self) -> int | None:
        """Any unpersisted row with data time <= this is safe to persist
        — rows newer than it may still gain late twins from the windows
        that have not aged out."""
        return self.persistable.max_time if self.persistable else None

    def minimum_unpersisted_sequence(self) -> dict[int, MinMaxSequence] | None:
        """Per-sequencer sequence range of the OLDEST unpersisted window
        — where a restarting consumer must seek to replay safely."""
        w = self.persistable or (self.closed[0] if self.closed else self.open)
        return dict(w.sequencer_numbers) if w is not None else None

    def flush(self) -> Window | None:
        """Mark the persistable window flushed; truncate the data-time
        ranges of the remaining closed windows below the persisted
        boundary (persistence_windows.rs flush: everything up to and
        including the persistable max_time is now on disk — a closed
        window's overlap with that range must not re-trigger persistence
        accounting).  Returns the flushed window."""
        flushed = self.persistable
        if flushed is None:
            return None
        new_min = flushed.max_time + 1
        for w in self.closed:
            if w.min_time < new_min:
                w.min_time = new_min
                if w.max_time < new_min:
                    w.max_time = new_min
                    w.row_count = 0
        self.persistable = None
        return flushed

    # -- introspection (system table rows) ---------------------------------
    def summary_rows(self) -> list[dict]:
        out = []
        now = _time.time()
        for state, windows in (
            ("persistable", [self.persistable] if self.persistable else []),
            ("closed", self.closed),
            ("open", [self.open] if self.open else []),
        ):
            for w in windows:
                if not w.sequencer_numbers:
                    out.append(
                        {
                            "state": state,
                            "sequencer_id": None,
                            "min_sequence": None,
                            "max_sequence": None,
                            "row_count": w.row_count,
                            "min_time": w.min_time,
                            "max_time": w.max_time,
                            "age_seconds": now - w.created_at,
                        }
                    )
                for sid, mm in sorted(w.sequencer_numbers.items()):
                    out.append(
                        {
                            "state": state,
                            "sequencer_id": sid,
                            "min_sequence": mm.min,
                            "max_sequence": mm.max,
                            "row_count": w.row_count,
                            "min_time": w.min_time,
                            "max_time": w.max_time,
                            "age_seconds": now - w.created_at,
                        }
                    )
        return out
