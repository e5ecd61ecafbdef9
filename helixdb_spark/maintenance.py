"""Maintenance policy: compaction / retention triggers.

Port of the reference's ``TimestampReviewer`` contract and its
``SimpleTimestampReviewer`` implementation (reference src/level.rs:520-591),
with the exact trigger arithmetic verified against the reference's own test
sequence (src/level.rs:734-753): observing ts 0..40 with (rick_range=10,
outdate_range=30) must yield
``Compact(0,9), Compact(10,19), Compact(20,29), Outdate(9), Compact(30,39),
Outdate(19)``.

In the reference these actions are broadcast over a shard channel mesh so all
shards compact the same range (src/level.rs:292-345). On Spark one batch job
already covers every partition atomically, so the mesh disappears — the
actions simply drive :meth:`helixdb_spark.engine.HelixSpark` maintenance jobs.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Union


@dataclass(frozen=True)
class Compact:
    """Compact data between two timestamps, both inclusive
    (reference src/level.rs:527-534)."""

    start: int
    end: int


@dataclass(frozen=True)
class Outdate:
    """Outdate (retire) data with timestamp <= ``ts``
    (reference src/level.rs:535-536)."""

    ts: int


TimestampAction = Union[Compact, Outdate]


class TimestampReviewer:
    """Policy interface: observe the max timestamp of a write batch, emit
    maintenance actions (reference src/level.rs:520-525)."""

    def observe(self, timestamp: int) -> list[TimestampAction]:
        raise NotImplementedError


@dataclass
class SimpleTimestampReviewer(TimestampReviewer):
    """Tumbling-range compaction + retention trigger
    (reference src/level.rs:550-591, arithmetic verbatim incl. the ``+1``
    inclusive bounds).

    ``rick_range`` is the width of one compacted time level (== our
    ``time_bucket`` width); ``outdate_range`` is how much history to keep and
    should be an integer multiple of ``rick_range``.
    """

    rick_range: int = 1024
    outdate_range: int = 8192
    last_compacted: int = 0
    last_outdated: int = 0

    def observe(self, timestamp: int) -> list[TimestampAction]:
        actions: list[TimestampAction] = []
        if timestamp - self.last_compacted + 1 >= self.rick_range:
            actions.append(Compact(self.last_compacted, timestamp))
            self.last_compacted = timestamp + 1
        if timestamp - self.last_outdated + 1 >= self.outdate_range:
            actions.append(Outdate(self.last_outdated + self.rick_range - 1))
            self.last_outdated += self.rick_range
        return actions

    def to_state(self) -> dict[str, int]:
        return {
            "rick_range": self.rick_range,
            "outdate_range": self.outdate_range,
            "last_compacted": self.last_compacted,
            "last_outdated": self.last_outdated,
        }

    @classmethod
    def from_state(cls, state: dict[str, int]) -> "SimpleTimestampReviewer":
        return cls(**{k: int(v) for k, v in state.items()})
