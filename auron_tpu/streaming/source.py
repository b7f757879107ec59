"""Micro-batch record sources — the Kafka-scan analog of the reference's
Flink front-end (kafka_scan_exec.rs:578, kafka_mock_scan_exec.rs:466).

TPU re-design: instead of a pull-based Arrow-builder loop feeding a
streaming operator graph, sources hand the engine *micro-batches* of raw
records. Each micro-batch is decoded (serde.py) into one fixed-capacity
TableBlock, so the per-batch relational program has static shapes and
compiles once; offsets advance only after the batch is absorbed into
query state, giving exactly-once accounting under checkpoint/restore
(query.py).

No broker client ships here (zero-egress build); ``MockSource`` is the
kafka_mock_scan_exec.rs analog — an in-memory topic log with real offset
semantics — and any external system plugs in through the two-method
``MicroBatchSource`` protocol.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple


@dataclass(frozen=True)
class Record:
    """One source record: opaque payload + (topic, partition, offset)."""

    value: bytes
    key: Optional[bytes] = None
    topic: str = ""
    partition: int = 0
    offset: int = -1
    timestamp_us: int = 0


# offsets map: (topic, partition) -> next offset to read
Offsets = Dict[Tuple[str, int], int]


class MicroBatchSource:
    """Protocol: poll records at-or-after ``offsets``; report end offsets.

    ``poll`` must be side-effect free w.r.t. commit position — the caller
    owns the offsets (they are part of the query checkpoint), so a crashed
    consumer replays from its last checkpoint, never from the source's
    notion of progress.
    """

    def poll(self, offsets: Offsets, max_records: int) -> List[Record]:
        raise NotImplementedError

    def end_offsets(self) -> Offsets:
        raise NotImplementedError


@dataclass
class _TopicLog:
    records: List[Record] = field(default_factory=list)


class MockSource(MicroBatchSource):
    """In-memory topic log (kafka_mock_scan_exec.rs:466 analog): tests and
    demos run the full streaming path — offsets, replay, checkpoint —
    without a broker."""

    def __init__(self, num_partitions: int = 1):
        self._topics: Dict[str, List[_TopicLog]] = {}
        self._np = num_partitions

    def append(self, topic: str, value: bytes, key: Optional[bytes] = None,
               partition: Optional[int] = None,
               timestamp_us: int = 0) -> int:
        logs = self._topics.setdefault(
            topic, [_TopicLog() for _ in range(self._np)])
        if partition is None:
            partition = (hash(key) if key is not None else 0) % self._np
        log = logs[partition]
        off = len(log.records)
        log.records.append(Record(value=value, key=key, topic=topic,
                                  partition=partition, offset=off,
                                  timestamp_us=timestamp_us))
        return off

    def append_many(self, topic: str, values: Sequence[bytes]) -> None:
        for v in values:
            self.append(topic, v)

    def poll(self, offsets: Offsets, max_records: int) -> List[Record]:
        out: List[Record] = []
        for topic, logs in self._topics.items():
            for p, log in enumerate(logs):
                lo = offsets.get((topic, p), 0)
                take = log.records[lo:lo + max(0, max_records - len(out))]
                out.extend(take)
                if len(out) >= max_records:
                    return out
        return out

    def end_offsets(self) -> Offsets:
        return {(t, p): len(log.records)
                for t, logs in self._topics.items()
                for p, log in enumerate(logs)}
