"""Kafka wire protocol: a real TCP client source + an in-process broker.

The reference's streaming scan is a real rdkafka consumer
(flink/kafka_scan_exec.rs:298-478: manual offset assignment from restored
checkpoints, enable.auto.commit=false, offsets committed back on
checkpoint). This module gives the TPU engine the same capability
without the C client: ``KafkaWireSource`` speaks the actual Kafka
protocol over a socket — request framing, Metadata v1, ListOffsets v1,
Fetch v4 with RecordBatch v2 (magic=2) decoding incl. crc32c
verification and varint record parsing, OffsetCommit v2 / OffsetFetch v1
for the checkpoint-commit parity path — so any broker speaking those
APIs works. ``FakeBroker`` is an in-process TCP server implementing the
same subset (the kafka_mock_scan_exec.rs analog, but over a REAL wire:
the client exercises genuine framing/parsing, not an in-memory shortcut).

Offsets polled by the source are CALLER-owned (MicroBatchSource
contract): restart-replay reads from the query checkpoint, exactly like
the reference's restored_offsets path (kafka_scan_exec.rs:259-336).
"""

from __future__ import annotations

import socket
import struct
import threading
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from .source import MicroBatchSource, Offsets, Record

# api keys (Kafka protocol)
PRODUCE, FETCH, LIST_OFFSETS, METADATA = 0, 1, 2, 3
OFFSET_COMMIT, OFFSET_FETCH, API_VERSIONS = 8, 9, 18


# ---- crc32c (Castagnoli) — RecordBatch v2 integrity -------------------------

def _crc32c_table() -> np.ndarray:
    poly = 0x82F63B78
    tbl = np.zeros(256, np.uint32)
    for i in range(256):
        c = i
        for _ in range(8):
            c = (c >> 1) ^ poly if (c & 1) else c >> 1
        tbl[i] = c
    return tbl


_CRC_TBL = _crc32c_table()


def crc32c(data: bytes) -> int:
    crc = np.uint32(0xFFFFFFFF)
    tbl = _CRC_TBL
    arr = np.frombuffer(data, np.uint8)
    for b in arr:
        crc = tbl[(crc ^ b) & 0xFF] ^ (crc >> np.uint32(8))
    return int(crc ^ np.uint32(0xFFFFFFFF))


# ---- primitive wire encoding -------------------------------------------------

class _Writer:
    def __init__(self):
        self.b = bytearray()

    def i8(self, v):
        self.b += struct.pack(">b", v)
        return self

    def i16(self, v):
        self.b += struct.pack(">h", v)
        return self

    def i32(self, v):
        self.b += struct.pack(">i", v)
        return self

    def i64(self, v):
        self.b += struct.pack(">q", v)
        return self

    def string(self, s: Optional[str]):
        if s is None:
            return self.i16(-1)
        raw = s.encode()
        self.i16(len(raw))
        self.b += raw
        return self

    def nbytes(self, raw: Optional[bytes]):
        if raw is None:
            return self.i32(-1)
        self.i32(len(raw))
        self.b += raw
        return self

    def varint(self, v: int):
        # signed zigzag varint (record fields inside batches)
        u = (v << 1) ^ (v >> 63) if v < 0 else v << 1
        while True:
            x = u & 0x7F
            u >>= 7
            if u:
                self.b.append(x | 0x80)
            else:
                self.b.append(x)
                return self


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def _take(self, n):
        c = self.buf[self.pos:self.pos + n]
        if len(c) < n:
            raise ValueError("short read")
        self.pos += n
        return c

    def i8(self):
        return struct.unpack(">b", self._take(1))[0]

    def i16(self):
        return struct.unpack(">h", self._take(2))[0]

    def i32(self):
        return struct.unpack(">i", self._take(4))[0]

    def i64(self):
        return struct.unpack(">q", self._take(8))[0]

    def string(self) -> Optional[str]:
        n = self.i16()
        return None if n < 0 else self._take(n).decode()

    def nbytes(self) -> Optional[bytes]:
        n = self.i32()
        return None if n < 0 else bytes(self._take(n))

    def varint(self) -> int:
        shift = 0
        u = 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            u |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
        return (u >> 1) ^ -(u & 1)


# ---- RecordBatch v2 ----------------------------------------------------------

def encode_record_batch(base_offset: int,
                        records: List[Tuple[Optional[bytes],
                                            Optional[bytes], int]]) -> bytes:
    """[(key, value, timestamp_ms)] -> one magic=2 batch (no compression)."""
    first_ts = records[0][2] if records else 0
    max_ts = max((r[2] for r in records), default=0)
    body = _Writer()
    body.i16(0)                      # attributes: no compression
    body.i32(len(records) - 1)       # lastOffsetDelta
    body.i64(first_ts).i64(max_ts)
    body.i64(-1)                     # producerId
    body.i16(-1)                     # producerEpoch
    body.i32(-1)                     # baseSequence
    body.i32(len(records))
    for i, (key, value, ts) in enumerate(records):
        rec = _Writer()
        rec.b.append(0)              # record attributes
        rec.varint(ts - first_ts)    # timestampDelta
        rec.varint(i)                # offsetDelta
        for payload in (key, value):
            if payload is None:
                rec.varint(-1)
            else:
                rec.varint(len(payload))
                rec.b += payload
        rec.varint(0)                # headers count
        body.varint(len(rec.b))
        body.b += rec.b
    crc = crc32c(bytes(body.b))
    head = _Writer()
    head.i64(base_offset)
    head.i32(4 + 1 + 4 + len(body.b))  # batchLength (after this field)
    head.i32(0)                        # partitionLeaderEpoch
    head.i8(2)                         # magic
    head.b += struct.pack(">I", crc)
    return bytes(head.b) + bytes(body.b)


def decode_record_batches(buf: bytes, topic: str,
                          partition: int) -> List[Record]:
    """A Fetch response record set (concatenated batches) -> Records."""
    out: List[Record] = []
    pos = 0
    n = len(buf)
    while pos + 17 <= n:
        base_offset, batch_len = struct.unpack_from(">qi", buf, pos)
        if pos + 12 + batch_len > n:
            break  # broker may truncate the final batch — spec allows it
        magic = buf[pos + 16]
        if magic != 2:
            raise ValueError(f"unsupported record batch magic {magic}")
        crc_stored = struct.unpack_from(">I", buf, pos + 17)[0]
        body = buf[pos + 21:pos + 12 + batch_len]
        if crc32c(body) != crc_stored:
            raise ValueError("record batch crc32c mismatch")
        r = _Reader(body)
        r.i16()                      # attributes (no compression supported)
        r.i32()                      # lastOffsetDelta
        first_ts = r.i64()
        r.i64()                      # maxTimestamp
        r.i64(); r.i16(); r.i32()    # producer id/epoch, baseSequence
        count = r.i32()
        for _ in range(count):
            r.varint()               # record length
            r.i8()                   # attributes
            ts_delta = r.varint()
            off_delta = r.varint()
            klen = r.varint()
            key = bytes(r._take(klen)) if klen >= 0 else None
            vlen = r.varint()
            value = bytes(r._take(vlen)) if vlen >= 0 else None
            for _h in range(r.varint()):
                hk = r.varint()
                r._take(hk)
                hv = r.varint()
                if hv >= 0:
                    r._take(hv)
            out.append(Record(value=value or b"", key=key, topic=topic,
                              partition=partition,
                              offset=base_offset + off_delta,
                              timestamp_us=(first_ts + ts_delta) * 1000))
        pos += 12 + batch_len
    return out


# ---- client ------------------------------------------------------------------

class _Conn:
    def __init__(self, host: str, port: int, client_id: str = "auron-tpu"):
        self.sock = socket.create_connection((host, port), timeout=30)
        self.client_id = client_id
        self._corr = 0

    def request(self, api_key: int, api_version: int, body: bytes) -> _Reader:
        self._corr += 1
        head = _Writer()
        head.i16(api_key).i16(api_version).i32(self._corr)
        head.string(self.client_id)
        msg = bytes(head.b) + body
        self.sock.sendall(struct.pack(">i", len(msg)) + msg)
        raw = self._recv_n(4)
        (n,) = struct.unpack(">i", raw)
        resp = _Reader(self._recv_n(n))
        corr = resp.i32()
        if corr != self._corr:
            raise ValueError(f"correlation mismatch {corr} != {self._corr}")
        return resp

    def _recv_n(self, n: int) -> bytes:
        chunks = []
        while n:
            c = self.sock.recv(n)
            if not c:
                raise ConnectionError("broker closed connection")
            chunks.append(c)
            n -= len(c)
        return b"".join(chunks)

    def close(self):
        try:
            self.sock.close()
        except OSError:
            pass


class KafkaWireSource(MicroBatchSource):
    """MicroBatchSource over the real Kafka protocol.

    ``poll`` issues one Fetch v4 per (topic, partition) at the
    caller-held offsets; ``end_offsets`` issues ListOffsets v1 (latest).
    ``commit``/``committed`` mirror the reference's checkpoint-commit
    path (OffsetCommit v2 / OffsetFetch v1 against ``group_id``) — the
    query's own checkpoint stays authoritative, the broker-side commit is
    for lag monitors and for first-start positioning."""

    def __init__(self, host: str, port: int, topics: List[str],
                 group_id: str = "auron", max_bytes: int = 1 << 20):
        self.host, self.port = host, port
        self.topics = list(topics)
        self.group_id = group_id
        self.max_bytes = max_bytes
        self._conn: Optional[_Conn] = None
        self._parts: Optional[Dict[str, List[int]]] = None

    def _c(self) -> _Conn:
        if self._conn is None:
            self._conn = _Conn(self.host, self.port)
        return self._conn

    def close(self):
        if self._conn is not None:
            self._conn.close()
            self._conn = None

    # -- metadata ----------------------------------------------------------
    def partitions(self) -> Dict[str, List[int]]:
        if self._parts is not None:
            return self._parts
        w = _Writer()
        w.i32(len(self.topics))
        for t in self.topics:
            w.string(t)
        r = self._c().request(METADATA, 1, bytes(w.b))
        for _ in range(r.i32()):     # brokers
            r.i32(); r.string(); r.i32(); r.string()
        r.i32()                      # controller id
        parts: Dict[str, List[int]] = {}
        for _ in range(r.i32()):     # topics
            r.i16()                  # error
            name = r.string()
            r.i8()                   # is_internal
            ps = []
            for _ in range(r.i32()):
                r.i16()              # error
                ps.append(r.i32())   # partition id
                r.i32()              # leader
                for _ in range(r.i32()):
                    r.i32()          # replicas
                for _ in range(r.i32()):
                    r.i32()          # isr
            parts[name] = sorted(ps)
        self._parts = parts
        return parts

    def _list_offset(self, topic: str, partition: int, ts: int) -> int:
        w = _Writer()
        w.i32(-1)                    # replica id
        w.i32(1).string(topic).i32(1).i32(partition).i64(ts)
        r = self._c().request(LIST_OFFSETS, 1, bytes(w.b))
        r.i32(); r.string()          # topic count(1), name
        r.i32(); r.i32()             # partition count(1), id
        err = r.i16()
        if err:
            raise ValueError(f"ListOffsets error {err}")
        r.i64()                      # timestamp
        return r.i64()

    def earliest_offsets(self) -> Offsets:
        return {(t, p): self._list_offset(t, p, -2)
                for t, ps in self.partitions().items() for p in ps}

    def end_offsets(self) -> Offsets:
        return {(t, p): self._list_offset(t, p, -1)
                for t, ps in self.partitions().items() for p in ps}

    # -- fetch ---------------------------------------------------------------
    def poll(self, offsets: Offsets, max_records: int) -> List[Record]:
        out: List[Record] = []
        for topic, ps in self.partitions().items():
            for p in ps:
                if len(out) >= max_records:
                    return out
                off = offsets.get((topic, p), 0)
                w = _Writer()
                w.i32(-1)            # replica id
                w.i32(100)           # max wait ms
                w.i32(0)             # min bytes
                w.i32(self.max_bytes)
                w.i8(0)              # isolation level
                w.i32(1).string(topic)
                w.i32(1).i32(p).i64(off).i32(self.max_bytes)
                r = self._c().request(FETCH, 4, bytes(w.b))
                r.i32()              # throttle
                r.i32(); r.string()  # topic count(1), name
                r.i32(); r.i32()     # partition count(1), id
                err = r.i16()
                if err:
                    raise ValueError(f"Fetch error {err}")
                r.i64()              # high watermark
                r.i64()              # last stable offset
                for _ in range(r.i32()):  # aborted txns
                    r.i64(); r.i64()
                record_set = r.nbytes() or b""
                recs = decode_record_batches(record_set, topic, p)
                # the batch may start before `off` (batch granularity)
                out.extend(x for x in recs if x.offset >= off)
                out = out[:max_records]
        return out

    # -- offset commit (checkpoint-commit parity) ---------------------------
    def commit(self, offsets: Offsets) -> None:
        by_topic: Dict[str, List[Tuple[int, int]]] = {}
        for (t, p), o in offsets.items():
            by_topic.setdefault(t, []).append((p, o))
        w = _Writer()
        w.string(self.group_id)
        w.i32(-1)                    # generation
        w.string("")                 # member id
        w.i64(-1)                    # retention
        w.i32(len(by_topic))
        for t, ps in by_topic.items():
            w.string(t).i32(len(ps))
            for p, o in ps:
                w.i32(p).i64(o).string(None)
        r = self._c().request(OFFSET_COMMIT, 2, bytes(w.b))
        for _ in range(r.i32()):
            r.string()
            for _ in range(r.i32()):
                r.i32()
                err = r.i16()
                if err:
                    raise ValueError(f"OffsetCommit error {err}")

    def committed(self) -> Offsets:
        w = _Writer()
        w.string(self.group_id)
        parts = self.partitions()
        w.i32(len(parts))
        for t, ps in parts.items():
            w.string(t).i32(len(ps))
            for p in ps:
                w.i32(p)
        r = self._c().request(OFFSET_FETCH, 1, bytes(w.b))
        out: Offsets = {}
        for _ in range(r.i32()):
            t = r.string()
            for _ in range(r.i32()):
                p = r.i32()
                off = r.i64()
                r.string()           # metadata
                r.i16()              # error
                if off >= 0:
                    out[(t, p)] = off
        return out


# ---- in-process broker --------------------------------------------------------

@dataclass
class _PartLog:
    batches: List[Tuple[int, bytes]] = field(default_factory=list)  # (base, raw)
    next_offset: int = 0


class FakeBroker:
    """Threaded TCP server speaking the same protocol subset the client
    uses (Metadata v1, ListOffsets v1, Fetch v4, OffsetCommit v2,
    OffsetFetch v1, ApiVersions v0). Messages append via ``produce`` as
    real encoded RecordBatch v2 bytes — Fetch serves the stored batches
    verbatim, so the client's crc/varint decoding is genuinely exercised."""

    def __init__(self, num_partitions: int = 2):
        self._np = num_partitions
        self._topics: Dict[str, List[_PartLog]] = {}
        self._commits: Dict[Tuple[str, str, int], int] = {}
        self._lock = threading.Lock()
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind(("127.0.0.1", 0))
        self._srv.listen(16)
        self.port = self._srv.getsockname()[1]
        self._stop = False
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    # -- producer-side API ----------------------------------------------------
    def produce(self, topic: str, values: List[bytes],
                partition: int = 0, keys: Optional[List[bytes]] = None,
                timestamp_ms: Optional[int] = None) -> None:
        ts = int(time.time() * 1000) if timestamp_ms is None else timestamp_ms
        with self._lock:
            logs = self._topics.setdefault(
                topic, [_PartLog() for _ in range(self._np)])
            log = logs[partition]
            recs = [(keys[i] if keys else None, v, ts)
                    for i, v in enumerate(values)]
            raw = encode_record_batch(log.next_offset, recs)
            log.batches.append((log.next_offset, raw))
            log.next_offset += len(values)

    def close(self):
        self._stop = True
        try:
            # unblock accept()
            socket.create_connection(("127.0.0.1", self.port),
                                     timeout=1).close()
        except OSError:
            pass
        self._srv.close()

    # -- server loop -----------------------------------------------------------
    def _serve(self):
        while not self._stop:
            try:
                conn, _ = self._srv.accept()
            except OSError:
                return
            threading.Thread(target=self._handle, args=(conn,),
                             daemon=True).start()

    def _handle(self, conn: socket.socket):
        try:
            while True:
                head = self._recv_n(conn, 4)
                if head is None:
                    return
                (n,) = struct.unpack(">i", head)
                buf = self._recv_n(conn, n)
                if buf is None:
                    return
                r = _Reader(buf)
                api_key, api_version, corr = r.i16(), r.i16(), r.i32()
                r.string()  # client id
                body = self._dispatch(api_key, api_version, r)
                resp = struct.pack(">i", corr) + body
                conn.sendall(struct.pack(">i", len(resp)) + resp)
        except (ConnectionError, OSError, ValueError):
            pass
        finally:
            conn.close()

    @staticmethod
    def _recv_n(conn, n) -> Optional[bytes]:
        chunks = []
        while n:
            try:
                c = conn.recv(n)
            except OSError:
                return None
            if not c:
                return None
            chunks.append(c)
            n -= len(c)
        return b"".join(chunks)

    def _dispatch(self, api_key: int, ver: int, r: _Reader) -> bytes:
        if api_key == API_VERSIONS:
            w = _Writer()
            w.i16(0).i32(6)
            for k in (METADATA, LIST_OFFSETS, FETCH, OFFSET_COMMIT,
                      OFFSET_FETCH, API_VERSIONS):
                w.i16(k).i16(0).i16(4)
            return bytes(w.b)
        if api_key == METADATA:
            n = r.i32()
            names = [r.string() for _ in range(n)] if n >= 0 else \
                list(self._topics)
            w = _Writer()
            w.i32(1).i32(0).string("127.0.0.1").i32(self.port).string(None)
            w.i32(0)                 # controller id
            w.i32(len(names))
            with self._lock:
                for t in names:
                    ps = self._topics.get(
                        t, [_PartLog() for _ in range(self._np)])
                    self._topics.setdefault(t, ps)
                    w.i16(0).string(t).i8(0).i32(len(ps))
                    for p in range(len(ps)):
                        w.i16(0).i32(p).i32(0).i32(1).i32(0).i32(1).i32(0)
            return bytes(w.b)
        if api_key == LIST_OFFSETS:
            r.i32()                  # replica
            r.i32()                  # topic count (assume 1)
            t = r.string()
            r.i32()                  # partition count (assume 1)
            p = r.i32()
            ts = r.i64()
            with self._lock:
                log = self._topics.get(t, [_PartLog()
                                           for _ in range(self._np)])[p]
                if ts == -2:         # earliest
                    off = log.batches[0][0] if log.batches else 0
                else:                # latest
                    off = log.next_offset
            w = _Writer()
            w.i32(1).string(t).i32(1).i32(p).i16(0).i64(-1).i64(off)
            return bytes(w.b)
        if api_key == FETCH:
            r.i32(); r.i32(); r.i32(); r.i32(); r.i8()
            r.i32()                  # topic count (assume 1)
            t = r.string()
            r.i32()                  # partition count (assume 1)
            p = r.i32()
            off = r.i64()
            max_bytes = r.i32()
            with self._lock:
                log = self._topics.get(t, [_PartLog()
                                           for _ in range(self._np)])[p]
                chunks, size = [], 0
                for base, raw in log.batches:
                    n_recs = struct.unpack(">i", raw[57:61])[0]
                    if base + n_recs <= off:
                        continue     # fully before the requested offset
                    chunks.append(raw)
                    size += len(raw)
                    if size >= max_bytes:
                        break
                hw = log.next_offset
            record_set = b"".join(chunks)
            w = _Writer()
            w.i32(0)                 # throttle
            w.i32(1).string(t).i32(1).i32(p).i16(0)
            w.i64(hw).i64(hw).i32(0)  # hw, lso, no aborted txns
            w.nbytes(record_set)
            return bytes(w.b)
        if api_key == OFFSET_COMMIT:
            g = r.string()
            r.i32(); r.string(); r.i64()
            topics = []
            for _ in range(r.i32()):
                t = r.string()
                ps = []
                for _ in range(r.i32()):
                    p = r.i32()
                    o = r.i64()
                    r.string()
                    with self._lock:
                        self._commits[(g, t, p)] = o
                    ps.append(p)
                topics.append((t, ps))
            w = _Writer()
            w.i32(len(topics))
            for t, ps in topics:
                w.string(t).i32(len(ps))
                for p in ps:
                    w.i32(p).i16(0)
            return bytes(w.b)
        if api_key == OFFSET_FETCH:
            g = r.string()
            topics = []
            for _ in range(r.i32()):
                t = r.string()
                ps = [r.i32() for _ in range(r.i32())]
                topics.append((t, ps))
            w = _Writer()
            w.i32(len(topics))
            for t, ps in topics:
                w.string(t).i32(len(ps))
                for p in ps:
                    with self._lock:
                        off = self._commits.get((g, t, p), -1)
                    w.i32(p).i64(off).string(None).i16(0)
            return bytes(w.b)
        raise ValueError(f"unsupported api key {api_key}")
