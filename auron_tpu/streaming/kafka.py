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
APIs works. Authenticated listeners are supported: SASL PLAIN and
SCRAM-SHA-256 (RFC 5802/7677, mutual — the client verifies the server
signature) via SaslHandshake v1 + SaslAuthenticate v0, and TLS via a
caller-supplied ssl.SSLContext (SASL_SSL when combined) — the
rdkafka security.protocol/sasl.* analog. Consumer-GROUP rebalance
(JoinGroup/SyncGroup) is deliberately absent: like the reference's scan
(kafka_scan_exec.rs:259-336), partitions are manually assigned and
offsets are checkpoint-owned, so group membership would only fight the
engine's own partition placement. ``FakeBroker`` is an in-process TCP server implementing the
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
SASL_HANDSHAKE, SASL_AUTHENTICATE = 17, 36

# error codes used on the auth path
ERR_UNSUPPORTED_SASL_MECHANISM = 33
ERR_ILLEGAL_SASL_STATE = 34
ERR_SASL_AUTHENTICATION_FAILED = 58


# ---- SCRAM-SHA-256 (RFC 5802/7677) — shared by client and fake broker -------

def _scram_hmac(key: bytes, msg: bytes) -> bytes:
    import hashlib
    import hmac as _hmac
    return _hmac.new(key, msg, hashlib.sha256).digest()


def _scram_h(data: bytes) -> bytes:
    import hashlib
    return hashlib.sha256(data).digest()


def scram_salted_password(password: str, salt: bytes, iters: int) -> bytes:
    import hashlib
    return hashlib.pbkdf2_hmac("sha256", password.encode(), salt, iters)


def scram_signatures(password: str, salt: bytes, iters: int,
                     auth_message: bytes) -> Tuple[bytes, bytes]:
    """(client_proof, server_signature) for one SCRAM exchange."""
    import hmac as _hmac
    salted = scram_salted_password(password, salt, iters)
    client_key = _scram_hmac(salted, b"Client Key")
    stored_key = _scram_h(client_key)
    client_sig = _scram_hmac(stored_key, auth_message)
    proof = bytes(a ^ b for a, b in zip(client_key, client_sig))
    server_key = _scram_hmac(salted, b"Server Key")
    server_sig = _scram_hmac(server_key, auth_message)
    return proof, server_sig


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
    def __init__(self, host: str, port: int, client_id: str = "auron-tpu",
                 ssl_context=None, sasl: Optional[Dict] = None):
        self.sock = socket.create_connection((host, port), timeout=30)
        if ssl_context is not None:
            self.sock = ssl_context.wrap_socket(self.sock,
                                                server_hostname=host)
        self.client_id = client_id
        self._corr = 0
        if sasl:
            self._authenticate(sasl)

    # -- SASL (SaslHandshake v1 + SaslAuthenticate v0) -----------------------
    def _authenticate(self, sasl: Dict) -> None:
        mech = sasl.get("mechanism", "PLAIN").upper()
        user, password = sasl["username"], sasl["password"]
        w = _Writer()
        w.string(mech)
        r = self.request(SASL_HANDSHAKE, 1, bytes(w.b))
        err = r.i16()
        if err:
            enabled = [r.string() for _ in range(r.i32())]
            raise PermissionError(
                f"SaslHandshake rejected {mech} (error {err}; broker "
                f"supports {enabled})")
        if mech == "PLAIN":
            token = b"\x00" + user.encode() + b"\x00" + password.encode()
            self._sasl_round(token)
            return
        if mech != "SCRAM-SHA-256":
            raise ValueError(f"unsupported sasl mechanism {mech!r}")
        import base64
        import os as _os
        cnonce = base64.b64encode(_os.urandom(18)).decode()
        gs2, cf_bare = "n,,", f"n={user},r={cnonce}"
        server_first = self._sasl_round((gs2 + cf_bare).encode()).decode()
        attrs = dict(kv.split("=", 1) for kv in server_first.split(","))
        nonce, salt = attrs["r"], base64.b64decode(attrs["s"])
        iters = int(attrs["i"])
        if not nonce.startswith(cnonce):
            raise PermissionError("SCRAM server nonce does not extend ours")
        cf_woproof = (f"c={base64.b64encode(gs2.encode()).decode()},"
                      f"r={nonce}")
        auth_msg = f"{cf_bare},{server_first},{cf_woproof}".encode()
        proof, server_sig = scram_signatures(password, salt, iters,
                                             auth_msg)
        final = (f"{cf_woproof},"
                 f"p={base64.b64encode(proof).decode()}").encode()
        server_final = self._sasl_round(final).decode()
        v = dict(kv.split("=", 1) for kv in server_final.split(","))
        if base64.b64decode(v.get("v", "")) != server_sig:
            raise PermissionError(
                "SCRAM server signature mismatch (not the broker that "
                "holds our credentials)")

    def _sasl_round(self, token: bytes) -> bytes:
        w = _Writer()
        w.nbytes(token)
        r = self.request(SASL_AUTHENTICATE, 0, bytes(w.b))
        err = r.i16()
        msg = r.string()
        if err:
            raise PermissionError(f"SASL authentication failed "
                                  f"(error {err}): {msg}")
        return r.nbytes() or b""

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
                 group_id: str = "auron", max_bytes: int = 1 << 20,
                 ssl_context=None, sasl: Optional[Dict] = None):
        """``ssl_context``: an ssl.SSLContext for TLS listeners.
        ``sasl``: {"mechanism": "PLAIN"|"SCRAM-SHA-256", "username",
        "password"} — authenticated per-connection via SaslHandshake v1 +
        SaslAuthenticate v0 before any other request (the rdkafka
        sasl.mechanism/sasl.username/sasl.password analog)."""
        self.host, self.port = host, port
        self.topics = list(topics)
        self.group_id = group_id
        self.max_bytes = max_bytes
        self.ssl_context = ssl_context
        self.sasl = dict(sasl) if sasl else None
        self._conn: Optional[_Conn] = None
        self._parts: Optional[Dict[str, List[int]]] = None

    def _c(self) -> _Conn:
        if self._conn is None:
            self._conn = _Conn(self.host, self.port,
                               ssl_context=self.ssl_context,
                               sasl=self.sasl)
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

    def __init__(self, num_partitions: int = 2,
                 sasl_users: Optional[Dict[str, str]] = None,
                 certfile: Optional[str] = None,
                 keyfile: Optional[str] = None):
        """``sasl_users``: {username: password}. When set, every
        connection must complete SaslHandshake+SaslAuthenticate (PLAIN or
        SCRAM-SHA-256) before any other API — unauthenticated requests
        close the connection, like a real broker's SASL listener.
        ``certfile``/``keyfile``: serve TLS (SASL_SSL when combined)."""
        self._np = num_partitions
        self._sasl_users = dict(sasl_users) if sasl_users else None
        self._ssl_ctx = None
        if certfile:
            import ssl
            self._ssl_ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
            self._ssl_ctx.load_cert_chain(certfile, keyfile)
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
        auth = {"ok": self._sasl_users is None, "mech": None,
                "scram": None}
        try:
            if self._ssl_ctx is not None:
                conn = self._ssl_ctx.wrap_socket(conn, server_side=True)
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
                if not auth["ok"] and api_key not in (
                        API_VERSIONS, SASL_HANDSHAKE, SASL_AUTHENTICATE):
                    return  # real SASL listeners drop unauthenticated reqs
                if api_key in (SASL_HANDSHAKE, SASL_AUTHENTICATE):
                    body = self._dispatch_sasl(api_key, r, auth)
                else:
                    body = self._dispatch(api_key, api_version, r)
                resp = struct.pack(">i", corr) + body
                conn.sendall(struct.pack(">i", len(resp)) + resp)
        except (ConnectionError, OSError, ValueError):
            pass
        finally:
            conn.close()

    def _dispatch_sasl(self, api_key: int, r: _Reader, auth: Dict) -> bytes:
        import base64
        import os as _os
        w = _Writer()
        if api_key == SASL_HANDSHAKE:
            mech = (r.string() or "").upper()
            mechs = ["PLAIN", "SCRAM-SHA-256"]
            if self._sasl_users is None or mech not in mechs:
                w.i16(ERR_UNSUPPORTED_SASL_MECHANISM).i32(len(mechs))
                for m in mechs:
                    w.string(m)
                return bytes(w.b)
            auth["mech"] = mech
            w.i16(0).i32(len(mechs))
            for m in mechs:
                w.string(m)
            return bytes(w.b)
        # SaslAuthenticate v0: [error, message, auth_bytes]
        token = r.nbytes() or b""

        def fail(msg: str) -> bytes:
            w.i16(ERR_SASL_AUTHENTICATION_FAILED).string(msg).nbytes(b"")
            return bytes(w.b)

        if auth["mech"] == "PLAIN":
            try:
                _authzid, user, password = token.split(b"\x00", 2)
            except ValueError:
                return fail("malformed PLAIN token")
            want = (self._sasl_users or {}).get(user.decode())
            if want is None or want.encode() != password:
                return fail("bad credentials")
            auth["ok"] = True
            w.i16(0).string(None).nbytes(b"")
            return bytes(w.b)
        if auth["mech"] == "SCRAM-SHA-256":
            if auth["scram"] is None:
                first = token.decode()
                if not first.startswith("n,,"):
                    return fail("unsupported gs2 header")
                cf_bare = first[3:]
                attrs = dict(kv.split("=", 1)
                             for kv in cf_bare.split(","))
                user, cnonce = attrs.get("n"), attrs.get("r")
                if user not in (self._sasl_users or {}):
                    return fail("unknown user")
                salt = _os.urandom(16)
                nonce = cnonce + base64.b64encode(
                    _os.urandom(12)).decode()
                server_first = (f"r={nonce},"
                                f"s={base64.b64encode(salt).decode()},"
                                f"i=4096")
                auth["scram"] = {"user": user, "nonce": nonce,
                                 "salt": salt, "iters": 4096,
                                 "cf_bare": cf_bare,
                                 "server_first": server_first}
                w.i16(0).string(None).nbytes(server_first.encode())
                return bytes(w.b)
            st = auth["scram"]
            final = token.decode()
            woproof, _, proof_attr = final.rpartition(",")
            if not proof_attr.startswith("p="):
                return fail("missing proof")
            attrs = dict(kv.split("=", 1) for kv in woproof.split(","))
            if attrs.get("r") != st["nonce"]:
                return fail("nonce mismatch")
            auth_msg = (f"{st['cf_bare']},{st['server_first']},"
                        f"{woproof}").encode()
            want_proof, server_sig = scram_signatures(
                self._sasl_users[st["user"]], st["salt"], st["iters"],
                auth_msg)
            if base64.b64decode(proof_attr[2:]) != want_proof:
                return fail("bad SCRAM proof")
            auth["ok"] = True
            w.i16(0).string(None).nbytes(
                b"v=" + base64.b64encode(server_sig))
            return bytes(w.b)
        return fail("SaslAuthenticate before SaslHandshake")

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
