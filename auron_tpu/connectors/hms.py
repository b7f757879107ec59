"""Hive Metastore (thrift) catalog client.

The reference gets HMS resolution for free through Spark's session catalog
(every `spark.table("db.t")` consults the metastore before Auron ever sees
the plan). This module is the native equivalent: a minimal, dependency-free
TBinaryProtocol client speaking directly to a metastore's thrift port. Only
the read-side RPCs a scan needs are implemented:

  * ``get_table(db, table)``          -> table name/type, storage
    descriptor (location, input format, columns), parameters map
    (Iceberg's ``metadata_location`` rides here), partition keys.
  * ``get_partitions(db, table)``     -> per-partition locations + values
    (hive-layout tables whose partition dirs live outside the table root).

Wire format: unframed TBinaryProtocol, strict version header — the
metastore's default transport. Structs decode into plain dicts keyed by
thrift field id; ``_TABLE_FIELDS``/``_SD_FIELDS`` then name the subset we
consume, so unknown/new fields are skipped structurally rather than
breaking the parse (same forward-compat posture as the real generated
clients).

URI form (consumed by connectors/catalog.py):

    hms://host[:port]/<database>/<table>        (default port 9083)

No SASL: kerberized metastores are out of scope here (the reference's own
IT suites run against plain-auth metastores too).
"""

from __future__ import annotations

import io
import socket
import struct
from typing import Any, Dict, List, Optional, Tuple

# thrift type ids (TType)
STOP, BOOL, BYTE, DOUBLE = 0, 2, 3, 4
I16, I32, I64, STRING = 6, 8, 10, 11
STRUCT, MAP, SET, LIST = 12, 13, 14, 15

_VERSION_1 = 0x80010000
_CALL, _REPLY, _EXCEPTION = 1, 2, 3


# ---------------------------------------------------------------- encode --

def _w_str(out: io.BytesIO, s: str) -> None:
    b = s.encode("utf-8")
    out.write(struct.pack(">i", len(b)))
    out.write(b)


def _w_field(out: io.BytesIO, ftype: int, fid: int) -> None:
    out.write(struct.pack(">bh", ftype, fid))


def encode_call(name: str, seqid: int, args: bytes) -> bytes:
    """Strict-protocol message: [version|CALL][name][seqid][args struct]."""
    out = io.BytesIO()
    out.write(struct.pack(">I", _VERSION_1 | _CALL))
    _w_str(out, name)
    out.write(struct.pack(">i", seqid))
    out.write(args)
    return out.getvalue()


def encode_get_table_args(db: str, table: str) -> bytes:
    out = io.BytesIO()
    _w_field(out, STRING, 1)
    _w_str(out, db)
    _w_field(out, STRING, 2)
    _w_str(out, table)
    out.write(b"\x00")
    return out.getvalue()


def encode_get_partitions_args(db: str, table: str,
                               max_parts: int = -1) -> bytes:
    out = io.BytesIO()
    _w_field(out, STRING, 1)
    _w_str(out, db)
    _w_field(out, STRING, 2)
    _w_str(out, table)
    _w_field(out, I16, 3)
    out.write(struct.pack(">h", max_parts))
    out.write(b"\x00")
    return out.getvalue()


# ---------------------------------------------------------------- decode --

class _Reader:
    def __init__(self, buf: bytes):
        self._b = buf
        self._o = 0

    def take(self, n: int) -> bytes:
        if self._o + n > len(self._b):
            raise EOFError("truncated thrift payload")
        v = self._b[self._o:self._o + n]
        self._o += n
        return v

    def u8(self) -> int:
        return self.take(1)[0]

    def i16(self) -> int:
        return struct.unpack(">h", self.take(2))[0]

    def i32(self) -> int:
        return struct.unpack(">i", self.take(4))[0]

    def i64(self) -> int:
        return struct.unpack(">q", self.take(8))[0]

    def f64(self) -> float:
        return struct.unpack(">d", self.take(8))[0]

    def string(self) -> str:
        n = self.i32()
        return self.take(n).decode("utf-8", "replace")


def _read_value(r: _Reader, ftype: int) -> Any:
    if ftype == BOOL:
        return r.u8() != 0
    if ftype == BYTE:
        return r.u8()
    if ftype == DOUBLE:
        return r.f64()
    if ftype == I16:
        return r.i16()
    if ftype == I32:
        return r.i32()
    if ftype == I64:
        return r.i64()
    if ftype == STRING:
        return r.string()
    if ftype == STRUCT:
        return read_struct(r)
    if ftype in (LIST, SET):
        etype = r.u8()
        n = r.i32()
        return [_read_value(r, etype) for _ in range(n)]
    if ftype == MAP:
        ktype, vtype = r.u8(), r.u8()
        n = r.i32()
        return {_read_value(r, ktype): _read_value(r, vtype)
                for _ in range(n)}
    raise ValueError(f"unsupported thrift type {ftype}")


def read_struct(r: _Reader) -> Dict[int, Any]:
    """Generic struct decode: {field_id: value}, recursively."""
    out: Dict[int, Any] = {}
    while True:
        ftype = r.u8()
        if ftype == STOP:
            return out
        fid = r.i16()
        out[fid] = _read_value(r, ftype)


def decode_reply(buf: bytes, expect_name: str) -> Dict[int, Any]:
    """Parse [version|REPLY][name][seqid][result struct]; raise on
    EXCEPTION messages and on declared-exception result fields (>0)."""
    r = _Reader(buf)
    head = r.i32() & 0xFFFFFFFF
    if head & 0xFFFF0000 != _VERSION_1:
        raise ValueError(f"bad thrift version word 0x{head:08x}")
    mtype = head & 0xFF
    name = r.string()
    r.i32()  # seqid
    if mtype == _EXCEPTION:
        exc = read_struct(r)
        raise RuntimeError(f"thrift TApplicationException from {name!r}: "
                           f"{exc.get(1)}")
    if mtype != _REPLY or name != expect_name:
        raise ValueError(f"unexpected thrift message {mtype}/{name!r}")
    result = read_struct(r)
    for fid, val in result.items():
        if fid > 0:  # declared exception (MetaException / NoSuchObject...)
            msg = val.get(1) if isinstance(val, dict) else val
            raise LookupError(f"{expect_name} failed: {msg}")
    return result


# ------------------------------------------------------ struct field maps --

_FIELD_SCHEMA = {1: "name", 2: "type", 3: "comment"}
_SD_FIELDS = {1: "cols", 2: "location", 3: "input_format",
              4: "output_format", 5: "compressed", 6: "num_buckets",
              10: "parameters"}
_TABLE_FIELDS = {1: "table_name", 2: "db_name", 3: "owner", 7: "sd",
                 8: "partition_keys", 9: "parameters", 12: "table_type"}
_PARTITION_FIELDS = {1: "values", 2: "db_name", 3: "table_name", 6: "sd",
                     7: "parameters"}


def _name_fields(raw: Dict[int, Any], names: Dict[int, str]) -> Dict:
    out = {}
    for fid, key in names.items():
        if fid in raw:
            out[key] = raw[fid]
    return out


def _shape_sd(raw: Optional[Dict[int, Any]]) -> Dict:
    if not isinstance(raw, dict):
        return {}
    sd = _name_fields(raw, _SD_FIELDS)
    sd["cols"] = [_name_fields(c, _FIELD_SCHEMA)
                  for c in sd.get("cols", []) if isinstance(c, dict)]
    return sd


def _shape_table(raw: Dict[int, Any]) -> Dict:
    t = _name_fields(raw, _TABLE_FIELDS)
    t["sd"] = _shape_sd(t.get("sd"))
    t["partition_keys"] = [_name_fields(c, _FIELD_SCHEMA)
                           for c in t.get("partition_keys", [])
                           if isinstance(c, dict)]
    t.setdefault("parameters", {})
    return t


# ---------------------------------------------------------------- client --

class HmsClient:
    """One-connection-per-call client (the metastore protocol is
    stateless for reads; no pooling needed at catalog-resolution rates)."""

    def __init__(self, host: str, port: int = 9083, timeout: float = 30.0):
        self.host, self.port, self.timeout = host, port, timeout
        self._seq = 0

    def _rpc(self, name: str, args: bytes) -> Dict[int, Any]:
        self._seq += 1
        msg = encode_call(name, self._seq, args)
        with socket.create_connection((self.host, self.port),
                                      timeout=self.timeout) as sk:
            sk.sendall(msg)
            sk.shutdown(socket.SHUT_WR)
            chunks = []
            while True:
                b = sk.recv(65536)
                if not b:
                    break
                chunks.append(b)
        return decode_reply(b"".join(chunks), name)

    def get_table(self, db: str, table: str) -> Dict:
        result = self._rpc("get_table", encode_get_table_args(db, table))
        return _shape_table(result[0])

    def get_partitions(self, db: str, table: str,
                       max_parts: int = -1) -> List[Dict]:
        result = self._rpc(
            "get_partitions", encode_get_partitions_args(db, table,
                                                         max_parts))
        parts = []
        for raw in result.get(0, []):
            p = _name_fields(raw, _PARTITION_FIELDS)
            p["sd"] = _shape_sd(p.get("sd"))
            parts.append(p)
        return parts


def split_uri(uri: str) -> Tuple[str, int, str, str]:
    """hms://host[:port]/db/table -> (host, port, db, table)."""
    if not uri.startswith("hms://"):
        raise ValueError(f"not an HMS uri: {uri!r}")
    rest = uri[len("hms://"):]
    hostport, _, path = rest.partition("/")
    parts = [p for p in path.split("/") if p]
    if len(parts) != 2:
        raise ValueError(f"bad HMS uri {uri!r} (want hms://host/db/table)")
    host, _, port = hostport.partition(":")
    return host, int(port) if port else 9083, parts[0], parts[1]


def load_table(uri: str, timeout: float = 30.0) -> Dict:
    host, port, db, table = split_uri(uri)
    return HmsClient(host, port, timeout=timeout).get_table(db, table)


def load_partitions(uri: str, timeout: float = 30.0) -> List[Dict]:
    host, port, db, table = split_uri(uri)
    return HmsClient(host, port, timeout=timeout).get_partitions(db, table)
