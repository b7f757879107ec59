"""Minimal Avro Object Container File codec (reader + writer).

Lakehouse table formats carry their metadata in Avro container files:
Iceberg manifest lists / manifests (spec: iceberg.apache.org/spec — the
reference consumes them through iceberg-core in
thirdparty/auron-iceberg/.../NativeIcebergTableScanExec) and Paimon
manifests. No Avro library is available in this environment, so this is a
self-contained implementation of the subset those files use:

  types   : null, boolean, int, long, float, double, bytes, string,
            record, enum, array, map, union, fixed
  codecs  : null, deflate (raw zlib stream, per the Avro spec)

Records decode to plain dicts keyed by field name (reader uses the writer
schema embedded in the file header; no schema-resolution pass — consumers
look fields up by name, which is robust across spec versions).
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib
from typing import Any, Dict, Iterable, List, Optional

MAGIC = b"Obj\x01"


# -- primitive decode ---------------------------------------------------------

def _read_long(buf: io.BytesIO) -> int:
    """zigzag varint."""
    shift, acc = 0, 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated avro varint")
        byte = b[0]
        acc |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    return buf.read(n)


def _decode(schema: Any, buf: io.BytesIO) -> Any:
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return None
        if t == "boolean":
            return buf.read(1) == b"\x01"
        if t in ("int", "long"):
            return _read_long(buf)
        if t == "float":
            return struct.unpack("<f", buf.read(4))[0]
        if t == "double":
            return struct.unpack("<d", buf.read(8))[0]
        if t == "bytes":
            return _read_bytes(buf)
        if t == "string":
            return _read_bytes(buf).decode("utf-8")
        raise NotImplementedError(f"avro type {t}")
    if isinstance(schema, list):  # union
        idx = _read_long(buf)
        return _decode(schema[idx], buf)
    t = schema["type"]
    if t == "record":
        return {f["name"]: _decode(f["type"], buf)
                for f in schema["fields"]}
    if t == "enum":
        return schema["symbols"][_read_long(buf)]
    if t == "fixed":
        return buf.read(schema["size"])
    if t == "array":
        out: List[Any] = []
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:
                _read_long(buf)  # block byte size (skippable hint)
                n = -n
            for _ in range(n):
                out.append(_decode(schema["items"], buf))
    if t == "map":
        m: Dict[str, Any] = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                return m
            if n < 0:
                _read_long(buf)
                n = -n
            for _ in range(n):
                k = _read_bytes(buf).decode("utf-8")
                m[k] = _decode(schema["values"], buf)
    if t in ("null", "boolean", "int", "long", "float", "double", "bytes",
             "string"):
        return _decode(t, buf)
    raise NotImplementedError(f"avro type {t}")


def _resolve_named(schema: Any, names: Dict[str, Any]) -> Any:
    """Inline previously-defined named types (records referenced by name)."""
    if isinstance(schema, str):
        return names.get(schema, schema)
    if isinstance(schema, list):
        return [_resolve_named(s, names) for s in schema]
    if isinstance(schema, dict):
        t = schema.get("type")
        if t in ("record", "enum", "fixed"):
            names[schema["name"]] = schema
        out = dict(schema)
        if t == "record":
            out["fields"] = [dict(f, type=_resolve_named(f["type"], names))
                             for f in schema["fields"]]
        elif t == "array":
            out["items"] = _resolve_named(schema["items"], names)
        elif t == "map":
            out["values"] = _resolve_named(schema["values"], names)
        elif isinstance(t, (dict, list)):
            out["type"] = _resolve_named(t, names)
        return out
    return schema


def read_container(path: str) -> List[Dict[str, Any]]:
    """Read every record of an Avro OCF into a list of dicts."""
    with open(path, "rb") as f:
        data = f.read()
    buf = io.BytesIO(data)
    if buf.read(4) != MAGIC:
        raise ValueError(f"{path}: not an Avro container file")
    meta: Dict[str, bytes] = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:
            _read_long(buf)
            n = -n
        for _ in range(n):
            k = _read_bytes(buf).decode("utf-8")
            meta[k] = _read_bytes(buf)
    schema = json.loads(meta["avro.schema"])
    schema = _resolve_named(schema, {})
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    sync = buf.read(16)
    out: List[Dict[str, Any]] = []
    while buf.tell() < len(data):
        count = _read_long(buf)
        size = _read_long(buf)
        block = buf.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise NotImplementedError(f"avro codec {codec}")
        bbuf = io.BytesIO(block)
        for _ in range(count):
            out.append(_decode(schema, bbuf))
        if buf.read(16) != sync:
            raise ValueError(f"{path}: sync marker mismatch")
    return out


# -- primitive encode ---------------------------------------------------------

def _zigzag(v: int) -> int:
    return (v << 1) if v >= 0 else ((-v) << 1) - 1


def _write_varint(buf: io.BytesIO, v: int) -> None:
    n = _zigzag(v)
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            return


def _write_bytes(buf: io.BytesIO, b: bytes) -> None:
    _write_varint(buf, len(b))
    buf.write(b)


def _encode(schema: Any, v: Any, buf: io.BytesIO) -> None:
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return
        if t == "boolean":
            buf.write(b"\x01" if v else b"\x00")
        elif t in ("int", "long"):
            _write_varint(buf, int(v))
        elif t == "float":
            buf.write(struct.pack("<f", float(v)))
        elif t == "double":
            buf.write(struct.pack("<d", float(v)))
        elif t == "bytes":
            _write_bytes(buf, bytes(v))
        elif t == "string":
            _write_bytes(buf, v.encode("utf-8"))
        else:
            raise NotImplementedError(f"avro type {t}")
        return
    if isinstance(schema, list):  # union: pick first branch matching py type
        for i, branch in enumerate(schema):
            name = branch if isinstance(branch, str) else branch["type"]
            if v is None and name == "null":
                _write_varint(buf, i)
                return
            if v is not None and name != "null":
                _write_varint(buf, i)
                _encode(branch, v, buf)
                return
        raise ValueError(f"no union branch for {v!r} in {schema}")
    t = schema["type"]
    if t == "record":
        for f in schema["fields"]:
            _encode(f["type"], v.get(f["name"]), buf)
    elif t == "enum":
        _write_varint(buf, schema["symbols"].index(v))
    elif t == "fixed":
        assert len(v) == schema["size"]
        buf.write(bytes(v))
    elif t == "array":
        if v:
            _write_varint(buf, len(v))
            for item in v:
                _encode(schema["items"], item, buf)
        _write_varint(buf, 0)
    elif t == "map":
        if v:
            _write_varint(buf, len(v))
            for k, item in v.items():
                _write_bytes(buf, k.encode("utf-8"))
                _encode(schema["values"], item, buf)
        _write_varint(buf, 0)
    else:
        _encode(t, v, buf)


def write_container(path: str, schema: Dict[str, Any],
                    records: Iterable[Dict[str, Any]],
                    codec: str = "deflate",
                    extra_meta: Optional[Dict[str, bytes]] = None) -> None:
    """Write records as one Avro OCF block (fixture-scale).

    ``extra_meta`` adds file-header metadata keys — Iceberg manifests
    require "schema"/"partition-spec"/"format-version" keys in the OCF
    header for external readers."""
    body = io.BytesIO()
    records = list(records)
    for r in records:
        _encode(schema, r, body)
    block = body.getvalue()
    if codec == "deflate":
        comp = zlib.compressobj(6, zlib.DEFLATED, -15)
        block = comp.compress(block) + comp.flush()
    elif codec != "null":
        raise NotImplementedError(f"avro codec {codec}")
    sync = b"auron-tpu-avro-0"  # any 16 bytes
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {"avro.schema": json.dumps(schema).encode("utf-8"),
            "avro.codec": codec.encode("utf-8")}
    if extra_meta:
        meta.update(extra_meta)
    _write_varint(out, len(meta))
    for k, v in meta.items():
        _write_bytes(out, k.encode("utf-8"))
        _write_bytes(out, v)
    _write_varint(out, 0)
    out.write(sync)
    _write_varint(out, len(records))
    _write_varint(out, len(block))
    out.write(block)
    out.write(sync)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(out.getvalue())


def decode_record(schema: Dict[str, Any], data: bytes) -> Any:
    """Decode ONE schema-shaped value from raw Avro binary (no container).

    Used by the Hudi log-format reader, whose AVRO_DATA_BLOCK content is a
    sequence of bare binary-encoded records with the writer schema carried
    in the block header."""
    return _decode(_resolve_named(schema, {}), io.BytesIO(data))


def encode_record(schema: Dict[str, Any], value: Any) -> bytes:
    """Encode ONE schema-shaped value to raw Avro binary (no container)."""
    buf = io.BytesIO()
    _encode(_resolve_named(schema, {}), value, buf)
    return buf.getvalue()
