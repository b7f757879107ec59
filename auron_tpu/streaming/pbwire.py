"""Raw protobuf wire-format decoder — schema-driven, no generated classes.

The reference decodes Kafka protobuf payloads straight off the wire with
per-field handlers (flink/serde/pb_deserializer.rs:96-1702: varint keys,
wire-type dispatch, nested sub-messages, repeated fields both packed and
unpacked, unknown-field skipping) rather than through generated message
classes. This module is that capability for the TPU engine: a
``PbSchema`` maps field numbers to (name, kind[, sub-schema]); ``decode``
walks the bytes once and produces plain dicts; ``PbWireDeserializer``
columnizes a micro-batch of payloads into one TableBlock — repeated
fields land as the engine's plane representation (``name#vals`` 2-D +
``name#len``) so ``explode`` works on streamed arrays, and decimal
fields (string/double/int carriers) land as decimal64 at a declared
scale, matching the reference's decimal-aware decoding.

proto3 semantics: absent scalar fields decode to the type default,
absent sub-messages to NULL, unknown fields are skipped by wire type.
``encode`` is the inverse (test vectors, fake-broker payload
generation); decode(encode(x)) == x for canonical values.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field as dc_field
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

# wire types (protobuf encoding spec)
_VARINT, _I64, _LEN, _SGROUP, _EGROUP, _I32 = 0, 1, 2, 3, 4, 5

_SCALAR_WIRE = {
    "int32": _VARINT, "int64": _VARINT, "uint32": _VARINT,
    "uint64": _VARINT, "sint32": _VARINT, "sint64": _VARINT,
    "bool": _VARINT, "enum": _VARINT,
    "fixed64": _I64, "sfixed64": _I64, "double": _I64,
    "fixed32": _I32, "sfixed32": _I32, "float": _I32,
    "string": _LEN, "bytes": _LEN,
}

_DEFAULTS = {"string": "", "bytes": b"", "bool": False,
             "double": 0.0, "float": 0.0}


@dataclass(frozen=True)
class PbField:
    """One field: wire number -> name/kind. ``kind`` is a protobuf scalar
    kind, "message" (with ``message`` = the nested PbSchema), or
    "decimal" (carrier in ``carrier``: string|double|int64, decoded to an
    unscaled int at ``scale`` — the reference's decimal-aware arm)."""

    number: int
    name: str
    kind: str
    repeated: bool = False
    message: Optional["PbSchema"] = None
    scale: int = 2
    carrier: str = "string"


@dataclass(frozen=True)
class PbSchema:
    fields: Tuple[PbField, ...]
    by_number: Dict[int, PbField] = dc_field(default_factory=dict)

    def __post_init__(self):
        object.__setattr__(
            self, "by_number", {f.number: f for f in self.fields})


def schema(*fields: PbField) -> PbSchema:
    return PbSchema(tuple(fields))


# ---- varint primitives ------------------------------------------------------

def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def _write_varint(out: bytearray, v: int) -> None:
    v &= (1 << 64) - 1
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _zigzag_dec(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _zigzag_enc(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def _to_signed(v: int, bits: int) -> int:
    v &= (1 << bits) - 1
    return v - (1 << bits) if v >= (1 << (bits - 1)) else v


# ---- decoding ---------------------------------------------------------------

def _decode_scalar(kind: str, wire: int, buf: bytes, pos: int):
    if wire == _VARINT:
        raw, pos = _read_varint(buf, pos)
        if kind in ("sint32", "sint64"):
            return _zigzag_dec(raw), pos
        if kind == "bool":
            return bool(raw), pos
        if kind in ("int32", "int64", "enum"):
            # negatives ride as 64-bit two's-complement varints (spec)
            return _to_signed(raw, 64), pos
        if kind == "uint32":
            return raw & 0xFFFFFFFF, pos
        return raw, pos  # uint64
    if wire == _I64:
        if pos + 8 > len(buf):
            raise ValueError("truncated i64")
        chunk = buf[pos:pos + 8]
        pos += 8
        if kind == "double":
            return struct.unpack("<d", chunk)[0], pos
        if kind == "sfixed64":
            return struct.unpack("<q", chunk)[0], pos
        return struct.unpack("<Q", chunk)[0], pos
    if wire == _I32:
        if pos + 4 > len(buf):
            raise ValueError("truncated i32")
        chunk = buf[pos:pos + 4]
        pos += 4
        if kind == "float":
            return struct.unpack("<f", chunk)[0], pos
        if kind == "sfixed32":
            return struct.unpack("<i", chunk)[0], pos
        return struct.unpack("<I", chunk)[0], pos
    raise ValueError(f"scalar kind {kind} with wire type {wire}")


def _decode_decimal(f: PbField, payload) -> int:
    """Carrier value -> unscaled int at f.scale (half-up rounding)."""
    from decimal import ROUND_HALF_UP, Decimal
    if f.carrier == "string":
        s = payload.decode("utf-8") if isinstance(payload, bytes) else \
            str(payload)
        d = Decimal(s)
    else:
        d = Decimal(str(payload))
    q = d.scaleb(f.scale).quantize(Decimal(1), rounding=ROUND_HALF_UP)
    return int(q)


def _skip(wire: int, buf: bytes, pos: int) -> int:
    """Skip one unknown field (pb_deserializer.rs skip_pb_value analog)."""
    if wire == _VARINT:
        _, pos = _read_varint(buf, pos)
        return pos
    if wire == _I64:
        return pos + 8
    if wire == _I32:
        return pos + 4
    if wire == _LEN:
        n, pos = _read_varint(buf, pos)
        return pos + n
    if wire == _SGROUP:  # legacy groups: skip to matching end-group
        while True:
            key, pos = _read_varint(buf, pos)
            w = key & 7
            if w == _EGROUP:
                return pos
            pos = _skip(w, buf, pos)
    raise ValueError(f"cannot skip wire type {wire}")


def decode(sch: PbSchema, buf: bytes) -> Dict[str, Any]:
    """One message -> dict. Repeated fields -> lists (packed and unpacked
    occurrences accumulate into the same list, per spec); sub-messages ->
    nested dicts (repeated sub-messages -> list of dicts); decimal ->
    unscaled int."""
    out: Dict[str, Any] = {}
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        fnum, wire = key >> 3, key & 7
        f = sch.by_number.get(fnum)
        if f is None:
            pos = _skip(wire, buf, pos)
            continue
        if f.kind == "message":
            if wire != _LEN:
                raise ValueError(f"message field {f.name} wire {wire}")
            ln, pos = _read_varint(buf, pos)
            sub = decode(f.message, buf[pos:pos + ln])
            pos += ln
            if f.repeated:
                out.setdefault(f.name, []).append(sub)
            else:
                out[f.name] = sub
            continue
        if f.kind == "decimal":
            carrier_kind = {"string": "string", "double": "double",
                            "int64": "int64"}[f.carrier]
            ewire = _SCALAR_WIRE[carrier_kind]
        else:
            carrier_kind = f.kind
            ewire = _SCALAR_WIRE[f.kind]
        if wire == _LEN and ewire != _LEN:
            # packed repeated scalars: a length-delimited run of values
            ln, pos = _read_varint(buf, pos)
            end = pos + ln
            vals = out.setdefault(f.name, []) if f.repeated else None
            while pos < end:
                v, pos = _decode_scalar(carrier_kind, ewire, buf, pos)
                if f.kind == "decimal":
                    v = _decode_decimal(f, v)
                if vals is not None:
                    vals.append(v)
                else:
                    out[f.name] = v
            continue
        if ewire == _LEN:
            ln, pos = _read_varint(buf, pos)
            payload = buf[pos:pos + ln]
            pos += ln
            if f.kind == "decimal":
                v: Any = _decode_decimal(f, payload)
            elif carrier_kind == "string":
                v = payload.decode("utf-8", errors="replace")
            else:
                v = bytes(payload)
        else:
            if wire != ewire:
                raise ValueError(
                    f"field {f.name}: wire {wire} != expected {ewire}")
            v, pos = _decode_scalar(carrier_kind, ewire, buf, pos)
            if f.kind == "decimal":
                v = _decode_decimal(f, v)
        if f.repeated:
            out.setdefault(f.name, []).append(v)
        else:
            out[f.name] = v
    return out


# ---- encoding (test vectors / fake-broker payloads) ------------------------

def encode(sch: PbSchema, obj: Dict[str, Any]) -> bytes:
    out = bytearray()
    for f in sch.fields:
        if f.name not in obj or obj[f.name] is None:
            continue
        vals = obj[f.name] if f.repeated else [obj[f.name]]
        if f.kind == "message":
            for v in vals:
                sub = encode(f.message, v)
                _write_varint(out, (f.number << 3) | _LEN)
                _write_varint(out, len(sub))
                out.extend(sub)
            continue
        kind = {"string": "string", "double": "double",
                "int64": "int64"}[f.carrier] if f.kind == "decimal" \
            else f.kind
        wire = _SCALAR_WIRE[kind]
        if f.repeated and wire != _LEN:
            # canonical proto3: packed
            body = bytearray()
            for v in vals:
                _encode_scalar(body, kind, f, v)
            _write_varint(out, (f.number << 3) | _LEN)
            _write_varint(out, len(body))
            out.extend(body)
            continue
        for v in vals:
            _write_varint(out, (f.number << 3) | wire)
            if wire == _LEN:
                if f.kind == "decimal":
                    v = _decimal_carrier_str(f, v)
                payload = v.encode("utf-8") if isinstance(v, str) else bytes(v)
                _write_varint(out, len(payload))
                out.extend(payload)
            else:
                _encode_scalar(out, kind, f, v)
    return bytes(out)


def _decimal_carrier_str(f: PbField, v) -> str:
    from decimal import Decimal
    if isinstance(v, int):  # unscaled int at f.scale
        return str(Decimal(v).scaleb(-f.scale))
    return str(v)


def _encode_scalar(out: bytearray, kind: str, f: PbField, v) -> None:
    if f.kind == "decimal" and kind == "double":
        v = float(v) / 10 ** f.scale if isinstance(v, int) else float(v)
    if f.kind == "decimal" and kind == "int64":
        v = int(v)
    if kind in ("sint32", "sint64"):
        _write_varint(out, _zigzag_enc(int(v)))
    elif kind in ("int32", "int64", "uint32", "uint64", "enum"):
        _write_varint(out, int(v))
    elif kind == "bool":
        _write_varint(out, 1 if v else 0)
    elif kind == "double":
        out.extend(struct.pack("<d", float(v)))
    elif kind == "float":
        out.extend(struct.pack("<f", float(v)))
    elif kind == "fixed64":
        out.extend(struct.pack("<Q", int(v)))
    elif kind == "sfixed64":
        out.extend(struct.pack("<q", int(v)))
    elif kind == "fixed32":
        out.extend(struct.pack("<I", int(v)))
    elif kind == "sfixed32":
        out.extend(struct.pack("<i", int(v)))
    else:
        raise ValueError(f"cannot encode scalar kind {kind}")


# ---- micro-batch deserializer ----------------------------------------------

def _walk_dicts(obj, parts):
    for p in parts:
        if not isinstance(obj, dict) or p not in obj:
            return None
        obj = obj[p]
    return obj


def _set_path(obj, parts, v) -> None:
    for p in parts[:-1]:
        if not isinstance(obj, dict) or p not in obj:
            return
        obj = obj[p]
    if isinstance(obj, dict) and parts[-1] in obj:
        obj[parts[-1]] = v


class PbWireDeserializer:
    """Raw-wire protobuf micro-batch deserializer.

    ``fields`` are serde.FieldSpec columns whose dot-paths walk the
    decoded dicts; a path resolving to a LIST (repeated field) columnizes
    as the engine's plane pair (``name#vals`` [cap, max_len] +
    ``name#len``) ready for explode; decimal64-typed columns read the
    already-unscaled ints from "decimal" schema fields directly.
    """

    def __init__(self, sch: PbSchema, fields, metadata: Sequence[str] = (),
                 max_list_len: int = 16):
        self.schema = sch
        self.fields = list(fields)
        self.metadata = list(metadata)
        self.max_list_len = int(max_list_len)

    def _terminal(self, parts) -> Optional[PbField]:
        """The PbField a dot-path lands on (None if off-schema)."""
        sch = self.schema
        pf = None
        for p in parts:
            pf = next((f for f in sch.fields if f.name == p), None)
            if pf is None:
                return None
            sch = pf.message if pf.message is not None else sch
        return pf

    def __call__(self, records, capacity: Optional[int] = None):
        from auron_tpu.block import TableBlock, round_capacity
        from auron_tpu.dtypes import INT32
        from .serde import _columnize, _walk

        scalar_fields = []
        list_fields = []
        decoded: List[Dict[str, Any]] = []
        for r in records:
            try:
                decoded.append(decode(self.schema, r.value))
            except ValueError:
                decoded.append({})  # lenient: bad record -> nulls
        # decimal schema fields decode to UNSCALED ints; hand _coerce an
        # exact Decimal so the column lands bit-exact at the spec scale
        from decimal import Decimal
        for f in self.fields:
            pf = self._terminal(f.parts)
            if pf is not None and pf.kind == "decimal":
                for d in decoded:
                    v = _walk_dicts(d, f.parts)
                    if isinstance(v, int):
                        _set_path(d, f.parts,
                                  Decimal(v).scaleb(-pf.scale))
        for f in self.fields:
            probe = next((_walk(d, f.parts) for d in decoded
                          if _walk(d, f.parts) is not None), None)
            (list_fields if isinstance(probe, list)
             else scalar_fields).append(f)
        rows = [tuple(_walk(d, f.parts) for f in scalar_fields)
                for d in decoded]
        block = _columnize(rows, records, scalar_fields, self.metadata,
                           capacity)
        if not list_fields:
            return block
        from auron_tpu.block import Column
        import jax.numpy as jnp
        n = len(decoded)
        extra = {}
        for f in list_fields:
            ml = self.max_list_len
            vals = np.zeros((block.capacity, ml), f.dtype.np_dtype)
            lens = np.zeros(block.capacity, np.int32)
            for i, d in enumerate(decoded):
                xs = _walk(d, f.parts) or []
                lens[i] = min(len(xs), ml)
                for j, x in enumerate(xs[:ml]):
                    vals[i, j] = x
            extra[f"{f.name}#vals"] = Column(jnp.asarray(vals), None,
                                             f.dtype, None)
            extra[f"{f.name}#len"] = Column.of(jnp.asarray(lens), INT32)
        return block.with_columns(extra)
