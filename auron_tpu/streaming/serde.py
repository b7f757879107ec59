"""Record deserializers: raw source payloads -> one TableBlock per
micro-batch (the reference's flink/serde/{json_deserializer.rs:1091,
pb_deserializer.rs:2836} re-designed for block columns).

The reference decodes row-by-row into Arrow builders inside the operator;
here decoding is a host-side columnar pass (the device never sees bytes —
architecture invariant), producing fixed-capacity numpy planes + string
dictionaries that upload as ONE block. Lenient semantics match the
reference: missing fields, nulls, and type mismatches decode as NULL
rather than failing the batch (json_deserializer.rs fail-on-missing=false
path).
"""

from __future__ import annotations

import json
from typing import Any, Callable, List, Optional, Sequence, Tuple

import numpy as np

from auron_tpu.block import TableBlock, round_capacity
from auron_tpu.dtypes import (BOOL, DATE32, FLOAT64, INT64, STRING,
                              TIMESTAMP64, DataType)

from .source import Record


class FieldSpec:
    """One output column: name, dtype, and a dot-path into the record
    (``a.b.c`` walks nested objects/messages; default: the name)."""

    def __init__(self, name: str, dtype: DataType,
                 path: Optional[str] = None):
        self.name = name
        self.dtype = dtype
        self.parts = tuple((path or name).split("."))


# metadata pseudo-columns every deserializer can inject (the reference
# exposes these as Kafka connector metadata columns)
_META = {
    "__topic": (STRING, lambda r: r.topic),
    "__partition": (INT64, lambda r: r.partition),
    "__offset": (INT64, lambda r: r.offset),
    "__timestamp": (TIMESTAMP64, lambda r: r.timestamp_us),
}


def _walk(obj: Any, parts: Tuple[str, ...]) -> Any:
    for p in parts:
        if not isinstance(obj, dict) or p not in obj:
            return None
        obj = obj[p]
    return obj


def _coerce(v: Any, dt: DataType):
    """Python value -> (numpy scalar, valid) with lenient NULL semantics."""
    if v is None:
        return 0, False
    try:
        if dt.name == "string":
            return str(v), True
        if dt.name == "bool":
            if isinstance(v, str):
                lv = v.strip().lower()
                if lv in ("true", "1"):
                    return True, True
                if lv in ("false", "0"):
                    return False, True
                return False, False
            return bool(v), True
        if dt.is_float:
            return float(v), True
        if dt.name == "date32":
            return np.datetime64(str(v), "D").astype(np.int32), True
        if dt.name == "timestamp64":
            if isinstance(v, (int, float)):  # epoch micros pass through
                return int(v), True
            return np.datetime64(str(v), "us").astype(np.int64), True
        if dt.name == "decimal64":
            scale = dt.params[1]
            from decimal import ROUND_HALF_UP, Decimal
            if isinstance(v, Decimal):  # exact (pbwire decimal fields)
                return int(v.scaleb(scale).to_integral_value(
                    rounding=ROUND_HALF_UP)), True
            return int(round(float(v) * 10 ** scale)), True
        return int(v), True
    except (TypeError, ValueError):
        return 0, False


def _columnize(rows: List[Tuple[Any, ...]], records: Sequence[Record],
               fields: Sequence[FieldSpec], metadata: Sequence[str],
               capacity: Optional[int]) -> TableBlock:
    n = len(rows)
    cap = capacity or round_capacity(max(n, 1))
    data, validity, dicts, dtypes = {}, {}, {}, {}
    cols = list(zip(*rows)) if rows else [[] for _ in fields]
    for f, cells in zip(fields, cols):
        vals = [_coerce(c, f.dtype) for c in cells]
        ok = np.array([v[1] for v in vals], dtype=np.bool_)
        if f.dtype.name == "string":
            raw = np.array([v[0] if v[1] else "" for v in vals],
                           dtype=object)
            uniq, codes = np.unique(raw.astype(str), return_inverse=True)
            data[f.name] = codes.astype(np.int32)
            dicts[f.name] = uniq
        else:
            data[f.name] = np.array([v[0] for v in vals],
                                    dtype=f.dtype.np_dtype)
        validity[f.name] = ok
        dtypes[f.name] = f.dtype
    for m in metadata:
        dt, get = _META[m]
        raw = [get(r) for r in records]
        if dt.name == "string":
            uniq, codes = np.unique(np.array(raw, dtype=str),
                                    return_inverse=True)
            data[m] = codes.astype(np.int32)
            dicts[m] = uniq
        else:
            data[m] = np.array(raw, dtype=dt.np_dtype)
        dtypes[m] = dt
    if not data:
        raise ValueError("deserializer produced no columns")
    return TableBlock.from_numpy(data, dtypes=dtypes, capacity=cap,
                                 validity=validity, dictionaries=dicts)


class JsonDeserializer:
    """JSON-lines payloads -> block (json_deserializer.rs:1091 analog)."""

    def __init__(self, fields: Sequence[FieldSpec],
                 metadata: Sequence[str] = ()):
        self.fields = list(fields)
        self.metadata = list(metadata)

    def __call__(self, records: Sequence[Record],
                 capacity: Optional[int] = None) -> TableBlock:
        rows = []
        for r in records:
            try:
                obj = json.loads(r.value)
            except (ValueError, UnicodeDecodeError):
                obj = {}
            rows.append(tuple(_walk(obj, f.parts) for f in self.fields))
        return _columnize(rows, records, self.fields, self.metadata,
                          capacity)


class PbDeserializer:
    """Protobuf payloads -> block (pb_deserializer.rs:2836 analog).

    ``message_cls`` is a generated ``google.protobuf`` message class; field
    paths walk nested submessages. Unset scalar fields decode as the proto3
    default (the reference's behavior), unset submessages as NULL.
    """

    def __init__(self, message_cls, fields: Sequence[FieldSpec],
                 metadata: Sequence[str] = ()):
        self.message_cls = message_cls
        self.fields = list(fields)
        self.metadata = list(metadata)

    def _get(self, msg, parts: Tuple[str, ...]):
        for i, p in enumerate(parts):
            if msg is None or not hasattr(msg, p):
                return None
            if i < len(parts) - 1 and hasattr(msg, "HasField"):
                try:
                    if not msg.HasField(p):
                        return None
                except ValueError:
                    pass  # repeated / non-optional: getattr below
            msg = getattr(msg, p)
        return msg

    def __call__(self, records: Sequence[Record],
                 capacity: Optional[int] = None) -> TableBlock:
        rows = []
        for r in records:
            msg = self.message_cls()
            try:
                msg.ParseFromString(r.value)
            except Exception:  # noqa: BLE001 — lenient: bad record -> nulls
                msg = None
            rows.append(tuple(
                self._get(msg, f.parts) if msg is not None else None
                for f in self.fields))
        return _columnize(rows, records, self.fields, self.metadata,
                          capacity)


Deserializer = Callable[[Sequence[Record], Optional[int]], TableBlock]
