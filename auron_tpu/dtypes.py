"""Logical data types for the engine.

The reference engine's type system is Arrow's (via DataFusion); ours is a small
logical layer over JAX dtypes, because on TPU every column is a fixed-shape
dense array. Variable-length strings are dictionary-encoded at scan time
(SURVEY.md §7.4.5: TPC-DS join/agg keys are ints/dates/short strings, so
dictionary ids carry the engine), with the dictionary kept host-side for
decode at the result boundary. Decimals with precision <= 18 are scaled int64
(Spark's long-backed decimals).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class DataType:
    """A logical SQL type mapped onto a physical JAX dtype."""

    name: str
    # Physical storage dtype for the values array.
    np_dtype: np.dtype
    # For DECIMAL64: (precision, scale). For STRING: None (dict-encoded int32).
    params: Optional[Tuple] = None

    @property
    def jnp_dtype(self):
        return jnp.dtype(self.np_dtype)

    @property
    def is_numeric(self) -> bool:
        return self.name in (
            "int8", "int16", "int32", "int64", "float32", "float64",
            "decimal64", "decimal128")

    @property
    def is_decimal(self) -> bool:
        return self.name in ("decimal64", "decimal128")

    @property
    def is_integer(self) -> bool:
        return self.name in ("int8", "int16", "int32", "int64")

    @property
    def is_float(self) -> bool:
        return self.name in ("float32", "float64")

    @property
    def is_string(self) -> bool:
        return self.name == "string"

    @property
    def is_raw_string(self) -> bool:
        return self.name == "string_raw"

    @property
    def is_any_string(self) -> bool:
        return self.name in ("string", "string_raw")

    @property
    def byte_width(self) -> int:
        return np.dtype(self.np_dtype).itemsize

    def __repr__(self):
        if self.params:
            return f"{self.name}{self.params}"
        return self.name


BOOL = DataType("bool", np.dtype(np.bool_))
INT8 = DataType("int8", np.dtype(np.int8))
INT16 = DataType("int16", np.dtype(np.int16))
INT32 = DataType("int32", np.dtype(np.int32))
INT64 = DataType("int64", np.dtype(np.int64))
FLOAT32 = DataType("float32", np.dtype(np.float32))
FLOAT64 = DataType("float64", np.dtype(np.float64))
# Days since 1970-01-01, Spark DateType.
DATE32 = DataType("date32", np.dtype(np.int32))
# Microseconds since epoch, Spark TimestampType internal representation.
TIMESTAMP64 = DataType("timestamp64", np.dtype(np.int64))
# Dictionary-encoded string: values are int32 codes into a host-side dictionary.
STRING = DataType("string", np.dtype(np.int32))
# ANSI interval COLUMN types (Spark YearMonthIntervalType months /
# DayTimeIntervalType microseconds) — orderable and summable, unlike
# CalendarInterval (which Spark itself cannot MIN/MAX/SUM). Reference
# surface: auron.proto IntervalYearMonth/IntervalDayTime scalar arms.
INTERVAL_YM = DataType("interval_ym", np.dtype(np.int32))
INTERVAL_DT = DataType("interval_dt", np.dtype(np.int64))


def DECIMAL64(precision: int = 18, scale: int = 2) -> DataType:
    """Spark long-backed decimal (precision <= 18): scaled int64."""
    if precision > 18:
        raise ValueError("decimal64 requires precision <= 18; "
                         "use DECIMAL128 / decimal_type")
    return DataType("decimal64", np.dtype(np.int64), (precision, scale))


def DECIMAL128(precision: int = 38, scale: int = 2) -> DataType:
    """Spark wide decimal (18 < precision <= 38): the reference stores these
    as Arrow Decimal128 (cast.rs decimal arms); here the scaled integer is a
    ``[capacity, 2]`` int64 limb-plane pair (ops/decimal128.py)."""
    if precision > 38:
        raise ValueError("decimal precision > 38 not supported (Spark max)")
    return DataType("decimal128", np.dtype(np.int64), (precision, scale))


def STRING_RAW(n_words: int) -> DataType:
    """Raw byte-plane string (expr/strings_raw.py): UTF-8 bytes packed
    big-endian-orderable into a ``[capacity, n_words]`` int32 plane array —
    the high-cardinality representation with no host dictionary. int32
    lexicographic order over the planes == bytewise string order."""
    return DataType("string_raw", np.dtype(np.int32), (int(n_words),))


def decimal_type(precision: int, scale: int) -> DataType:
    """Narrowest engine decimal for a (precision, scale)."""
    return DECIMAL64(precision, scale) if precision <= 18 \
        else DECIMAL128(precision, scale)


def _adjust_precision_scale(precision: int, scale: int):
    """Spark DecimalPrecision.adjustPrecisionScale (allowPrecisionLoss=true):
    cap at 38 digits, keeping at least min(scale, 6) fractional digits."""
    if precision <= 38:
        return precision, scale
    digits = precision - scale  # integral digits
    min_scale = min(scale, 6)
    adjusted = max(38 - digits, min_scale)
    return 38, adjusted


def decimal_result_type(op: str, p1: int, s1: int, p2: int, s2: int
                        ) -> DataType:
    """Spark's decimal binary-arithmetic result types (DecimalPrecision),
    the contract the reference inherits through Spark's analyzer."""
    if op in ("Plus", "Minus"):
        s = max(s1, s2)
        p = max(p1 - s1, p2 - s2) + s + 1
    elif op == "Multiply":
        s = s1 + s2
        p = p1 + p2 + 1
    elif op == "Divide":
        s = max(6, s1 + p2 + 1)
        p = p1 - s1 + s2 + s
    elif op == "Remainder":
        s = max(s1, s2)
        p = min(p1 - s1, p2 - s2) + s
    else:
        raise ValueError(f"not a decimal arithmetic op: {op}")
    return decimal_type(*_adjust_precision_scale(p, s))


_BY_NAME = {
    "bool": BOOL, "int8": INT8, "int16": INT16, "int32": INT32,
    "int64": INT64, "float32": FLOAT32, "float64": FLOAT64,
    "date32": DATE32, "timestamp64": TIMESTAMP64, "string": STRING,
    "interval_ym": INTERVAL_YM, "interval_dt": INTERVAL_DT,
}


def type_from_name(name: str, params: Optional[Tuple] = None) -> DataType:
    if name == "decimal64":
        return DECIMAL64(*params) if params else DECIMAL64()
    if name == "decimal128":
        return DECIMAL128(*params) if params else DECIMAL128()
    if name == "string_raw":
        return STRING_RAW(*params)
    return _BY_NAME[name]


@dataclass(frozen=True)
class Field:
    name: str
    dtype: DataType
    nullable: bool = True

    def __repr__(self):
        n = "" if self.nullable else " NOT NULL"
        return f"{self.name}: {self.dtype!r}{n}"


@dataclass(frozen=True)
class Schema:
    fields: Tuple[Field, ...]

    def __init__(self, fields):
        object.__setattr__(self, "fields", tuple(fields))

    @property
    def names(self) -> List[str]:
        return [f.name for f in self.fields]

    def field(self, name: str) -> Field:
        for f in self.fields:
            if f.name == name:
                return f
        raise KeyError(name)

    def index(self, name: str) -> int:
        for i, f in enumerate(self.fields):
            if f.name == name:
                return i
        raise KeyError(name)

    def __contains__(self, name: str) -> bool:
        return any(f.name == name for f in self.fields)

    def __len__(self):
        return len(self.fields)

    def __iter__(self):
        return iter(self.fields)

    def __repr__(self):
        return "Schema(" + ", ".join(repr(f) for f in self.fields) + ")"
