"""Spark TryCast semantics (non-ANSI): failures yield NULL, never errors.

Behavior contract from the reference cast matrix
(/root/reference/native-engine/datafusion-ext-commons/src/arrow/cast.rs and
SURVEY.md A.1): int->int wraps two's-complement; float->int truncates toward
zero with NaN->0 and out-of-range clamped to MIN/MAX (Java (long)/(int)
conversion semantics); string->numeric parses with optional whitespace trim,
null on malformed; anything->bool via != 0.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from auron_tpu import config
from auron_tpu.block import Column
from auron_tpu.dtypes import BOOL, DataType, FLOAT64, STRING


def cast_column(col: Column, to: DataType, capacity: int) -> Column:
    src = col.dtype
    if src.name == to.name and src.params == to.params:
        return col
    values, validity = col.values, col.validity

    if src.is_string:
        return _cast_from_string(col, to)

    if to.is_string:
        raise NotImplementedError("cast to string lands with varlen output support")

    if src.name == "decimal64" or to.name == "decimal64":
        return _cast_decimal(col, to)

    if to.name == "bool":
        out = values.astype(jnp.float64) != 0 if src.is_float else values != 0
        return Column.of(out.astype(jnp.bool_), BOOL, validity)

    if src.is_float and to.is_integer:
        # Java (int)/(long) conversion: NaN -> 0, +-inf / out-of-range clamp.
        info = np.iinfo(to.np_dtype)
        v = values
        nan = jnp.isnan(v)
        clipped = jnp.clip(v, float(info.min), float(info.max))
        out = jnp.where(nan, 0, clipped.astype(to.jnp_dtype))
        return Column.of(out, to, validity)

    # int->int (wraps), int->float, float->float, bool->numeric, date<->int
    return Column.of(values.astype(to.jnp_dtype), to, validity)


def _cast_decimal(col: Column, to: DataType) -> Column:
    src = col.dtype
    if src.name == "decimal64" and to.name == "decimal64":
        _, s_from = src.params
        _, s_to = to.params
        if s_to >= s_from:
            out = col.values * np.int64(10 ** (s_to - s_from))
        else:
            # Spark HALF_UP rounding on scale reduction
            div = np.int64(10 ** (s_from - s_to))
            half = div // 2
            out = jnp.where(col.values >= 0,
                            (col.values + half) // div,
                            -((-col.values + half) // div))
        return Column.of(out, to, col.validity)
    if src.name == "decimal64":
        _, scale = src.params
        if to.is_float:
            out = col.values.astype(jnp.float64) / float(10 ** scale)
            return Column.of(out.astype(to.jnp_dtype), to, col.validity)
        if to.is_integer:
            out = col.values // np.int64(10 ** scale)  # truncate toward -inf?
            # Spark decimal->int truncates toward zero:
            out = jnp.where(col.values >= 0, out,
                            -((-col.values) // np.int64(10 ** scale)))
            return Column.of(out.astype(to.jnp_dtype), to, col.validity)
    if to.name == "decimal64":
        _, scale = to.params
        mul = np.int64(10 ** scale)
        if src.is_integer or src.name == "bool":
            out = col.values.astype(jnp.int64) * mul
            return Column.of(out, to, col.validity)
        if src.is_float:
            # HALF_UP on the scaled value; overflow -> null (TryCast)
            scaled = col.values.astype(jnp.float64) * mul.astype(jnp.float64)
            ok = jnp.isfinite(scaled) & (jnp.abs(scaled) < 2.0 ** 63)
            rounded = jnp.where(scaled >= 0, jnp.floor(scaled + 0.5),
                                jnp.ceil(scaled - 0.5))
            out = jnp.where(ok, rounded, 0.0).astype(jnp.int64)
            validity = col.valid_at() & ok if col.validity is not None else ok
            allv = bool(np.all(np.asarray(ok))) if not _is_traced(ok) else False
            return Column.of(out, to, None if allv else validity)
    raise NotImplementedError(f"cast {src!r} -> {to!r}")


def _cast_from_string(col: Column, to: DataType) -> Column:
    """string->numeric/date: parse the dictionary host-side once, gather."""
    if col.dict_values is None:
        raise ValueError("string cast without dictionary")
    trim = config.conf.get(config.CAST_STRING_TRIM)
    parsed = np.zeros(len(col.dict_values), dtype=to.np_dtype)
    ok = np.zeros(len(col.dict_values), dtype=np.bool_)
    for i, s in enumerate(col.dict_values):
        t = s.strip() if trim else s
        try:
            if to.is_integer:
                # Spark: "3.7" -> 3 for int casts? No: string->int requires
                # integral form; fractional strings are null in TryCast.
                parsed[i] = int(t)
            elif to.is_float:
                parsed[i] = float(t)
            elif to.name == "date32":
                parsed[i] = _parse_date_days(t)
            elif to.name == "decimal64":
                _, scale = to.params
                from decimal import Decimal, ROUND_HALF_UP
                q = Decimal(t).scaleb(scale).quantize(0, rounding=ROUND_HALF_UP)
                parsed[i] = int(q)
            elif to.name == "bool":
                tl = t.lower()
                if tl in ("t", "true", "y", "yes", "1"):
                    parsed[i] = True
                elif tl in ("f", "false", "n", "no", "0"):
                    parsed[i] = False
                else:
                    continue
            else:
                continue
            ok[i] = True
        except (ValueError, OverflowError, ArithmeticError):
            pass
    codes = jnp.clip(col.values, 0, len(col.dict_values) - 1)
    out = jnp.asarray(parsed)[codes]
    okv = jnp.asarray(ok)[codes]
    validity = okv if col.validity is None else (col.validity & okv)
    if bool(ok.all()) and col.validity is None:
        validity = None
    return Column.of(out, to, validity)


def _parse_date_days(s: str) -> int:
    import datetime
    d = datetime.date.fromisoformat(s.strip())
    return (d - datetime.date(1970, 1, 1)).days


def _is_traced(x) -> bool:
    import jax.core
    return isinstance(x, jax.core.Tracer)
