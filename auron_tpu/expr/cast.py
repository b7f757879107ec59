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


def cast_column(col: Column, to: DataType, capacity: int,
                domain=None) -> Column:
    src = col.dtype
    if src.name == to.name and src.params == to.params:
        return col
    values, validity = col.values, col.validity

    if src.is_raw_string or to.is_raw_string:
        from auron_tpu.expr import strings_raw as SR
        if src.is_raw_string and to.is_raw_string:
            w = to.params[0]
            if w < src.params[0]:
                raise ValueError("narrowing a raw string plane set could "
                                 "truncate — widen only")
            return Column(SR.pad_planes(values, w), validity, to, None)
        if src.is_string and to.is_raw_string:
            return Column(SR.dict_column_as_planes(col, to.params[0]),
                          validity, to, None)
        # raw -> dictionary string / anything else: decode at the host
        # boundary (eager only), then continue with the dictionary matrix
        as_dict = SR.to_dictionary_column(col)
        return as_dict if to.is_string \
            else cast_column(as_dict, to, capacity, domain)

    if src.is_string and not to.is_string:
        return _cast_from_string(col, to)

    if to.is_string:
        return _cast_to_string(col, domain)

    if to.name == "bool":
        if src.name in ("date32", "timestamp64"):
            raise NotImplementedError(f"cast {src!r} -> bool (Spark disallows)")
        if src.name == "decimal128":
            hi, lo = values[..., 0], values[..., 1]
            return Column.of((hi != 0) | (lo != 0), BOOL, validity)
        out = values.astype(jnp.float64) != 0 if src.is_float else values != 0
        return Column.of(out.astype(jnp.bool_), BOOL, validity)

    if src.name == "decimal128" or to.name == "decimal128":
        return _cast_decimal128(col, to)

    if src.name == "decimal64" or to.name == "decimal64":
        return _cast_decimal(col, to)

    if to.name == "date32" and src.is_float:
        raise NotImplementedError("cast float -> date32 (Spark disallows)")

    # timestamp conversions (Spark: timestamp <-> long is SECONDS; the
    # internal representation is microseconds; date <-> timestamp at UTC
    # midnight — reference cast.rs timestamp arms)
    US_PER_DAY = np.int64(86_400_000_000)
    if src.name == "date32" and to.name == "timestamp64":
        return Column.of(values.astype(jnp.int64) * US_PER_DAY, to, validity)
    if src.name == "timestamp64" and to.name == "date32":
        out = jnp.floor_divide(values, US_PER_DAY).astype(jnp.int32)
        return Column.of(out, to, validity)
    if src.name == "timestamp64" and (to.is_integer or to.is_float):
        if to.is_float:
            out = values.astype(jnp.float64) / 1e6
            return Column.of(out.astype(to.jnp_dtype), to, validity)
        out = jnp.floor_divide(values, np.int64(1_000_000))
        return Column.of(out.astype(to.jnp_dtype), to, validity)
    if to.name == "timestamp64" and (src.is_integer or src.is_float
                                     or src.name == "bool"):
        if src.is_float:
            scaled = values.astype(jnp.float64) * 1e6
            ok = jnp.isfinite(scaled) & (jnp.abs(scaled) < 2.0 ** 63)
            out = jnp.where(ok, scaled, 0.0).astype(jnp.int64)
            v = ok if validity is None else (validity & ok)
            return Column.of(out, to, v)
        out = values.astype(jnp.int64) * np.int64(1_000_000)
        return Column.of(out, to, validity)

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


def _cast_decimal128(col: Column, to: DataType) -> Column:
    """Casts where either side is a wide decimal (reference cast.rs
    Decimal128 arms). Values travel as 128-bit limb planes
    (ops/decimal128.py); overflow -> NULL (TryCast)."""
    from auron_tpu.ops import decimal128 as d128
    src = col.dtype
    validity = col.validity

    def _limbs(c: Column):
        if c.dtype.name == "decimal128":
            return d128.hi_lo(c.values)
        return d128.from_i64(c.values)  # decimal64 scaled int64

    if src.is_decimal and to.is_decimal:
        s_from, s_to = src.params[1], to.params[1]
        hi, lo = _limbs(col)
        if s_to >= s_from:
            hi, lo = d128.mul_pow10(hi, lo, s_to - s_from)
        else:
            hi, lo = d128.div_pow10_round(hi, lo, s_from - s_to)
        ok = d128.fits_precision(hi, lo, to.params[0])
        validity = ok if validity is None else (validity & ok)
        if to.name == "decimal64":
            return Column.of(lo, to, validity)  # p<=18 fits one limb
        return Column.of(d128.pack(hi, lo), to, validity)

    if src.name == "decimal128":
        scale = src.params[1]
        hi, lo = d128.hi_lo(col.values)
        if to.is_float:
            out = d128.to_f64(hi, lo) / float(10 ** scale)
            return Column.of(out.astype(to.jnp_dtype), to, validity)
        if to.is_integer:
            qh, ql = d128.div_pow10_round(hi, lo, scale, half_up=False)
            ql64, ok = d128.to_i64_clamped(qh, ql)
            validity = ok if validity is None else (validity & ok)
            return Column.of(ql64.astype(to.jnp_dtype), to, validity)
        raise NotImplementedError(f"cast {src!r} -> {to!r}")

    # -> decimal128
    scale, prec = to.params[1], to.params[0]
    if src.is_integer or src.name == "bool":
        hi, lo = d128.from_i64(col.values.astype(jnp.int64))
        hi, lo = d128.mul_pow10(hi, lo, scale)
        ok = d128.fits_precision(hi, lo, prec)
        validity = ok if validity is None else (validity & ok)
        return Column.of(d128.pack(hi, lo), to, validity)
    if src.is_float:
        scaled = col.values.astype(jnp.float64) * float(10 ** scale)
        ok = jnp.isfinite(scaled) & (jnp.abs(scaled) < 2.0 ** 126)
        hi, lo = d128.from_f64(jnp.where(ok, scaled, 0.0))
        ok = ok & d128.fits_precision(hi, lo, prec)
        validity = ok if validity is None else (validity & ok)
        return Column.of(d128.pack(hi, lo), to, validity)
    raise NotImplementedError(f"cast {src!r} -> {to!r}")


# ---------------------------------------------------------------------------
# Cast TO string (reference cast.rs's *-to-Utf8 arm). Strings in this engine
# are host dictionaries + int32 codes, so the cast builds a dictionary:
#  * concrete values (eager mode): format only the DISTINCT source values
#    host-side (np.unique bounds the Python loop), codes = unique inverse;
#  * traced values (whole-plan jit): bool uses a static 2-entry dictionary;
#    int/date casts use the plan-time domain hint (plan/stats.py fills
#    Cast.domain from table stats) to precompute the dictionary for the
#    whole value range — codes are then a pure on-device subtraction.
# ---------------------------------------------------------------------------

def _cast_to_string(col: Column, domain=None) -> Column:
    src = col.dtype
    if src.is_string:
        return col
    if src.name == "bool":
        d = np.array(["false", "true"], dtype=object)
        return Column(col.values.astype(jnp.int32), col.validity, STRING, d)
    if _is_traced(col.values):
        if domain is not None and (src.is_integer or
                                   src.name in ("date32", "timestamp64")):
            lo, hi = int(domain[0]), int(domain[1])
            span = hi - lo
            if span <= (1 << 22):
                d = np.array([_format_value(v, src) for v in range(lo, hi)],
                             dtype=object)
                codes = (col.values.astype(jnp.int64) - lo)
                in_rng = (codes >= 0) & (codes < span)
                codes = jnp.clip(codes, 0, span - 1).astype(jnp.int32)
                validity = in_rng if col.validity is None \
                    else (col.validity & in_rng)
                return Column(codes, validity, STRING, d)
        raise NotImplementedError(
            f"cast {src!r} -> string under tracing needs a plan-time domain "
            "hint (plan/stats.py) or eager execution")
    vals = np.asarray(col.values)
    if src.name == "decimal128":
        from auron_tpu.ops import decimal128 as d128
        ints = np.array(d128.np_to_ints(vals), dtype=object)
        uniq, inv = np.unique(ints, return_inverse=True)
        d = np.array([_format_decimal_str(int(v), src.params[1])
                      for v in uniq], dtype=object)
        return Column(jnp.asarray(inv.astype(np.int32)), col.validity,
                      STRING, d)
    if src.is_float:
        # unique() groups NaNs apart; canonicalize them first
        canon = np.where(np.isnan(vals), np.asarray(np.nan, vals.dtype), vals)
        uniq, inv = np.unique(canon, return_inverse=True)
    else:
        uniq, inv = np.unique(vals, return_inverse=True)
    d = np.array([_format_value(v, src) for v in uniq], dtype=object)
    return Column(jnp.asarray(inv.astype(np.int32)), col.validity, STRING, d)


def _format_value(v, dt: DataType) -> str:
    """Spark cast-to-string formatting (cast.rs / Java toString parity)."""
    if dt.is_integer:
        return str(int(v))
    if dt.name == "bool":
        return "true" if v else "false"
    if dt.name == "date32":
        import datetime
        return (datetime.date(1970, 1, 1) +
                datetime.timedelta(days=int(v))).isoformat()
    if dt.name == "timestamp64":
        import datetime
        micros = int(v)
        ts = (datetime.datetime(1970, 1, 1) +
              datetime.timedelta(microseconds=micros))
        base = ts.strftime("%Y-%m-%d %H:%M:%S")
        if ts.microsecond:
            frac = f"{ts.microsecond:06d}".rstrip("0")
            return f"{base}.{frac}"
        return base
    if dt.is_decimal:
        return _format_decimal_str(int(v), dt.params[1])
    if dt.is_float:
        return _java_float_str(float(v), dt.name == "float32")
    raise NotImplementedError(f"format {dt!r} as string")


def _format_decimal_str(u: int, scale: int) -> str:
    """BigDecimal.toPlainString of an unscaled int at a scale."""
    if scale <= 0:
        return str(u * 10 ** (-scale))
    sign = "-" if u < 0 else ""
    a = abs(u)
    return f"{sign}{a // 10 ** scale}.{a % 10 ** scale:0{scale}d}"


def _java_float_str(v: float, single: bool) -> str:
    """Java Double/Float.toString: shortest round-trip digits; plain decimal
    for 1e-3 <= |v| < 1e7, scientific 'd.dddE±x' otherwise."""
    import math
    from decimal import Decimal
    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "Infinity" if v > 0 else "-Infinity"
    neg = math.copysign(1.0, v) < 0
    sign = "-" if neg else ""
    m = abs(v)
    if m == 0.0:
        return sign + "0.0"
    if single:
        short = np.format_float_positional(np.float32(m), unique=True,
                                           trim="-")
    else:
        short = repr(m)
    stag = Decimal(short).as_tuple()
    digits = "".join(map(str, stag.digits)).rstrip("0") or "0"
    e10 = stag.exponent + len(stag.digits) - 1  # exponent of leading digit
    if -3 <= e10 < 7:
        if e10 >= 0:
            intpart = digits[:e10 + 1].ljust(e10 + 1, "0")
            frac = digits[e10 + 1:] or "0"
        else:
            intpart = "0"
            frac = "0" * (-e10 - 1) + digits
        return f"{sign}{intpart}.{frac}"
    mant = digits[0] + "." + (digits[1:] or "0")
    return f"{sign}{mant}E{e10}"


def _cast_from_string(col: Column, to: DataType) -> Column:
    """string->numeric/date: parse the dictionary host-side once, gather."""
    if col.dict_values is None:
        raise ValueError("string cast without dictionary")
    trim = config.conf.get(config.CAST_STRING_TRIM)
    if to.name == "decimal128":
        return _string_to_decimal128(col, to, trim)
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
            elif to.name == "timestamp64":
                parsed[i] = _parse_timestamp_micros(t)
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


def _string_to_decimal128(col: Column, to: DataType, trim: bool) -> Column:
    """Parse the dictionary once host-side into 128-bit limb planes."""
    from decimal import Decimal, ROUND_HALF_UP, localcontext, \
        InvalidOperation
    from auron_tpu.ops import decimal128 as d128
    prec, scale = to.params
    ints = []
    ok = np.zeros(len(col.dict_values), dtype=np.bool_)
    with localcontext() as ctx:
        ctx.prec = 60
        for i, s in enumerate(col.dict_values):
            t = s.strip() if trim else s
            try:
                q = int(Decimal(t).scaleb(scale)
                        .quantize(0, rounding=ROUND_HALF_UP))
                if abs(q) < 10 ** prec:
                    ints.append(q)
                    ok[i] = True
                else:
                    ints.append(0)
            except (InvalidOperation, ValueError, ArithmeticError):
                ints.append(0)
    planes = jnp.asarray(d128.np_from_ints(ints))
    codes = jnp.clip(col.values, 0, len(col.dict_values) - 1)
    out = planes[codes]
    okv = jnp.asarray(ok)[codes]
    validity = okv if col.validity is None else (col.validity & okv)
    if bool(ok.all()) and col.validity is None:
        validity = None
    return Column.of(out, to, validity)


def _parse_date_days(s: str) -> int:
    import datetime
    t = s.strip()
    if len(t) > 10:  # Spark accepts timestamp-shaped strings for date casts
        t = t[:10]
    d = datetime.date.fromisoformat(t)
    return (d - datetime.date(1970, 1, 1)).days


def _parse_timestamp_micros(s: str) -> int:
    import datetime
    t = s.strip()
    if len(t) == 10:  # bare date form
        dt = datetime.datetime.fromisoformat(t + " 00:00:00")
    else:
        dt = datetime.datetime.fromisoformat(t)
    delta = dt - datetime.datetime(1970, 1, 1)
    return int(delta // datetime.timedelta(microseconds=1))


def _is_traced(x) -> bool:
    import jax.core
    return isinstance(x, jax.core.Tracer)
