"""Scalar function registry.

Covers the capability surface of the reference's function kernels
(/root/reference/native-engine/datafusion-ext-functions/src/: spark_dates.rs,
spark_strings.rs, spark_round.rs, spark_hash.rs, spark_null_if.rs,
spark_isnan.rs, ...) re-expressed as fused jnp lane ops. Dates are civil-date
integer arithmetic on days-since-epoch (no host round-trips); strings go
through the dictionary machinery in strings.py.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax.numpy as jnp
import numpy as np

from auron_tpu.block import Column, TableBlock
from auron_tpu.dtypes import (BOOL, DATE32, DataType, FLOAT64, INT32, INT64,
                              STRING)
from auron_tpu.expr import nodes as N
from auron_tpu.expr import strings as S

_REGISTRY: Dict[str, Callable] = {}


def register(name):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn
    return deco


# kernels that take planes as-is (device-native or self-converting)
_RAW_NATIVE = {"length", "interval_add", "upper", "lower", "substring"}


def dispatch_function(expr: N.ScalarFunc, block: TableBlock) -> Column:
    from auron_tpu.expr.eval import evaluate
    fn = _REGISTRY.get(expr.name)
    if fn is None:
        raise NotImplementedError(f"scalar function {expr.name}")
    args = [evaluate(a, block) for a in expr.args]
    if expr.name not in _RAW_NATIVE:
        # text kernels run on dictionaries: raw byte-plane columns convert
        # at eager boundaries (strings_raw.to_dictionary_column); the hot
        # paths (filter/join/agg/sort keys) never reach here
        from auron_tpu.expr import strings_raw as SR
        args = [SR.to_dictionary_column(a)
                if isinstance(a, Column) and a.dtype.is_raw_string else a
                for a in args]
    return fn(block, *args, *expr.params)


# -- civil date arithmetic (Howard Hinnant's algorithms, integer-only) -------

def _civil_from_days(days):
    """days since 1970-01-01 -> (year, month, day), vectorized int32."""
    z = days.astype(jnp.int64) + 719468
    era = z // 146097
    doe = z - era * 146097
    yoe = (doe - doe // 1460 + doe // 36524 - doe // 146096) // 365
    y = yoe + era * 400
    doy = doe - (365 * yoe + yoe // 4 - yoe // 100)
    mp = (5 * doy + 2) // 153
    d = doy - (153 * mp + 2) // 5 + 1
    m = mp + jnp.where(mp < 10, 3, -9)
    y = y + (m <= 2)
    return y.astype(jnp.int32), m.astype(jnp.int32), d.astype(jnp.int32)


def _days_from_civil(y, m, d):
    y = y.astype(jnp.int64) - (m <= 2)
    era = jnp.where(y >= 0, y, y - 399) // 400
    yoe = y - era * 400
    mp = jnp.where(m > 2, m - 3, m + 9).astype(jnp.int64)
    doy = (153 * mp + 2) // 5 + d.astype(jnp.int64) - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    return (era * 146097 + doe - 719468).astype(jnp.int32)


def _date_part(which):
    def fn(block, c: Column) -> Column:
        y, m, d = _civil_from_days(c.values)
        out = {"year": y, "month": m, "day": d}[which]
        return Column.of(out, INT32, c.validity)
    return fn


register("year")(_date_part("year"))
register("month")(_date_part("month"))
register("day")(_date_part("day"))
register("dayofmonth")(_date_part("day"))


@register("quarter")
def _quarter(block, c: Column) -> Column:
    _, m, _ = _civil_from_days(c.values)
    return Column.of((m - 1) // 3 + 1, INT32, c.validity)


@register("dayofweek")
def _dayofweek(block, c: Column) -> Column:
    # Spark: 1 = Sunday ... 7 = Saturday; epoch day 0 was a Thursday (=5)
    dow = (c.values.astype(jnp.int64) + 4) % 7  # 0=Sunday
    dow = jnp.where(dow < 0, dow + 7, dow)
    return Column.of((dow + 1).astype(jnp.int32), INT32, c.validity)


@register("dayofyear")
def _dayofyear(block, c: Column) -> Column:
    y, _, _ = _civil_from_days(c.values)
    jan1 = _days_from_civil(y, jnp.ones_like(y), jnp.ones_like(y))
    return Column.of((c.values - jan1 + 1).astype(jnp.int32), INT32, c.validity)


@register("date_add")
def _date_add(block, c: Column, n: Column) -> Column:
    from auron_tpu.expr.eval import _combine_validity
    out = (c.values.astype(jnp.int64) + n.values.astype(jnp.int64))
    return Column.of(out.astype(jnp.int32), DATE32, _combine_validity(c, n))


@register("date_sub")
def _date_sub(block, c: Column, n: Column) -> Column:
    from auron_tpu.expr.eval import _combine_validity
    out = (c.values.astype(jnp.int64) - n.values.astype(jnp.int64))
    return Column.of(out.astype(jnp.int32), DATE32, _combine_validity(c, n))


@register("datediff")
def _datediff(block, a: Column, b: Column) -> Column:
    from auron_tpu.expr.eval import _combine_validity
    return Column.of((a.values - b.values).astype(jnp.int32), INT32,
                     _combine_validity(a, b))


@register("last_day")
def _last_day(block, c: Column) -> Column:
    y, m, _ = _civil_from_days(c.values)
    ny = jnp.where(m == 12, y + 1, y)
    nm = jnp.where(m == 12, 1, m + 1)
    first_next = _days_from_civil(ny, nm, jnp.ones_like(nm))
    return Column.of((first_next - 1).astype(jnp.int32), DATE32, c.validity)


def _month_end_days(y, m):
    ny = jnp.where(m == 12, y + 1, y)
    nm = jnp.where(m == 12, 1, m + 1)
    return _days_from_civil(ny, nm, jnp.ones_like(nm)) - \
        _days_from_civil(y, m, jnp.ones_like(m))


def _shift_months_clamped(day32, n):
    """days-since-epoch + n months, day-of-month clamped to the target
    month's end (Spark add_months / CalendarInterval month semantics)."""
    y, m, d = _civil_from_days(day32)
    tot = (y.astype(jnp.int64) * 12 + (m - 1) + n)
    ny = (tot // 12).astype(jnp.int32)
    nm = (tot % 12 + 1).astype(jnp.int32)
    dmax = _month_end_days(ny, nm)
    nd = jnp.minimum(d, dmax.astype(jnp.int32))
    return _days_from_civil(ny, nm, nd)


@register("add_months")
def _add_months(block, c: Column, n) -> Column:
    """Spark add_months: day clamps to the target month's end
    (spark_dates.rs add_months arm)."""
    nn = n.values if isinstance(n, Column) else jnp.asarray(int(n))
    validity = c.validity
    if isinstance(n, Column) and n.validity is not None:
        validity = n.validity if validity is None else (validity & n.validity)
    return Column.of(_shift_months_clamped(c.values, nn), DATE32, validity)


_US_PER_DAY = 86_400_000_000


@register("interval_add")
def _interval_add(block, c: Column, months: int, days: int, micros: int,
                  sign: int = 1) -> Column:
    """date/timestamp ± CalendarInterval(months, days, micros).

    Spark semantics (reference DateAddInterval / TimeAdd, converted at
    NativeConverters.scala date-arithmetic arms; month math matches
    spark_dates.rs add_months day-clamping): the month component shifts the
    civil month with end-of-month clamping, then days and microseconds are
    plain arithmetic. date ± an interval with a sub-day component is a
    timestamp in Spark — represented here by promoting to timestamp64."""
    from auron_tpu.dtypes import TIMESTAMP64
    months, days, micros = sign * months, sign * days, sign * micros
    if c.dtype.name == "date32":
        vals = c.values
        if months:
            vals = _shift_months_clamped(vals, months)
        if days:
            vals = (vals.astype(jnp.int64) + days).astype(jnp.int32)
        if micros:
            ts = vals.astype(jnp.int64) * _US_PER_DAY + micros
            return Column.of(ts, TIMESTAMP64, c.validity)
        return Column.of(vals.astype(jnp.int32), DATE32, c.validity)
    if c.dtype.name == "timestamp64":
        vals = c.values.astype(jnp.int64)
        if months:
            day = jnp.floor_divide(vals, _US_PER_DAY)
            tod = vals - day * _US_PER_DAY
            day2 = _shift_months_clamped(day.astype(jnp.int32), months)
            vals = day2.astype(jnp.int64) * _US_PER_DAY + tod
        vals = vals + days * _US_PER_DAY + micros
        return Column.of(vals, TIMESTAMP64, c.validity)
    raise NotImplementedError(f"interval_add on {c.dtype.name}")


@register("months_between")
def _months_between(block, a: Column, b: Column,
                    round_off: bool = True) -> Column:
    """Spark months_between(date1, date2) (spark_dates.rs:1177 family):
    whole months when both days match or both are month-ends, otherwise a
    31-day-month fraction, rounded to 8 digits."""
    from auron_tpu.expr.eval import _combine_validity
    y1, m1, d1 = _civil_from_days(a.values)
    y2, m2, d2 = _civil_from_days(b.values)
    last1 = _month_end_days(y1, m1).astype(jnp.int32)
    last2 = _month_end_days(y2, m2).astype(jnp.int32)
    months = ((y1 - y2) * 12 + (m1 - m2)).astype(jnp.float64)
    whole = (d1 == d2) | ((d1 == last1) & (d2 == last2))
    frac = (d1 - d2).astype(jnp.float64) / 31.0
    out = jnp.where(whole, months, months + frac)
    if round_off:
        out = jnp.round(out * 1e8) / 1e8
    return Column.of(out, FLOAT64, _combine_validity(a, b))


@register("trunc")
def _trunc_date(block, c: Column, fmt: str) -> Column:
    """trunc(date, fmt): year/quarter/month/week starts (spark_dates.rs)."""
    f = fmt.lower()
    y, m, d = _civil_from_days(c.values)
    one = jnp.ones_like(m)
    if f in ("year", "yyyy", "yy"):
        out = _days_from_civil(y, one, one)
    elif f in ("quarter",):
        qm = ((m - 1) // 3) * 3 + 1
        out = _days_from_civil(y, qm, one)
    elif f in ("month", "mon", "mm"):
        out = _days_from_civil(y, m, one)
    elif f in ("week",):
        # Monday start; epoch day 0 (1970-01-01) was a Thursday (dow 3)
        dow = (c.values.astype(jnp.int64) + 3) % 7
        out = (c.values.astype(jnp.int64) - dow).astype(jnp.int32)
    else:
        # unknown format -> NULL (Spark behavior)
        return Column(c.values, jnp.zeros(c.values.shape[0], jnp.bool_),
                      DATE32, None)
    return Column.of(out.astype(jnp.int32), DATE32, c.validity)


_DAY_NAMES = {"su": 0, "mo": 1, "tu": 2, "we": 3, "th": 4, "fr": 5,
              "sa": 6}


@register("next_day")
def _next_day(block, c: Column, day_name: str) -> Column:
    """next_day(date, 'Mon'): the first date later than `date` falling on
    that weekday; invalid day names yield NULL."""
    key = (day_name or "")[:2].lower()
    if key not in _DAY_NAMES:
        return Column(c.values, jnp.zeros(c.values.shape[0], jnp.bool_),
                      DATE32, None)
    target = _DAY_NAMES[key]
    dow = (c.values.astype(jnp.int64) + 4) % 7  # 0 = Sunday
    delta = (target - dow) % 7
    delta = jnp.where(delta == 0, 7, delta)
    return Column.of((c.values + delta).astype(jnp.int32), DATE32,
                     c.validity)


# -- math --------------------------------------------------------------------

@register("abs")
def _abs(block, c: Column) -> Column:
    return Column.of(jnp.abs(c.values), c.dtype, c.validity)


@register("negative")
def _neg(block, c: Column) -> Column:
    return Column.of(-c.values, c.dtype, c.validity)


@register("sqrt")
def _sqrt(block, c: Column) -> Column:
    v = c.values.astype(jnp.float64)
    return Column.of(jnp.sqrt(v), FLOAT64, c.validity)


@register("exp")
def _exp(block, c: Column) -> Column:
    return Column.of(jnp.exp(c.values.astype(jnp.float64)), FLOAT64, c.validity)


@register("ln")
def _ln(block, c: Column) -> Column:
    v = c.values.astype(jnp.float64)
    ok = v > 0
    from auron_tpu.expr.eval import _and_mask
    return Column.of(jnp.log(jnp.where(ok, v, 1.0)), FLOAT64,
                     _and_mask(c.validity, ok))


@register("pow")
def _pow(block, a: Column, b: Column) -> Column:
    from auron_tpu.expr.eval import _combine_validity
    out = jnp.power(a.values.astype(jnp.float64), b.values.astype(jnp.float64))
    return Column.of(out, FLOAT64, _combine_validity(a, b))


@register("floor")
def _floor(block, c: Column) -> Column:
    if c.dtype.is_integer:
        return Column.of(c.values.astype(jnp.int64), INT64, c.validity)
    return Column.of(jnp.floor(c.values).astype(jnp.int64), INT64, c.validity)


@register("ceil")
def _ceil(block, c: Column) -> Column:
    if c.dtype.is_integer:
        return Column.of(c.values.astype(jnp.int64), INT64, c.validity)
    return Column.of(jnp.ceil(c.values).astype(jnp.int64), INT64, c.validity)


@register("round")
def _round(block, c: Column, scale: int = 0) -> Column:
    """Spark HALF_UP rounding (spark_round.rs behavior)."""
    if c.dtype.is_decimal:
        from auron_tpu.dtypes import decimal_type
        from auron_tpu.expr.cast import cast_column
        return cast_column(c, decimal_type(c.dtype.params[0], scale), 0)
    if c.dtype.is_integer:
        return c
    m = 10.0 ** scale
    v = c.values.astype(jnp.float64) * m
    out = jnp.where(v >= 0, jnp.floor(v + 0.5), jnp.ceil(v - 0.5)) / m
    return Column.of(out, FLOAT64, c.validity)


@register("sign")
def _sign(block, c: Column) -> Column:
    return Column.of(jnp.sign(c.values).astype(jnp.float64), FLOAT64, c.validity)


@register("isnan")
def _isnan(block, c: Column) -> Column:
    if not c.dtype.is_float:
        return Column.of(jnp.zeros(block.capacity, jnp.bool_), BOOL)
    v = jnp.isnan(c.values)
    if c.validity is not None:
        v = v & c.validity
    return Column.of(v, BOOL)


@register("greatest")
def _greatest(block, *cols: Column) -> Column:
    return _minmax_of(cols, jnp.maximum)


@register("least")
def _least(block, *cols: Column) -> Column:
    return _minmax_of(cols, jnp.minimum)


def _minmax_of(cols, op):
    """Spark greatest/least skip NULLs; NULL only if all inputs NULL."""
    out, ok = cols[0].values, cols[0].valid_at()
    for c in cols[1:]:
        v, cv = c.values, c.valid_at()
        cand = op(out, v)
        out = jnp.where(ok & cv, cand, jnp.where(cv & ~ok, v, out))
        ok = ok | cv
    all_valid = all(c.validity is None for c in cols)
    return Column.of(out, cols[0].dtype, None if all_valid else ok)


@register("coalesce")
def _coalesce(block, *cols: Column) -> Column:
    if cols[0].dtype.is_string:
        cols, _ = S.unify_string_columns(list(cols))
    out = cols[0].values
    ok = cols[0].valid_at() if cols[0].validity is not None else None
    for c in cols[1:]:
        if ok is None:
            break
        out = jnp.where(ok, out, c.values)
        ok = ok | (c.valid_at() if c.validity is not None else
                   jnp.ones_like(ok))
    return Column(out, ok, cols[0].dtype, cols[0].dict_values)


@register("nullif")
def _nullif(block, a: Column, b: Column) -> Column:
    """NULL when a == b else a (spark_null_if.rs)."""
    from auron_tpu.expr.eval import _compare
    eq = _compare("Eq", a, b)
    neq = ~(eq.values & eq.valid_at())
    validity = neq if a.validity is None else (a.validity & neq)
    return Column(a.values, validity, a.dtype, a.dict_values)


# -- strings -----------------------------------------------------------------

def _str_to_str(name, pyfn):
    @register(name)
    def fn(block, c: Column, *params) -> Column:
        return S.map_to_new_dictionary(c, (name,) + params,
                                       lambda s: pyfn(s, *params))
    return fn


def _case_fn(name, upper):
    @register(name)
    def fn(block, c: Column) -> Column:
        if c.dtype.is_raw_string:
            from auron_tpu.expr import strings_raw as SR
            if SR.planes_all_ascii(c.values):
                # device-native byte-lane case map: exact on ASCII columns
                # (UTF8String takes the same byte-wise branch), no host
                # dictionary materialization
                return c.with_values(SR.ascii_case_planes(c.values, upper))
            c = SR.to_dictionary_column(c)  # non-ASCII: Unicode host path
        return S.map_to_new_dictionary(c, (name,),
                                       lambda s: getattr(s, name)())
    return fn


_case_fn("upper", True)
_case_fn("lower", False)
_str_to_str("trim", lambda s: s.strip())
_str_to_str("ltrim", lambda s: s.lstrip())
_str_to_str("rtrim", lambda s: s.rstrip())
_str_to_str("reverse", lambda s: s[::-1])
_str_to_str("initcap", lambda s: " ".join(
    w[:1].upper() + w[1:].lower() if w else w for w in s.split(" ")))
_str_to_str("repeat", lambda s, n=1: s * max(int(n), 0))


_SPACE_MAX = 128


@register("space")
def _space(block, c: Column) -> Column:
    """space(n) -> n spaces (spark_strings.rs); n clamps to 128 so the
    dictionary stays static under tracing."""
    from auron_tpu.dtypes import STRING
    n = jnp.clip(c.values.astype(jnp.int32), 0, _SPACE_MAX)
    dict_values = np.array([" " * k for k in range(_SPACE_MAX + 1)],
                           dtype=object)
    return Column(n, c.validity, STRING, dict_values)


@register("substring")
def _substring(block, c: Column, pos: int, length: int = 1 << 30) -> Column:
    # Spark substring: 1-based, pos 0 treated as 1, negative counts from end
    if c.dtype.is_raw_string:
        from auron_tpu.expr import strings_raw as SR
        if pos in (0, 1) and length >= 0 and SR.planes_all_ascii(c.values):
            # prefix substring on ASCII planes: byte mask, stays on device
            return c.with_values(SR.ascii_prefix_planes(c.values, length))
        c = SR.to_dictionary_column(c)  # general case: host dictionary
    def sub(s):
        p = pos
        if p > 0:
            start = p - 1
        elif p == 0:
            start = 0
        else:
            start = max(len(s) + p, 0)
        return s[start:start + max(length, 0)]
    return S.map_to_new_dictionary(c, ("substring", pos, length), sub)


@register("length")
def _length(block, c: Column) -> Column:
    if c.dtype.is_raw_string:
        from auron_tpu.expr import strings_raw as SR
        return Column.of(SR.raw_char_lengths(c.values), INT32, c.validity)
    return S.map_to_values(c, ("length",), lambda s: len(s), INT32)



def _dedupe_dict(codes, d):
    """Cross-product dictionaries can contain DUPLICATE strings under
    different codes (('x','yz') and ('xy','z') both concat to 'xyz');
    grouping/rank machinery treats codes as identity, so equal strings
    must share one code."""
    uniq, inv = np.unique(d.astype(str), return_inverse=True)
    if len(uniq) == len(d):
        return codes, d
    remap = jnp.asarray(inv.astype(np.int32))
    return jnp.take(remap, jnp.clip(codes, 0, len(d) - 1)), \
        uniq.astype(object)


@register("concat_lit")
def _concat_lit(block, c: Column, prefix: str = "", suffix: str = "") -> Column:
    return S.map_to_new_dictionary(c, ("concat_lit", prefix, suffix),
                                   lambda s: prefix + s + suffix)


@register("concat")
def _concat(block, *cols, sep: str = "") -> Column:
    """Multi-operand string concat (spark_strings.rs string_concat).

    String operands pair-reduce through a cross-product dictionary: for
    dictionaries |a| x |b| <= 2^16 the combined dictionary is precomputed
    host-side and the codes combine with one on-device multiply-add — fully
    traceable under whole-plan jit. String literals arrive as 1-entry
    dictionaries, so interleaved separators cost nothing."""
    from auron_tpu.dtypes import STRING

    def pair(a: Column, b: Column) -> Column:
        da, db = a.dict_values, b.dict_values
        if len(da) * len(db) > (1 << 16):
            raise NotImplementedError(
                f"concat dictionary product {len(da)}x{len(db)} too large")
        d = np.array([sep.join((x, y)) if sep else x + y
                      for x in da for y in db], dtype=object)
        codes = (jnp.clip(a.values, 0, len(da) - 1).astype(jnp.int32) *
                 np.int32(len(db)) +
                 jnp.clip(b.values, 0, len(db) - 1).astype(jnp.int32))
        if a.validity is None:
            validity = b.validity
        elif b.validity is None:
            validity = a.validity
        else:
            validity = a.validity & b.validity
        codes, d = _dedupe_dict(codes, d)
        return Column(codes, validity, STRING, d)

    out = cols[0]
    for c in cols[1:]:
        out = pair(out, c)
    return out


@register("concat_ws")
def _concat_ws(block, *args) -> Column:
    """concat_ws(col..., sep): separator-joined concat that SKIPS null
    operands (Spark semantics — never returns NULL; all-null rows yield
    the empty string). Pairwise fold where 'null' means 'no content yet',
    so a null middle operand never leaves a doubled separator."""
    from auron_tpu.dtypes import STRING as _S
    sep = args[-1]
    cols = list(args[:-1])

    def pair(a: Column, b: Column) -> Column:
        da, db = a.dict_values, b.dict_values
        nA, nB = len(da), len(db)
        if nA * nB > (1 << 16):
            raise NotImplementedError(
                f"concat_ws dictionary product {nA}x{nB} too large")
        d = np.array([x + sep + y for x in da for y in db] +
                     list(da) + list(db), dtype=object)
        ca = jnp.clip(a.values, 0, nA - 1).astype(jnp.int32)
        cb = jnp.clip(b.values, 0, nB - 1).astype(jnp.int32)
        va = a.valid_at() if a.validity is not None \
            else jnp.ones(ca.shape[0], jnp.bool_)
        vb = b.valid_at() if b.validity is not None \
            else jnp.ones(cb.shape[0], jnp.bool_)
        codes = jnp.where(va & vb, ca * nB + cb,
                          jnp.where(va, nA * nB + ca, nA * nB + nA + cb))
        codes, d = _dedupe_dict(codes, d)
        return Column(codes, va | vb, _S, d)

    out = cols[0]
    for c in cols[1:]:
        out = pair(out, c)
    # finalize: all-null -> empty string, never NULL
    if out.validity is None:
        return out
    d = np.concatenate([out.dict_values,
                        np.array([""], dtype=object)])
    codes = jnp.where(out.validity, out.values,
                      jnp.asarray(len(d) - 1, jnp.int32))
    codes, d = _dedupe_dict(codes, d)
    return Column(codes.astype(jnp.int32), None, _S, d)


def _predicate(name):
    @register(name)
    def fn(block, c: Column, pattern: str) -> Column:
        if c.dtype.is_raw_string:
            from auron_tpu.expr import strings_raw as SR
            pre = SR.like_prefix(name, pattern)
            if pre is not None:  # prefix tests run on-device on the planes
                return Column.of(SR.prefix_match(c.values, pre), BOOL,
                                 c.validity)
            c = SR.to_dictionary_column(c)  # general patterns: host (eager)
        return S.string_predicate(c, name, pattern)
    return fn


for _k in ("like", "rlike", "startswith", "endswith", "contains"):
    _predicate(_k)
_RAW_NATIVE.update(("like", "startswith", "rlike", "endswith", "contains"))


# -- hash --------------------------------------------------------------------

@register("hash")
def _hash(block, *cols: Column) -> Column:
    from auron_tpu.ops import hashing as H
    inputs = [H.column_hash_inputs(c) for c in cols]
    out = H.hash_columns_murmur3(inputs, rows=block.capacity, seed=42)
    return Column.of(out, INT32)


@register("xxhash64")
def _xxhash64(block, *cols: Column) -> Column:
    from auron_tpu.ops import hashing as H
    inputs = [H.column_hash_inputs(c) for c in cols]
    out = H.hash_columns_xxhash64(inputs, rows=block.capacity, seed=42)
    return Column.of(out, INT64)


@register("might_contain")
def _might_contain(block, c: Column, resource_key: str) -> Column:
    """Bloom-filter runtime-filter probe (reference
    bloom_filter_might_contain.rs:223, filter keyed by a session resource)."""
    from auron_tpu.ops.bloom import get_resource, might_contain
    return might_contain(get_resource(resource_key), c)


# -- more Spark string kernels (reference datafusion-ext-functions/src/
# spark_strings.rs, spark_initcap.rs, spark_crypto.rs — dictionary-level
# host transforms; device work is one gather per column) --------------------

_str_to_str("lpad", lambda s, n, p=" ": s.rjust(n, p[0] if p else " ")[:max(n, len(s))] if len(s) < n else s[:n])
_str_to_str("rpad", lambda s, n, p=" ": s.ljust(n, p[0] if p else " ")[:n] if len(s) < n else s[:n])
_str_to_str("replace", lambda s, find, repl="": s.replace(find, repl))
_str_to_str("repeat", lambda s, n: s * max(int(n), 0))
_str_to_str("translate", lambda s, src, dst: s.translate(
    {ord(a): (dst[i] if i < len(dst) else None)
     for i, a in enumerate(src)}))
_str_to_str("split_part", lambda s, sep, idx: (
    (s.split(sep) + [""] * 99)[idx - 1] if idx > 0 else ""))


def _crypto(name, fn):
    @register(name)
    def f(block, c: Column, *params) -> Column:
        return S.map_to_new_dictionary(c, (name,) + params,
                                       lambda s: fn(s, *params))
    return f


def _md5(s):
    import hashlib
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def _sha1(s):
    import hashlib
    return hashlib.sha1(s.encode("utf-8")).hexdigest()


def _sha2(s, bits=256):
    import hashlib
    h = {224: hashlib.sha224, 256: hashlib.sha256,
         384: hashlib.sha384, 512: hashlib.sha512}[int(bits) or 256]
    return h(s.encode("utf-8")).hexdigest()


_crypto("md5", lambda s: _md5(s))
_crypto("sha1", lambda s: _sha1(s))
_crypto("sha2", lambda s, bits=256: _sha2(s, bits))


@register("ascii")
def _ascii(block, c: Column) -> Column:
    return S.map_to_values(c, ("ascii",),
                           lambda s: ord(s[0]) if s else 0, INT32)


@register("locate")
def _locate(block, c: Column, sub: str, pos: int = 1) -> Column:
    # Spark locate: 1-based; 0 when not found
    return S.map_to_values(
        c, ("locate", sub, pos),
        lambda s: s.find(sub, max(pos - 1, 0)) + 1, INT32)


@register("instr")
def _instr(block, c: Column, sub: str) -> Column:
    return S.map_to_values(c, ("instr", sub),
                           lambda s: s.find(sub) + 1, INT32)


# -- more math (reference routes ~70 DataFusion built-ins) -------------------

def _math1(name, jfn):
    @register(name)
    def fn(block, c: Column) -> Column:
        v = jfn(c.values.astype(jnp.float64))
        return Column.of(v, FLOAT64, c.validity)
    return fn


_math1("log10", jnp.log10)
_math1("log2", jnp.log2)
_math1("sin", jnp.sin)
_math1("cos", jnp.cos)
_math1("tan", jnp.tan)
_math1("asin", jnp.arcsin)
_math1("acos", jnp.arccos)
_math1("atan", jnp.arctan)
_math1("sinh", jnp.sinh)
_math1("cosh", jnp.cosh)
_math1("tanh", jnp.tanh)
_math1("cbrt", jnp.cbrt)
_math1("degrees", jnp.degrees)
_math1("radians", jnp.radians)
_math1("expm1", jnp.expm1)
_math1("log1p", jnp.log1p)


@register("bround")
def _bround(block, c: Column, scale: int = 0) -> Column:
    """Banker's (half-even) rounding — spark_bround.rs semantics."""
    f = 10.0 ** scale
    v = c.values.astype(jnp.float64) * f
    r = jnp.round(v)  # jnp.round IS half-even
    out = r / f
    if c.dtype.is_integer and scale >= 0:
        return Column.of(out.astype(c.dtype.jnp_dtype), c.dtype, c.validity)
    return Column.of(out, FLOAT64, c.validity)


@register("normalize_nan_and_zero")
def _normalize_nan_and_zero(block, c: Column) -> Column:
    """spark_normalize_nan_and_zero.rs: canonical NaN, -0.0 -> +0.0."""
    v = c.values
    v = jnp.where(jnp.isnan(v), jnp.asarray(float("nan"), v.dtype), v)
    v = jnp.where(v == 0, jnp.asarray(0.0, v.dtype), v)
    return Column.of(v, c.dtype, c.validity)


@register("nvl")
def _nvl(block, a: Column, b: Column) -> Column:
    return _coalesce(block, a, b)


@register("if")
def _if(block, cond: Column, a: Column, b: Column) -> Column:
    ok = cond.values.astype(jnp.bool_)
    if cond.validity is not None:
        ok = ok & cond.validity
    vals = jnp.where(ok, a.values, b.values.astype(a.values.dtype))
    validity = None
    av = a.validity if a.validity is not None else jnp.ones_like(ok)
    bv = b.validity if b.validity is not None else jnp.ones_like(ok)
    if a.validity is not None or b.validity is not None:
        validity = jnp.where(ok, av, bv)
    return Column(vals, validity, a.dtype, a.dict_values)


# -- JSON (reference spark_get_json_object.rs:867) ---------------------------

def _json_path_get(doc: str, path: str):
    import json as _json
    try:
        obj = _json.loads(doc)
    except Exception:
        return None
    if not path.startswith("$"):
        return None
    cur = obj
    i = 1
    import re as _re
    for tok in _re.findall(r"\.([A-Za-z0-9_]+)|\[(\d+)\]", path):
        name, idx = tok
        try:
            if name:
                cur = cur[name]
            else:
                cur = cur[int(idx)]
        except Exception:
            return None
    if isinstance(cur, (dict, list)):
        import json as _json2
        return _json2.dumps(cur, separators=(",", ":"))
    if cur is None:
        return None
    if isinstance(cur, bool):
        return "true" if cur else "false"
    return str(cur)


@register("get_json_object")
def _get_json_object(block, c: Column, path: str) -> Column:
    out = S.map_to_new_dictionary(c, ("get_json_object", path),
                                  lambda s: _json_path_get(s, path) or "")
    # NULL where path missing
    import numpy as _np
    missing = _np.array([_json_path_get(s, path) is None
                         for s in c.dict_values])
    miss = jnp.asarray(missing)[jnp.clip(c.values, 0,
                                         len(c.dict_values) - 1)]
    validity = ~miss if c.validity is None else (c.validity & ~miss)
    return Column(out.values, validity, out.dtype, out.dict_values)


# -- nondeterministic / id functions (reference spark_randn.rs,
# spark_partition_id.rs, spark_monotonically_increasing_id.rs) ---------------

@register("rand")
def _rand(block, seed: int = 0) -> Column:
    import jax as _jax
    key = _jax.random.PRNGKey(seed)
    return Column.of(_jax.random.uniform(key, (block.capacity,),
                                         dtype=jnp.float64), FLOAT64)


@register("randn")
def _randn(block, seed: int = 0) -> Column:
    import jax as _jax
    key = _jax.random.PRNGKey(seed)
    return Column.of(_jax.random.normal(key, (block.capacity,),
                                        dtype=jnp.float64), FLOAT64)


@register("spark_partition_id")
def _spark_partition_id(block, pid: int = 0) -> Column:
    return Column.of(jnp.full(block.capacity, pid, jnp.int32), INT32)


@register("monotonically_increasing_id")
def _monotonically_increasing_id(block, pid: int = 0) -> Column:
    # Spark: partition_id << 33 | row_index_within_partition
    rank = jnp.cumsum(block.row_mask.astype(jnp.int64)) - 1
    from auron_tpu.dtypes import INT64 as _I64
    return Column.of((jnp.int64(pid) << 33) | jnp.maximum(rank, 0), _I64)


# -- timestamps (reference flink_datetime.rs / spark date-time kernels;
# micros-since-epoch int64, Spark TimestampType layout) ----------------------

@register("hour")
def _hour(block, c: Column) -> Column:
    secs = c.values // 1_000_000
    return Column.of(((secs // 3600) % 24).astype(jnp.int32), INT32,
                     c.validity)


@register("minute")
def _minute(block, c: Column) -> Column:
    secs = c.values // 1_000_000
    return Column.of(((secs // 60) % 60).astype(jnp.int32), INT32, c.validity)


@register("second")
def _second(block, c: Column) -> Column:
    secs = c.values // 1_000_000
    return Column.of((secs % 60).astype(jnp.int32), INT32, c.validity)


@register("to_date")
def _to_date(block, c: Column) -> Column:
    from auron_tpu.dtypes import DATE32
    days = jnp.floor_divide(c.values, 86_400_000_000)
    return Column.of(days.astype(jnp.int32), DATE32, c.validity)


@register("to_timestamp_from_date")
def _to_timestamp_from_date(block, c: Column) -> Column:
    from auron_tpu.dtypes import TIMESTAMP64
    return Column.of(c.values.astype(jnp.int64) * 86_400_000_000,
                     TIMESTAMP64, c.validity)


@register("unix_timestamp")
def _unix_timestamp(block, c: Column) -> Column:
    from auron_tpu.dtypes import INT64 as _I64
    return Column.of(jnp.floor_divide(c.values, 1_000_000), _I64, c.validity)


# -- remaining ScalarFunction enum built-ins (auron.proto:218-297) ------------
# Aliases first: the proto routes several DataFusion names onto kernels that
# already exist here under their Spark spelling.

_REGISTRY["signum"] = _REGISTRY["sign"]
_REGISTRY["substr"] = _REGISTRY["substring"]
_REGISTRY["strpos"] = _REGISTRY["locate"]
_REGISTRY["power"] = _REGISTRY["pow"]
_REGISTRY["character_length"] = _REGISTRY["length"]
_REGISTRY["char_length"] = _REGISTRY["length"]

_math1("acosh", jnp.arccosh)
_math1("asinh", jnp.arcsinh)
_math1("atanh", jnp.arctanh)


@register("log")
def _log(block, *cols) -> Column:
    """log(x) = ln(x); log(base, x) = ln(x)/ln(base) (DataFusion Log)."""
    from auron_tpu.expr.eval import _and_mask, _combine_validity
    if len(cols) == 1:
        return _REGISTRY["ln"](block, cols[0])
    base, x = cols
    b = base.values.astype(jnp.float64)
    v = x.values.astype(jnp.float64)
    ok = (v > 0) & (b > 0) & (b != 1.0)
    out = jnp.log(jnp.where(v > 0, v, 1.0)) / \
        jnp.log(jnp.where((b > 0) & (b != 1.0), b, 2.0))
    return Column.of(out, FLOAT64, _and_mask(_combine_validity(base, x), ok))


@register("factorial")
def _factorial(block, c: Column) -> Column:
    """factorial(n) for 0<=n<=20 (fits int64), NULL outside — Spark."""
    import math
    from auron_tpu.expr.eval import _and_mask
    table = jnp.asarray([math.factorial(i) for i in range(21)], jnp.int64)
    n = c.values.astype(jnp.int32)
    ok = (n >= 0) & (n <= 20)
    return Column.of(table[jnp.clip(n, 0, 20)], INT64,
                     _and_mask(c.validity, ok))


@register("chr")
def _chr(block, c: Column) -> Column:
    """chr(n): the character of n % 256; empty for n <= 0 or n % 256 == 0
    (Spark Chr; NUL-free by the engine's string contract)."""
    d = np.array([""] + [chr(i) for i in range(1, 256)], dtype=object)
    n = c.values.astype(jnp.int64)
    code = jnp.where(n <= 0, 0, n % 256).astype(jnp.int32)
    return Column(code, c.validity, STRING, d)


_str_to_str("left", lambda s, n: s[:n] if n > 0 else "")
_str_to_str("right", lambda s, n: s[-n:] if n > 0 else "")
_str_to_str("btrim",
            lambda s, chars=None: s.strip(chars) if chars else s.strip())


def _len_bytes_fn(name, mult):
    @register(name)
    def fn(block, c: Column) -> Column:
        if c.dtype.is_raw_string:
            from auron_tpu.expr import strings_raw as SR
            return Column.of(SR.raw_lengths(c.values) * mult, INT32,
                             c.validity)
        return S.map_to_values(c, (name,),
                               lambda s: len(s.encode("utf-8")) * mult,
                               INT32)
    return fn


_len_bytes_fn("octet_length", 1)
_len_bytes_fn("bit_length", 8)
_RAW_NATIVE.update(("octet_length", "bit_length"))


@register("regexp_replace")
def _regexp_replace(block, c: Column, pattern: str, repl: str,
                    pos: int = 1) -> Column:
    """Java-style $N group references translate to python backrefs."""
    import re as _re
    rx = _re.compile(pattern)
    py_repl = _re.sub(r"\$(\d+)", r"\\\1", repl)

    def f(s):
        if pos <= 1:
            return rx.sub(py_repl, s)
        head = s[:pos - 1]
        return head + rx.sub(py_repl, s[pos - 1:])
    return S.map_to_new_dictionary(
        c, ("regexp_replace", pattern, repl, pos), f)


@register("regexp_extract")
def _regexp_extract(block, c: Column, pattern: str, idx: int = 1) -> Column:
    """First match's group `idx`, empty string when unmatched (Spark)."""
    import re as _re
    rx = _re.compile(pattern)
    return S.map_to_new_dictionary(
        c, ("regexp_extract", pattern, idx),
        lambda s: (lambda m: (m.group(idx) or "") if m else "")(rx.search(s)))


@register("find_in_set")
def _find_in_set(block, c: Column, strlist: str) -> Column:
    """1-based index of the string inside a comma-joined list; 0 when
    absent or when the probe itself contains a comma (Spark)."""
    items = strlist.split(",")

    def f(s):
        if "," in s:
            return 0
        try:
            return items.index(s) + 1
        except ValueError:
            return 0
    return S.map_to_values(c, ("find_in_set", strlist), f, INT32)


@register("levenshtein")
def _levenshtein(block, a: Column, b: Column) -> Column:
    """Edit distance via the cross-product dictionary (same budget rule as
    concat: |a| x |b| <= 2^16 precomputed host-side, one device gather)."""
    from auron_tpu.expr.eval import _combine_validity
    da, db = a.dict_values, b.dict_values
    if da is None or db is None:
        raise NotImplementedError("levenshtein needs two string columns")
    if len(da) * len(db) > (1 << 16):
        raise NotImplementedError(
            f"levenshtein dictionary product {len(da)}x{len(db)} too large")

    def lev(x: str, y: str) -> int:
        if len(x) < len(y):
            x, y = y, x
        prev = list(range(len(y) + 1))
        for i, cx in enumerate(x, 1):
            cur = [i]
            for j, cy in enumerate(y, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (cx != cy)))
            prev = cur
        return prev[-1]

    table = np.array([lev(str(x), str(y)) for x in da for y in db],
                     np.int32)
    codes = (jnp.clip(a.values, 0, len(da) - 1).astype(jnp.int32)
             * np.int32(len(db))
             + jnp.clip(b.values, 0, len(db) - 1).astype(jnp.int32))
    return Column.of(jnp.asarray(table)[codes], INT32,
                     _combine_validity(a, b))


@register("nvl2")
def _nvl2(block, a: Column, b: Column, c2: Column) -> Column:
    """nvl2(a, b, c) = if(a is not null, b, c)."""
    cond = Column.of(a.valid_at() if a.validity is not None
                     else jnp.ones(block.capacity, jnp.bool_), BOOL)
    return _REGISTRY["if"](block, cond, b, c2)


@register("make_date")
def _make_date(block, y: Column, m: Column, d: Column) -> Column:
    """make_date(y, m, d) -> date; NULL on invalid civil dates (round-trip
    check instead of a month-length table)."""
    from auron_tpu.expr.eval import _and_mask, _combine_validity
    yy = y.values.astype(jnp.int64)
    mm = m.values.astype(jnp.int64)
    dd = d.values.astype(jnp.int64)
    rng_ok = (mm >= 1) & (mm <= 12) & (dd >= 1) & (dd <= 31)
    days = _days_from_civil(yy, jnp.clip(mm, 1, 12), jnp.clip(dd, 1, 31))
    cy, cm, cd = _civil_from_days(days)
    ok = rng_ok & (cy == yy) & (cm == mm) & (cd == dd)
    validity = _and_mask(_combine_validity(y, m), ok)
    validity = _and_mask(validity, d.valid_at()) \
        if d.validity is not None else validity
    return Column.of(days.astype(jnp.int32), DATE32, validity)


@register("date_trunc")
def _date_trunc(block, c: Column, fmt: str) -> Column:
    """date_trunc(fmt, timestamp) -> timestamp floored at the unit
    (spark DateTrunc; microsecond storage)."""
    from auron_tpu.dtypes import TIMESTAMP64
    us = c.values.astype(jnp.int64)
    unit = fmt.lower()
    sizes = {"microsecond": 1, "millisecond": 1_000, "second": 1_000_000,
             "minute": 60_000_000, "hour": 3_600_000_000,
             "day": _US_PER_DAY, "dd": _US_PER_DAY}
    if unit in sizes:
        out = jnp.floor_divide(us, sizes[unit]) * sizes[unit]
    elif unit == "week":
        days = jnp.floor_divide(us, _US_PER_DAY)
        monday = days - (days + 3) % 7  # 1970-01-01 was a Thursday
        out = monday * _US_PER_DAY
    elif unit in ("month", "mon", "mm", "quarter", "year", "yy", "yyyy"):
        days = jnp.floor_divide(us, _US_PER_DAY)
        yy_, mm_, _dd = _civil_from_days(days)
        one = jnp.ones_like(mm_)
        if unit in ("year", "yy", "yyyy"):
            d2 = _days_from_civil(yy_, one, one)
        elif unit == "quarter":
            d2 = _days_from_civil(yy_, ((mm_ - 1) // 3) * 3 + 1, one)
        else:
            d2 = _days_from_civil(yy_, mm_, one)
        out = d2.astype(jnp.int64) * _US_PER_DAY
    else:
        raise NotImplementedError(f"date_trunc unit {fmt!r}")
    return Column.of(out, TIMESTAMP64, c.validity)


@register("hex")
def _hex(block, c: Column) -> Column:
    """hex(string) -> utf-8 bytes hex; hex(integer) -> uppercase hex of the
    64-bit two's-complement value (Spark)."""
    if c.dtype.is_string or c.dtype.is_raw_string:
        cc = c
        if c.dtype.is_raw_string:
            from auron_tpu.expr import strings_raw as SR
            cc = SR.to_dictionary_column(c)
        return S.map_to_new_dictionary(
            cc, ("hex",), lambda s: s.encode("utf-8").hex().upper())
    import jax.core
    if isinstance(c.values, jax.core.Tracer):
        raise NotImplementedError(
            "hex(integer) builds a value dictionary — apply it outside the "
            "jitted region")
    vals = np.asarray(c.values).astype(np.int64)
    texts = np.array([format(v & 0xFFFFFFFFFFFFFFFF, "X") for v in vals],
                     dtype=object)
    uniq, inv = np.unique(texts.astype(str), return_inverse=True)
    return Column(jnp.asarray(inv.astype(np.int32)), c.validity, STRING,
                  uniq.astype(object))


_RAW_NATIVE.add("hex")


# -- ScalarFunction-enum stragglers (reference auron.proto:227-279:
# Digest=7, DatePart=28, ToTimestampMillis/Micros/Seconds=56-58, Now=59) ----

@register("now")
def _now(block) -> Column:
    """Query-start timestamp, constant across rows (Spark folds now() per
    query; here it is captured at trace/eval time — a jit cache hit reuses
    the traced instant, matching Spark's per-query constant)."""
    import time as _time
    from auron_tpu.dtypes import TIMESTAMP64
    micros = int(_time.time() * 1_000_000)
    return Column.of(jnp.full(block.capacity, micros, jnp.int64),
                     TIMESTAMP64)


_REGISTRY["current_timestamp"] = _REGISTRY["now"]

_DATE_PART_ALIAS = {
    "year": "year", "yr": "year", "quarter": "quarter", "qtr": "quarter",
    "month": "month", "mon": "month", "week": "weekofyear",
    "day": "day", "dom": "day", "dow": "dayofweek", "doy": "dayofyear",
    "hour": "hour", "minute": "minute", "min": "minute",
    "second": "second", "sec": "second",
}

_US_PER_DAY = 86_400_000_000


@register("date_part")
def _date_part_fn(block, c: Column, field: str) -> Column:
    """DataFusion date_part(field, source); the SQL front-end swaps the
    leading literal field into a static param (like date_trunc)."""
    f = str(field).strip().lower()
    if f.endswith("s") and f not in ("", "s"):
        f = f[:-1] if f[:-1] in _DATE_PART_ALIAS else f
    if f == "epoch":
        from auron_tpu.dtypes import FLOAT64
        if c.dtype.name == "date32":
            secs = c.values.astype(jnp.float64) * 86_400.0
        else:
            secs = c.values.astype(jnp.float64) / 1e6
        return Column.of(secs, FLOAT64, c.validity)
    kernel_name = _DATE_PART_ALIAS.get(f)
    if kernel_name is None:
        raise NotImplementedError(f"date_part field {field!r}")
    if kernel_name in ("hour", "minute", "second"):
        if c.dtype.name == "date32":  # midnight: all zero
            return Column.of(jnp.zeros(block.capacity, jnp.int32), INT32,
                             c.validity)
        return _REGISTRY[kernel_name](block, c)
    # date-family parts want days; convert timestamps first
    if c.dtype.name == "timestamp64":
        from auron_tpu.dtypes import DATE32
        c = Column(jnp.floor_divide(c.values, _US_PER_DAY).astype(
            jnp.int32), c.validity, DATE32, None)
    return _REGISTRY[kernel_name](block, c)


@register("digest")
def _digest(block, c: Column, algo: str) -> Column:
    """DataFusion digest(expr, algorithm) -> hex string (the reference
    routes this through the ScalarFunction enum, Digest=7)."""
    import hashlib
    a = str(algo).lower().replace("-", "")
    fns = {"md5": _md5, "sha1": _sha1,
           "sha224": lambda s: _sha2(s, 224),
           "sha256": lambda s: _sha2(s, 256),
           "sha384": lambda s: _sha2(s, 384),
           "sha512": lambda s: _sha2(s, 512),
           "blake2b": lambda s: hashlib.blake2b(
               s.encode("utf-8")).hexdigest(),
           "blake2s": lambda s: hashlib.blake2s(
               s.encode("utf-8")).hexdigest()}
    fn = fns.get(a)
    if fn is None:
        raise NotImplementedError(f"digest algorithm {algo!r}")
    return S.map_to_new_dictionary(c, ("digest", a), fn)


def _to_timestamp_unit(mult: int):
    def fn(block, c: Column) -> Column:
        """Integer epoch values at the unit -> timestamp64 (micros);
        timestamps/dates pass through rescaled; strings parse via the
        cast machinery."""
        from auron_tpu.dtypes import TIMESTAMP64
        if c.dtype.is_string or c.dtype.is_raw_string:
            from auron_tpu.expr.cast import cast_column
            parsed = cast_column(c, TIMESTAMP64, block.capacity)
            vals, validity = parsed.values, parsed.validity
        elif c.dtype.name == "timestamp64":
            vals, validity = c.values, c.validity
        elif c.dtype.name == "date32":
            vals = c.values.astype(jnp.int64) * _US_PER_DAY
            validity = c.validity
        else:
            vals = c.values.astype(jnp.int64) * mult
            validity = c.validity
        if c.dtype.name == "timestamp64" and mult > 1:
            vals = (vals // mult) * mult  # truncate to the unit
        return Column.of(vals, TIMESTAMP64, validity)
    return fn


register("to_timestamp_seconds")(_to_timestamp_unit(1_000_000))
register("to_timestamp_millis")(_to_timestamp_unit(1_000))
register("to_timestamp_micros")(_to_timestamp_unit(1))
