"""Vectorized expression evaluator with Spark SQL semantics.

Null semantics (three-valued logic), TryCast behavior, divide-by-zero -> NULL,
and type promotion match the reference's expression stack (SURVEY.md A.1,
/root/reference/native-engine/datafusion-ext-exprs/). Every operation is pure
jnp over [capacity] lanes, so XLA fuses whole projection/filter expressions
into single VPU passes over the block.
"""

from __future__ import annotations

import datetime
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from auron_tpu.block import Column, TableBlock
from auron_tpu.dtypes import (BOOL, DATE32, DataType, FLOAT64, INT32, INT64,
                              STRING)
from auron_tpu.expr import nodes as N
from auron_tpu.expr import strings as S
from auron_tpu.expr.cast import cast_column

_NUM_ORDER = {"bool": 0, "int8": 1, "int16": 2, "int32": 3, "int64": 4,
              "float32": 5, "float64": 6}


def evaluate(expr: N.Expr, block: TableBlock) -> Column:
    """Evaluate an expression over a block -> Column (values may be scalar
    0-d until materialized; use :func:`materialize` for [capacity] output)."""
    if isinstance(expr, N.Alias):
        return evaluate(expr.child, block)
    if isinstance(expr, N.Column):
        return block.columns[expr.name]
    if isinstance(expr, N.Literal):
        return _literal_column(expr)
    if isinstance(expr, N.BinaryOp):
        return _binary(expr, block)
    if isinstance(expr, N.Not):
        c = evaluate(expr.child, block)
        return Column.of(jnp.logical_not(c.values.astype(jnp.bool_)), BOOL,
                         c.validity)
    if isinstance(expr, N.IsNull):
        c = evaluate(expr.child, block)
        if c.validity is None:
            return Column.of(jnp.zeros_like(c.values, dtype=jnp.bool_), BOOL)
        return Column.of(jnp.logical_not(c.validity), BOOL)
    if isinstance(expr, N.PyUDF):
        return _py_udf(expr, block)
    if isinstance(expr, N.Cast):
        c = evaluate(expr.child, block)
        return cast_column(c, expr.to, block.capacity,
                           domain=getattr(expr, "domain", None))
    if isinstance(expr, N.CaseWhen):
        return _case_when(expr, block)
    if isinstance(expr, N.ScalarSubquery):
        return _scalar_subquery(expr)
    if isinstance(expr, N.InList):
        return _in_list(expr, block)
    if isinstance(expr, N.ScalarFunc):
        from auron_tpu.expr.functions import dispatch_function
        return dispatch_function(expr, block)
    raise NotImplementedError(f"evaluate: {type(expr).__name__}")


def materialize(col: Column, capacity: int) -> Column:
    """Broadcast scalar-valued columns to full [capacity] arrays.

    Plane-valued scalars broadcast along a new row axis: a scalar
    decimal128 literal is a (2,) limb pair, a scalar raw string a (W,)
    plane row — both become [capacity, planes]."""
    v = col.values
    planes = col.dtype.name == "decimal128" or col.dtype.is_raw_string
    if getattr(v, "ndim", 1) == 0 or (hasattr(v, "shape") and v.shape == ()):
        v = jnp.broadcast_to(v, (capacity,))
    elif planes and getattr(v, "ndim", 2) == 1:
        v = jnp.broadcast_to(v[None, :], (capacity, v.shape[0]))
    val = col.validity
    if val is not None and (getattr(val, "ndim", 1) == 0 or val.shape == ()):
        val = jnp.broadcast_to(val, (capacity,))
    return Column(v, val, col.dtype, col.dict_values)


def project_block(block: TableBlock, exprs) -> TableBlock:
    """ProjectExec analog: evaluate expressions into a new block (same mask).

    XLA's CSE subsumes the reference's cached-expression evaluator
    (common/cached_exprs_evaluator.rs): repeated subtrees trace to identical
    jaxpr subgraphs and compile once.
    """
    cols = {}
    for i, e in enumerate(exprs):
        c = materialize(evaluate(e, block), block.capacity)
        cols[output_name(e, i)] = c
    return TableBlock(cols, block.row_mask)


def filter_block(block: TableBlock, predicate: N.Expr) -> TableBlock:
    """FilterExec analog: predicate ANDs into the row mask; NULL -> drop."""
    c = evaluate(predicate, block)
    keep = c.values.astype(jnp.bool_)
    if c.validity is not None:
        keep = keep & c.validity
    if keep.ndim == 0:
        keep = jnp.broadcast_to(keep, (block.capacity,))
    return block.filter_mask(keep)


def output_name(expr: N.Expr, i: int) -> str:
    if isinstance(expr, N.Alias):
        return expr.name
    if isinstance(expr, N.Column):
        return expr.name
    return f"_col{i}"


# ---------------------------------------------------------------------------


def _literal_column(lit: N.Literal) -> Column:
    v, dt = lit.value, lit.dtype
    if v is None:
        dt = dt or INT32
        return Column.of(jnp.zeros((), dt.jnp_dtype),
                         dt, jnp.zeros((), jnp.bool_))
    if isinstance(v, str):
        d = np.array([v], dtype=object)
        return Column(jnp.zeros((), jnp.int32), None, STRING, d)
    if isinstance(v, bool):
        return Column.of(jnp.asarray(v, jnp.bool_), BOOL)
    if isinstance(v, (datetime.date,)) and not isinstance(v, datetime.datetime):
        days = (v - datetime.date(1970, 1, 1)).days
        return Column.of(jnp.asarray(days, jnp.int32), DATE32)
    if dt is not None:
        return Column.of(jnp.asarray(v, dt.jnp_dtype), dt)
    if isinstance(v, (int, np.integer)):
        dt = INT32 if -2**31 <= int(v) < 2**31 else INT64
        return Column.of(jnp.asarray(v, dt.jnp_dtype), dt)
    if isinstance(v, (float, np.floating)):
        return Column.of(jnp.asarray(v, jnp.float64), FLOAT64)
    raise TypeError(f"cannot infer literal type for {v!r}")


def _combine_validity(*cols) -> Optional[jnp.ndarray]:
    out = None
    for c in cols:
        if c.validity is None:
            continue
        out = c.validity if out is None else (out & c.validity)
    return out


def _promote_pair(l: Column, r: Column, for_div: bool = False
                  ) -> Tuple[Column, Column, DataType]:
    lt, rt = l.dtype, r.dtype
    if lt.is_any_string or rt.is_any_string:
        raise TypeError("string arithmetic not supported")
    if lt.is_decimal or rt.is_decimal:
        return _promote_decimal(l, r)
    if {lt.name, rt.name} == {"date32", "timestamp64"}:
        # promote the day count to micros-since-epoch so mixed
        # date/timestamp comparisons (d_date BETWEEN cast(.. AS DATE) ..)
        # compare on one clock (arrow/cast.rs date->timestamp semantics)
        from auron_tpu.dtypes import TIMESTAMP64

        def to_us(c: Column) -> Column:
            if c.dtype.name != "date32":
                return c
            return Column.of(c.values.astype(jnp.int64) * 86_400_000_000,
                             TIMESTAMP64, c.validity)
        return to_us(l), to_us(r), TIMESTAMP64
    if lt.name == "date32" or rt.name == "date32":
        # date +- int handled in functions (date_add); here require same type
        return l, r, DATE32
    if lt.name == "timestamp64" or rt.name == "timestamp64":
        # micros-since-epoch int64 representation compares directly
        return l, r, lt if lt.name == "timestamp64" else rt
    target = lt if _NUM_ORDER[lt.name] >= _NUM_ORDER[rt.name] else rt
    if for_div and not target.is_float:
        target = FLOAT64
    lc = l if lt.name == target.name else Column.of(
        l.values.astype(target.jnp_dtype), target, l.validity)
    rc = r if rt.name == target.name else Column.of(
        r.values.astype(target.jnp_dtype), target, r.validity)
    return lc, rc, target


def _promote_decimal(l: Column, r: Column):
    from auron_tpu.dtypes import DECIMAL64
    # normalize non-decimal side to decimal with scale 0
    if not l.dtype.is_decimal:
        l = Column.of(l.values.astype(jnp.int64), DECIMAL64(18, 0), l.validity)
    if not r.dtype.is_decimal:
        r = Column.of(r.values.astype(jnp.int64), DECIMAL64(18, 0), r.validity)
    return l, r, None  # op-specific result type resolved in _binary


_CMP_OPS = {"Eq": jnp.equal, "NotEq": jnp.not_equal, "Lt": jnp.less,
            "LtEq": jnp.less_equal, "Gt": jnp.greater,
            "GtEq": jnp.greater_equal}


def _binary(expr: N.BinaryOp, block: TableBlock) -> Column:
    op = expr.op
    l = evaluate(expr.left, block)
    r = evaluate(expr.right, block)

    if op in ("And", "Or"):
        return _logical(op, l, r)

    if op in _CMP_OPS:
        return _compare(op, l, r)

    if op in ("Plus", "Minus", "Multiply", "Divide", "Remainder"):
        return _arith(op, l, r)

    if op in ("BitAnd", "BitOr", "BitXor", "ShiftLeft", "ShiftRight"):
        lc, rc, t = _promote_pair(l, r)
        fn = {"BitAnd": jnp.bitwise_and, "BitOr": jnp.bitwise_or,
              "BitXor": jnp.bitwise_xor, "ShiftLeft": jnp.left_shift,
              "ShiftRight": jnp.right_shift}[op]
        return Column.of(fn(lc.values, rc.values), t, _combine_validity(l, r))

    raise NotImplementedError(f"binary op {op}")


def _logical(op: str, l: Column, r: Column) -> Column:
    """Three-valued AND/OR: a known-False AND / known-True OR dominates NULL."""
    lv = l.values.astype(jnp.bool_)
    rv = r.values.astype(jnp.bool_)
    if l.validity is None and r.validity is None:
        return Column.of(lv & rv if op == "And" else lv | rv, BOOL)
    lok, rok = l.valid_at(), r.valid_at()
    if op == "And":
        # wherever valid, lv & rv is correct: a known False forces False even
        # if the other lane holds garbage under an invalid slot
        value = (lv | ~lok) & (rv | ~rok)
        validity = (lok & rok) | (lok & ~lv) | (rok & ~rv)
    else:
        value = (lv & lok) | (rv & rok)
        validity = (lok & rok) | (lok & lv) | (rok & rv)
    return Column.of(value, BOOL, validity)


def _compare(op: str, l: Column, r: Column) -> Column:
    validity = _combine_validity(l, r)
    if l.dtype.is_raw_string or r.dtype.is_raw_string:
        return _compare_raw_strings(op, l, r, validity)
    if l.dtype.is_string or r.dtype.is_string:
        return _compare_strings(op, l, r, validity)
    if (l.dtype.is_decimal or r.dtype.is_decimal) and \
            (l.dtype.is_float or r.dtype.is_float):
        # Spark compares decimal vs double as double — truncating the
        # float to an integer decimal would flip results (e.g. d > 1.5)
        from auron_tpu.dtypes import FLOAT64 as _F64
        shapes = [c.values.shape for c in (l, r)
                  if getattr(c.values, "ndim", 0) >= 1
                  and not c.dtype.name == "decimal128"]
        cap = int(shapes[0][0]) if shapes else 1
        lf = cast_column(l, _F64, cap) if l.dtype.is_decimal else l
        rf = cast_column(r, _F64, cap) if r.dtype.is_decimal else r
        return _compare(op, lf, rf)
    if l.dtype.name == "decimal128" or r.dtype.name == "decimal128":
        if not (l.dtype.is_decimal and r.dtype.is_decimal):
            l, r, _ = _promote_decimal(l, r)
        return _compare_decimal128(op, l, r, validity)
    if l.dtype.name == "decimal64" and r.dtype.name == "decimal64" \
            and l.dtype.params[1] != r.dtype.params[1]:
        # rescale to the larger scale for exact compare
        s = max(l.dtype.params[1], r.dtype.params[1])
        from auron_tpu.dtypes import DECIMAL64
        l = cast_column(l, DECIMAL64(18, s), 0)
        r = cast_column(r, DECIMAL64(18, s), 0)
        lv, rv = l.values, r.values
    else:
        lc, rc, _ = _promote_pair(l, r)
        lv, rv = lc.values, rc.values
    return Column.of(_CMP_OPS[op](lv, rv), BOOL, validity)


def _compare_raw_strings(op: str, l: Column, r: Column, validity) -> Column:
    """Lexicographic compare on byte planes, fully on-device. The other
    side may be a dictionary string (incl. 1-entry literal dictionaries):
    a single-entry dict encodes as literal planes (wider literals handled
    exactly via the overflow flag), larger dicts via a plane-table gather."""
    from auron_tpu.expr import strings_raw as SR
    raw = l if l.dtype.is_raw_string else r
    other = r if raw is l else l
    W = SR.width_words(raw.dtype)
    r_extra = False
    if other.dtype.is_raw_string:
        W = max(W, SR.width_words(other.dtype))
        lv = SR.pad_planes(l.values, W)
        rv = SR.pad_planes(r.values, W)
    elif other.dtype.is_string:
        if len(other.dict_values) == 1:
            planes, extra = SR.encode_literal(str(other.dict_values[0]), W)
            ov = jnp.broadcast_to(jnp.asarray(planes),
                                  (raw.values.shape[0], W))
            r_extra = extra and other is r
            if extra and other is l:
                # wide literal on the LEFT: flip the comparison instead
                flip = {"Lt": "Gt", "LtEq": "GtEq", "Gt": "Lt",
                        "GtEq": "LtEq", "Eq": "Eq", "NotEq": "NotEq"}
                out = SR.lex_compare(flip[op], raw.values, ov,
                                     r_extra=True)
                return Column.of(out, BOOL, validity)
        else:
            mb = SR.max_bytes(other.dict_values)
            W = max(W, (mb + 3) // 4 or 1)
            ov = SR.dict_column_as_planes(other, W)
        lv = SR.pad_planes(raw.values, W) if raw is l else ov
        rv = ov if raw is l else SR.pad_planes(raw.values, W)
    else:
        raise TypeError(f"compare string_raw with {other.dtype!r}")
    return Column.of(SR.lex_compare(op, lv, rv, r_extra=r_extra), BOOL,
                     validity)


def _compare_strings(op: str, l: Column, r: Column, validity) -> Column:
    if not (l.dtype.is_string and r.dtype.is_string):
        # string vs date/number literal comparisons: cast string side
        other = r if l.dtype.is_string else l
        sc = l if l.dtype.is_string else r
        casted = cast_column(sc, other.dtype, 0)
        return _compare(op, casted if l.dtype.is_string else other,
                        other if l.dtype.is_string else casted)
    ld, rd = l.dict_values, r.dict_values
    if op in ("Eq", "NotEq"):
        if ld is rd:
            lv, rv = l.values, r.values
        elif len(rd) == 1:  # literal on the right
            code = S.code_of_literal(ld, rd[0])
            lv, rv = l.values, jnp.asarray(code, jnp.int32)
        elif len(ld) == 1:
            code = S.code_of_literal(rd, ld[0])
            lv, rv = jnp.asarray(code, jnp.int32), r.values
        else:
            xlate = S.translate_codes(ld, rd)
            lv = jnp.asarray(xlate)[jnp.clip(l.values, 0, len(ld) - 1)]
            rv = r.values
        return Column.of(_CMP_OPS[op](lv, rv), BOOL, validity)
    # ordering: compare lexicographic ranks in a merged dictionary
    merged = _merged_dict(ld, rd)
    la = S.translate_codes(ld, merged)
    ra = S.translate_codes(rd, merged)
    rank = S.sort_rank_table(merged)
    lv = jnp.asarray(rank[la])[jnp.clip(l.values, 0, len(ld) - 1)]
    rv = jnp.asarray(rank[ra])[jnp.clip(r.values, 0, len(rd) - 1)]
    return Column.of(_CMP_OPS[op](lv, rv), BOOL, validity)


_MERGED_CACHE: dict = {}


def _merged_dict(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    key = (id(a), id(b))
    hit = _MERGED_CACHE.get(key)
    if hit is None:
        # entry pins (a, b): their ids must not be recycled while cached
        hit = (a, b,
               np.unique(np.concatenate([a.astype(object),
                                         b.astype(object)])))
        _MERGED_CACHE[key] = hit
    return hit[2]


def _arith(op: str, l: Column, r: Column) -> Column:
    validity = _combine_validity(l, r)
    if l.dtype.is_decimal or r.dtype.is_decimal:
        # Spark DecimalPrecision: decimal op float -> double arithmetic,
        # anything else stays exact decimal (incl. decimal128 limb planes)
        if (not l.dtype.is_decimal and l.dtype.is_float) or \
                (not r.dtype.is_decimal and r.dtype.is_float):
            from auron_tpu.expr.cast import cast_column
            from auron_tpu.dtypes import FLOAT64 as _F64
            # literal columns are scalar-shaped: take cap from whichever
            # side actually has a row axis
            shapes = [c.values.shape for c in (l, r)
                      if getattr(c.values, "ndim", 0) >= 1]
            cap = int(shapes[0][0]) if shapes else 1
            lf = cast_column(l, _F64, cap) if l.dtype.is_decimal else l
            rf = cast_column(r, _F64, cap) if r.dtype.is_decimal else r
            return _arith(op, lf, rf)
        return _arith_decimal(op, l, r, validity)
    lc, rc, t = _promote_pair(l, r, for_div=(op == "Divide"))
    lv, rv = lc.values, rc.values
    if op == "Plus":
        out = lv + rv
    elif op == "Minus":
        out = lv - rv
    elif op == "Multiply":
        out = lv * rv
    elif op == "Divide":
        zero = rv == 0
        out = lv / jnp.where(zero, 1, rv)
        validity = _and_mask(validity, ~zero)
        out = jnp.where(zero, 0, out)
    elif op == "Remainder":
        zero = rv == 0
        safe = jnp.where(zero, 1, rv)
        if t.is_float:
            out = jnp.where(zero, 0, jnp.fmod(lv, safe))
        else:
            out = jnp.where(zero, 0, _java_mod(lv, safe))
        validity = _and_mask(validity, ~zero)
    else:
        raise NotImplementedError(op)
    return Column.of(out, t, validity)


def _java_mod(a, b):
    """Truncated remainder (sign follows dividend) like Java/Spark %;
    jnp's % is floored. r = a - trunc(a/b) * b."""
    q = (jnp.abs(a) // jnp.abs(b)) * jnp.sign(a) * jnp.sign(b)
    return a - q * b


def _decimal_limbs(c: Column):
    from auron_tpu.ops import decimal128 as d128
    if c.dtype.name == "decimal128":
        return d128.hi_lo(c.values)
    return d128.from_i64(c.values)


def _pack_decimal(hi, lo, out_t: "DataType", validity) -> Column:
    from auron_tpu.ops import decimal128 as d128
    if out_t.name == "decimal64":
        return Column.of(lo, out_t, validity)  # p <= 18 fits one limb
    return Column.of(d128.pack(hi, lo), out_t, validity)


def _compare_decimal128(op: str, l: Column, r: Column, validity) -> Column:
    """Exact wide-decimal compare: rescale both to the larger scale in
    128-bit limbs, then lexicographic (hi, unsigned lo) compare."""
    from auron_tpu.ops import decimal128 as d128
    s1, s2 = l.dtype.params[1], r.dtype.params[1]
    s = max(s1, s2)
    # checked rescale: only ONE side rescales (the smaller-scale one); on
    # i128 overflow that side dominates by sign instead of wrapping
    lh, ll, lov = d128.mul_pow10_checked(*_decimal_limbs(l), s - s1)
    rh, rl, rov = d128.mul_pow10_checked(*_decimal_limbs(r), s - s2)
    lneg = _decimal_limbs(l)[0] < 0
    rneg = _decimal_limbs(r)[0] < 0
    lt_ = d128.lt(lh, ll, rh, rl)
    eq_ = d128.eq(lh, ll, rh, rl)
    # overflowed left: |l| huge -> l < r iff l negative; mirrored for right
    lt_ = jnp.where(lov, lneg, jnp.where(rov, ~rneg, lt_))
    eq_ = eq_ & ~lov & ~rov
    out = {"Eq": eq_, "NotEq": ~eq_, "Lt": lt_, "LtEq": lt_ | eq_,
           "Gt": ~(lt_ | eq_), "GtEq": ~lt_}[op]
    return Column.of(out, BOOL, validity)


def _arith_decimal(op: str, l: Column, r: Column, validity) -> Column:
    """Spark decimal arithmetic with DecimalPrecision result types.

    Exactness contract (reference: Spark Decimal over Java BigDecimal,
    surfaced through datafusion-ext-exprs check_overflow):
      * +/-/* are exact: narrow results ride one int64 limb, wide results
        the 128-bit (or 256-bit intermediate) kernels in ops/decimal128.py.
      * / is exact via bit-serial long division at the result scale.
      * Overflow beyond the result precision -> NULL (TryCast semantics).
    """
    from auron_tpu.dtypes import decimal_result_type
    from auron_tpu.ops import decimal128 as d128
    l, r, _ = _promote_decimal(l, r)
    p1, s1 = l.dtype.params
    p2, s2 = r.dtype.params
    narrow_in = l.dtype.name == "decimal64" and r.dtype.name == "decimal64"
    if op == "Remainder":
        raise NotImplementedError("decimal Remainder")
    out_t = decimal_result_type(op, p1, s1, p2, s2)
    po, so = out_t.params

    if op in ("Plus", "Minus"):
        s = max(s1, s2)
        if narrow_in and out_t.name == "decimal64":
            lv = l.values * np.int64(10 ** (s - s1))
            rv = r.values * np.int64(10 ** (s - s2))
            out = lv + rv if op == "Plus" else lv - rv
            return Column.of(out, out_t, validity)
        lh, ll, lov = d128.mul_pow10_checked(*_decimal_limbs(l), s - s1)
        rh, rl, rov = d128.mul_pow10_checked(*_decimal_limbs(r), s - s2)
        fn = d128.add if op == "Plus" else d128.sub
        oh, ol = fn(lh, ll, rh, rl)
        if so < s:  # precision-loss adjustment shrank the scale
            oh, ol = d128.div_pow10_round(oh, ol, s - so)
        # a rescale that exceeds i128 -> NULL (Spark computes such extreme
        # scale mixes in BigDecimal; the 128-bit intermediate can't)
        ok = d128.fits_precision(oh, ol, po) & ~lov & ~rov
        return _pack_decimal(oh, ol, out_t, _and_mask(validity, ok))

    if op == "Multiply":
        if narrow_in and out_t.name == "decimal64":
            return Column.of(l.values * r.values, out_t, validity)
        lh, ll = _decimal_limbs(l)
        rh, rl = _decimal_limbs(r)
        lmh, lml, lneg = d128.abs128(lh, ll)
        rmh, rml, rneg = d128.abs128(rh, rl)
        wide = d128.mul_mag_wide(d128._limbs4(lmh, lml),
                                 d128._limbs4(rmh, rml))
        scaled = d128.div_pow10_mag(wide, s1 + s2 - so, half_up=True)
        oh, ol, over = d128.mag_to_i128(scaled)
        sign = lneg ^ rneg
        nh, nl = d128.neg(oh, ol)
        oh = jnp.where(sign, nh, oh)
        ol = jnp.where(sign, nl, ol)
        ok = ~over & d128.fits_precision(oh, ol, po)
        return _pack_decimal(oh, ol, out_t, _and_mask(validity, ok))

    # Divide: exact long division at the result scale (ops/decimal128.py)
    lh, ll = _decimal_limbs(l)
    rh, rl = _decimal_limbs(r)
    oh, ol, ok = d128.div_decimal_exact(lh, ll, rh, rl, so + s2 - s1)
    ok = ok & d128.fits_precision(oh, ol, po)
    return _pack_decimal(oh, ol, out_t, _and_mask(validity, ok))


def _and_mask(validity, extra):
    return extra if validity is None else (validity & extra)


def _case_when(expr: N.CaseWhen, block: TableBlock) -> Column:
    conds = []
    vals = []
    for c, v in expr.branches:
        cc = evaluate(c, block)
        # NULL condition counts as false
        cond = cc.values.astype(jnp.bool_)
        if cc.validity is not None:
            cond = cond & cc.validity
        conds.append(cond)
        vals.append(evaluate(v, block))
    other = evaluate(expr.otherwise, block) if expr.otherwise is not None \
        else None
    # promote all value branches to a common type
    out_t = vals[0].dtype
    pool = vals + ([other] if other is not None else [])
    for v in pool[1:]:
        if _NUM_ORDER.get(v.dtype.name, -1) > _NUM_ORDER.get(out_t.name, -1):
            out_t = v.dtype
    if any(v.dtype.is_raw_string for v in pool):
        # mixed raw/dictionary string branches converge on raw planes;
        # NULL-literal branches (non-string dtype, all-invalid) become
        # all-NULL raw columns instead of entering the width computation
        from auron_tpu.dtypes import STRING_RAW
        from auron_tpu.expr import strings_raw as SR

        def _is_null_branch(v):
            return not (v.dtype.is_raw_string or v.dtype.is_string)

        W = max(SR.width_words(v.dtype) if v.dtype.is_raw_string
                else max((SR.max_bytes(v.dict_values) + 3) // 4, 1)
                for v in pool if not _is_null_branch(v))
        out_t = STRING_RAW(W)
        cap0 = block.capacity

        def _to_raw(v):
            if _is_null_branch(v):
                # only the NULL literal coerces with strings in Spark's
                # type system — an all-NULL raw column is its raw form
                empty = jnp.full((cap0, W), jnp.int32(-0x80000000),
                                 jnp.int32)
                return Column(empty, jnp.zeros(cap0, jnp.bool_), out_t,
                              None)
            return cast_column(v, out_t, cap0)

        cast_pool = [_to_raw(v) for v in pool]
    elif out_t.is_string:
        cast_pool, _merged = S.unify_string_columns(pool)
    else:
        cast_pool = [v if v.dtype.name == out_t.name else
                     cast_column(v, out_t, block.capacity) for v in pool]
    vals = cast_pool[:len(vals)]
    other = cast_pool[-1] if other is not None else None

    if other is None:
        out = jnp.zeros((), out_t.jnp_dtype)
        ok = jnp.zeros((), jnp.bool_)
    else:
        out, ok = other.values, other.valid_at() if other.validity is not None \
            else jnp.ones((), jnp.bool_)
    # build from last branch backwards so first match wins
    for cond, v in zip(reversed(conds), reversed(vals)):
        # plane-valued branches (decimal128 limbs / raw string words)
        # broadcast the row condition across planes
        cnd = cond[:, None] if getattr(v.values, "ndim", 1) == 2 else cond
        out = jnp.where(cnd, v.values, out)
        vok = v.valid_at() if v.validity is not None else jnp.ones((), jnp.bool_)
        ok = jnp.where(cond, vok, ok)
    cap = block.capacity
    out = jnp.broadcast_to(out, (cap,)) if out.ndim == 0 else out
    ok = jnp.broadcast_to(ok, (cap,)) if ok.ndim == 0 else ok
    dict_values = vals[0].dict_values if out_t.is_string else None
    return Column(out, ok, out_t, dict_values)


def _in_list(expr: N.InList, block: TableBlock) -> Column:
    c = evaluate(expr.child, block)
    hit = None
    has_null_item = False
    for v in expr.values:
        if v is None:
            has_null_item = True
            continue
        eq = _compare("Eq", c, _literal_column(N.Literal(v)))
        hit = eq.values if hit is None else (hit | eq.values)
    if hit is None:
        hit = jnp.zeros(block.capacity, jnp.bool_)
    validity = c.validity
    if has_null_item:
        # value NOT IN list containing null -> NULL unless matched
        known = hit if validity is None else (validity & hit)
        validity = known
    out = ~hit if expr.negated else hit
    if expr.negated and has_null_item:
        out = jnp.zeros_like(hit)
    return Column.of(out, BOOL, validity)


def _py_udf(expr: "N.PyUDF", block: TableBlock) -> Column:
    """Host round-trip UDF (see nodes.PyUDF). NULL handling: output is NULL
    where any argument is NULL (Spark's default null-intolerant UDF path)."""
    import jax
    cap = block.capacity
    cols = [materialize(evaluate(a, block), cap) for a in expr.args]
    out_t = expr.dtype
    if out_t.is_string:
        # string outputs ride raw byte planes (fixed shape, jit-safe) —
        # a data-dependent dictionary cannot be built under tracing
        from auron_tpu import config as _cfg
        from auron_tpu.dtypes import STRING_RAW
        out_t = STRING_RAW(_cfg.conf.get(_cfg.UDF_STRING_BYTES) // 4)

    decoders = []
    for c in cols:
        if c.dtype.is_string:
            dv = c.dict_values
            decoders.append(("str", dv))
        elif c.dtype.is_raw_string:
            decoders.append(("rawstr", None))
        else:
            decoders.append(("raw", None))

    fn = expr.fn

    def host_call(*arrays):
        from auron_tpu.expr import strings_raw as SR
        decoded = []
        for (kind, dv), arr in zip(decoders, arrays):
            arr = np.asarray(arr)
            if kind == "str":
                codes = np.clip(arr, 0, len(dv) - 1)
                decoded.append(dv[codes])
            elif kind == "rawstr":
                decoded.append(SR.decode_planes(arr))
            else:
                decoded.append(arr)
        out = np.asarray(fn(*decoded))
        if out_t.is_raw_string:
            return SR.encode_object_array(out.astype(object),
                                          out_t.params[0])
        return out.astype(out_t.np_dtype, copy=False)

    shape = (cap, out_t.params[0]) if out_t.is_raw_string else (cap,)
    result = jax.pure_callback(
        host_call,
        jax.ShapeDtypeStruct(shape, out_t.np_dtype),
        *[c.values for c in cols],
        vmap_method="sequential")
    validity = _combine_validity(*cols)
    return Column.of(result, out_t, validity)


def _scalar_subquery(expr) -> Column:
    """Run the embedded 1x1 subplan against the innermost session (traced
    tables under whole-plan jit) and return a broadcastable 0-d Column."""
    from auron_tpu.plan.execute import current_session, execute_plan
    s = current_session()
    if s is None:
        raise RuntimeError(
            "ScalarSubquery evaluated outside execute_plan (no session)")
    blocks = execute_plan(expr.plan, s)
    from auron_tpu.ops.join import concat_blocks
    b = blocks[0] if len(blocks) == 1 else concat_blocks(list(blocks))
    name = b.names[0]
    c = b.columns[name]
    import jax.core
    if not isinstance(b.row_mask, jax.core.Tracer):
        n = int(np.asarray(jnp.sum(b.row_mask.astype(jnp.int32))))
        if n > 1:  # Spark: runtime error, not an arbitrary row
            raise ValueError(
                f"scalar subquery returned {n} rows (expected at most 1)")
    idx = jnp.argmax(b.row_mask)
    v = c.values[idx]
    have = b.row_mask[idx]
    if c.validity is not None:
        have = have & c.validity[idx]
    return Column(v, have, c.dtype, c.dict_values)
