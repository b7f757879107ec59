"""Differential tests for the 128-bit limb kernels vs python big ints."""

import numpy as np
import pytest

import auron_tpu  # noqa: F401  (x64 on)
import jax.numpy as jnp

from auron_tpu.ops import decimal128 as d


def _rand_i128(rng, n, bits=120):
    out = []
    for _ in range(n):
        b = int(rng.integers(0, bits + 1))
        v = int(rng.integers(0, 2**31)) | (int(rng.integers(0, 2**62)) << 31)
        v = (v << max(b - 93, 0)) & ((1 << b) - 1) if b else 0
        if rng.random() < 0.5:
            v = -v
        out.append(v)
    # always include the edge cases
    out[:6] = [0, -1, 2**64 - 1, -(2**64), 2**127 - 1, -(2**127)]
    return out


@pytest.fixture(scope="module")
def vals():
    rng = np.random.default_rng(7)
    a = _rand_i128(rng, 64)
    b = _rand_i128(rng, 64)
    return a, b


def _planes(ints):
    arr = jnp.asarray(d.np_from_ints(ints))
    return arr[:, 0], arr[:, 1]


def _wrap(v):
    v &= (1 << 128) - 1
    return v - (1 << 128) if v >= 1 << 127 else v


def test_roundtrip(vals):
    a, _ = vals
    planes = d.np_from_ints(a)
    assert d.np_to_ints(planes) == a


def test_add_sub_neg(vals):
    a, b = vals
    ah, al = _planes(a)
    bh, bl = _planes(b)
    got = d.np_to_ints(np.asarray(d.pack(*d.add(ah, al, bh, bl))))
    assert got == [_wrap(x + y) for x, y in zip(a, b)]
    got = d.np_to_ints(np.asarray(d.pack(*d.sub(ah, al, bh, bl))))
    assert got == [_wrap(x - y) for x, y in zip(a, b)]
    got = d.np_to_ints(np.asarray(d.pack(*d.neg(ah, al))))
    assert got == [_wrap(-x) for x in a]


def test_mul(vals):
    a, b = vals
    ah, al = _planes(a)
    bh, bl = _planes(b)
    got = d.np_to_ints(np.asarray(d.pack(*d.mul(ah, al, bh, bl))))
    assert got == [_wrap(x * y) for x, y in zip(a, b)]


def test_compare(vals):
    a, b = vals
    ah, al = _planes(a)
    bh, bl = _planes(b)
    np.testing.assert_array_equal(
        np.asarray(d.lt(ah, al, bh, bl)), [x < y for x, y in zip(a, b)])
    np.testing.assert_array_equal(
        np.asarray(d.eq(ah, al, bh, bl)), [x == y for x, y in zip(a, b)])


def test_orderable_ops_sort(vals):
    a, _ = vals
    arr = jnp.asarray(d.np_from_ints(a))
    import jax
    ops = d.orderable_ops(arr)
    order = np.lexsort((np.asarray(ops[1]), np.asarray(ops[0])))
    assert [a[i] for i in order] == sorted(a)


@pytest.mark.parametrize("k", [1, 2, 5, 19, 37])
def test_div_pow10_half_up(vals, k):
    a, _ = vals
    ah, al = _planes(a)
    got = d.np_to_ints(np.asarray(d.pack(*d.div_pow10_round(ah, al, k))))
    from decimal import Decimal, ROUND_HALF_UP, localcontext
    with localcontext() as ctx:
        ctx.prec = 60
        want = [int(Decimal(x).scaleb(-k).quantize(0, ROUND_HALF_UP))
                for x in a]
    assert got == want


@pytest.mark.parametrize("k", [0, 3, 21])
def test_mul_pow10(vals, k):
    a, _ = vals
    ah, al = _planes(a)
    got = d.np_to_ints(np.asarray(d.pack(*d.mul_pow10(ah, al, k))))
    assert got == [_wrap(x * 10**k) for x in a]


def test_fits_precision(vals):
    a, _ = vals
    ah, al = _planes(a)
    for p in (5, 18, 38):
        np.testing.assert_array_equal(
            np.asarray(d.fits_precision(ah, al, p)),
            [abs(x) < 10**p for x in a])


def test_wide_mul_rescale(vals):
    """256-bit product of two magnitudes, rescaled — the exact decimal
    multiply path."""
    a, b = vals
    am = [abs(x) % 10**38 for x in a]
    bm = [abs(x) % 10**38 for x in b]
    ah, al = _planes(am)
    bh, bl = _planes(bm)
    wide = d.mul_mag_wide(d._limbs4(ah, al), d._limbs4(bh, bl))
    from decimal import Decimal, ROUND_HALF_UP, localcontext
    for k in (0, 7, 40):
        scaled = d.div_pow10_mag(wide, k, half_up=True)
        hi, lo, over = d.mag_to_i128(scaled)
        got = d.np_to_ints(np.asarray(d.pack(hi, lo)))
        with localcontext() as ctx:
            ctx.prec = 90
            want = [int(Decimal(x * y).scaleb(-k)
                        .quantize(0, ROUND_HALF_UP))
                    for x, y in zip(am, bm)]
        for g, w, o in zip(got, want, np.asarray(over)):
            if w < 2**127:
                assert not o
                assert g == w
            else:
                assert o


def test_exact_division(vals):
    """Bit-serial long division == BigDecimal HALF_UP division."""
    a, b = vals
    am = [x % 10**38 for x in a]          # signed, |.| < 10^38
    bm = [y % 10**38 - (10**38 if abs(y) % 3 == 0 and y else 0) for y in b]
    ah, al = _planes(am)
    bh, bl = _planes(bm)
    for scale_up in (0, 6, 20):
        hi, lo, ok = d.div_decimal_exact(ah, al, bh, bl, scale_up)
        got = d.np_to_ints(np.asarray(d.pack(hi, lo)))
        okv = np.asarray(ok)
        from decimal import Decimal, ROUND_HALF_UP, localcontext
        with localcontext() as ctx:
            ctx.prec = 120
            for g, o, x, y in zip(got, okv, am, bm):
                if y == 0:
                    assert not o
                    continue
                want = int((Decimal(x) * 10**scale_up / Decimal(y))
                           .quantize(0, ROUND_HALF_UP))
                if abs(want) < 2**127:
                    assert o and g == want, (x, y, scale_up, g, want)


def test_f64_roundtrip():
    xs = [0.0, 1.0, -1.0, 123456789.5, -9.87e20, 3.2e30]
    hi, lo = d.from_f64(jnp.asarray(xs, jnp.float64))
    got = d.np_to_ints(np.asarray(d.pack(hi, lo)))
    assert got == [int(round(x)) for x in xs]
    back = np.asarray(d.to_f64(hi, lo))
    np.testing.assert_allclose(back, [float(round(x)) for x in xs],
                               rtol=1e-15)


# ---------------------------------------------------------------------------
# engine-level: decimal128 columns through expressions, aggregation, sort,
# join and serde (reference: Decimal128 flowing through every ext-plans
# operator via Arrow; here the [cap, 2] limb planes must survive the same)
# ---------------------------------------------------------------------------

def _dec_block(ints, scale=2, prec=38, extra=None):
    from auron_tpu.block import TableBlock
    from auron_tpu.dtypes import DECIMAL128
    data = {"d": np.array([int(v) for v in ints], dtype=object)}
    dts = {"d": DECIMAL128(prec, scale)}
    if extra:
        data.update(extra)
    return TableBlock.from_numpy(data, dts)


def test_e2e_mul_of_longs_goes_wide():
    """decimal(18,2) * decimal(18,2) -> exact decimal128(37,4)."""
    from auron_tpu.block import TableBlock
    from auron_tpu.dtypes import DECIMAL64
    from auron_tpu.expr.nodes import col
    from auron_tpu.expr.eval import project_block
    a = [10**17 + 3, -5 * 10**16, 123456]
    b2 = [99, 10**18 - 1, -77]
    blk = TableBlock.from_numpy(
        {"a": np.array(a, np.int64), "b": np.array(b2, np.int64)},
        dtypes={"a": DECIMAL64(18, 2), "b": DECIMAL64(18, 2)})
    out = project_block(blk, [(col("a") * col("b")).alias("p")])
    c = out.columns["p"]
    assert c.dtype.name == "decimal128" and c.dtype.params == (37, 4)
    got = d.np_to_ints(np.asarray(c.values)[:3])
    assert got == [x * y for x, y in zip(a, b2)]


def test_e2e_exact_wide_sum_groupby():
    from auron_tpu.expr.nodes import col
    from auron_tpu.plan import Agg, AggCall, MemoryScan, Session, execute_plan
    rng = np.random.default_rng(3)
    n = 512
    vals = [int(rng.integers(-10**12, 10**12)) * 10**15 for _ in range(n)]
    keys = rng.integers(0, 7, n)
    blk = _dec_block(vals, extra={"k": keys.astype(np.int64)})
    s = Session().register("t", blk)
    plan = Agg(MemoryScan("t"), keys=(("k", col("k")),),
               calls=(AggCall("total", "sum", col("d")),
                      AggCall("lo", "min", col("d")),
                      AggCall("hi", "max", col("d"))), mode="single")
    outb = execute_plan(plan, s)[0]
    mask = np.asarray(outb.row_mask)
    kv = np.asarray(outb.columns["k"].values)[mask]
    tot = d.np_to_ints(np.asarray(outb.columns["total"].values)[mask])
    lo = d.np_to_ints(np.asarray(outb.columns["lo"].values)[mask])
    hi = d.np_to_ints(np.asarray(outb.columns["hi"].values)[mask])
    for k_, t_, l_, h_ in zip(kv, tot, lo, hi):
        grp = [v for v, kk in zip(vals, keys) if kk == k_]
        assert t_ == sum(grp)        # exact: far beyond int64/f64 range
        assert l_ == min(grp) and h_ == max(grp)


def test_e2e_sort_and_join_on_wide_keys():
    from auron_tpu.ops.sort import SortKey, sort_block
    from auron_tpu.ops.join import JoinSpec, join_blocks, INNER
    rng = np.random.default_rng(5)
    left_keys = [int(rng.integers(-10**15, 10**15)) * 10**16
                 for _ in range(40)]
    blk = _dec_block(left_keys, extra={"x": np.arange(40, dtype=np.int64)})
    srt = sort_block(blk, [SortKey("d", ascending=False)])
    got = d.np_to_ints(np.asarray(srt.columns["d"].values)[
        np.asarray(srt.row_mask)])
    assert got == sorted(left_keys, reverse=True)

    right_keys = left_keys[::2] + [999 * 10**20]
    rblk = _dec_block(right_keys,
                      extra={"y": np.arange(len(right_keys),
                                            dtype=np.int64)})
    spec = JoinSpec(("d",), ("d",), INNER)
    out = join_blocks(blk, rblk, spec)
    mask = np.asarray(out.row_mask)
    joined = d.np_to_ints(np.asarray(out.columns["d"].values)[mask])
    assert sorted(joined) == sorted(left_keys[::2])


def test_e2e_serde_roundtrip():
    from auron_tpu.io.serde import serialize_block, deserialize_block
    blk = _dec_block([10**30, -10**25, 7], extra={"z": np.ones(3)})
    data = serialize_block(blk)
    back = deserialize_block(data)
    assert d.np_to_ints(np.asarray(back.columns["d"].values)[:3]) == \
        [10**30, -10**25, 7]
    assert back.columns["d"].dtype.params == (38, 2)


def test_e2e_division_exact():
    """decimal / decimal is exact at the Spark result scale."""
    from auron_tpu.block import TableBlock
    from auron_tpu.dtypes import DECIMAL64
    from auron_tpu.expr.nodes import col
    from auron_tpu.expr.eval import project_block
    a = [100, 1, 7]
    b2 = [300, 3, 9]
    blk = TableBlock.from_numpy(
        {"a": np.array(a, np.int64), "b": np.array(b2, np.int64)},
        dtypes={"a": DECIMAL64(18, 2), "b": DECIMAL64(18, 2)})
    out = project_block(blk, [(col("a") / col("b")).alias("q")])
    c = out.columns["q"]
    assert c.dtype.is_decimal
    scale = c.dtype.params[1]
    ints = d.np_to_ints(np.asarray(c.values)[:3]) \
        if c.dtype.name == "decimal128" else \
        [int(v) for v in np.asarray(c.values)[:3]]
    from decimal import Decimal, ROUND_HALF_UP, localcontext
    with localcontext() as ctx:
        ctx.prec = 60
        for g, x, y in zip(ints, a, b2):
            want = int((Decimal(x) / Decimal(y)).scaleb(scale)
                       .quantize(0, ROUND_HALF_UP))
            assert g == want


def test_e2e_cast_roundtrips():
    from auron_tpu.dtypes import DECIMAL64, DECIMAL128, INT64, FLOAT64, STRING
    from auron_tpu.expr.cast import cast_column
    blk = _dec_block([123456789012345678901234567890, -5 * 10**24, 42])
    c = blk.columns["d"]
    s = cast_column(c, STRING, 0)
    dec = [s.dict_values[i] for i in np.asarray(s.values)[:3]]
    assert dec[0] == "1234567890123456789012345678.90"
    assert dec[2] == "0.42"
    back = cast_column(s, DECIMAL128(38, 2), 0)
    assert d.np_to_ints(np.asarray(back.values)[:3]) == \
        [123456789012345678901234567890, -5 * 10**24, 42]
    f = cast_column(c, FLOAT64, 0)
    np.testing.assert_allclose(
        np.asarray(f.values)[:3],
        [1.23456789012345678901234567890e27, -5e22, 0.42], rtol=1e-14)
    i = cast_column(cast_column(c, DECIMAL64(18, 0), 0), INT64, 0)
    # first two overflow decimal64 -> NULL; third truncates toward zero
    ok = np.asarray(i.validity)[:3]
    assert not ok[0] and not ok[1]


def test_from_i64():
    xs = jnp.asarray([0, 1, -1, 2**62, -(2**63)], jnp.int64)
    hi, lo = d.from_i64(xs)
    assert d.np_to_ints(np.asarray(d.pack(hi, lo))) == \
        [0, 1, -1, 2**62, -(2**63)]


def test_decimal128_times_int_and_float():
    """decimal128 op non-decimal: int stays exact decimal (q61's
    promotions/total*100 shape), float goes through double arithmetic
    (Spark DecimalPrecision nondecimal-float rule)."""
    from auron_tpu.expr.eval import project_block
    from auron_tpu.expr.nodes import col, lit
    blk = _dec_block([12345, -250, 42],
                     extra={"n": np.array([3, 3, 3], np.int64),
                            "f": np.array([0.5, 0.5, 0.5], np.float64)})
    out = project_block(blk, [(col("d") * col("n")).alias("di"),
                              (col("d") * col("f")).alias("df"),
                              (col("d") / lit(100)).alias("dd")])
    di = out.columns["di"]
    assert di.dtype.is_decimal
    got = d.np_to_ints(np.asarray(di.values)[:3])
    assert got == [37035, -750, 126]
    df = out.columns["df"]
    assert df.dtype.is_float
    np.testing.assert_allclose(np.asarray(df.values)[:3],
                               [61.725, -1.25, 0.21], rtol=1e-12)
    dd = out.columns["dd"]
    assert dd.dtype.is_decimal


def test_decimal_times_float_literal():
    """decimal column x float LITERAL (scalar-shaped) goes through double
    arithmetic without crashing on the literal's empty shape."""
    from auron_tpu.block import TableBlock
    from auron_tpu.dtypes import DECIMAL64
    from auron_tpu.expr.eval import project_block
    from auron_tpu.expr.nodes import col, lit
    blk = TableBlock.from_numpy(
        {"d": np.array([150, -250], np.int64)}, {"d": DECIMAL64(10, 2)})
    out = project_block(blk, [(col("d") * lit(0.5)).alias("x")])
    assert out.columns["x"].dtype.is_float
    np.testing.assert_allclose(np.asarray(out.columns["x"].values)[:2],
                               [0.75, -1.25])
