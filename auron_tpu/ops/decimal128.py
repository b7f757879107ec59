"""128-bit decimal limb arithmetic — Spark DecimalType(p>18) on the VPU.

The reference stores wide decimals as Arrow Decimal128 and runs them through
DataFusion's i128 kernels (reference:
/root/reference/native-engine/datafusion-ext-commons/src/arrow/cast.rs decimal
paths, datafusion-ext-exprs check_overflow / make_decimal). TPUs have no
128-bit integer type — and int64 itself is emulated — so the TPU-native
re-design represents a decimal128 column as a ``[capacity, 2]`` int64 plane
pair: ``[:, 0]`` = high 64 bits (signed), ``[:, 1]`` = low 64 bits (the uint64
bit pattern stored in an int64). All arithmetic is branch-free limb
manipulation (two's-complement add with carry, 32-bit-limb schoolbook
multiply, digit-serial division by powers of ten) that XLA fuses into the
surrounding expression — no host round-trips on the hot path.

Every kernel here is differentially tested against arbitrary-precision
python ints (tests/test_decimal128.py).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

_M32 = np.int64(0xFFFFFFFF)
_SIGN = np.int64(-2**63)
_U64 = 1 << 64
_M64 = _U64 - 1


# ---------------------------------------------------------------------------
# bit-pattern helpers
# ---------------------------------------------------------------------------

def _ult(a, b):
    """Unsigned < on int64 bit patterns (flip the sign bit, compare signed)."""
    return (a ^ _SIGN) < (b ^ _SIGN)


def hi_lo(values) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Split a [..., 2] limb-plane array into (hi, lo)."""
    return values[..., 0], values[..., 1]


def pack(hi, lo) -> jnp.ndarray:
    """Stack (hi, lo) back into the [..., 2] storage layout."""
    return jnp.stack([hi, lo], axis=-1)


def from_i64(v) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sign-extend an int64 array to 128 bits."""
    v = v.astype(jnp.int64)
    return v >> np.int64(63), v


def to_i64_clamped(hi, lo):
    """Low 64 bits plus an in-range flag (value representable in int64)."""
    ok = hi == (lo >> np.int64(63))
    return lo, ok


def const128(v: int) -> Tuple[np.int64, np.int64]:
    """Host-side 128-bit constant -> (hi, lo) int64 bit patterns."""
    v = int(v) & ((1 << 128) - 1)
    lo = v & _M64
    hi = (v >> 64) & _M64
    as_i64 = lambda u: np.uint64(u).astype(np.int64)
    return as_i64(hi), as_i64(lo)


# ---------------------------------------------------------------------------
# add / neg / compare
# ---------------------------------------------------------------------------

def add(a_hi, a_lo, b_hi, b_lo):
    """128-bit two's-complement add (wraps mod 2^128 like the i128 it models)."""
    lo = a_lo + b_lo  # int64 add wraps = uint64 add bit pattern
    carry = _ult(lo, a_lo).astype(jnp.int64)
    return a_hi + b_hi + carry, lo


def neg(hi, lo):
    n_lo = -lo
    borrow = (lo == 0).astype(jnp.int64)
    return ~hi + borrow, n_lo


def sub(a_hi, a_lo, b_hi, b_lo):
    n_hi, n_lo = neg(b_hi, b_lo)
    return add(a_hi, a_lo, n_hi, n_lo)


def lt(a_hi, a_lo, b_hi, b_lo):
    return (a_hi < b_hi) | ((a_hi == b_hi) & _ult(a_lo, b_lo))


def eq(a_hi, a_lo, b_hi, b_lo):
    return (a_hi == b_hi) & (a_lo == b_lo)


def is_neg(hi, lo):
    return hi < 0


def abs128(hi, lo):
    """(|x|, was_negative). |i128::MIN| wraps, matching i128 semantics."""
    n = is_neg(hi, lo)
    nh, nl = neg(hi, lo)
    return jnp.where(n, nh, hi), jnp.where(n, nl, lo), n


def orderable_ops(values):
    """Two int64 sort/join operands with lexicographic order == numeric order:
    signed hi, then sign-flipped lo (unsigned order under signed compare)."""
    hi, lo = hi_lo(values)
    return [hi, lo ^ _SIGN]


# ---------------------------------------------------------------------------
# multiply
# ---------------------------------------------------------------------------

def _limbs4(hi, lo):
    """[hi, lo] -> four 32-bit limbs (little-endian) held in int64."""
    return (lo & _M32, (lo >> np.int64(32)) & _M32,
            hi & _M32, (hi >> np.int64(32)) & _M32)


def _from_limbs4(l0, l1, l2, l3):
    lo = (l0 & _M32) | ((l1 & _M32) << np.int64(32))
    hi = (l2 & _M32) | ((l3 & _M32) << np.int64(32))
    return hi, lo


def mul(a_hi, a_lo, b_hi, b_lo):
    """128 x 128 -> low 128 bits (schoolbook over 32-bit limbs).

    Each 32x32 partial product is exact in one int64; column accumulators
    stay < 2^40, far from overflow.
    """
    a = _limbs4(a_hi, a_lo)
    b = _limbs4(b_hi, b_lo)
    acc = [jnp.zeros_like(a_lo) for _ in range(4)]
    for i in range(4):
        for j in range(4 - i):
            p = a[i] * b[j]
            acc[i + j] = acc[i + j] + (p & _M32)
            if i + j + 1 < 4:
                acc[i + j + 1] = acc[i + j + 1] + ((p >> np.int64(32)) & _M32)
    out = []
    carry = jnp.zeros_like(a_lo)
    for k in range(4):
        t = acc[k] + carry
        out.append(t & _M32)
        carry = (t >> np.int64(32)) & _M32
    return _from_limbs4(*out)


def mul_pow10(hi, lo, k: int):
    """x * 10^k (mod 2^128), k a static python int >= 0."""
    if k == 0:
        return hi, lo
    c_hi, c_lo = const128(10 ** k)
    return mul(hi, lo, jnp.full_like(hi, c_hi), jnp.full_like(lo, c_lo))


def mul_pow10_checked(hi, lo, k: int):
    """x * 10^k with an OVERFLOW flag (x * 10^k outside i128) instead of
    the silent mod-2^128 wrap — rescales for compares/additions must never
    flip signs."""
    if k == 0:
        return hi, lo, jnp.zeros_like(hi, jnp.bool_)
    m_hi, m_lo, negf = abs128(hi, lo)
    limbs = list(_limbs4(m_hi, m_lo))
    extra = (k * 4) // 32 + 1  # 10^k < 2^(4k) extra bits
    limbs = limbs + [jnp.zeros_like(limbs[0])] * extra
    limbs = mul_pow10_mag(limbs, k)
    oh, ol, over = mag_to_i128(limbs)
    nh, nl = neg(oh, ol)
    oh = jnp.where(negf, nh, oh)
    ol = jnp.where(negf, nl, ol)
    return oh, ol, over


# ---------------------------------------------------------------------------
# divide by powers of ten (rescale) — digit-serial, branch-free
# ---------------------------------------------------------------------------

def _div10_mag(l0, l1, l2, l3):
    """Divide a non-negative 4x32-limb value by 10; returns (limbs, rem).

    Long division high->low: cur = rem * 2^32 + limb stays < 10 * 2^32,
    comfortably inside int64.
    """
    rem = jnp.zeros_like(l0)
    out = []
    for limb in (l3, l2, l1, l0):
        cur = (rem << np.int64(32)) | limb
        out.append(cur // np.int64(10))
        rem = cur % np.int64(10)
    q3, q2, q1, q0 = out
    return (q0, q1, q2, q3), rem


def div_pow10_round(hi, lo, k: int, half_up: bool = True):
    """x / 10^k, HALF_UP by default (Spark decimal rescale semantics:
    arrow/cast.rs decimal rescale + check_overflow round toward nearest,
    ties away from zero); ``half_up=False`` truncates toward zero
    (decimal->int casts). k is a static python int >= 0."""
    if k == 0:
        return hi, lo
    mag_hi, mag_lo, sign = abs128(hi, lo)
    if half_up:
        # round half away from zero == trunc((|x| + 5*10^(k-1)) / 10^k)
        r_hi, r_lo = const128(5 * 10 ** (k - 1))
        mag_hi, mag_lo = add(mag_hi, mag_lo,
                             jnp.full_like(hi, r_hi), jnp.full_like(lo, r_lo))
    limbs = _limbs4(mag_hi, mag_lo)
    for _ in range(k):
        limbs, _ = _div10_mag(*limbs)
    q_hi, q_lo = _from_limbs4(*limbs)
    n_hi, n_lo = neg(q_hi, q_lo)
    return jnp.where(sign, n_hi, q_hi), jnp.where(sign, n_lo, q_lo)


def fits_precision(hi, lo, precision: int):
    """|x| < 10^precision (the check_overflow bound)."""
    b_hi, b_lo = const128(10 ** precision)
    mag_hi, mag_lo, _ = abs128(hi, lo)
    # |i128::MIN| wraps back to a negative magnitude — never in range
    return ~is_neg(mag_hi, mag_lo) & lt(
        mag_hi, mag_lo, jnp.full_like(hi, b_hi), jnp.full_like(lo, b_lo))


# ---------------------------------------------------------------------------
# 256-bit magnitude intermediates — exact wide-decimal multiply.
# Spark's Decimal.multiply goes through Java BigDecimal (arbitrary
# precision) then CheckOverflow rounds to the result type; two 38-digit
# unscaled values can need 76 digits (~253 bits), so the exact product is
# computed over eight 32-bit limbs and rescaled before truncating to 128.
# ---------------------------------------------------------------------------

def mul_mag_wide(a_limbs, b_limbs):
    """4x32-limb magnitudes -> exact 8x32-limb product (non-negative)."""
    acc = [None] * 8
    zero = jnp.zeros_like(a_limbs[0])
    for i in range(4):
        for j in range(4):
            p = a_limbs[i] * b_limbs[j]
            k = i + j
            acc[k] = (acc[k] if acc[k] is not None else zero) + (p & _M32)
            acc[k + 1] = (acc[k + 1] if acc[k + 1] is not None else zero) \
                + ((p >> np.int64(32)) & _M32)
    out, carry = [], zero
    for k in range(8):
        t = (acc[k] if acc[k] is not None else zero) + carry
        out.append(t & _M32)
        carry = (t >> np.int64(32)) & _M32
    return out


def _div10_mag_n(limbs):
    """Divide a non-negative n x 32-limb value by 10 -> (limbs, remainder)."""
    rem = jnp.zeros_like(limbs[0])
    out = [None] * len(limbs)
    for idx in range(len(limbs) - 1, -1, -1):
        cur = (rem << np.int64(32)) | limbs[idx]
        out[idx] = cur // np.int64(10)
        rem = cur % np.int64(10)
    return out, rem


def div_pow10_mag(limbs, k: int, half_up: bool):
    """Non-negative n-limb magnitude / 10^k with optional HALF_UP."""
    if k == 0:
        return limbs
    if half_up:
        # add 5*10^(k-1) limb-wise (constant fits python int)
        c = 5 * 10 ** (k - 1)
        carry = jnp.zeros_like(limbs[0])
        added = []
        for idx in range(len(limbs)):
            t = limbs[idx] + np.int64((c >> (32 * idx)) & 0xFFFFFFFF) + carry
            added.append(t & _M32)
            carry = (t >> np.int64(32)) & _M32
        limbs = added
    for _ in range(k):
        limbs, _ = _div10_mag_n(limbs)
    return limbs


def mag_to_i128(limbs):
    """Low 4 limbs -> (hi, lo); overflow flag if any higher limb set or the
    sign bit of limb 3 is occupied (magnitude must fit a POSITIVE i128)."""
    hi, lo = _from_limbs4(*limbs[:4])
    over = hi < 0  # bit 127 set
    for l in limbs[4:]:
        over = over | (l != 0)
    return hi, lo, over


# ---------------------------------------------------------------------------
# exact division — restoring binary long division over limb vectors.
# Spark divides decimals through Java BigDecimal (arbitrary precision,
# HALF_UP at the result scale); here the numerator is scaled up to
# 12 x 32 limbs (384 bits — enough for |A| * 10^81, the worst case of
# 38-digit operands at extreme scales) and divided bit-serially under
# lax.fori_loop: every step is a vectorized shift/compare/subtract across
# all rows, so the loop costs 384 VPU passes regardless of row count.
# ---------------------------------------------------------------------------

def mul_pow10_mag(limbs, k: int):
    """Non-negative n-limb magnitude * 10^k (must fit; caller sizes limbs)."""
    for _ in range(k):
        carry = jnp.zeros_like(limbs[0])
        out = []
        for l in limbs:
            t = l * np.int64(10) + carry
            out.append(t & _M32)
            carry = (t >> np.int64(32)) & _M32
        limbs = out
    return limbs


def divmod_mag(num_limbs, den_limbs):
    """Bit-serial restoring division of non-negative limb magnitudes.

    num_limbs: list of n int64 arrays (32-bit limbs, little-endian);
    den_limbs: list of m <= n limbs, must be nonzero rows (caller guards).
    Returns quotient limbs (n) — remainder is discarded (rounding is done
    by scaling the numerator one digit further and HALF_UP on the last).
    """
    import jax

    n = len(num_limbs)
    num = jnp.stack(num_limbs, axis=-1)           # [..., n]
    den = jnp.stack(list(den_limbs) +
                    [jnp.zeros_like(den_limbs[0])] * (n - len(den_limbs)),
                    axis=-1)

    def shl1(x, insert_bit):
        carry = jnp.concatenate(
            [insert_bit[..., None],
             (x[..., :-1] >> np.int64(31)) & np.int64(1)], axis=-1)
        return ((x << np.int64(1)) & _M32) | carry

    def body(_, state):
        rem, quot, nm = state
        top = (nm[..., n - 1] >> np.int64(31)) & np.int64(1)
        nm = shl1(nm, jnp.zeros_like(top))
        rem = shl1(rem, top)
        # compare rem >= den (lexicographic from the top limb)
        ge = jnp.ones(rem.shape[:-1], jnp.bool_)
        decided = jnp.zeros(rem.shape[:-1], jnp.bool_)
        for j in range(n - 1, -1, -1):
            gt = rem[..., j] > den[..., j]
            lt_ = rem[..., j] < den[..., j]
            ge = jnp.where(~decided, gt | (ge & ~lt_), ge)
            decided = decided | gt | lt_
        # rem -= den where ge
        borrow = jnp.zeros(rem.shape[:-1], jnp.int64)
        new = []
        for j in range(n):
            t = rem[..., j] - den[..., j] - borrow
            borrow = (t < 0).astype(jnp.int64)
            new.append(t + borrow * np.int64(1 << 32))
        sub_res = jnp.stack(new, axis=-1)
        rem = jnp.where(ge[..., None], sub_res, rem)
        quot = shl1(quot, ge.astype(jnp.int64))
        return rem, quot, nm

    zero = jnp.zeros_like(num)
    _, quot, _ = jax.lax.fori_loop(0, n * 32, body, (zero, zero, num))
    return [quot[..., j] for j in range(n)]


def div_decimal_exact(a_hi, a_lo, b_hi, b_lo, scale_up: int):
    """round_half_up((a * 10^scale_up) / b) over 128-bit operands.

    Returns (hi, lo, ok) where ok=False marks division by zero or a
    quotient overflowing 128 bits. Used for Spark decimal divide:
    scale_up = result_scale + s2 - s1 (+1 digit for rounding).
    """
    n_limbs = 12
    am_hi, am_lo, a_neg = abs128(a_hi, a_lo)
    bm_hi, bm_lo, b_neg = abs128(b_hi, b_lo)
    b_zero = (b_hi == 0) & (b_lo == 0)
    # guard zero denominators (quotient discarded under ~ok)
    bm_lo = jnp.where(b_zero, np.int64(1), bm_lo)
    num = list(_limbs4(am_hi, am_lo)) + \
        [jnp.zeros_like(a_lo)] * (n_limbs - 4)
    den = list(_limbs4(bm_hi, bm_lo)) + \
        [jnp.zeros_like(b_lo)] * (n_limbs - 4)
    # one extra digit on the numerator for HALF_UP; a negative scale_up
    # scales the denominator instead
    num = mul_pow10_mag(num, max(scale_up, 0) + 1)
    den = mul_pow10_mag(den, max(-scale_up, 0))
    quot = divmod_mag(num, den)
    quot = div_pow10_mag(quot, 1, half_up=True)
    over = jnp.zeros_like(b_zero)
    for l in quot[4:]:
        over = over | (l != 0)
    q_hi, q_lo = _from_limbs4(*quot[:4])
    over = over | (q_hi < 0)
    sign = a_neg ^ b_neg
    n_hi, n_lo = neg(q_hi, q_lo)
    q_hi = jnp.where(sign, n_hi, q_hi)
    q_lo = jnp.where(sign, n_lo, q_lo)
    return q_hi, q_lo, ~b_zero & ~over


# ---------------------------------------------------------------------------
# float conversion
# ---------------------------------------------------------------------------

def to_f64(hi, lo):
    mag_hi, mag_lo, sign = abs128(hi, lo)
    l0, l1, l2, l3 = _limbs4(mag_hi, mag_lo)
    m = ((l3.astype(jnp.float64) * 2.0 ** 32 + l2.astype(jnp.float64))
         * 2.0 ** 32 + l1.astype(jnp.float64)) * 2.0 ** 32 \
        + l0.astype(jnp.float64)
    return jnp.where(sign, -m, m)


def from_f64(x):
    """Nearest-int 128-bit value of a float64 (|x| must be < 2^127).

    Splits the magnitude into exact 32-bit chunks via fmod (IEEE fmod is
    exact), avoiding rounding at the 2^64 limb boundary.
    """
    x = jnp.round(x)
    sign = x < 0
    m = jnp.abs(x)
    limbs = []
    for _ in range(4):
        l = jnp.fmod(m, 2.0 ** 32)
        limbs.append(l.astype(jnp.int64))
        m = (m - l) / (2.0 ** 32)
    hi, lo = _from_limbs4(*limbs)
    n_hi, n_lo = neg(hi, lo)
    return jnp.where(sign, n_hi, hi), jnp.where(sign, n_lo, lo)


# ---------------------------------------------------------------------------
# host-side conversion (block boundaries, oracles)
# ---------------------------------------------------------------------------

def np_from_ints(values) -> np.ndarray:
    """Python ints -> [n, 2] int64 limb planes (host side)."""
    out = np.zeros((len(values), 2), np.int64)
    for i, v in enumerate(values):
        v = int(v) & ((1 << 128) - 1)
        out[i, 1] = np.uint64(v & _M64).astype(np.int64)
        out[i, 0] = np.uint64((v >> 64) & _M64).astype(np.int64)
    return out


def np_to_ints(planes: np.ndarray) -> list:
    """[n, 2] limb planes -> signed python ints (host side)."""
    out = []
    for hi, lo in np.asarray(planes, np.int64):
        v = ((int(hi) & _M64) << 64) | (int(lo) & _M64)
        if v >= 1 << 127:
            v -= 1 << 128
        out.append(v)
    return out
