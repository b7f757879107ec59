"""Spark-compatible hashing, vectorized for TPU.

Behavior contract (bit-exact) from the reference implementation
/root/reference/native-engine/datafusion-ext-commons/src/hash/mur.rs and
spark_hash.rs (which itself matches Spark's Murmur3_x86_32 / XxHash64):

* murmur3-32: per-row *chained* across columns — ``h = hash(col_i, seed=h)``
  starting from seed 42 for shuffle partitioning (spark_hash.rs:16-31).
* int8/16/32/date32/bool widen to i32 → 4 LE bytes; int64/timestamp/f64-bits
  are 8 LE bytes (hash_long); f32-bits are 4 LE bytes (spark_hash.rs:88-108 —
  raw bits, NO -0.0 normalization at the hash layer).
* NULL rows leave the running hash unchanged (spark_hash.rs:96-105).
* Strings hash their UTF-8 bytes: full 4-byte LE words, then sign-extended
  tail bytes, fmix with total length (mur.rs:19-30).
* Partition id = pmod(hash, n) — Java's floor-mod on the *signed* hash
  (shuffle/mod.rs:178-188).

Everything here is pure jnp on uint32/uint64 lanes (wrap-around semantics),
so it vectorizes across rows on the VPU and fuses into surrounding ops.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_C1 = np.uint32(0xCC9E2D51)
_C2 = np.uint32(0x1B873593)
_M5 = np.uint32(5)
_MA = np.uint32(0xE6546B64)


def _u32(x):
    return jax.lax.bitcast_convert_type(x, jnp.uint32)


def _rotl32(x, r: int):
    return (x << r) | (x >> (32 - r))


def _mix_k1(k1):
    k1 = k1 * _C1
    k1 = _rotl32(k1, 15)
    return k1 * _C2


def _mix_h1(h1, k1):
    h1 = h1 ^ k1
    h1 = _rotl32(h1, 13)
    return h1 * _M5 + _MA


def _fmix(h1, length):
    h1 = h1 ^ length
    h1 = h1 ^ (h1 >> 16)
    h1 = h1 * np.uint32(0x85EBCA6B)
    h1 = h1 ^ (h1 >> 13)
    h1 = h1 * np.uint32(0xC2B2AE35)
    h1 = h1 ^ (h1 >> 16)
    return h1


def murmur3_word(word_u32, seed_u32):
    """murmur3 of one 4-byte word (ints, dates, bools, f32 bits)."""
    return _fmix(_mix_h1(seed_u32, _mix_k1(word_u32)), np.uint32(4))


def murmur3_long(value_i64, seed_u32):
    """murmur3 of an 8-byte value, low word first (mur.rs:76-88).

    Bitcast s64 -> [low_u32, high_u32] instead of 64-bit shifts: the pair form
    survives the TPU X64-rewrite pass, which cannot lower 64-bit bitcasts.
    """
    pair = jax.lax.bitcast_convert_type(value_i64.astype(jnp.int64), jnp.uint32)
    low, high = pair[..., 0], pair[..., 1]
    h1 = _mix_h1(seed_u32, _mix_k1(low))
    h1 = _mix_h1(h1, _mix_k1(high))
    return _fmix(h1, np.uint32(8))


_F64_WARNED = False


def _f64_words(values):
    """f64 -> (low_u32, high_u32) bit words, with a TPU fallback.

    On TPU, float64 is silently demoted to float32 by XLA, so true f64 bit
    patterns do not exist on-device; we hash the f32 bits zero-extended
    instead. That loses Spark bit-parity for double *keys* on TPU (documented)
    but keeps placement deterministic, which is all the exchange needs.
    """
    if jax.default_backend() == "tpu":
        global _F64_WARNED
        if not _F64_WARNED:
            _F64_WARNED = True
            import warnings
            warnings.warn(
                "float64 partition keys on TPU hash their float32 bits "
                "(XLA demotes f64; placement stays deterministic and "
                "results exact, but Spark shuffle-placement bit-parity "
                "does not hold for double keys on this backend)",
                RuntimeWarning, stacklevel=3)
        w = jax.lax.bitcast_convert_type(values.astype(jnp.float32), jnp.uint32)
        return w, jnp.zeros_like(w)
    pair = jax.lax.bitcast_convert_type(values, jnp.uint32)
    return pair[..., 0], pair[..., 1]


def murmur3_words_tail(words_u32, nbytes, seed_u32):
    """murmur3 of a per-row variable-length byte string.

    ``words_u32``: [rows, max_words] little-endian 4-byte words (tail bytes
    zero-padded); ``nbytes``: [rows] actual byte length. Reproduces
    mur.rs:19-30: aligned words via mix_h1/mix_k1, then each tail byte
    sign-extended and mixed individually, then fmix(len).
    """
    rows, max_words = words_u32.shape
    nbytes = nbytes.astype(jnp.int32)
    nwords = nbytes // 4
    h1 = jnp.broadcast_to(seed_u32, (rows,)).astype(jnp.uint32)
    for j in range(max_words):
        mixed = _mix_h1(h1, _mix_k1(words_u32[:, j]))
        h1 = jnp.where(j < nwords, mixed, h1)
    # tail: up to 3 bytes, sign-extended from the last (partial) word
    tail_word = jnp.take_along_axis(
        words_u32, jnp.clip(nwords, 0, max_words - 1)[:, None], axis=1)[:, 0]
    for t in range(3):
        byte = (tail_word >> (8 * t)) & np.uint32(0xFF)
        # sign-extend int8 -> int32 -> uint32
        sbyte = jax.lax.bitcast_convert_type(
            byte.astype(jnp.uint8).astype(jnp.int8).astype(jnp.int32), jnp.uint32)
        mixed = _mix_h1(h1, _mix_k1(sbyte))
        h1 = jnp.where(t < (nbytes - 4 * nwords), mixed, h1)
    return _fmix(h1, jax.lax.bitcast_convert_type(nbytes, jnp.uint32))


def _hash_column_chained(values, dtype_name: str, validity, h_u32,
                         dict_words=None, dict_lens=None):
    """One chaining step: h = murmur3(value, seed=h), null rows unchanged."""
    if dtype_name in ("int8", "int16", "int32", "date32"):
        word = _u32(values.astype(jnp.int32))
        new_h = murmur3_word(word, h_u32)
    elif dtype_name == "bool":
        word = values.astype(jnp.uint32)
        new_h = murmur3_word(word, h_u32)
    elif dtype_name == "float32":
        word = _u32(values)
        new_h = murmur3_word(word, h_u32)
    elif dtype_name in ("int64", "decimal64", "timestamp64"):
        new_h = murmur3_long(values, h_u32)
    elif dtype_name == "decimal128":
        # Engine-internal placement hash: chain the two int64 limbs.
        # (Spark hashes the minimal big-endian byte form of wide decimals —
        # variable length per row; placement parity for p>18 keys is
        # deliberately traded for a fixed-shape kernel. Placement-only:
        # results are unaffected.)
        new_h = murmur3_long(values[..., 1], h_u32)
        new_h = murmur3_long(values[..., 0], new_h)
    elif dtype_name == "float64":
        low, high = _f64_words(values)
        h1 = _mix_h1(h_u32, _mix_k1(low))
        h1 = _mix_h1(h1, _mix_k1(high))
        new_h = _fmix(h1, np.uint32(8))
    elif dtype_name == "string":
        if dict_words is None:
            raise ValueError("string hashing requires dictionary byte planes")
        codes = jnp.clip(values, 0, dict_words.shape[0] - 1)
        words = dict_words[codes]          # [rows, max_words] gather
        lens = dict_lens[codes]
        new_h = murmur3_words_tail(words, lens, h_u32)
    elif dtype_name == "string_raw":
        # per-row byte planes: unflip + byteswap back to the LE words
        # Spark's murmur3 consumes — same placement as dictionary strings
        from auron_tpu.expr.strings_raw import le_words_and_lens
        words, lens = le_words_and_lens(values)
        new_h = murmur3_words_tail(words, lens, h_u32)
    else:
        raise NotImplementedError(f"murmur3 for {dtype_name}")
    if validity is not None:
        new_h = jnp.where(validity, new_h, h_u32)
    return new_h


def hash_columns_murmur3(
        columns: Sequence[Tuple],
        rows: int,
        seed: int = 42) -> jnp.ndarray:
    """Chained per-row murmur3 over key columns → int32 hash.

    ``columns`` is a sequence of tuples
    ``(values, dtype_name, validity, dict_words, dict_lens)`` — use
    :func:`column_hash_inputs` to build them from :class:`Column`.
    """
    h = jnp.full((rows,), np.uint32(np.uint32(seed & 0xFFFFFFFF)), jnp.uint32)
    for (values, dtype_name, validity, dw, dl) in columns:
        h = _hash_column_chained(values, dtype_name, validity, h, dw, dl)
    return jax.lax.bitcast_convert_type(h, jnp.int32)


def column_hash_inputs(col) -> Tuple:
    """Adapt a block Column into hash_columns_murmur3 inputs."""
    dw = dl = None
    if col.dtype.is_string:
        dw, dl = dictionary_byte_planes(col.dict_values)
        dw, dl = jnp.asarray(dw), jnp.asarray(dl)
    return (col.values, col.dtype.name, col.validity, dw, dl)


_DICT_PLANE_CACHE: dict = {}


def dictionary_byte_planes(dict_values: Optional[np.ndarray]):
    """Host-side: encode a string dictionary as LE 4-byte word planes + lens.

    Cached per dictionary object so repeated queries don't re-encode.
    """
    if dict_values is None:
        raise ValueError("string column without dictionary")
    key = id(dict_values)
    hit = _DICT_PLANE_CACHE.get(key)
    if hit is not None:
        return hit[1]
    from auron_tpu.expr.strings_host import byte_planes as _native_planes
    np_planes = _native_planes(dict_values) if all(
        isinstance(s, str) for s in dict_values) else None
    if np_planes is not None:
        words, lens = np_planes
        _DICT_PLANE_CACHE[key] = (dict_values, (words, lens))
        return words, lens
    encoded = [s.encode("utf-8") if isinstance(s, str) else bytes(s)
               for s in dict_values]
    max_len = max((len(b) for b in encoded), default=0)
    max_words = max((max_len + 3) // 4, 1)
    words = np.zeros((len(encoded), max_words), dtype=np.uint32)
    lens = np.zeros(len(encoded), dtype=np.int32)
    for i, b in enumerate(encoded):
        lens[i] = len(b)
        padded = b + b"\x00" * (max_words * 4 - len(b))
        words[i] = np.frombuffer(padded, dtype="<u4")
    # pin dict_values: its id() must not be recycled while the entry lives
    _DICT_PLANE_CACHE[key] = (dict_values, (words, lens))
    return words, lens


def pmod(hash_i32, n: int):
    """Spark partition id: Java floor-mod of the signed hash (mod.rs:178-188)."""
    m = hash_i32 % np.int32(n)
    return jnp.where(m < 0, m + np.int32(n), m).astype(jnp.int32)


# ---------------------------------------------------------------------------
# xxhash64 (seed 42 default) — contract from hash/xxhash.rs (Spark XxHash64).
# ---------------------------------------------------------------------------

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)


def _rotl64(x, r: int):
    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


def _xx_avalanche(h):
    h = h ^ (h >> np.uint64(33))
    h = h * _P2
    h = h ^ (h >> np.uint64(29))
    h = h * _P3
    h = h ^ (h >> np.uint64(32))
    return h


def xxhash64_long(value_i64, seed_u64):
    """xxhash64 of one 8-byte value (Spark XxHash64.hashLong)."""
    hash_ = seed_u64 + _P5 + np.uint64(8)
    u = value_i64.astype(jnp.int64).astype(jnp.uint64)
    k1 = _rotl64(u * _P2, 31) * _P1
    hash_ = hash_ ^ k1
    hash_ = _rotl64(hash_, 27) * _P1 + _P4
    return _xx_avalanche(hash_)


def xxhash64_word(word_u32, seed_u64):
    """xxhash64 of one 4-byte value (Spark XxHash64.hashInt)."""
    hash_ = seed_u64 + _P5 + np.uint64(4)
    hash_ = hash_ ^ (word_u32.astype(jnp.uint64) * _P1)
    hash_ = _rotl64(hash_, 23) * _P2 + _P3
    return _xx_avalanche(hash_)


def hash_columns_xxhash64(columns: Sequence[Tuple], rows: int,
                          seed: int = 42) -> jnp.ndarray:
    """Chained per-row xxhash64 over key columns → int64 hash."""
    h = jnp.full((rows,), np.uint64(seed), jnp.uint64)
    for (values, dtype_name, validity, _dw, _dl) in columns:
        if dtype_name in ("int8", "int16", "int32", "date32"):
            new_h = xxhash64_word(_u32(values.astype(jnp.int32)), h)
        elif dtype_name == "bool":
            new_h = xxhash64_word(values.astype(jnp.uint32), h)
        elif dtype_name == "float32":
            new_h = xxhash64_word(_u32(values), h)
        elif dtype_name in ("int64", "decimal64"):
            new_h = xxhash64_long(values, h)
        elif dtype_name == "float64":
            low, high = _f64_words(values)
            u = low.astype(jnp.uint64) | (high.astype(jnp.uint64) << np.uint64(32))
            hash_ = h + _P5 + np.uint64(8)
            k1 = _rotl64(u * _P2, 31) * _P1
            hash_ = hash_ ^ k1
            hash_ = _rotl64(hash_, 27) * _P1 + _P4
            new_h = _xx_avalanche(hash_)
        else:
            raise NotImplementedError(f"xxhash64 for {dtype_name}")
        if validity is not None:
            new_h = jnp.where(validity, new_h, h)
        h = new_h
    return jax.lax.bitcast_convert_type(h, jnp.int64)


def murmur3_bytes_host(data: bytes, seed: int = 42) -> int:
    """Host-side reference murmur3 (for tests / dictionary precompute)."""
    M = 0xFFFFFFFF

    def rotl(x, r):
        return ((x << r) | (x >> (32 - r))) & M

    def mixk1(k1):
        return (rotl((k1 * 0xCC9E2D51) & M, 15) * 0x1B873593) & M

    def mixh1(h1, k1):
        return (rotl(h1 ^ k1, 13) * 5 + 0xE6546B64) & M

    h1 = seed & M
    n = len(data)
    aligned = n - n % 4
    for i in range(0, aligned, 4):
        h1 = mixh1(h1, mixk1(int.from_bytes(data[i:i + 4], "little")))
    for i in range(aligned, n):
        b = data[i]
        h1 = mixh1(h1, mixk1((b - 256 if b >= 128 else b) & M))
    h1 ^= n
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & M
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & M
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1
