"""Raw byte-plane string columns — the high-cardinality representation.

Dictionary encoding (expr/strings.py) is ideal when distinct values are few:
device sees int32 codes, the dictionary lives host-side. For near-unique
columns (URLs, ids) the dictionary becomes as large as the data and every
derived dictionary is an O(n) host pass — the reference has no such cliff
because Arrow strings keep raw bytes (StringArray offsets+data, used
directly by datafusion-ext-commons eq_comparator / spark_hash). This module
is the TPU-native equivalent of "strings as bytes":

* A ``string_raw(W)`` column stores UTF-8 bytes as ``[capacity, W]`` int32
  word planes, 4 bytes per word, big-endian packed with the sign bit
  flipped, so **ascending int32 lexicographic order over the word tuple
  equals bytewise string order** — the planes ARE their own sort keys
  (orderable_ops_list), join encodings, and group-by operands. No host
  dictionary exists at all.
* Hashing unflips + byteswaps the planes back to the little-endian words
  Spark's murmur3 consumes (ops/hashing.py murmur3_words_tail) — placement
  stays bit-exact with the reference.
* Strings must be NUL-free (SQL text in practice); trailing zero bytes are
  padding. Values longer than the plane width stay dictionary-encoded
  (block.py promotion guard) — never truncated.

Functions that need real text (upper/substring/LIKE...) convert to a
dictionary at eager boundaries (``to_dictionary_column``) — correctness
everywhere, device-speed on the paths that matter (filter/join/agg/sort/
exchange keys).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

_SIGN = np.int32(-0x80000000)  # 0x80000000 as int32


def width_words(dtype) -> int:
    return int(dtype.params[0])


def encode_object_array(arr: np.ndarray, n_words: int) -> np.ndarray:
    """Host: object array of str -> [n, n_words] orderable int32 planes."""
    n = len(arr)
    out_u8 = np.zeros((n, n_words * 4), dtype=np.uint8)
    for i, s in enumerate(arr):
        b = s.encode("utf-8") if isinstance(s, str) else bytes(s or b"")
        if len(b) > n_words * 4:
            raise ValueError(
                f"string of {len(b)} bytes exceeds raw width {n_words * 4}")
        out_u8[i, :len(b)] = np.frombuffer(b, np.uint8)
    return _u8_to_orderable(out_u8, n_words)


def _u8_to_orderable(u8: np.ndarray, n_words: int) -> np.ndarray:
    be = u8.reshape(len(u8), n_words, 4).astype(np.uint32)
    words = (be[..., 0] << 24) | (be[..., 1] << 16) | \
        (be[..., 2] << 8) | be[..., 3]
    return (words ^ np.uint32(0x80000000)).view(np.int32)


def planes_from_le(words_le: np.ndarray, n_words: int) -> np.ndarray:
    """LE word planes (ops/hashing.dictionary_byte_planes) -> orderable."""
    w = words_le.astype(np.uint32)
    if w.shape[1] < n_words:
        w = np.pad(w, ((0, 0), (0, n_words - w.shape[1])))
    elif w.shape[1] > n_words:
        if (w[:, n_words:] != 0).any():
            raise ValueError("dictionary strings exceed raw plane width")
        w = w[:, :n_words]
    be = ((w & 0xFF) << 24) | ((w & 0xFF00) << 8) | \
        ((w >> 8) & np.uint32(0xFF00)) | (w >> 24)
    return (be ^ np.uint32(0x80000000)).view(np.int32)


def decode_planes(planes: np.ndarray) -> np.ndarray:
    """Host: [n, W] orderable int32 -> object array of str."""
    u = planes.view(np.uint32) ^ np.uint32(0x80000000)
    n, W = u.shape
    u8 = np.empty((n, W, 4), np.uint8)
    u8[..., 0] = u >> 24
    u8[..., 1] = (u >> 16) & 0xFF
    u8[..., 2] = (u >> 8) & 0xFF
    u8[..., 3] = u & 0xFF
    flat = u8.reshape(n, W * 4)
    # errors="replace": NULL slots may hold reduction identities (0xFF...)
    # — they are masked by validity, but every row decodes
    return np.array([bytes(row).rstrip(b"\x00").decode("utf-8", "replace")
                     for row in flat], dtype=object)


def encode_literal(s: str, n_words: int) -> Tuple[np.ndarray, bool]:
    """Literal -> ([n_words] orderable int32 planes, overflowed_width)."""
    b = s.encode("utf-8")
    extra = len(b) > n_words * 4
    u8 = np.zeros((1, n_words * 4), np.uint8)
    take = min(len(b), n_words * 4)
    u8[0, :take] = np.frombuffer(b[:take], np.uint8)
    return _u8_to_orderable(u8, n_words)[0], extra


# -- device kernels -----------------------------------------------------------

def pad_planes(values, n_words: int):
    """[cap, w] -> [cap, n_words] by appending empty (all-padding) words."""
    w = values.shape[1]
    if w == n_words:
        return values
    fill = jnp.full((values.shape[0], n_words - w), _SIGN, jnp.int32)
    return jnp.concatenate([values, fill], axis=1)


def lex_compare(op: str, lv, rv, r_extra: bool = False):
    """Lexicographic compare of two [cap, W] orderable plane sets.

    ``r_extra``: the right side had bytes beyond W (literal wider than the
    column) — equal prefixes then mean left < right."""
    eq_w = lv == rv
    lt_w = lv < rv
    # first differing word decides: lt = any(lt_w before first neq)
    eq_prefix = jnp.cumprod(eq_w.astype(jnp.int8), axis=1).astype(jnp.bool_)
    prev_eq = jnp.concatenate(
        [jnp.ones((lv.shape[0], 1), jnp.bool_), eq_prefix[:, :-1]], axis=1)
    lt = jnp.any(prev_eq & lt_w, axis=1)
    eq = eq_prefix[:, -1]
    if r_extra:
        lt = lt | eq
        eq = jnp.zeros_like(eq)
    if op == "Eq":
        return eq
    if op == "NotEq":
        return ~eq
    if op == "Lt":
        return lt
    if op == "LtEq":
        return lt | eq
    if op == "Gt":
        return ~(lt | eq)
    if op == "GtEq":
        return ~lt
    raise NotImplementedError(op)


def le_words_and_lens(values):
    """[cap, W] orderable planes -> (LE u32 words, byte lens) for murmur3."""
    import jax
    u = jax.lax.bitcast_convert_type(jnp.asarray(values), jnp.uint32) \
        ^ jnp.uint32(0x80000000)
    le = ((u & 0xFF) << 24) | ((u & 0xFF00) << 8) | \
        ((u >> 8) & 0xFF00) | (u >> 24)
    b0 = (u >> 24) != 0
    b1 = ((u >> 16) & 0xFF) != 0
    b2 = ((u >> 8) & 0xFF) != 0
    b3 = (u & 0xFF) != 0
    # NUL-free contract: zero bytes only trail, so popcount == prefix length
    nbytes = (b0.astype(jnp.int32) + b1.astype(jnp.int32)
              + b2.astype(jnp.int32) + b3.astype(jnp.int32))
    return le, jnp.sum(nbytes, axis=1).astype(jnp.int32)


def like_prefix(kind: str, pattern: str) -> Optional[str]:
    """The literal prefix when a LIKE/startswith predicate is a pure
    prefix test (runs device-native on planes); None otherwise."""
    if kind == "startswith":
        return pattern
    if kind == "like" and pattern.endswith("%") and \
            not any(ch in pattern[:-1] for ch in "%_\\"):
        return pattern[:-1]
    return None


def prefix_match(values, prefix: str):
    """Device: does each row start with `prefix`? Whole words compare
    directly; the partial tail word compares under a byte mask."""
    import jax
    b = prefix.encode("utf-8")
    cap, W = values.shape
    if len(b) > W * 4:
        return jnp.zeros(cap, jnp.bool_)
    u = jax.lax.bitcast_convert_type(values, jnp.uint32) \
        ^ jnp.uint32(0x80000000)
    out = jnp.ones(cap, jnp.bool_)
    full, r = divmod(len(b), 4)
    for w in range(full):
        want = int.from_bytes(b[w * 4:w * 4 + 4], "big")
        out = out & (u[:, w] == jnp.uint32(want))
    if r:
        shift = (4 - r) * 8
        mask = np.uint32((0xFFFFFFFF >> shift) << shift)
        want = int.from_bytes(b[full * 4:] + b"\x00" * (4 - r), "big")
        out = out & ((u[:, full] & mask) == jnp.uint32(want))
    return out


def raw_lengths(values):
    """Device byte length of every row (murmur3 tail handling)."""
    return le_words_and_lens(values)[1]


def planes_all_ascii(values) -> bool:
    """Host: True when ``values`` are CONCRETE and every byte is ASCII
    (< 0x80). Tracers return False — callers keep the exact fallback, so
    the ASCII device kernels can never silently diverge from Spark's
    Unicode semantics on non-ASCII text."""
    import jax.core
    if isinstance(values, jax.core.Tracer):
        return False
    u = np.asarray(values).view(np.uint32) ^ np.uint32(0x80000000)
    return not bool(np.any(u & np.uint32(0x80808080)))


def ascii_case_planes(values, upper: bool):
    """Device upper/lower over the byte lanes. Exact for ASCII columns
    (Spark's UTF8String.toUpperCase takes the same byte-wise branch when
    the string is fully ASCII); callers gate on planes_all_ascii."""
    import jax
    u = jax.lax.bitcast_convert_type(jnp.asarray(values), jnp.uint32) \
        ^ jnp.uint32(0x80000000)
    lo, hi = (0x61, 0x7A) if upper else (0x41, 0x5A)
    out = jnp.zeros_like(u)
    for shift in (24, 16, 8, 0):
        b = (u >> shift) & jnp.uint32(0xFF)
        flip = (b >= lo) & (b <= hi)
        b = jnp.where(flip, b - 0x20 if upper else b + 0x20, b)
        out = out | (b << shift)
    return jax.lax.bitcast_convert_type(out ^ jnp.uint32(0x80000000),
                                        jnp.int32)


def ascii_prefix_planes(values, nbytes: int):
    """Device: keep the first ``nbytes`` bytes of every row (byte prefix ==
    character prefix on ASCII columns; callers gate on planes_all_ascii).
    The tail zeroes out, which IS the raw padding convention."""
    import jax
    W = values.shape[1]
    nbytes = max(int(nbytes), 0)
    if nbytes >= W * 4:
        return values
    u = jax.lax.bitcast_convert_type(jnp.asarray(values), jnp.uint32) \
        ^ jnp.uint32(0x80000000)
    m = np.zeros(W, np.uint32)
    full, r = divmod(nbytes, 4)
    m[:full] = 0xFFFFFFFF
    if r:
        shift = (4 - r) * 8
        m[full] = np.uint32((0xFFFFFFFF >> shift) << shift)
    out = u & jnp.asarray(m)[None, :]
    return jax.lax.bitcast_convert_type(out ^ jnp.uint32(0x80000000),
                                        jnp.int32)


def raw_char_lengths(values):
    """Device CHARACTER count (Spark `length`): UTF-8 bytes that are not
    continuation bytes (10xxxxxx), computed per byte lane."""
    import jax
    u = jax.lax.bitcast_convert_type(jnp.asarray(values), jnp.uint32) \
        ^ jnp.uint32(0x80000000)
    total = jnp.zeros(values.shape[0], jnp.int32)
    for shift in (24, 16, 8, 0):
        byte = (u >> shift) & 0xFF
        is_char = (byte != 0) & ((byte & 0xC0) != 0x80)
        total = total + jnp.sum(is_char.astype(jnp.int32), axis=1)
    return total


# -- representation changes ---------------------------------------------------

def dictionary_to_planes(dict_values: np.ndarray, n_words: int) -> np.ndarray:
    """Host: dictionary -> [dict_size, n_words] orderable plane table (so a
    dict-encoded column converts on device with one gather)."""
    from auron_tpu.ops.hashing import dictionary_byte_planes
    words_le, _ = dictionary_byte_planes(dict_values)
    return planes_from_le(np.asarray(words_le), n_words)


def dict_column_as_planes(col, n_words: int):
    """Device: dict-encoded string column -> [cap, n_words] planes."""
    table = jnp.asarray(dictionary_to_planes(col.dict_values, n_words))
    codes = jnp.clip(col.values, 0, table.shape[0] - 1)
    return jnp.take(table, codes, axis=0)


def to_dictionary_column(col):
    """Host (eager only): raw column -> dictionary-encoded STRING column.
    The escape hatch for text functions; key paths never need it."""
    from auron_tpu.block import Column
    from auron_tpu.dtypes import STRING
    from auron_tpu.expr.strings_host import dict_encode
    import jax.core
    if isinstance(col.values, jax.core.Tracer):
        raise NotImplementedError(
            "string function over a raw (byte-plane) column inside jit — "
            "apply it before the jitted region or keep the column "
            "dictionary-encoded (auron.string.raw.enable=false)")
    decoded = decode_planes(np.asarray(col.values))
    codes, uniq = dict_encode(decoded)
    return Column(jnp.asarray(codes), col.validity, STRING, uniq)


def max_bytes(arr: np.ndarray) -> int:
    """Host: longest UTF-8 encoding in an object array of str."""
    m = 0
    for s in arr:
        if isinstance(s, str):
            b = len(s.encode("utf-8")) if not s.isascii() else len(s)
            if b > m:
                m = b
    return m
