"""Native string-ingest kernels vs pure-python oracles.

native/strings.cpp does the per-row work of dictionary encoding and
murmur3 byte-plane packing; outputs must be IDENTICAL to the numpy/python
fallbacks (sorted np.unique dictionaries; mur.rs word-plane layout)."""

import numpy as np
import pytest

from auron_tpu import native
from auron_tpu.expr.strings_host import byte_planes, dict_encode


@pytest.fixture(autouse=True)
def _require_native():
    if native.strings_lib() is None:
        pytest.skip("native toolchain unavailable")


def test_dict_encode_matches_np_unique():
    rng = np.random.default_rng(81)
    pool = ["", "a", "aa", "übergröße", "snow", "snow ", "日本語テスト",
            "x" * 300, "tail1", "tail12", "tail123"]
    vals = np.array([pool[i] for i in rng.integers(0, len(pool), 5000)],
                    dtype=object)
    codes, d = dict_encode(vals)
    uniq, inv = np.unique(vals.astype(str), return_inverse=True)
    assert (d == uniq.astype(object)).all()
    np.testing.assert_array_equal(codes, inv.astype(np.int32))


def test_byte_planes_match_python_loop():
    vals = np.array(["", "a", "abc", "abcd", "abcde", "übergröße",
                     "exactly8", "nine char", "日本語"], dtype=object)
    words, lens = byte_planes(vals)
    # python oracle (the original loop)
    encoded = [s.encode("utf-8") for s in vals]
    max_len = max(len(b) for b in encoded)
    mw = max((max_len + 3) // 4, 1)
    ww = np.zeros((len(vals), mw), np.uint32)
    ll = np.zeros(len(vals), np.int32)
    for i, b in enumerate(encoded):
        ll[i] = len(b)
        padded = b + b"\x00" * (mw * 4 - len(b))
        ww[i] = np.frombuffer(padded, dtype="<u4")
    np.testing.assert_array_equal(lens, ll)
    np.testing.assert_array_equal(words, ww)


def test_hash_parity_through_native_planes():
    """End-to-end: murmur3 string hashing over native planes matches the
    golden vectors (mur.rs contract, tests/test_hashing.py anchors)."""
    import jax.numpy as jnp
    from auron_tpu.block import Column
    from auron_tpu.dtypes import STRING
    from auron_tpu.ops.hashing import (column_hash_inputs,
                                       hash_columns_murmur3)
    d = np.array(["abc", "", "hello world", "日本語"], dtype=object)
    c = Column(jnp.arange(4, dtype=jnp.int32), None, STRING, d)
    h_native = np.asarray(hash_columns_murmur3(
        [column_hash_inputs(c)], 4, seed=42))
    # pure-python oracle through the fallback loop
    from auron_tpu.ops import hashing as H
    H._DICT_PLANE_CACHE.clear()
    import auron_tpu.expr.strings_host as sh
    orig = sh.byte_planes
    sh.byte_planes = lambda *_: None  # force the python loop
    try:
        H._DICT_PLANE_CACHE.clear()
        h_py = np.asarray(hash_columns_murmur3(
            [column_hash_inputs(c)], 4, seed=42))
    finally:
        sh.byte_planes = orig
        H._DICT_PLANE_CACHE.clear()
    np.testing.assert_array_equal(h_native, h_py)
