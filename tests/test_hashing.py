"""Bit-exactness tests for Spark-compatible hashing.

Golden string vectors from the reference's own unit test
(/root/reference/native-engine/datafusion-ext-commons/src/hash/mur.rs:91-104).
Numeric paths are cross-validated against the byte-level host oracle, which is
itself anchored by the string goldens.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from auron_tpu.ops import hashing as H

GOLDEN_STRINGS = {
    "": 142593372,
    "a": 1485273170,
    "ab": -97053317,
    "abc": 1322437556,
    "abcd": -396302900,
    "abcde": 814637928,
}


def test_host_murmur3_golden_strings():
    for s, want in GOLDEN_STRINGS.items():
        assert H.murmur3_bytes_host(s.encode(), 42) == want, s


def test_device_string_hash_matches_goldens():
    dict_values = np.array(list(GOLDEN_STRINGS.keys()), dtype=object)
    words, lens = H.dictionary_byte_planes(dict_values)
    codes = jnp.arange(len(dict_values), dtype=jnp.int32)
    got = H.hash_columns_murmur3(
        [(codes, "string", None, jnp.asarray(words), jnp.asarray(lens))],
        rows=len(dict_values), seed=42)
    np.testing.assert_array_equal(
        np.asarray(got), np.array(list(GOLDEN_STRINGS.values()), np.int32))


@pytest.mark.parametrize("vals", [
    [0, 1, -1, 42, 2**31 - 1, -2**31, 123456789],
])
def test_int32_matches_byte_oracle(vals):
    x = jnp.asarray(np.array(vals, np.int32))
    got = np.asarray(H.hash_columns_murmur3(
        [(x, "int32", None, None, None)], rows=len(vals)))
    want = [H.murmur3_bytes_host(
        int(v).to_bytes(4, "little", signed=True)) for v in vals]
    np.testing.assert_array_equal(got, np.array(want, np.int32))


def test_int64_matches_byte_oracle():
    vals = [0, 1, -1, 42, 2**63 - 1, -2**63, 987654321012345]
    x = jnp.asarray(np.array(vals, np.int64))
    got = np.asarray(H.hash_columns_murmur3(
        [(x, "int64", None, None, None)], rows=len(vals)))
    want = [H.murmur3_bytes_host(
        int(v).to_bytes(8, "little", signed=True)) for v in vals]
    np.testing.assert_array_equal(got, np.array(want, np.int64).astype(np.int32))


def test_float_matches_byte_oracle():
    vals = np.array([0.0, -0.0, 1.5, -3.25, np.inf, -np.inf], np.float32)
    got = np.asarray(H.hash_columns_murmur3(
        [(jnp.asarray(vals), "float32", None, None, None)], rows=len(vals)))
    want = [H.murmur3_bytes_host(v.tobytes()) for v in vals]
    np.testing.assert_array_equal(got, np.array(want, np.int32))
    # raw-bits hashing: -0.0 and 0.0 hash differently (reference behavior)
    assert got[0] != got[1]


def test_float64_matches_byte_oracle():
    vals = np.array([0.0, -0.0, 1.5, -3.25, 1e300], np.float64)
    got = np.asarray(H.hash_columns_murmur3(
        [(jnp.asarray(vals), "float64", None, None, None)], rows=len(vals)))
    want = [H.murmur3_bytes_host(v.tobytes()) for v in vals]
    np.testing.assert_array_equal(got, np.array(want, np.int32))


def test_chained_multi_column_and_nulls():
    a = jnp.asarray(np.array([1, 2, 3], np.int32))
    b = jnp.asarray(np.array([10, 20, 30], np.int64))
    validity_a = jnp.asarray(np.array([True, False, True]))
    got = np.asarray(H.hash_columns_murmur3(
        [(a, "int32", validity_a, None, None),
         (b, "int64", None, None, None)], rows=3))
    # row 1: null int32 leaves hash at seed, then chains the int64
    h0 = H.murmur3_bytes_host(int(2).to_bytes(4, "little"), 42)
    want_row1 = H.murmur3_bytes_host(int(20).to_bytes(8, "little"), 42)
    assert got[1] == np.int32(want_row1)
    # row 0: chained
    want_row0 = H.murmur3_bytes_host(
        int(10).to_bytes(8, "little"),
        H.murmur3_bytes_host(int(1).to_bytes(4, "little"), 42))
    assert got[0] == np.int32(want_row0)
    del h0


def test_pmod_matches_java_floormod():
    h = jnp.asarray(np.array([-7, -1, 0, 1, 7], np.int32))
    got = np.asarray(H.pmod(h, 4))
    np.testing.assert_array_equal(got, [1, 3, 0, 1, 3])


def test_xxhash64_runs_and_is_deterministic():
    x = jnp.asarray(np.array([0, 1, -5, 2**40], np.int64))
    a = np.asarray(H.hash_columns_xxhash64([(x, "int64", None, None, None)], 4))
    b = np.asarray(H.hash_columns_xxhash64([(x, "int64", None, None, None)], 4))
    np.testing.assert_array_equal(a, b)
    assert len(set(a.tolist())) == 4
