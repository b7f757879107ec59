"""Bloom filter — runtime-filter probe/build (Spark-compatible scheme).

Re-implements the reference's spark_bloom_filter.rs + spark_bit_array.rs and
the bloom_filter_might_contain probe expression
(/root/reference/native-engine/datafusion-ext-exprs/src/
bloom_filter_might_contain.rs:223, agg bloom_filter in §2.1.1): the classic
Spark BloomFilterImpl double-hashing scheme (h1 = murmur3(value, 0),
h2 = murmur3(value, h1), bit_i = (h1 + i*h2) mod num_bits with negative
flip), over a dense uint32 bit array living in HBM.

Build is a scatter-OR over the bit words; probe is a gather + AND reduce —
both single fused XLA passes, no host round-trip. Filters register in the
session resource registry by id (the reference keys them by UUID resource).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from auron_tpu.block import Column, TableBlock
from auron_tpu import dtypes as _DT
from auron_tpu.ops.hashing import column_hash_inputs, hash_columns_murmur3


@dataclass
class BloomFilter:
    words: jnp.ndarray  # uint32 [num_bits/32]
    num_hashes: int

    @property
    def num_bits(self) -> int:
        return int(self.words.shape[0]) * 32


def optimal_params(expected_items: int, fpp: float = 0.03):
    """Spark's BloomFilter.optimalNumOfBits/HashFunctions."""
    m = int(-expected_items * np.log(fpp) / (np.log(2) ** 2))
    m = max(((m + 31) // 32) * 32, 64)
    k = max(int(round(m / max(expected_items, 1) * np.log(2))), 1)
    return m, min(k, 16)


def _hash_pair(col: Column, capacity: int):
    """Two independent 32-bit hashes per row (Spark-style double hashing:
    bit_i derives from h1 + i*h2). h2 comes from a second murmur3 pass under
    a different seed, finalized against h1 — same independence property as
    Spark's hashLong(item, h1) chain without per-row seeding.

    Integer keys hash through their INT64 layout regardless of stored
    width: Spark's bloom_filter_agg/might_contain operate on longs only
    (spark_bloom_filter.rs hashes 8-byte items), and width-canonical
    hashing keeps a filter built from an int64 column consistent with a
    probe column the registration-time narrower stored as int32."""
    if jnp.issubdtype(jnp.asarray(col.values).dtype, jnp.integer):
        col = Column.of(col.values.astype(jnp.int64),
                        _DT.INT64, col.validity)
    h1 = hash_columns_murmur3([column_hash_inputs(col)], capacity, seed=0)
    h1u = jax.lax.bitcast_convert_type(h1, jnp.uint32)
    h2 = hash_columns_murmur3([column_hash_inputs(col)], capacity,
                              seed=0x9747B28C)
    h2 = jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(h2, jnp.uint32) * np.uint32(0x9E3779B1)
        + h1u, jnp.int32)
    return h1, h2


def build_bloom(col: Column, live, num_bits: int, num_hashes: int
                ) -> BloomFilter:
    cap = col.values.shape[0]
    h1, h2 = _hash_pair(col, cap)
    ok = live if col.validity is None else (live & col.validity)
    nwords = num_bits // 32
    words = jnp.zeros(nwords, jnp.uint32)
    for i in range(1, num_hashes + 1):
        combined = h1 + jnp.int32(i) * h2
        combined = jnp.where(combined < 0, ~combined, combined)
        bit = (combined % np.int32(num_bits)).astype(jnp.int32)
        word_idx = jnp.where(ok, bit // 32, 0)
        bitmask = jnp.where(ok, jnp.uint32(1) << (bit % 32).astype(jnp.uint32),
                            jnp.uint32(0))
        words = words | _scatter_or(bitmask, word_idx, nwords)
    return BloomFilter(words, num_hashes)


def _scatter_or(bitmasks, word_idx, nwords):
    """OR-scatter uint32 masks into words: decompose per bit via segment_max
    would be 32 passes; instead use sum over distinct bits per word — but
    duplicate (word,bit) pairs would collide. Robust route: 32-lane loop."""
    out = jnp.zeros(nwords, jnp.uint32)
    for b in range(32):
        lane = (bitmasks >> b) & jnp.uint32(1)
        got = jax.ops.segment_max(lane, word_idx, nwords)
        out = out | (got.astype(jnp.uint32) << b)
    return out


def might_contain(bf: BloomFilter, col: Column) -> Column:
    from auron_tpu.dtypes import BOOL
    cap = col.values.shape[0]
    h1, h2 = _hash_pair(col, cap)
    result = jnp.ones(cap, jnp.bool_)
    for i in range(1, bf.num_hashes + 1):
        combined = h1 + jnp.int32(i) * h2
        combined = jnp.where(combined < 0, ~combined, combined)
        bit = (combined % np.int32(bf.num_bits)).astype(jnp.int32)
        word = jnp.take(bf.words, bit // 32)
        hit = (word >> (bit % 32).astype(jnp.uint32)) & jnp.uint32(1)
        result = result & (hit == 1)
    return Column.of(result, BOOL, col.validity)


# ---------------------------------------------------------------------------
# Session resource registry (reference: JniBridge resource map,
# JniBridge.java:43-71; bloom filters keyed by UUID).
# ---------------------------------------------------------------------------

_RESOURCES: Dict[str, object] = {}


def put_resource(key: str, value) -> str:
    _RESOURCES[key] = value
    return key


def get_resource(key: str):
    return _RESOURCES[key]


def clear_resources():
    _RESOURCES.clear()
