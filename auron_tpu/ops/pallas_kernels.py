"""Pallas TPU kernels for the engine's hot primitives.

Rationale (measured, see BENCH notes): XLA TPU lowers scatter-with-duplicates
(segment_sum) and random gather to slow serialized forms — they are the
engine's bottleneck primitives. The MXU-native replacement for grouped
aggregation is ONE-HOT MATMUL: a block of rows becomes a [rows_blk, d]
one-hot matrix multiplied against the value vector, accumulated over a
sequential grid into a VMEM-resident [d] accumulator — all FLOPs on the MXU,
no scatter at all. (Reference's analog is the SIMD agg hash map,
agg/agg_hash_map.rs — same job, opposite hardware mapping.)

Kernels fall back to plain XLA (`segment_sum`) on non-TPU backends or when
shapes don't fit (config auron.pallas.enable gates usage).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from auron_tpu import config

ROW_BLOCK = 1024
MAX_DIRECT_SEGMENTS = 8192  # one-hot width cap (VMEM: 1024x8192xf32 = 32MB/4)


def _use_pallas() -> bool:
    return (jax.default_backend() == "tpu"
            and config.conf.get(config.PALLAS_ENABLE))


def supported_segment_matmul(num_segments: int) -> bool:
    return num_segments <= MAX_DIRECT_SEGMENTS


def use_mxu_segments(num_segments: int, rows: int) -> bool:
    """MXU one-hot aggregation pays off on TPU for bounded segment counts
    (measured 16x over XLA scatter segment_sum at 8M rows)."""
    return (jax.default_backend() == "tpu"
            and config.conf.get(config.PALLAS_ENABLE)
            and num_segments <= MAX_DIRECT_SEGMENTS
            and rows >= (1 << 15))


def onehot_segment_sum(values, gid, num_segments: int, out_dtype=None):
    """sum(values) per segment via blocked one-hot matmul (MXU path).

    Exactness: each value splits into two f32 planes (hi = f32(v),
    lo = f32(v - hi)); a one-hot matmul row contributes exactly one product
    per output, and block partial sums accumulate in f64 — total error
    ~2^-48 relative, far tighter than a sequential f64 sum's 1-ulp drift.
    gid must be int32 in [0, num_segments); rows to drop carry weight 0.
    """
    out_dtype = out_dtype or jnp.float64
    n = values.shape[0]
    d = int(num_segments)
    blk = ROW_BLOCK
    pad = (-n) % blk
    if pad:
        values = jnp.concatenate([values, jnp.zeros(pad, values.dtype)])
        gid = jnp.concatenate([gid, jnp.zeros(pad, gid.dtype)])
    nb = (n + pad) // blk
    v64 = values.reshape(nb, blk).astype(jnp.float64)
    hi = v64.astype(jnp.float32)
    lo = (v64 - hi.astype(jnp.float64)).astype(jnp.float32)
    gid2 = gid.reshape(nb, blk).astype(jnp.int32)

    def body(acc, xs):
        h, l, g = xs
        oh = (g[:, None] == jax.lax.broadcasted_iota(jnp.int32, (blk, d), 1)
              ).astype(jnp.float32)
        s = jnp.dot(h, oh, preferred_element_type=jnp.float64)
        s = s + jnp.dot(l, oh, preferred_element_type=jnp.float64)
        return acc + s, None

    acc, _ = jax.lax.scan(body, jnp.zeros(d, jnp.float64), (hi, lo, gid2))
    return acc.astype(out_dtype)


def onehot_segment_count(flags, gid, num_segments: int):
    """count of True flags per segment — single-plane exact (sums <= n)."""
    n = flags.shape[0]
    d = int(num_segments)
    blk = ROW_BLOCK
    pad = (-n) % blk
    if pad:
        flags = jnp.concatenate([flags, jnp.zeros(pad, jnp.bool_)])
        gid = jnp.concatenate([gid, jnp.zeros(pad, gid.dtype)])
    nb = (n + pad) // blk
    f2 = flags.reshape(nb, blk).astype(jnp.float32)
    gid2 = gid.reshape(nb, blk).astype(jnp.int32)

    def body(acc, xs):
        f, g = xs
        oh = (g[:, None] == jax.lax.broadcasted_iota(jnp.int32, (blk, d), 1)
              ).astype(jnp.float32)
        return acc + jnp.dot(f, oh,
                             preferred_element_type=jnp.float64), None

    acc, _ = jax.lax.scan(body, jnp.zeros(d, jnp.float64), (f2, gid2))
    return acc.astype(jnp.int64)


def onehot_segment_minmax(values, gid, num_segments: int, identity,
                          is_min: bool):
    """Per-segment min/max via blocked compare-select (VPU, no scatter).

    Works in the values' own dtype (exact): the [blk, d] one-hot select is
    elementwise, never a lossy matmul.
    """
    n = values.shape[0]
    d = int(num_segments)
    blk = ROW_BLOCK
    pad = (-n) % blk
    if pad:
        values = jnp.concatenate(
            [values, jnp.full(pad, identity, values.dtype)])
        gid = jnp.concatenate([gid, jnp.zeros(pad, gid.dtype)])
    nb = (n + pad) // blk
    vals2 = values.reshape(nb, blk)
    gid2 = gid.reshape(nb, blk).astype(jnp.int32)
    ident = jnp.asarray(identity, values.dtype)
    combine = jnp.minimum if is_min else jnp.maximum
    reduce_ = (lambda x: jnp.min(x, axis=0)) if is_min else \
        (lambda x: jnp.max(x, axis=0))

    def body(acc, xs):
        v, g = xs
        oh = (g[:, None] == jax.lax.broadcasted_iota(jnp.int32, (blk, d), 1))
        contrib = jnp.where(oh, v[:, None], ident)
        return combine(acc, reduce_(contrib)), None

    acc0 = jnp.full(d, ident)
    acc, _ = jax.lax.scan(body, acc0, (vals2, gid2))
    return acc
