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


def onehot_segment_sum(values, gid, num_segments: int,
                       dtype=None):
    """sum(values) per segment via blocked one-hot matmul (MXU path).

    values: [n] float/int; gid: [n] int32 in [0, num_segments) (rows to drop
    must carry weight 0 in `values`). Returns [num_segments] sums in f32 (or
    `dtype`).
    """
    out_dtype = dtype or jnp.float32
    n = values.shape[0]
    d = int(num_segments)
    blk = ROW_BLOCK
    pad = (-n) % blk
    if pad:
        values = jnp.concatenate([values, jnp.zeros(pad, values.dtype)])
        gid = jnp.concatenate([gid, jnp.zeros(pad, gid.dtype)])
    nb = (n + pad) // blk
    vals2 = values.reshape(nb, blk).astype(jnp.float32)
    gid2 = gid.reshape(nb, blk).astype(jnp.int32)

    if _use_pallas():
        try:
            return _pallas_onehot_sum(vals2, gid2, d).astype(out_dtype)
        except Exception:  # pragma: no cover - mosaic availability varies
            pass
    # XLA fallback: scan over blocks, fused one-hot contraction per block
    def body(acc, xs):
        v, g = xs
        oh = (g[:, None] == jax.lax.broadcasted_iota(jnp.int32, (blk, d), 1))
        acc = acc + jnp.dot(v, oh.astype(jnp.float32),
                            preferred_element_type=jnp.float32)
        return acc, None
    acc0 = jnp.zeros(d, jnp.float32)
    acc, _ = jax.lax.scan(body, acc0, (vals2, gid2))
    return acc.astype(out_dtype)


def _pallas_onehot_sum(vals2, gid2, d: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nb, blk = vals2.shape
    d_pad = max(((d + 127) // 128) * 128, 128)

    def kernel(v_ref, g_ref, out_ref, acc_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        g = g_ref[:]              # [1, blk] int32
        v = v_ref[:]              # [1, blk] f32
        col = jax.lax.broadcasted_iota(jnp.int32, (blk, d_pad), 1)
        oh = (g.reshape(blk, 1) == col).astype(jnp.float32)
        acc_ref[:] += jnp.dot(v.reshape(1, blk), oh,
                              preferred_element_type=jnp.float32)

        @pl.when(step == pl.num_programs(0) - 1)
        def _():
            out_ref[:] = acc_ref[:]

    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, blk), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, d_pad), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, d_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, d_pad), jnp.float32)],
    )(vals2, gid2)
    return out[0, :d]


def onehot_segment_max(values, gid, num_segments: int, identity: float):
    """Per-segment max via blocked compare-select (VPU path, no scatter)."""
    n = values.shape[0]
    d = int(num_segments)
    blk = ROW_BLOCK
    pad = (-n) % blk
    if pad:
        values = jnp.concatenate(
            [values, jnp.full(pad, identity, values.dtype)])
        gid = jnp.concatenate([gid, jnp.zeros(pad, gid.dtype)])
    nb = (n + pad) // blk
    vals2 = values.reshape(nb, blk).astype(jnp.float32)
    gid2 = gid.reshape(nb, blk).astype(jnp.int32)

    def body(acc, xs):
        v, g = xs
        oh = (g[:, None] == jax.lax.broadcasted_iota(jnp.int32, (blk, d), 1))
        contrib = jnp.where(oh, v[:, None], jnp.float32(identity))
        acc = jnp.maximum(acc, jnp.max(contrib, axis=0))
        return acc, None
    acc0 = jnp.full(d, jnp.float32(identity))
    acc, _ = jax.lax.scan(body, acc0, (vals2, gid2))
    return acc
