"""Random gather as blocked one-hot matmul — the MXU answer to the 80ms
gather floor.

Measured (BENCH_NOTES): XLA lowers random gather on TPU to a serialized
~80ms-per-8M-indices form REGARDLESS of table size. But dimension tables
are small, and a gather from a small table is a tiny matmul in disguise:

    element n lives at (n >> 7, n & 127) of a [N/128, 128] layout;
    row-select = one-hot [T, N/128] @ table [N/128, 128]  (MXU)
    lane-select = one-hot-weighted sum over the 128 lanes  (VPU)

Exactness: every int32 plane (including bitcast f32/date planes) splits
into four UNSIGNED BYTES; bytes (<=255) are exact in bf16, each output
accumulates exactly ONE nonzero product, and the f32 MXU accumulator
reassembles them bit-exactly. Cost is M x N x 4 bf16 MACs — for an 8M-row
probe against a 32k-row dimension that is ~1 TMAC (~3ms on a v5e) vs the
80ms gather floor. The switch lives in selection.batched_take, gated by
``auron.gather.mxu.max.table``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from auron_tpu import config

LANES = 128
TILE = 2048  # indices per scan step


def mxu_gather_i32_planes(table, idx):
    """table: [N, P] int32 (bit planes); idx: [M] int32 in [0, N).
    Returns [M, P] int32, bit-exact equal to table[idx]."""
    n, p = table.shape
    m = idx.shape[0]
    nb = -(-n // LANES)
    pad_rows = nb * LANES - n
    if pad_rows:
        table = jnp.concatenate(
            [table, jnp.zeros((pad_rows, p), table.dtype)])
    # byte-split -> bf16 lane matrix [NB, 128 * P * 4]
    shifts = jnp.asarray([0, 8, 16, 24], jnp.int32)
    tb = (table[:, :, None] >> shifts) & jnp.int32(0xFF)     # [N', P, 4]
    tb = tb.reshape(nb, LANES, p * 4).astype(jnp.bfloat16)
    tb = tb.reshape(nb, LANES * p * 4)

    pad_m = (-m) % TILE
    if pad_m:
        idx = jnp.concatenate([idx, jnp.zeros(pad_m, idx.dtype)])
    nt = (m + pad_m) // TILE
    idx2 = idx.reshape(nt, TILE).astype(jnp.int32)

    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (TILE, LANES), 1)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (TILE, nb), 1)

    def body(_, tile_idx):
        rows = tile_idx >> 7
        cols = tile_idx & 127
        oh = (rows[:, None] == row_iota).astype(jnp.bfloat16)  # [T, NB]
        fetched = jax.lax.dot_general(
            oh, tb, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # [T, 128*P4]
        fetched = fetched.reshape(TILE, LANES, p * 4)
        sel = (cols[:, None] == lane_iota).astype(jnp.float32)  # [T, 128]
        out = jnp.einsum("tl,tlq->tq", sel, fetched,
                         precision=jax.lax.Precision.HIGHEST)   # [T, P4]
        bytes_i = out.astype(jnp.int32).reshape(TILE, p, 4)
        vals = (bytes_i[:, :, 0] | (bytes_i[:, :, 1] << 8) |
                (bytes_i[:, :, 2] << 16) | (bytes_i[:, :, 3] << 24))
        return None, vals

    _, tiles = jax.lax.scan(body, None, idx2)
    return tiles.reshape(nt * TILE, p)[:m]


def use_mxu_gather(table_rows: int, num_indices: int) -> bool:
    max_table = config.conf.get(config.MXU_GATHER_MAX_TABLE)
    if table_rows > max_table or table_rows == 0:
        return False
    if num_indices < (1 << 16):
        return False  # small index sets: the plain gather is fine
    if config.conf.get(config.PALLAS_INTERPRET):
        return True  # CPU test mode
    return jax.default_backend() == "tpu" and \
        config.conf.get(config.PALLAS_ENABLE)
