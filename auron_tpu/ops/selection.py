"""Selection compaction and row gather — the engine's data-movement kernels.

Replaces the reference's selection/interleave primitives
(/root/reference/native-engine/datafusion-ext-commons/src/arrow/selection.rs:
`create_batch_interleaver`, `take_batch`) with XLA-native forms: compaction is
`nonzero(mask)` (cumsum + scatter under the hood, one fused pass), gathers are
`take` over every column. All shapes stay static at block capacity; liveness
rides in the row mask.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from auron_tpu.block import Column, TableBlock


def compaction_indices(mask) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Indices of live rows, padded to capacity; returns (indices, count)."""
    cap = mask.shape[0]
    idx = first_live_indices(mask, cap)
    n = jnp.sum(mask.astype(jnp.int32))
    return idx, n


def _stacked_take(stacked, indices):
    """take(stacked[k,N], idx, axis=1) that survives huge index counts.

    The TPU gather emitter materializes the 2-D gather output
    offsets-MINOR: s32[n_idx, k]{1,0:T(8,128)} — k padded to 128 lanes,
    i.e. 512 B per index regardless of k. At 50M indices that temp is
    25.7 GB and the program cannot even compile (measured; forcing the
    layout via a fori_loop accumulator or lax.map fails identically —
    layout assignment propagates the gather's preference). Above a chunk
    threshold we therefore run the SAME stacked gather inside lax.scan
    with per-plane tuple outputs: every persistent buffer is per-plane
    (no k-minor dim exists to pad) and the padded temp is bounded by the
    chunk (8M idx = 4.3 GB). Measured v5e @ 50M idx x 5 planes:
    scan-chunked 1150 ms vs separate 1-D takes 3007 ms vs direct 2-D OOM.
    """
    import jax
    from auron_tpu.config import conf
    k = stacked.shape[0]
    n = indices.shape[0]
    chunk = conf.get("auron.take.chunk.rows")
    if n <= chunk or k == 1:
        got = jnp.take(stacked, indices, axis=1)
        return [got[j] for j in range(k)]
    pad = (-n) % chunk
    ix = jnp.pad(indices, (0, pad)).reshape(-1, chunk)

    def body(carry, ch):
        got = jnp.take(stacked, ch, axis=1)  # [k, chunk] — bounded temp
        return carry, tuple(got[j] for j in range(k))

    _, ys = jax.lax.scan(body, 0, ix)        # k arrays of [nchunks, chunk]
    return [y.reshape(-1)[:n] for y in ys]


def batched_take(arrays: dict, indices) -> dict:
    """Gather many row-aligned arrays by the same indices in ONE 2-D gather.

    TPU gather cost is per-index, not per-byte (measured: 8 stacked columns
    cost 1.8x one column; separate gathers cost 4x). So every 1-D column is
    decomposed into int32 planes — 64-bit dtypes bitcast to two planes,
    32-bit bitcast to one, narrower types widened — stacked into a single
    [total_planes, capacity] int32 matrix, gathered once along axis 1, and
    reassembled bit-exactly.

    Layout matters: the planes dimension must be MAJOR. A [capacity, k]
    stack pads k to the 128-lane tile (T(8,128)) — 32x memory at k=4,
    which OOMs HBM at 50M rows (measured: s32[50M,4] wants 25.7 GB).
    [k, capacity] pads k only to 8 sublanes and measures FASTER
    (v5e, 8M rows x 4 planes: 86 ms vs 96 ms axis-0 vs 341 ms separate;
    50M rows: 394 ms while axis-0 cannot even compile). Huge index
    counts route through the scan-chunked form (_stacked_take).
    """
    import jax
    # NOTE: 64-bit dtypes CANNOT ride the int32 plane stack — TPU's x64
    # emulation rewriter does not implement 64<->2x32 bitcast-convert
    # ("While rewriting computation to not contain X64 element types...").
    # They get their own per-dtype stacked gathers instead.
    plan = []   # (key, kind, orig_dtype) for the int32 stack
    cols = []
    wide: dict = {}  # dtype str -> [keys] for 64-bit groups
    out = {}
    for key, arr in arrays.items():
        if arr.ndim != 1:
            out[key] = jnp.take(arr, indices, axis=0)
            continue
        dt = arr.dtype
        size = jnp.dtype(dt).itemsize
        if size == 8:
            wide.setdefault(str(dt), []).append(key)
        elif size == 4:
            cols.append(arr if dt == jnp.int32
                        else jax.lax.bitcast_convert_type(arr, jnp.int32))
            plan.append((key, "32", dt))
        else:  # bool / int8 / int16: widen (value-preserving)
            cols.append(arr.astype(jnp.int32))
            plan.append((key, "narrow", dt))
    for dkey, keys in wide.items():
        if len(keys) == 1:
            out[keys[0]] = jnp.take(arrays[keys[0]], indices)
        else:
            rows64 = _stacked_take(
                jnp.stack([arrays[k] for k in keys], axis=0), indices)
            for j, k in enumerate(keys):
                out[k] = rows64[j]
    if not cols:
        return out
    from auron_tpu.ops.mxu_gather import mxu_gather_i32_planes, use_mxu_gather
    n_rows = cols[0].shape[0]
    if use_mxu_gather(n_rows, indices.shape[0]):
        got2 = mxu_gather_i32_planes(jnp.stack(cols, axis=1),
                                     indices.astype(jnp.int32))
        rows = [got2[:, j] for j in range(len(cols))]
    elif len(cols) == 1:
        rows = [jnp.take(cols[0], indices)]
    else:
        rows = _stacked_take(jnp.stack(cols, axis=0), indices)
    for j, (key, kind, dt) in enumerate(plan):
        col = rows[j]
        if kind == "32":
            out[key] = col if dt == jnp.int32 \
                else jax.lax.bitcast_convert_type(col, dt)
        else:
            out[key] = col.astype(dt)
    return out


def take_block(block: TableBlock, indices, out_mask) -> TableBlock:
    """Gather rows of every column by `indices`; new row mask = out_mask.

    Same-dtype 1-D columns are stacked and gathered in ONE 2-D take: TPU
    gather cost is dominated by per-index overhead, not row width (measured:
    8 columns in one 2-D gather = 1.8x one column, vs 8x for separate
    gathers), so batching is a ~4.5x win on wide blocks.
    """
    arrays = {}
    for name, c in block.columns.items():
        arrays[(name, "v")] = c.values
        if c.validity is not None:
            arrays[(name, "n")] = c.validity
    taken = batched_take(arrays, indices)
    cols = {}
    for name, c in block.columns.items():
        cols[name] = Column(taken[(name, "v")], taken.get((name, "n")),
                            c.dtype, c.dict_values)
    return TableBlock(cols, out_mask)


def compact(block: TableBlock) -> Tuple[TableBlock, jnp.ndarray]:
    """Move live rows to the front (stable). Returns (block, live_count).

    Only used where physical position matters: before exchange (cut comm
    volume), before sort-free limit, at the output boundary. Filters
    themselves never compact (they just AND the mask).
    """
    idx, n = compaction_indices(block.row_mask)
    cap = block.capacity
    new_mask = jnp.arange(cap) < n
    return take_block(block, idx, new_mask), n


def shrink_block(block: TableBlock, new_capacity: int) -> TableBlock:
    """Compact live rows into a block of SMALLER static capacity.

    The static-shape selectivity AQE: after a selective filter/join, most
    of a scan-capacity block is dead mask, yet every downstream gather,
    sort and aggregation still pays the full capacity (a 1/1000-selective
    dimension filter at 50M rows leaves 50M-row buffers flowing through
    the rest of the query). The calibration prepass measures the true
    live count (runtime/calibrate.py record_live) and the executor calls
    this to re-home the survivors in a right-sized block. Truncation is
    impossible by silent default: the true live count rides the traced
    overflow counters and regrow re-runs with a grown shrink factor.
    """
    from auron_tpu.runtime import overflow as OV
    n = jnp.sum(block.row_mask.astype(jnp.int32))
    OV.record("shrink", n, new_capacity)
    idx = first_live_indices(block.row_mask, new_capacity)
    new_mask = jnp.arange(new_capacity) < n
    return take_block(block, idx, new_mask)


def first_live_indices(mask: jnp.ndarray, k: int) -> jnp.ndarray:
    """Positions of the first ``k`` live rows, ascending (fill = anything
    past the live count — callers mask by the live total).

    Replaces ``jnp.nonzero(mask, size=k)``: measured on the v5e, XLA's
    sized-nonzero inside a large fused program cost 4.5s at 50M rows
    (q55's shrink dominated the whole query, BENCH_NOTES r05) where a
    single-operand sort of position-or-sentinel keys runs in 0.17s and
    is equal element-for-element."""
    import jax
    cap = mask.shape[0]
    src = jnp.arange(cap, dtype=jnp.int32)
    keys = jnp.where(mask, src, jnp.int32(2 ** 31 - 1))
    return jnp.minimum(jax.lax.sort(keys)[:k], cap - 1)


def head_limit(block: TableBlock, limit: int, offset: int = 0) -> TableBlock:
    """LimitExec analog (limit_exec.rs:305, auron.proto:752-756): keep the
    first `limit` live rows (after `offset`) in current physical order."""
    # int32: capacity-bounded rank; i64[N] becomes padded s32[N,2] on TPU
    live_rank = jnp.cumsum(block.row_mask.astype(jnp.int32)) - 1
    keep = block.row_mask & (live_rank >= offset) & (live_rank < offset + limit)
    return block.with_mask(keep)
