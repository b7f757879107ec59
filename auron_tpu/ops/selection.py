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
    idx = jnp.nonzero(mask, size=cap, fill_value=0)[0]
    n = jnp.sum(mask.astype(jnp.int32))
    return idx, n


def take_block(block: TableBlock, indices, out_mask) -> TableBlock:
    """Gather rows of every column by `indices`; new row mask = out_mask."""
    cols = {}
    for name, c in block.columns.items():
        vals = jnp.take(c.values, indices, axis=0)
        validity = None if c.validity is None else \
            jnp.take(c.validity, indices, axis=0)
        cols[name] = Column(vals, validity, c.dtype, c.dict_values)
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


def head_limit(block: TableBlock, limit: int, offset: int = 0) -> TableBlock:
    """LimitExec analog (limit_exec.rs:305, auron.proto:752-756): keep the
    first `limit` live rows (after `offset`) in current physical order."""
    live_rank = jnp.cumsum(block.row_mask.astype(jnp.int64)) - 1
    keep = block.row_mask & (live_rank >= offset) & (live_rank < offset + limit)
    return block.with_mask(keep)
