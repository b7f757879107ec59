"""Out-of-core sort: device-sorted runs + streaming merge over host-staged
chunks.

The reference's SortExec spills sorted runs to disk and merges them with a
loser tree (/root/reference/native-engine/datafusion-ext-plans/src/
sort_exec.rs:341-446, merge loop over SpillCursor). The TPU analog inverts
the cost model: `lax.sort` is cheap (~46 ms / 8M rows, BENCH_NOTES) while
HBM is the scarce resource — so

1. **run formation**: each staged chunk streams HBM-resident once, sorts on
   device, and returns to host RAM as a compressed sorted run
   (io/staging.py payloads);
2. **merge**: runs merge pairwise (a tournament — the loser-tree analog
   with fan-in 2). A 2-way merge holds ONE buffer block and ONE incoming
   chunk in HBM: always load the run whose next chunk starts lowest, then
   every buffered row is <= that bound or a short carry — emit rows <=
   bound, carry the rest. Peak HBM is O(3 chunks) regardless of table size.

Total device work is O(n log k) sorts of chunk-sized blocks; host work is
zstd serde per pass. `sort_staged` picks the chunk capacity from the
MemoryBudget so one merge step fits the configured headroom.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from auron_tpu.block import TableBlock
from auron_tpu.io.serde import deserialize_block, serialize_block
from auron_tpu.io.staging import StagedTable
from auron_tpu.ops.sort import SortKey, sort_block, sort_operands


def _first_live_operands(block: TableBlock, keys: Sequence[SortKey]):
    """Host tuple of the first live row's directional sort operands
    (sorted blocks keep live rows first, so row 0 is the minimum)."""
    ops = sort_operands(block, keys)
    return tuple(np.asarray(o[0]) for o in ops)


def _emit_mask(block: TableBlock, keys: Sequence[SortKey], bound) -> jnp.ndarray:
    """live rows whose key tuple <= bound (lexicographic, directional)."""
    ops = sort_operands(block, keys)
    lt = jnp.zeros(block.capacity, jnp.bool_)
    eq = jnp.ones(block.capacity, jnp.bool_)
    for o, b in zip(ops, bound):
        bv = jnp.asarray(b, o.dtype)
        lt = lt | (eq & (o < bv))
        eq = eq & (o == bv)
    return (lt | eq) & block.row_mask


def _merge_two_runs(a: List[bytes], b: List[bytes],
                    keys: Sequence[SortKey]) -> List[bytes]:
    """Streaming merge of two sorted runs (lists of sorted-chunk payloads).

    HBM residency: one carry buffer + one incoming chunk. Each loop
    iteration emits every buffered row <= the smallest first-element among
    unloaded chunks; those rows can never be beaten later because runs are
    globally sorted across their chunk sequence.
    """
    out: List[bytes] = []
    ai = bi = 0
    carry: Optional[TableBlock] = None

    def head(payloads, i):
        if i >= len(payloads):
            return None
        blk = deserialize_block(payloads[i])
        return sort_block(blk, keys)  # live rows first (already sorted; cheap)

    a_head = head(a, ai)
    b_head = head(b, bi)
    while a_head is not None or b_head is not None or carry is not None:
        # choose the run whose pending chunk starts lowest
        if a_head is not None and b_head is not None:
            fa = _first_live_operands(a_head, keys)
            fb = _first_live_operands(b_head, keys)
            take_a = fa <= fb  # tuple compare == lexicographic
        else:
            take_a = a_head is not None
        if a_head is None and b_head is None:
            # drain the carry
            out.append(serialize_block(sort_block(carry, keys)))
            carry = None
            break
        incoming = a_head if take_a else b_head
        if take_a:
            ai += 1
            a_head = head(a, ai)
        else:
            bi += 1
            b_head = head(b, bi)
        buf = incoming if carry is None else _concat(carry, incoming)
        buf = sort_block(buf, keys)
        # bound: smallest first element among still-unloaded chunk heads
        nxt = [h for h in (a_head, b_head) if h is not None]
        if not nxt:
            out.append(serialize_block(buf))
            carry = None
            continue
        bounds = [_first_live_operands(h, keys) for h in nxt]
        bound = min(bounds)
        emit = _emit_mask(buf, keys, bound)
        n_emit = int(np.asarray(jnp.sum(emit.astype(jnp.int32))))
        n_live = int(np.asarray(jnp.sum(buf.row_mask.astype(jnp.int32))))
        if n_emit:
            out.append(serialize_block(buf.with_mask(emit)))
        if n_emit == n_live:
            carry = None
        else:
            keep = sort_block(buf.with_mask(buf.row_mask & ~emit), keys)
            # compact to a bucketed capacity so buffer capacity cannot
            # creep upward across iterations (live rows are first after
            # sort_block, so a head slice is a compaction)
            n_keep = n_live - n_emit
            carry = _head_slice(keep, n_keep)
    return out


def _concat(a: TableBlock, b: TableBlock) -> TableBlock:
    from auron_tpu.ops.join import concat_blocks
    return concat_blocks([a, b])


def _head_slice(block: TableBlock, n_live: int) -> TableBlock:
    from auron_tpu.block import round_capacity
    from auron_tpu.ops.selection import take_block
    cap = round_capacity(max(n_live, 32))
    idx = jnp.arange(cap, dtype=jnp.int32)
    return take_block(block, jnp.clip(idx, 0, block.capacity - 1),
                      idx < n_live)


def sort_staged(staged: StagedTable, keys: Sequence[SortKey],
                budget=None) -> StagedTable:
    """External sort of a host-staged table; returns a globally sorted
    StagedTable (chunk i's rows all <= chunk i+1's rows, each chunk sorted).

    Done-criteria analog of sort_exec.rs:341-446: exact results for tables
    arbitrarily larger than the device budget; peak HBM bounded by ~3
    chunks.
    """
    # pass 1: per-chunk device sort -> sorted runs of one chunk each
    runs: List[List[bytes]] = []
    for i in range(staged.num_partitions):
        blk = staged.block(i)
        runs.append([serialize_block(sort_block(blk, keys))])
    if not runs:
        return StagedTable([])
    # pass 2: pairwise merge tournament (fan-in 2 loser tree)
    while len(runs) > 1:
        nxt: List[List[bytes]] = []
        for j in range(0, len(runs) - 1, 2):
            nxt.append(_merge_two_runs(runs[j], runs[j + 1], keys))
        if len(runs) % 2:
            nxt.append(runs[-1])
        runs = nxt
    return StagedTable(runs[0])
