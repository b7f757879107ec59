"""Partition-id computation — the map side of every exchange.

Mirrors the reference's repartitioner contract
(/root/reference/native-engine/datafusion-ext-plans/src/shuffle/mod.rs):
Hash = murmur3(seed 42) then Spark ``pmod`` (mod.rs:163-188) — bit-exact with
Spark so row placement matches the reference engine's shuffles; RoundRobin is
position-salted (mod.rs:190-202); Range uses sampled bounds + binary search
(mod.rs:204-279); Single sends everything to partition 0.

The ids feed either the single-host repartitioner (plan/execute.py) or the
mesh all_to_all exchange (parallel/exchange.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from auron_tpu.block import Column, TableBlock
from auron_tpu.ops.hashing import (column_hash_inputs, hash_columns_murmur3,
                                   pmod)
from auron_tpu.ops.join import concat_blocks
from auron_tpu.ops.selection import compact, take_block
from auron_tpu.ops.sort import SortKey, orderable_values, sort_operands


@dataclass(frozen=True)
class HashPartitioning:
    key_names: Tuple[str, ...]
    num_partitions: int
    seed: int = 42


@dataclass(frozen=True)
class RoundRobinPartitioning:
    num_partitions: int
    start: int = 0


@dataclass(frozen=True)
class RangePartitioning:
    """Bounds are host-side row tuples (one per splitter, ascending), computed
    by sampling at plan time — the analog of Spark's driver-side bounds
    (NativeShuffleExchangeBase.scala:96-117)."""

    sort_keys: Tuple[SortKey, ...]
    num_partitions: int
    bounds: Tuple[Tuple, ...] = ()


@dataclass(frozen=True)
class SinglePartitioning:
    num_partitions: int = 1


Partitioning = object  # union of the four dataclasses above


def partition_ids(block: TableBlock, part) -> jnp.ndarray:
    """Per-row destination partition id (dead rows -> 0, masked anyway)."""
    if isinstance(part, HashPartitioning):
        cols = [column_hash_inputs(block.columns[k]) for k in part.key_names]
        h = hash_columns_murmur3(cols, block.capacity, seed=part.seed)
        return pmod(h, part.num_partitions)
    if isinstance(part, RoundRobinPartitioning):
        live_rank = jnp.cumsum(block.row_mask.astype(jnp.int64)) - 1
        return ((live_rank + part.start) % part.num_partitions).astype(jnp.int32)
    if isinstance(part, RangePartitioning):
        return _range_ids(block, part)
    if isinstance(part, SinglePartitioning):
        return jnp.zeros(block.capacity, jnp.int32)
    raise TypeError(f"unknown partitioning {part!r}")


def _range_ids(block: TableBlock, part: RangePartitioning) -> jnp.ndarray:
    """id = number of bound tuples strictly below the row's sort key."""
    ops = sort_operands(block, part.sort_keys)[1:]  # drop dead-rows operand
    nb = len(part.bounds)
    if nb == 0:
        return jnp.zeros(block.capacity, jnp.int32)
    # encode bounds through the same transforms: build a tiny block holding
    # the bound rows and reuse sort_operands for identical encoding
    bound_data: Dict[str, np.ndarray] = {}
    bound_validity: Dict[str, np.ndarray] = {}
    for ki, k in enumerate(part.sort_keys):
        col = block.columns[k.column]
        vals = []
        valid = []
        for b in part.bounds:
            v = b[ki]
            valid.append(v is not None)
            if v is None:
                vals.append("" if col.dtype.is_raw_string else 0)
            elif col.dtype.is_string:
                from auron_tpu.expr.strings import code_of_literal
                vals.append(code_of_literal(col.dict_values, v))
            else:
                vals.append(v)
        if col.dtype.is_raw_string:  # from_numpy encodes the str bounds
            bound_data[k.column] = np.asarray(vals, dtype=object)
        else:
            bound_data[k.column] = np.asarray(vals, dtype=col.dtype.np_dtype)
        bound_validity[k.column] = np.asarray(valid, dtype=np.bool_)
    bblock = TableBlock.from_numpy(
        bound_data,
        {k.column: block.columns[k.column].dtype for k in part.sort_keys},
        capacity=max(nb, 1),
        validity={n: v for n, v in bound_validity.items() if not v.all()},
        dictionaries={k.column: block.columns[k.column].dict_values
                      for k in part.sort_keys
                      if block.columns[k.column].dtype.is_string})
    bops = sort_operands(bblock, part.sort_keys)[1:]
    # count bounds strictly less than row (lexicographic) -> partition id
    ids = jnp.zeros(block.capacity, jnp.int32)
    for bi in range(nb):
        lt = jnp.zeros(block.capacity, jnp.bool_)
        eq = jnp.ones(block.capacity, jnp.bool_)
        for bop, rop in zip(bops, ops):
            bv = bop[bi]
            lt = lt | (eq & (bv < rop))
            eq = eq & (bv == rop)
        ids = ids + (lt | eq).astype(jnp.int32)
    return jnp.clip(ids, 0, part.num_partitions - 1)


def sample_range_bounds(blocks: Sequence[TableBlock],
                        sort_keys: Sequence[SortKey],
                        num_partitions: int,
                        sample_rows: int = 4096) -> Tuple[Tuple, ...]:
    """Host-side: sample rows, sort, pick ``num_partitions - 1`` splitters."""
    frames = []
    for b in blocks:
        df = b.project([k.column for k in sort_keys]).to_pandas()
        frames.append(df.head(sample_rows))
    import pandas as pd
    allrows = pd.concat(frames, ignore_index=True)
    if len(allrows) == 0 or num_partitions <= 1:
        return ()
    by = [k.column for k in sort_keys]
    ascending = [k.ascending for k in sort_keys]
    allrows = allrows.sort_values(by=by, ascending=ascending,
                                  na_position="first")
    picks = []
    for i in range(1, num_partitions):
        pos = int(len(allrows) * i / num_partitions)
        row = allrows.iloc[min(pos, len(allrows) - 1)]
        picks.append(tuple(None if pd.isna(row[c]) else row[c].item()
                           if hasattr(row[c], "item") else row[c]
                           for c in by))
    return tuple(picks)


def repartition(blocks: Sequence[TableBlock], part,
                compact_output: bool = True) -> List[TableBlock]:
    """Single-host exchange: route rows of every input block to n outputs.

    Each output partition is the concatenation of per-input masked selections,
    compacted so downstream capacities stay near the true row counts. This is
    the local-mode analog of the shuffle write+read cycle
    (buffered_data.rs:123-158 + ipc_reader_exec.rs) without serialization —
    blocks never leave HBM.
    """
    n = part.num_partitions
    if n == 1:
        # single destination: every row routes to partition 0 whatever the
        # partitioning computes — skip the hash and the compaction gather
        # entirely (under jit the compact cannot shrink a static shape, so
        # it would be a full-capacity gather for nothing; a q93-scale probe
        # side pays seconds for it at 50M rows)
        blocks = list(blocks)
        return [concat_blocks(blocks) if len(blocks) > 1 else blocks[0]]
    if isinstance(part, RangePartitioning) and not part.bounds:
        # deferred splitter sampling from the blocks actually being
        # exchanged (Spark samples driver-side pre-shuffle; here the child
        # ran once and its outputs are in hand). Under tracing the sample
        # is unavailable — fall back to a single destination, which keeps
        # results correct (one globally-sorted partition) at the cost of
        # balance.
        import dataclasses
        import jax.core
        if not any(isinstance(b.row_mask, jax.core.Tracer) for b in blocks):
            part = dataclasses.replace(
                part, bounds=sample_range_bounds(blocks, part.sort_keys, n))
    outs: List[List[TableBlock]] = [[] for _ in range(n)]
    for bi, b in enumerate(blocks):
        p_eff = part
        if isinstance(part, RoundRobinPartitioning):
            # position-salt per source partition (reference mod.rs:190-202:
            # each map task starts at a different offset) so partition 0
            # does not receive the head row of every input block
            p_eff = RoundRobinPartitioning(n, start=part.start + bi)
        ids = partition_ids(b, p_eff)
        for p in range(n):
            masked = b.with_mask(b.row_mask & (ids == p))
            if compact_output:
                masked, _ = compact(masked)
            outs[p].append(masked)
    return [concat_blocks(parts) if len(parts) > 1 else parts[0]
            for parts in outs]
