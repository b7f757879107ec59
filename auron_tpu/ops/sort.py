"""Sort and top-K.

Replaces the reference's external radix sort + loser-tree merge
(/root/reference/native-engine/datafusion-ext-plans/src/sort_exec.rs,
datafusion-ext-commons/src/algorithm/{rdx_sort,loser_tree}.rs) with a single
XLA multi-operand lexicographic sort over HBM-resident blocks: there is no
spill hierarchy because blocks are sized to the HBM budget; larger-than-block
sorts become sorted-run merges at the plan layer.

Key encoding gives every ORDER BY the same machine shape:
  [dead-rows-last] [null-rank_0] [key_0] [null-rank_1] [key_1] ...
with per-key direction folded into a monotone int transform (bitwise NOT for
ints, IEEE-754 total-order mapping for floats, lexicographic dictionary ranks
for strings). NaN sorts greater than +inf like Spark.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from auron_tpu.block import Column, TableBlock
from auron_tpu.expr import strings as S


@dataclass(frozen=True)
class SortKey:
    column: str
    ascending: bool = True
    # Spark default: nulls first when ascending, nulls last when descending
    nulls_first: Optional[bool] = None

    @property
    def nulls_first_resolved(self) -> bool:
        return self.ascending if self.nulls_first is None else self.nulls_first


def orderable_ops_list(col: Column) -> List[jnp.ndarray]:
    """Lexicographic operand list for one column: a single array for every
    narrow dtype, (hi, sign-flipped lo) for 128-bit decimals."""
    if col.dtype.name == "decimal128":
        from auron_tpu.ops import decimal128 as d128
        return d128.orderable_ops(col.values)
    if col.dtype.is_raw_string:
        # byte planes are stored orderable: one operand per word
        return [col.values[:, w] for w in range(col.values.shape[1])]
    return [orderable_values(col)]


def orderable_values(col: Column):
    """Column values -> integer (or passthrough) array whose ascending order
    equals the column's SQL ordering."""
    dt = col.dtype
    if dt.name == "decimal128" or dt.is_raw_string:
        raise NotImplementedError(
            f"{dt.name} needs multiple sort operands — use "
            "orderable_ops_list")
    if dt.is_string:
        rank = S.sort_rank_table(col.dict_values)
        codes = jnp.clip(col.values, 0, len(col.dict_values) - 1)
        return jnp.asarray(rank)[codes]
    if dt.name == "float64":
        if jax.default_backend() == "tpu":
            # f64 is f32 on TPU; order via f32 mapping
            return _float32_orderable(col.values.astype(jnp.float32))
        return _float64_orderable(col.values)
    if dt.name == "float32":
        return _float32_orderable(col.values)
    if dt.name == "bool":
        return col.values.astype(jnp.int8)
    return col.values  # ints, dates, decimals


def _float64_orderable(v):
    # signed total-order map: negatives flip their magnitude bits, positives
    # pass through; -0.0 < +0.0; all NaN canonicalized above +inf (Spark)
    bits = jax.lax.bitcast_convert_type(v, jnp.int64)
    flipped = jnp.where(bits < 0, bits ^ np.int64(0x7FFFFFFFFFFFFFFF), bits)
    return jnp.where(jnp.isnan(v), np.int64(np.iinfo(np.int64).max), flipped)


def _float32_orderable(v):
    bits = jax.lax.bitcast_convert_type(v, jnp.int32)
    flipped = jnp.where(bits < 0, bits ^ np.int32(0x7FFFFFFF), bits)
    return jnp.where(jnp.isnan(v), np.int32(np.iinfo(np.int32).max), flipped)


def _directional(key_vals, ascending: bool):
    # bitwise NOT reverses order for any integer (and bool) dtype
    return key_vals if ascending else ~key_vals


def sort_operands(block: TableBlock, keys: Sequence[SortKey]
                  ) -> List[jnp.ndarray]:
    """Build the lexicographic operand list (most significant first)."""
    ops: List[jnp.ndarray] = [~block.row_mask]  # dead rows last, always
    for k in keys:
        c = block.columns[k.column]
        null_rank = jnp.zeros(block.capacity, jnp.int8)
        if c.validity is not None:
            if k.nulls_first_resolved:
                null_rank = jnp.where(c.validity, jnp.int8(1), jnp.int8(0))
            else:
                null_rank = jnp.where(c.validity, jnp.int8(0), jnp.int8(1))
        ops.append(null_rank)
        for ov in orderable_ops_list(c):
            ops.append(_directional(ov, k.ascending))
    return ops


def sort_block(block: TableBlock, keys: Sequence[SortKey],
               limit: Optional[int] = None) -> TableBlock:
    """Full ORDER BY: returns a block whose physical order is the sort order
    (live rows first). Stable."""
    cap = block.capacity
    ops = sort_operands(block, keys)
    iota = jnp.arange(cap, dtype=jnp.int32)
    *_, perm = jax.lax.sort(
        tuple(ops) + (iota,), dimension=0, is_stable=True,
        num_keys=len(ops))
    from auron_tpu.ops.selection import take_block
    n = jnp.sum(block.row_mask.astype(jnp.int32))
    new_mask = iota < n
    if limit is not None:
        new_mask = new_mask & (iota < limit)
    return take_block(block, perm, new_mask)


def top_k_block(block: TableBlock, keys: Sequence[SortKey], k: int
                ) -> TableBlock:
    """TakeOrdered / fetch-limit sort (sort_exec.rs top-K support).

    Same result as sort_block(..., limit=k); kept separate so the planner can
    choose a cheaper path for small k (currently also a full sort — XLA's
    sort is O(n log n) and top-k on multi-key needs the same operands; a
    Pallas partial-selection kernel is a later optimization).
    """
    return sort_block(block, keys, limit=k)
