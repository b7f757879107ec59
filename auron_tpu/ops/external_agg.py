"""Out-of-core aggregation: streaming group-by over host-staged sorted runs.

The reference's AggExec spills its hash table to radix-bucketed streams and
merges buckets with an RdxQueue (/root/reference/native-engine/
datafusion-ext-plans/src/agg/agg_table.rs:723-840, rdx_queue.rs). The TPU
analog rides the external SORT instead (sorting is cheap on TPU,
BENCH_NOTES): globally sort the staged table by the group keys
(ops/external_sort.py), then stream chunks in key order — within a chunk
a device group-by produces partial states; because later chunks hold only
keys >= the chunk's maximum, every group except the key-maximal one is
FINISHED and can be emitted immediately. Only that single boundary group
carries (as partial state) into the next chunk. Peak HBM stays O(chunk);
the output streams back to host RAM as it is produced.

Supported aggregate kinds: sum, count, count_star, min, max, avg
(avg rides (sum, count) partial states, merged by summation).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from auron_tpu.block import Column, TableBlock
from auron_tpu.dtypes import FLOAT64
from auron_tpu.io.serde import deserialize_block, serialize_block
from auron_tpu.io.staging import StagedTable
from auron_tpu.ops.aggregate import AggSpec, groupby_sorted
from auron_tpu.ops.external_sort import sort_staged
from auron_tpu.ops.join import concat_blocks
from auron_tpu.ops.sort import SortKey, sort_block


def _partial_specs(aggs) -> List[Tuple[AggSpec, Optional[str]]]:
    """(out_name, kind, in_col) -> partial-state spec list."""
    out = []
    for name, kind, col in aggs:
        if kind == "avg":
            out.append((AggSpec(f"{name}#s", "sum"), col))
            out.append((AggSpec(f"{name}#c", "count"), col))
        elif kind == "count_star":
            out.append((AggSpec(name, "count_star"), None))
        elif kind in ("sum", "count", "min", "max"):
            out.append((AggSpec(name, kind), col))
        else:
            raise NotImplementedError(f"external agg kind {kind}")
    return out


def _merge_specs(aggs) -> List[Tuple[AggSpec, str]]:
    """Partial states merge by: counts/sums -> sum, min -> min, max -> max."""
    out = []
    for name, kind, _col in aggs:
        if kind == "avg":
            out.append((AggSpec(f"{name}#s", "sum"), f"{name}#s"))
            out.append((AggSpec(f"{name}#c", "sum"), f"{name}#c"))
        elif kind in ("count", "count_star", "sum"):
            out.append((AggSpec(name, "sum"), name))
        else:  # min / max
            out.append((AggSpec(name, kind), name))
    return out


def _finalize(block: TableBlock, key_names: Sequence[str], aggs
              ) -> TableBlock:
    """Partial states -> user-facing columns (avg = sum / count)."""
    cols = {k: block.columns[k] for k in key_names}
    for name, kind, _col in aggs:
        if kind == "avg":
            s = block.columns[f"{name}#s"]
            c = block.columns[f"{name}#c"]
            cnt = c.values.astype(jnp.float64)
            sv = s.values
            if s.dtype.name == "decimal64":
                sv = sv.astype(jnp.float64) / float(10 ** s.dtype.params[1])
            vals = sv.astype(jnp.float64) / jnp.maximum(cnt, 1.0)
            cols[name] = Column.of(vals, FLOAT64, c.values > 0)
        else:
            cols[name] = block.columns[name]
    return TableBlock(cols, block.row_mask)


def _split_last_group(partial: TableBlock, key_names: Sequence[str]
                      ) -> Tuple[TableBlock, TableBlock]:
    """Sort the (small) partial block by keys and split off the key-maximal
    group as the carry. Uses plan sort order — the same orderable encodings
    sort_staged used — so the carry is exactly the group that may continue
    into the next (key-greater) chunk."""
    keys = [SortKey(k) for k in key_names]
    s = sort_block(partial, keys)
    n = int(np.asarray(jnp.sum(s.row_mask.astype(jnp.int32))))
    live_idx = n - 1
    mask = np.asarray(s.row_mask).copy()
    finished_mask = mask.copy()
    finished_mask[live_idx] = False
    carry_mask = np.zeros_like(mask)
    carry_mask[live_idx] = True
    return (TableBlock(s.columns, jnp.asarray(finished_mask)),
            TableBlock(s.columns, jnp.asarray(carry_mask)))


def aggregate_staged(staged: StagedTable, key_names: Sequence[str],
                     aggs: Sequence[Tuple[str, str, Optional[str]]],
                     budget=None) -> StagedTable:
    """GROUP BY over a staged table arbitrarily larger than HBM.

    ``aggs``: (out_name, kind, input_column) triples. Returns a StagedTable
    of finished groups (key-sorted across chunks). Exact at any size —
    done-criteria analog of agg_table.rs's spill/merge loop.
    """
    psp = _partial_specs(aggs)
    sorted_runs = sort_staged(
        staged, [SortKey(k) for k in key_names], budget)
    out_payloads: List[bytes] = []
    carry: Optional[TableBlock] = None
    for payload in sorted_runs.payloads:
        chunk = deserialize_block(payload)
        partial = groupby_sorted(
            chunk, list(key_names),
            [(spec, chunk.columns[col] if col else None)
             for spec, col in psp])
        if carry is not None:
            both = concat_blocks([carry, partial])
            partial = groupby_sorted(
                both, list(key_names),
                [(spec, both.columns[src])
                 for spec, src in _merge_specs(aggs)])
        n_groups = int(np.asarray(jnp.sum(
            partial.row_mask.astype(jnp.int32))))
        if n_groups == 0:
            carry = None
            continue
        finished, carry = _split_last_group(partial, key_names)
        if int(np.asarray(jnp.sum(
                finished.row_mask.astype(jnp.int32)))) > 0:
            out_payloads.append(serialize_block(
                _finalize(finished, key_names, aggs)))
    if carry is not None:
        out_payloads.append(serialize_block(
            _finalize(carry, key_names, aggs)))
    return StagedTable(out_payloads)
