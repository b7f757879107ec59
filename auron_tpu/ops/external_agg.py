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
(avg rides (sum, count) partial states, merged by summation), stddev /
stddev_samp ((sum, sum-of-squares, count) exact-merge states — the same
protocol the SPMD split uses, plan/execute.py std_div), and
count_distinct (the staged table is additionally sorted by the distinct
expression, so "first occurrence of a value within its group" becomes a
flag column summed like any other agg; the flag carry crosses chunk
boundaries). ``mode`` mirrors the in-HBM PARTIAL/FINAL protocol
(auron.proto:741-750): partial emits state columns, final merges them.
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
    """(out_name, kind, in_col) -> partial-state spec list.

    stddev expects a squared-input column named ``f"{col}#sq"`` alongside
    ``col`` (materialized by the caller's pre-projection);
    count_distinct expects a first-occurrence flag column
    ``f"{name}#dflag"`` (materialized by aggregate_staged's chunk prep).
    """
    out = []
    for name, kind, col in aggs:
        if kind == "avg":
            out.append((AggSpec(f"{name}#s", "sum"), col))
            out.append((AggSpec(f"{name}#c", "count"), col))
        elif kind in ("stddev", "stddev_samp"):
            out.append((AggSpec(f"{name}#s", "sum"), col))
            out.append((AggSpec(f"{name}#q", "sum"), f"{col}#sq"))
            out.append((AggSpec(f"{name}#c", "count"), col))
        elif kind == "count_distinct":
            out.append((AggSpec(name, "sum"), f"{name}#dflag"))
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
        elif kind in ("stddev", "stddev_samp"):
            out.append((AggSpec(f"{name}#s", "sum"), f"{name}#s"))
            out.append((AggSpec(f"{name}#q", "sum"), f"{name}#q"))
            out.append((AggSpec(f"{name}#c", "sum"), f"{name}#c"))
        elif kind in ("count", "count_star", "sum", "count_distinct"):
            out.append((AggSpec(name, "sum"), name))
        else:  # min / max
            out.append((AggSpec(name, kind), name))
    return out


def partial_names(name: str, kind: str) -> List[str]:
    """State-column names one agg emits in partial mode (the staged twin
    of plan/execute.py _partial_names)."""
    if kind == "avg":
        return [f"{name}#s", f"{name}#c"]
    if kind in ("stddev", "stddev_samp"):
        return [f"{name}#s", f"{name}#q", f"{name}#c"]
    return [name]


def _finalize(block: TableBlock, key_names: Sequence[str], aggs
              ) -> TableBlock:
    """Partial states -> user-facing columns (avg = sum / count,
    stddev_samp = sqrt((q - s^2/n) / (n-1)), NULL when n < 2)."""
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
        elif kind in ("stddev", "stddev_samp"):
            s = block.columns[f"{name}#s"]
            q = block.columns[f"{name}#q"]
            c = block.columns[f"{name}#c"]
            n = c.values.astype(jnp.float64)
            sv = s.values.astype(jnp.float64)
            qv = q.values.astype(jnp.float64)
            var = (qv - sv * sv / jnp.maximum(n, 1.0)) / \
                jnp.maximum(n - 1.0, 1.0)
            cols[name] = Column.of(jnp.sqrt(jnp.maximum(var, 0.0)),
                                   FLOAT64, c.values > 1)
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


def _row_values(chunk: TableBlock, names: Sequence[str], i: int) -> tuple:
    """Host-comparable (value, valid) tuple of row ``i`` — dictionary
    codes are DECODED so the tuple compares correctly across chunks whose
    per-chunk dictionaries differ."""
    out = []
    for n in names:
        c = chunk.columns[n]
        v = np.asarray(c.values)[i]
        valid = True if c.validity is None \
            else bool(np.asarray(c.validity)[i])
        if c.dict_values is not None:
            code = int(v)
            v = c.dict_values[code] if 0 <= code < len(c.dict_values) \
                else None
        elif getattr(v, "ndim", 0) == 0:
            v = v.item()
        out.append((v, valid))
    return tuple(out)


def mark_first_occurrences(chunk: TableBlock, key_names: Sequence[str],
                           dcol: str, flag_names: Sequence[str],
                           dcarry: Optional[tuple]
                           ) -> Tuple[TableBlock, Optional[tuple]]:
    """count_distinct prep over chunks sorted by (keys..., dcol): add
    int64 flag columns marking the first occurrence of each (keys, value)
    pair; the last live row's tuple carries to the next chunk so a value
    run spanning a boundary is counted once. NULL values never flag
    (Spark count(DISTINCT x) ignores nulls)."""
    mask = np.asarray(chunk.row_mask)
    n = int(mask.sum())
    cap = len(mask)
    flags = np.zeros(cap, np.int64)
    if n > 0:
        names = list(key_names) + [dcol]
        arrs, valids = [], []
        for nm in names:
            c = chunk.columns[nm]
            arrs.append(np.asarray(c.values)[:n])
            valids.append(np.ones(n, bool) if c.validity is None
                          else np.asarray(c.validity)[:n])
        diff = np.zeros(n, bool)
        diff[0] = True
        for a, va in zip(arrs, valids):
            if a.ndim > 1:   # raw-string byte planes: compare all lanes
                diff[1:] |= (a[1:] != a[:-1]).any(axis=1)
            else:
                diff[1:] |= a[1:] != a[:-1]
            diff[1:] |= va[1:] != va[:-1]
        if dcarry is not None and _row_values(chunk, names, 0) == dcarry:
            diff[0] = False
        dvalid = valids[-1]
        flags[:n] = (diff & dvalid).astype(np.int64)
        dcarry = _row_values(chunk, names, n - 1)
    from auron_tpu.dtypes import INT64
    cols = dict(chunk.columns)
    for fn_ in flag_names:
        cols[fn_] = Column.of(jnp.asarray(flags), INT64, None)
    return TableBlock(cols, chunk.row_mask), dcarry


def aggregate_staged(staged: StagedTable, key_names: Sequence[str],
                     aggs: Sequence[Tuple[str, str, Optional[str]]],
                     budget=None, mode: str = "single",
                     distinct_col: Optional[str] = None) -> StagedTable:
    """GROUP BY over a staged table arbitrarily larger than HBM.

    ``aggs``: (out_name, kind, input_column) triples. Returns a StagedTable
    of finished groups (key-sorted across chunks). Exact at any size —
    done-criteria analog of agg_table.rs's spill/merge loop.

    ``mode``: 'single' finalizes states to user columns; 'partial' emits
    the mergeable state columns (name#s / name#q / name#c); 'final'
    consumes state columns produced by a partial stage and finalizes.
    ``distinct_col``: the shared input column of every count_distinct
    call (the staged sort adds it as a trailing key; see
    mark_first_occurrences).
    """
    psp = _partial_specs(aggs) if mode != "final" else \
        [(spec, src) for spec, src in _merge_specs(aggs)]
    dflag_names = [f"{name}#dflag" for name, kind, _ in aggs
                   if kind == "count_distinct"]
    sort_keys = [SortKey(k) for k in key_names]
    if distinct_col is not None:
        sort_keys.append(SortKey(distinct_col))
    sorted_runs = sort_staged(staged, sort_keys, budget)
    out_payloads: List[bytes] = []
    carry: Optional[TableBlock] = None
    dcarry: Optional[tuple] = None
    for payload in sorted_runs.payloads:
        chunk = deserialize_block(payload)
        if distinct_col is not None:
            chunk, dcarry = mark_first_occurrences(
                chunk, key_names, distinct_col, dflag_names, dcarry)
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
                finished if mode == "partial"
                else _finalize(finished, key_names, aggs)))
    if carry is not None:
        out_payloads.append(serialize_block(
            carry if mode == "partial"
            else _finalize(carry, key_names, aggs)))
    return StagedTable(out_payloads)
