"""Window functions over sorted partitions.

Replaces the reference's streaming window processors
(/root/reference/native-engine/datafusion-ext-plans/src/window_exec.rs:896 +
window/processors/{row_number,rank,percent_rank,cume_dist,lead,nth_value,agg}
_processor.rs) with one vectorized pass: the block is sorted by
(partition keys, order keys); partition and peer-run boundaries become boolean
edge vectors; every ranking function is a prefix-sum / segment reduction over
those edges — no per-row cursors, fully fusible by XLA.

Also implements window ``group_limit`` (top-K rows per partition) and the
``output_window_cols=False`` mode, which together reproduce Spark 3.5's
WindowGroupLimitExec (reference window_exec.rs:56-80).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from auron_tpu.block import Column, TableBlock
from auron_tpu.dtypes import FLOAT64, INT32, INT64
from auron_tpu.ops.selection import take_block
from auron_tpu.ops.sort import SortKey, sort_operands


@dataclass(frozen=True)
class WindowFunc:
    """One window function: kind in {row_number, rank, dense_rank,
    percent_rank, cume_dist, ntile, lead, lag, nth_value, first_value,
    last_value, sum, min, max, count, avg}. ``input`` names the (already
    projected) argument column; ``offset`` is lead/lag distance or
    nth_value's n or ntile's bucket count. ``cumulative`` selects Spark's
    default ORDER BY frame (RANGE UNBOUNDED PRECEDING..CURRENT ROW) for agg
    kinds; False = whole partition."""

    name: str
    kind: str
    input: Optional[str] = None
    offset: int = 1
    default: Optional[float] = None
    cumulative: bool = True


def _segmented_cumsum(values, seg_start):
    """Prefix sum that restarts at each True in seg_start (same length)."""
    def combine(a, b):
        a_sum, a_start = a
        b_sum, b_start = b
        return jnp.where(b_start, b_sum, a_sum + b_sum), a_start | b_start
    total, _ = jax.lax.associative_scan(combine, (values, seg_start))
    return total


def _segmented_cummax(values, seg_start):
    def combine(a, b):
        a_v, a_start = a
        b_v, b_start = b
        return jnp.where(b_start, b_v, jnp.maximum(a_v, b_v)), a_start | b_start
    total, _ = jax.lax.associative_scan(combine, (values, seg_start))
    return total


def _segmented_cummin(values, seg_start):
    def combine(a, b):
        a_v, a_start = a
        b_v, b_start = b
        return jnp.where(b_start, b_v, jnp.minimum(a_v, b_v)), a_start | b_start
    total, _ = jax.lax.associative_scan(combine, (values, seg_start))
    return total


def window_block(block: TableBlock,
                 partition_by: Sequence[str],
                 order_by: Sequence[SortKey],
                 funcs: Sequence[WindowFunc],
                 group_limit: Optional[int] = None,
                 output_window_cols: bool = True) -> TableBlock:
    """Evaluate window functions; returns the block in (partition, order)
    sorted physical order with window columns appended."""
    cap = block.capacity
    part_keys = [SortKey(c) for c in partition_by]
    all_keys = list(part_keys) + list(order_by)
    ops = sort_operands(block, all_keys)
    iota = jnp.arange(cap, dtype=jnp.int32)
    *sorted_ops, perm = jax.lax.sort(
        tuple(ops) + (iota,), dimension=0, is_stable=True, num_keys=len(ops))
    live = jnp.take(block.row_mask, perm)
    n_live = jnp.sum(live.astype(jnp.int32))
    sblock = take_block(block, perm, live)

    # operand layout: [dead] + per key: ([null_rank]? , values). Recompute
    # edges directly from the sorted key columns for robustness.
    def edges_for(keys: List[SortKey]):
        if not keys:
            return jnp.zeros(cap, jnp.bool_).at[0].set(True)
        change = jnp.zeros(cap, jnp.bool_)
        kops = sort_operands(sblock, keys)[1:]
        for op in kops:
            prev = jnp.concatenate([op[:1], op[:-1]])
            change = change | (op != prev)
        return change.at[0].set(True)

    part_start = edges_for(list(part_keys))
    peer_start = part_start | edges_for(list(order_by)) if order_by \
        else part_start

    # per-row indices within partition
    ones = jnp.ones(cap, jnp.int64)
    row_in_part = _segmented_cumsum(ones, part_start)      # 1-based
    # partition sizes broadcast to rows: via segment id + segment_sum
    pid = jnp.cumsum(part_start.astype(jnp.int32)) - 1
    live_i = live.astype(jnp.int64)
    part_sizes = jax.ops.segment_sum(live_i, pid, cap)
    n_part = jnp.take(part_sizes, pid)
    # rank: row index of the peer-run start within the partition
    run_start_row = _segmented_cummax(
        jnp.where(peer_start, row_in_part, 0), part_start)
    rank = run_start_row
    dense = _segmented_cumsum(peer_start.astype(jnp.int64), part_start)

    out_cols: Dict[str, Column] = dict(sblock.columns)
    for f in funcs:
        k = f.kind
        if k == "row_number":
            out_cols[f.name] = Column.of(row_in_part.astype(jnp.int64), INT64)
        elif k == "rank":
            out_cols[f.name] = Column.of(rank.astype(jnp.int64), INT64)
        elif k == "dense_rank":
            out_cols[f.name] = Column.of(dense.astype(jnp.int64), INT64)
        elif k == "percent_rank":
            denom = jnp.maximum(n_part - 1, 1)
            pr = (rank - 1).astype(jnp.float64) / denom.astype(jnp.float64)
            pr = jnp.where(n_part <= 1, 0.0, pr)
            out_cols[f.name] = Column.of(pr, FLOAT64)
        elif k == "cume_dist":
            # number of rows <= current peer run's last row
            # = cumulative count up to run end: segment trick — count of rows
            # in partition with peer-run index <= mine. Compute per-run last
            # row_in_part via reverse cummax within partition of run starts.
            run_id = dense
            # last row_in_part of each (pid, run): max of row_in_part per run
            # dense segment ids for runs: use cumsum of peer_start
            rid = jnp.cumsum(peer_start.astype(jnp.int32)) - 1
            run_last = jax.ops.segment_max(row_in_part, rid, cap)
            cd_num = jnp.take(run_last, rid)
            cd = cd_num.astype(jnp.float64) / jnp.maximum(n_part, 1)
            out_cols[f.name] = Column.of(cd, FLOAT64)
        elif k == "ntile":
            n = jnp.asarray(f.offset, jnp.int64)
            sz = n_part
            base = sz // n
            rem = sz % n
            r0 = row_in_part - 1
            big = (base + 1) * rem
            tile = jnp.where(
                r0 < big,
                r0 // jnp.maximum(base + 1, 1),
                rem + (r0 - big) // jnp.maximum(base, 1))
            out_cols[f.name] = Column.of(tile.astype(jnp.int64) + 1, INT64)
        elif k in ("lead", "lag"):
            c = sblock.columns[f.input]
            d = f.offset if k == "lead" else -f.offset
            shifted_idx = iota + d
            ok = (shifted_idx >= 0) & (shifted_idx < cap)
            safe = jnp.clip(shifted_idx, 0, cap - 1)
            vals = jnp.take(c.values, safe, axis=0)
            same_part = jnp.take(pid, safe) == pid
            have = ok & same_part & jnp.take(live, safe)
            validity = have
            if c.validity is not None:
                validity = validity & jnp.take(c.validity, safe)
            if f.default is not None:
                fill = jnp.asarray(f.default, c.values.dtype)
                vals = jnp.where(have, vals, fill)
                validity = None if c.validity is None else \
                    jnp.where(have, validity, True)
            out_cols[f.name] = Column(vals, validity, c.dtype, c.dict_values)
        elif k == "last_value":
            c = sblock.columns[f.input]
            # value at the frame end: cumulative -> end of current peer run;
            # whole-partition -> last live row of the partition
            start_edge = peer_start if (f.cumulative and order_by) \
                else part_start
            rid_lv = jnp.cumsum(start_edge.astype(jnp.int32)) - 1
            pos64 = iota.astype(jnp.int64)
            seg_last = jax.ops.segment_max(
                jnp.where(live, pos64, -1), rid_lv, cap)
            at = jnp.clip(jnp.take(seg_last, rid_lv), 0, cap - 1)
            vals = jnp.take(c.values, at, axis=0)
            validity = jnp.take(seg_last, rid_lv) >= 0
            if c.validity is not None:
                validity = validity & jnp.take(c.validity, at)
            out_cols[f.name] = Column(vals, validity, c.dtype, c.dict_values)
        elif k in ("nth_value", "first_value"):
            c = sblock.columns[f.input]
            nth = 1 if k == "first_value" else f.offset
            part_first_pos = _segmented_cummax(
                jnp.where(part_start, iota.astype(jnp.int64), 0), part_start)
            pos = part_first_pos + (nth - 1)
            safe = jnp.clip(pos, 0, cap - 1)
            in_part = (pos < cap) & (jnp.take(pid, safe) == pid)
            if order_by:
                # Spark default frame (UNBOUNDED PRECEDING..CURRENT ROW):
                # the nth row is visible only from row n onward
                ok = in_part & (row_in_part >= nth)
            else:
                ok = in_part & (jnp.take(n_part, safe) >= nth)
            vals = jnp.take(c.values, safe, axis=0)
            validity = ok
            if c.validity is not None:
                validity = validity & jnp.take(c.validity, safe)
            out_cols[f.name] = Column(vals, validity, c.dtype, c.dict_values)
        elif k in ("sum", "min", "max", "count", "avg"):
            c = sblock.columns[f.input] if f.input else None
            out_cols[f.name] = _window_agg(k, c, live, part_start, peer_start,
                                           pid, cap, f.cumulative and
                                           bool(order_by))
        else:
            raise NotImplementedError(f"window function {k}")

    new_mask = live
    if group_limit is not None:
        new_mask = new_mask & (row_in_part <= group_limit)
    if not output_window_cols:
        out_cols = {n: c for n, c in out_cols.items()
                    if n in sblock.columns}
    return TableBlock(out_cols, new_mask)


def _window_agg(kind: str, c: Optional[Column], live, part_start, peer_start,
                pid, cap: int, cumulative: bool) -> Column:
    """Aggregate over the window frame.

    cumulative=True: Spark's default RANGE UNBOUNDED PRECEDING..CURRENT ROW —
    running value through the END of the current peer run (ties included).
    cumulative=False: whole partition.
    """
    from auron_tpu.ops.aggregate import _sum_dtype
    if kind == "count":
        ok = live if (c is None or c.validity is None) else (live & c.validity)
        vals = ok.astype(jnp.int64)
        out_dtype = INT64
        validity_all = None
    else:
        ok = live if c.validity is None else (live & c.validity)
        out_dtype = _sum_dtype(c.dtype) if kind in ("sum", "avg") else c.dtype
        vals = c.values.astype(out_dtype.jnp_dtype if kind in ("sum", "avg")
                               else c.values.dtype)
        validity_all = None

    if kind in ("sum", "avg", "count"):
        contrib = jnp.where(ok, vals, 0)
        run = _segmented_cumsum(contrib, part_start)
        nn = _segmented_cumsum(ok.astype(jnp.int64), part_start)
    elif kind == "min":
        big = _identity_for(c, True)
        run = _segmented_cummin(jnp.where(ok, vals, big), part_start)
        nn = _segmented_cumsum(ok.astype(jnp.int64), part_start)
    else:  # max
        small = _identity_for(c, False)
        run = _segmented_cummax(jnp.where(ok, vals, small), part_start)
        nn = _segmented_cumsum(ok.astype(jnp.int64), part_start)

    # value at end of frame: cumulative -> end of peer run; else partition end
    rid = jnp.cumsum((peer_start if cumulative else part_start)
                     .astype(jnp.int32)) - 1
    iota = jnp.arange(cap, dtype=jnp.int64)
    seg_last_pos = jax.ops.segment_max(iota, rid, cap)
    at = jnp.clip(jnp.take(seg_last_pos, rid), 0, cap - 1)
    run_at = jnp.take(run, at)
    nn_at = jnp.take(nn, at)

    if kind == "count":
        return Column.of(run_at.astype(jnp.int64), INT64)
    if kind == "avg":
        denom = jnp.maximum(nn_at, 1).astype(jnp.float64)
        return Column.of(run_at.astype(jnp.float64) / denom, FLOAT64,
                         nn_at > 0)
    if kind == "sum":
        return Column.of(run_at, out_dtype, nn_at > 0)
    return Column(run_at, nn_at > 0, c.dtype, c.dict_values)


def _identity_for(c: Column, is_min: bool):
    if c.dtype.is_float:
        return jnp.asarray(np.inf if is_min else -np.inf, c.values.dtype)
    info = np.iinfo(np.dtype(c.values.dtype))
    return jnp.asarray(info.max if is_min else info.min, c.values.dtype)
