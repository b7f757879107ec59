"""Grouped aggregation kernels.

Re-designs the reference's SIMD hash-agg table
(/root/reference/native-engine/datafusion-ext-plans/src/agg/: agg_hash_map.rs
open-addressing map, acc.rs columnar accumulators, agg_table.rs spill paths)
for XLA's static-shape world. Two physical strategies:

* ``groupby_direct``: when every key has a statically bounded integer domain
  (dictionary codes, small ints, dates within a range), the group id IS the
  (mixed-radix) key value and aggregation is one masked ``segment_sum`` over
  dense accumulator arrays — the TPU speed path. Its distributed "final" is
  an elementwise ``psum`` over the dense arrays: aggregation by collective,
  no shuffle at all.
* ``groupby_sorted``: the general path — lexicographic sort of encoded keys
  (co-sorted row permutation), run-boundary detection, prefix-sum group ids,
  masked segment reductions. Plays the role of agg_table.rs's sort-agg mode;
  there is no spill tier because blocks are HBM-budgeted.

Accumulator state is columnar (one dense array per agg), mirroring acc.rs's
AccTable design translated to SoA arrays indexed by group id.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from auron_tpu.block import Column, TableBlock
from auron_tpu.dtypes import BOOL, DataType, FLOAT64, INT64
from auron_tpu.ops.sort import orderable_ops_list, orderable_values


@dataclass(frozen=True)
class AggSpec:
    """One aggregation: kind in {sum, count, count_star, min, max, avg,
    first, first_ignores_null, collect_list, collect_set}. `merge` selects
    the PARTIAL_MERGE/FINAL combine semantics (sum of partial sums, min of
    partial mins, ...). ``max_len`` bounds collect_* output arrays (static
    shape; overflow elements are dropped)."""

    out_name: str
    kind: str
    merge: bool = False
    max_len: int = 64
    fn: object = None        # py_udaf host function
    udaf_dtype: object = None


def _masked(values, ok, fill):
    return jnp.where(ok, values, jnp.asarray(fill, values.dtype))


def _minmax_identity(dtype: DataType, is_min: bool):
    if dtype.is_float:
        return np.inf if is_min else -np.inf
    info = np.iinfo(dtype.np_dtype)
    return info.max if is_min else info.min


def segment_aggregate(
        gid, num_segments: int, live,
        aggs: Sequence[Tuple[AggSpec, Optional[Column]]],
        sorted_order: bool = False,
) -> Dict[str, Column]:
    """Core reduction: for each (spec, input column) produce dense accumulator
    Columns of length num_segments. Rows with live=False contribute nothing.

    Output validity: SUM/MIN/MAX/AVG are NULL for groups with no non-null
    input; COUNT is 0. first/first_ignores_null follow Spark.
    """
    out: Dict[str, Column] = {}
    gid = jnp.where(live, gid, 0)  # dead rows hit segment 0 with null weight

    # MXU fast path: scatter-free one-hot aggregation (pallas_kernels.py).
    # XLA's scatter-based segment_sum serializes on TPU (~16x slower,
    # measured at 8M rows); matmul/select blocks replace it when the
    # segment count is bounded.
    from auron_tpu.ops import pallas_kernels as PK
    use_mxu = PK.use_mxu_segments(num_segments, gid.shape[0])
    gid32 = gid.astype(jnp.int32)

    # Fused Mosaic path: every count/sum plane of this GROUP BY rides ONE
    # pallas kernel (one-hot built once per tile, VMEM accumulators).
    batcher = None
    if PK.use_pallas_fused(num_segments, gid.shape[0]):
        batcher = PK.SumBatcher(
            gid32, num_segments,
            interpret=jax.default_backend() != "tpu")
    elif use_mxu:
        # XLA one-hot path: batch every count/sum of this GROUP BY into
        # ONE _scan_dot (shared one-hot, stacked [S,k,blk] MXU dot) —
        # per-call scans rebuild the one-hot and waste 127/128 MXU rows
        batcher = PK.OneHotBatcher(gid32, num_segments)
    finishers = []

    def _seg_count(flags):
        if use_mxu:
            return PK.onehot_segment_count(flags, gid32, num_segments)
        # int32 flags: a count fits i32 (capacity-bounded); i64[N] inputs
        # would be tile-padded s32[N,2] by the TPU x64 rewriter (64x HBM)
        return jax.ops.segment_sum(flags.astype(jnp.int32), gid,
                                   num_segments,
                                   indices_are_sorted=sorted_order)

    def _seg_sum(vals):
        if use_mxu:
            return PK.onehot_segment_sum(vals, gid32, num_segments)
        return jax.ops.segment_sum(vals, gid, num_segments,
                                   indices_are_sorted=sorted_order)

    def _seg_minmax(vals, ident, is_min):
        if use_mxu:
            return PK.onehot_segment_minmax(vals, gid32, num_segments,
                                            ident, is_min)
        seg = jax.ops.segment_min if is_min else jax.ops.segment_max
        return seg(vals, gid, num_segments, indices_are_sorted=sorted_order)

    for spec, col in aggs:
        kind = spec.kind
        if kind == "count_star":
            if batcher is not None:
                t = batcher.request_count(live)
                finishers.append((spec.out_name, lambda t=t: Column.of(
                    t().astype(jnp.int64), INT64)))
                continue
            cnt = _seg_count(live).astype(jnp.int64)
            out[spec.out_name] = Column.of(cnt, INT64)
            continue
        assert col is not None, kind
        ok = live if col.validity is None else (live & col.validity)
        if kind == "count":
            if spec.merge:  # merging partial counts = summing them
                if batcher is not None:
                    t = batcher.request_sum(_masked(col.values, ok, 0))
                    finishers.append((spec.out_name, lambda t=t: Column.of(
                        t().astype(jnp.int64), INT64)))
                    continue
                s = _seg_sum(_masked(col.values, ok, 0))
                out[spec.out_name] = Column.of(s.astype(jnp.int64), INT64)
            else:
                if batcher is not None:
                    t = batcher.request_count(ok)
                    finishers.append((spec.out_name, lambda t=t: Column.of(
                        t().astype(jnp.int64), INT64)))
                    continue
                cnt = _seg_count(ok).astype(jnp.int64)
                out[spec.out_name] = Column.of(cnt, INT64)
            continue
        if kind == "sum":
            if col.dtype.name == "decimal128":
                out[spec.out_name] = _sum_decimal128(col, gid, ok, _seg_sum,
                                                     _seg_count)
                continue
            acc_dtype = _sum_dtype(col.dtype)
            vals = col.values.astype(acc_dtype.jnp_dtype)
            if batcher is not None:
                ts = batcher.request_sum(_masked(vals, ok, 0))
                tn = batcher.request_count(ok)
                finishers.append((spec.out_name,
                                  lambda ts=ts, tn=tn, a=acc_dtype:
                                  Column.of(ts().astype(a.jnp_dtype), a,
                                            tn() > 0)))
                continue
            s = _seg_sum(_masked(vals, ok, 0)).astype(acc_dtype.jnp_dtype)
            nn = _seg_count(ok)
            out[spec.out_name] = Column.of(s, acc_dtype, nn > 0)
            continue
        if kind in ("min", "max"):
            is_min = kind == "min"
            if col.dtype.name == "decimal128":
                out[spec.out_name] = _minmax_decimal128(
                    col, gid, ok, is_min, _seg_minmax, _seg_count)
                continue
            if col.dtype.is_raw_string:
                out[spec.out_name] = _minmax_raw_string(
                    col, gid, ok, is_min, _seg_minmax, _seg_count)
                continue
            ident = _minmax_identity(col.dtype if not col.dtype.is_string
                                     else _RANK_I32, is_min)
            vals = orderable_values(col) if col.dtype.is_string else col.values
            m = _seg_minmax(_masked(vals, ok, ident), ident, is_min)
            nn = _seg_count(ok)
            if col.dtype.is_string:
                # translate winning rank back to a dictionary code
                from auron_tpu.expr.strings import sort_rank_table
                rank = sort_rank_table(col.dict_values)
                inv = np.empty_like(rank)
                inv[rank] = np.arange(len(rank), dtype=rank.dtype)
                code = jnp.asarray(inv)[jnp.clip(m, 0, len(rank) - 1)]
                out[spec.out_name] = Column(code, nn > 0, col.dtype,
                                            col.dict_values)
            else:
                out[spec.out_name] = Column(m, nn > 0, col.dtype,
                                            col.dict_values)
            continue
        if kind in ("count_distinct", "approx_count_distinct"):
            # exact distinct count via (gid, value) sort + run starts —
            # beats approximation where the reference routes to DataFusion's
            # approx_distinct; exact answers are always within the allowed
            # error bound.
            iota2 = jnp.arange(gid.shape[0], dtype=jnp.int32)
            vops = tuple(jnp.where(ok, ov, 0)
                         for ov in orderable_ops_list(col))
            sort_in = (jnp.where(ok, gid, num_segments),) + vops + (iota2,)
            sorted_ = jax.lax.sort(sort_in, dimension=0, is_stable=True,
                                   num_keys=1 + len(vops))
            g_s, v_ss = sorted_[0], sorted_[1:-1]
            ok_s = g_s < num_segments
            prev_g = jnp.concatenate([g_s[:1] - 1, g_s[:-1]])
            diff = g_s != prev_g
            for v_s in v_ss:
                prev_v = jnp.concatenate([v_s[:1] - 1, v_s[:-1]])
                diff = diff | (v_s != prev_v)
            start = ok_s & diff
            cnt = jax.ops.segment_sum(start.astype(jnp.int32),
                                      jnp.where(ok_s, g_s, 0), num_segments)
            out[spec.out_name] = Column.of(cnt.astype(jnp.int64), INT64)
            continue
        if kind in ("collect_list", "collect_set"):
            # reference agg/collect.rs: list/set accumulation. Output is the
            # engine's fixed-width array representation (#vals [g, max_len]
            # + #len), the same planes Generate/explode consumes.
            vals2d, lens = _collect_into(gid, num_segments, ok, col,
                                         kind == "collect_set", spec.max_len)
            out[f"{spec.out_name}#vals"] = Column(vals2d, None, col.dtype,
                                                  col.dict_values)
            out[f"{spec.out_name}#len"] = Column.of(lens, INT64)
            continue
        if kind == "py_udaf":
            # spark_udaf_wrapper.rs:451 analog: the group's non-null values
            # round-trip to host python via pure_callback; rows were
            # co-located by the key exchange, so a per-partition pass is
            # exact. fn(np.ndarray) -> scalar per group.
            out_dt = spec.udaf_dtype or FLOAT64
            fnc = spec.fn

            def _host(gid_np, vals_np, ok_np):
                res = np.zeros(num_segments, out_dt.np_dtype)
                seen = np.zeros(num_segments, np.bool_)
                sel = ok_np
                order = np.argsort(gid_np[sel], kind="stable")
                g_sorted = gid_np[sel][order]
                v_sorted = vals_np[sel][order]
                bounds = np.searchsorted(g_sorted,
                                         np.arange(num_segments + 1))
                for g in range(num_segments):
                    lo_, hi_ = bounds[g], bounds[g + 1]
                    if hi_ > lo_:
                        res[g] = fnc(v_sorted[lo_:hi_])
                        seen[g] = True
                return res, seen
            res, seen = jax.pure_callback(
                _host,
                (jax.ShapeDtypeStruct((num_segments,), out_dt.np_dtype),
                 jax.ShapeDtypeStruct((num_segments,), np.bool_)),
                gid, col.values, ok)
            out[spec.out_name] = Column(res, seen, out_dt, None)
            continue
        if kind in ("first", "first_ignores_null"):
            cap = gid.shape[0]
            eligible = ok if kind == "first_ignores_null" else live
            idx = jnp.where(eligible, jnp.arange(cap), cap)
            first_idx = _seg_minmax(idx, cap, True)
            have = first_idx < cap
            safe = jnp.clip(first_idx, 0, cap - 1)
            vals = jnp.take(col.values, safe, axis=0)
            validity = have
            if col.validity is not None and kind == "first":
                validity = have & jnp.take(col.validity, safe)
            out[spec.out_name] = Column(vals, validity, col.dtype,
                                        col.dict_values)
            continue
        raise NotImplementedError(f"agg kind {kind}")
    if batcher is not None:
        batcher.finalize()
        for name, fn in finishers:
            out[name] = fn()
    return out


def _collect_into(gid, num_segments: int, ok, col: Column, distinct: bool,
                  max_len: int):
    """Scatter eligible values into [num_segments, max_len] planes.

    For collect_set, rows are first sorted by (gid, value) and only run
    starts kept (order within a set is unspecified in Spark, so the sorted
    order is fine; collect_list preserves encounter order via stable gid
    sort, matching Spark's per-partition order guarantee)."""
    cap = gid.shape[0]
    values = col.values
    if col.dtype.name == "decimal128":
        raise NotImplementedError("collect_list/set over decimal128")
    if distinct:
        iota = jnp.arange(cap, dtype=jnp.int32)
        sort_in = (jnp.where(ok, gid, num_segments),
                   jnp.where(ok, orderable_values(col), 0), iota)
        *_, perm = jax.lax.sort(sort_in, dimension=0, is_stable=True,
                                num_keys=2)
        gid = jnp.take(gid, perm)
        ok_s = jnp.take(ok, perm)
        vals_s = jnp.take(values, perm)
        ordv = jnp.take(sort_in[1], perm)
        prev_g = jnp.concatenate([gid[:1] - 1, gid[:-1]])
        prev_v = jnp.concatenate([ordv[:1] - 1, ordv[:-1]])
        ok = ok_s & ((gid != prev_g) | (ordv != prev_v))
        values = vals_s
    # position of each eligible row within its segment
    seg_start = jnp.concatenate(
        [jnp.ones(1, jnp.bool_), gid[1:] != gid[:-1]])
    def combine(a, b):
        a_sum, a_start = a
        b_sum, b_start = b
        return jnp.where(b_start, b_sum, a_sum + b_sum), a_start | b_start
    run, _ = jax.lax.associative_scan(
        combine, (ok.astype(jnp.int32), seg_start))
    pos = run - 1  # 0-based among eligible rows
    write = ok & (pos < max_len)
    out = jnp.zeros((num_segments, max_len), values.dtype)
    sg = jnp.where(write, gid, num_segments)  # out-of-range -> dropped
    out = out.at[sg, jnp.clip(pos, 0, max_len - 1).astype(jnp.int32)].set(
        values, mode="drop")
    raw_lens = jax.ops.segment_sum(ok.astype(jnp.int32), gid, num_segments)
    from auron_tpu.runtime import overflow
    overflow.record("collect", jnp.max(raw_lens), max_len)
    lens = jnp.minimum(raw_lens, max_len)
    return out, lens


def _sum_decimal128(col: Column, gid, ok, _seg_sum, _seg_count) -> Column:
    """Exact wide-decimal SUM: segment-sum each 32-bit limb plane in int64
    (carry-free for < 2^31 rows), then propagate carries mod 2^128 — the
    two's-complement identity makes negative rows come out right."""
    from auron_tpu.ops import decimal128 as d128
    hi, lo = d128.hi_lo(col.values)
    limbs = d128._limbs4(jnp.where(ok, hi, 0), jnp.where(ok, lo, 0))
    sums = [_seg_sum(l) for l in limbs]
    out, carry = [], jnp.zeros_like(sums[0])
    for k in range(4):
        t = sums[k] + carry
        out.append(t & np.int64(0xFFFFFFFF))
        carry = t >> np.int64(32)  # signed shift fine: t >= 0
    s_hi, s_lo = d128._from_limbs4(*out)
    nn = _seg_count(ok)
    return Column.of(d128.pack(s_hi, s_lo), col.dtype, nn > 0)


def _minmax_decimal128(col: Column, gid, ok, is_min, _seg_minmax, _seg_count
                       ) -> Column:
    """Two-pass lexicographic segment min/max over (hi, flipped-lo) operands:
    reduce the high limbs first, then reduce low limbs only among rows whose
    high limb equals their group's winner."""
    from auron_tpu.ops import decimal128 as d128
    op_hi, op_lo = d128.orderable_ops(col.values)
    ident = np.iinfo(np.int64).max if is_min else np.iinfo(np.int64).min
    m_hi = _seg_minmax(_masked(op_hi, ok, ident), ident, is_min)
    win = ok & (op_hi == jnp.take(m_hi, gid))
    m_lo = _seg_minmax(_masked(op_lo, win, ident), ident, is_min)
    nn = _seg_count(ok)
    return Column.of(d128.pack(m_hi, m_lo ^ np.int64(-2**63)),
                     col.dtype, nn > 0)


def _minmax_raw_string(col: Column, gid, ok, is_min, _seg_minmax, _seg_count
                       ) -> Column:
    """W-pass lexicographic segment min/max over byte-plane words: reduce
    word w only among rows whose words [0, w) equal their group's winning
    prefix (the _minmax_decimal128 two-limb refinement, generalized)."""
    W = col.values.shape[1]
    ident = np.int32(np.iinfo(np.int32).max if is_min
                     else np.iinfo(np.int32).min)
    tied = ok
    planes = []
    for w in range(W):
        vw = col.values[:, w]
        m = _seg_minmax(_masked(vw, tied, ident), ident, is_min)
        planes.append(m)
        tied = tied & (vw == jnp.take(m, gid))
    nn = _seg_count(ok)
    return Column.of(jnp.stack(planes, axis=1), col.dtype, nn > 0)


class _RankI32:
    is_float = False
    np_dtype = np.dtype(np.int32)


_RANK_I32 = _RankI32()


def _sum_dtype(dt: DataType) -> DataType:
    """Spark widens sums: integral -> long, float -> double, decimal keeps
    scale (precision widens — we stay in int64)."""
    if dt.name in ("decimal64", "interval_ym", "interval_dt"):
        return dt  # interval sums keep their unit (Spark ANSI intervals)
    if dt.is_integer or dt.name == "bool":
        return INT64
    return FLOAT64


def key_group_ids_sorted(block: TableBlock, key_names: Sequence[str]):
    """General grouping: sort rows by encoded keys, detect run boundaries.

    Returns (perm, gid, boundary_positions, num_groups, live_sorted) — all in
    the sorted row domain.
    """
    cap = block.capacity
    ops: List[jnp.ndarray] = [~block.row_mask]
    # Mixed-radix packing: grouping needs EQUALITY only, so keys with a
    # statically bounded code domain (dictionary strings, bools) pack into
    # one shared int32 operand — one lax.sort operand instead of two
    # (null_rank + rank) per key. NULL takes its own radix slot.
    acc = None
    acc_radix = 1

    def _flush():
        nonlocal acc, acc_radix
        if acc is not None:
            ops.append(acc)
            acc, acc_radix = None, 1

    for name in key_names:
        c = block.columns[name]
        if c.dtype.is_string and c.dict_values is not None:
            d = max(len(c.dict_values), 1)
        elif c.dtype.name == "bool":
            d = 2
        else:
            d = None
        if d is not None and acc_radix * (d + 1) < (1 << 31):
            enc = jnp.clip(c.values.astype(jnp.int32), 0, d - 1) \
                if c.dtype.is_string else c.values.astype(jnp.int32)
            if c.validity is not None:
                enc = jnp.where(c.validity, enc, jnp.int32(d))
            acc = enc if acc is None else acc * jnp.int32(d + 1) + enc
            acc_radix *= d + 1
            continue
        _flush()
        ovs = orderable_ops_list(c)
        if c.validity is not None:
            ops.append(jnp.where(c.validity, jnp.int8(0), jnp.int8(1)))
            # canonicalize NULL value planes: all NULLs are ONE group
            # (SQL GROUP BY semantics); stale codes must not split it
            ovs = [jnp.where(c.validity, ov, jnp.zeros_like(ov))
                   for ov in ovs]
        ops.extend(ovs)
    _flush()
    iota = jnp.arange(cap, dtype=jnp.int32)
    sorted_all = jax.lax.sort(tuple(ops) + (iota,), dimension=0,
                              is_stable=True, num_keys=len(ops))
    perm = sorted_all[-1]
    live_sorted = jnp.take(block.row_mask, perm)
    # boundary: live row whose key tuple differs from previous row's
    diff = jnp.zeros(cap, jnp.bool_)
    for op_sorted in sorted_all[1:-1]:  # skip dead-mask op and iota
        prev = jnp.concatenate([op_sorted[:1], op_sorted[:-1]])
        diff = diff | (op_sorted != prev)
    first = jnp.zeros(cap, jnp.bool_).at[0].set(True)
    boundary = live_sorted & (first | diff)
    gid = jnp.cumsum(boundary.astype(jnp.int32)) - 1
    gid = jnp.maximum(gid, 0)
    num_groups = jnp.sum(boundary.astype(jnp.int32))
    return perm, gid, boundary, num_groups, live_sorted


def groupby_sorted(block: TableBlock, key_names: Sequence[str],
                   aggs: Sequence[Tuple[AggSpec, Optional[Column]]]
                   ) -> TableBlock:
    """GROUP BY via sort: output block capacity == input capacity."""
    cap = block.capacity
    perm, gid, boundary, num_groups, live_sorted = \
        key_group_ids_sorted(block, key_names)
    # gather agg inputs into sorted domain
    aggs_sorted = []
    for spec, col in aggs:
        if col is None:
            aggs_sorted.append((spec, None))
        else:
            v = jnp.take(col.values, perm, axis=0)
            val = None if col.validity is None else jnp.take(col.validity, perm)
            aggs_sorted.append((spec, Column(v, val, col.dtype, col.dict_values)))
    acc = segment_aggregate(gid, cap, live_sorted, aggs_sorted,
                            sorted_order=True)
    # group representative rows: positions of boundaries, compacted
    from auron_tpu.ops.selection import first_live_indices
    positions = first_live_indices(boundary, cap)
    out_cols: Dict[str, Column] = {}
    for name in key_names:
        c = block.columns[name]
        sv = jnp.take(c.values, perm, axis=0)
        v = jnp.take(sv, positions, axis=0)
        validity = None
        if c.validity is not None:
            validity = jnp.take(jnp.take(c.validity, perm), positions)
        out_cols[name] = Column(v, validity, c.dtype, c.dict_values)
    out_cols.update(acc)
    mask = jnp.arange(cap) < num_groups
    return TableBlock(out_cols, mask)


def groupby_direct(block: TableBlock, key_names: Sequence[str],
                   aggs: Sequence[Tuple[AggSpec, Optional[Column]]],
                   domain_sizes: Sequence[int],
                   emit_keys: bool = True,
                   offsets: Optional[Sequence[int]] = None) -> TableBlock:
    """GROUP BY with statically bounded key domains (dict codes / small ints).

    Group id = mixed-radix combination of key values, with one extra slot per
    key for NULL. Output block has capacity prod(domain+1) — keys in domain
    order, making the distributed FINAL a pure psum over the dense arrays.

    ``offsets`` shifts integer keys into [0, domain) (planner domain hints:
    key value range [lo, lo+domain) with lo = offsets[i]); the caller is
    responsible for validating the range (plan/execute.py checks eagerly
    when values are concrete).
    """
    radices = [int(d) + 1 for d in domain_sizes]  # +1 -> NULL slot at d
    num_segments = 1
    for r in radices:
        num_segments *= r
    offsets = list(offsets) if offsets is not None else [0] * len(key_names)
    # pack in int32 when the radix product fits: on TPU the x64 rewriter
    # materializes every i64[N] as a PADDED s32[N,2] (T(8,128) tiles 2 ->
    # 128 lanes: 64x HBM, OOM at 50M rows). Clip in the SOURCE dtype
    # first so oversized i64 key values don't wrap before clamping.
    gdt = jnp.int32 if num_segments < 2 ** 31 else jnp.int64
    gid = jnp.zeros(block.capacity, gdt)
    for name, d, lo in zip(key_names, domain_sizes, offsets):
        c = block.columns[name]
        v = jnp.clip(c.values - jnp.asarray(lo, c.values.dtype),
                     0, d - 1).astype(gdt)
        if c.validity is not None:
            v = jnp.where(c.validity, v, jnp.asarray(d, gdt))
        gid = gid * jnp.asarray(d + 1, gdt) + v
    acc = segment_aggregate(gid.astype(jnp.int32), num_segments,
                            block.row_mask, aggs)
    from auron_tpu.ops import pallas_kernels as PK
    gid32 = jnp.where(block.row_mask, gid, 0).astype(jnp.int32)
    if PK.use_mxu_segments(num_segments, block.capacity):
        seen = PK.onehot_segment_count(block.row_mask, gid32, num_segments)
    else:
        seen = jax.ops.segment_sum(block.row_mask.astype(jnp.int32), gid32,
                                   num_segments)
    out_cols: Dict[str, Column] = {}
    if emit_keys:
        idx = jnp.arange(num_segments, dtype=jnp.int64)
        for ki, (name, d, lo) in enumerate(
                zip(key_names, domain_sizes, offsets)):
            radix_below = 1
            for dd in domain_sizes[ki + 1:]:
                radix_below *= int(dd) + 1
            code = (idx // radix_below) % (d + 1)
            c = block.columns[name]
            validity = code < d
            out_cols[name] = Column(
                (jnp.clip(code, 0, d - 1) + lo).astype(c.values.dtype),
                validity, c.dtype, c.dict_values)
    out_cols.update(acc)
    return TableBlock(out_cols, seen > 0)
