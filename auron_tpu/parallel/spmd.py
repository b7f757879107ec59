"""SPMD plan execution over a `jax.sharding.Mesh`.

The multi-chip runtime: one plan compiles to ONE SPMD program via
`shard_map` — every device executes the same traced pipeline on its local
table shard, and Exchange/broadcast nodes become XLA collectives
(all_to_all / all_gather / psum) riding ICI.

This replaces the reference's entire scale-out story — one native runtime
per Spark task plus shuffle files between stages
(/root/reference/native-engine/auron/src/rt.rs:76-139,
AuronShuffleManager.scala) — with compiler-scheduled collectives: there are
no per-stage materialization barriers, so exchange traffic overlaps with
adjacent operator compute.

Partition model: logical partition p == mesh position p along ``axis``. A
distributed table is a TableBlock whose arrays carry a leading device axis
[n, cap, ...]; `shard_map` peels it so the traced pipeline sees plain
[cap, ...] blocks and every single-chip kernel works unchanged.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from auron_tpu.block import Column, TableBlock
from auron_tpu.expr import nodes as E
from auron_tpu.expr.eval import evaluate, filter_block, materialize, project_block
from auron_tpu.ops import join as J
from auron_tpu.ops.selection import head_limit
from auron_tpu.ops.sort import sort_block
from auron_tpu.ops.window import window_block
from auron_tpu.parallel import partition as PT
from auron_tpu.parallel.exchange import (all_gather_block, all_to_all_exchange,
                                         gather_to_single)
from auron_tpu.plan import nodes as PN
from auron_tpu.plan.execute import Session, _agg_block, _SWAP


def stack_partitions(blocks: Sequence[TableBlock]) -> TableBlock:
    """Host-side: List[TableBlock] (equal schema+capacity) -> one block with
    leading device axis, ready to place on the mesh."""
    ref = blocks[0]
    cols = {}
    for name, c in ref.columns.items():
        scols = [b.columns[name] for b in blocks]
        if c.dtype.is_string:
            from auron_tpu.expr.strings import unify_string_columns
            scols, _ = unify_string_columns(scols)
        vals = jnp.stack([x.values for x in scols])
        validity = None
        if any(x.validity is not None for x in scols):
            validity = jnp.stack([
                x.validity if x.validity is not None
                else jnp.ones(x.values.shape[0], jnp.bool_) for x in scols])
        cols[name] = Column(vals, validity, c.dtype, scols[0].dict_values)
    mask = jnp.stack([b.row_mask for b in blocks])
    return TableBlock(cols, mask)


def pad_partitions(blocks: Sequence[TableBlock], n: int) -> List[TableBlock]:
    """Pad/extend a partition list to exactly n shards of equal capacity."""
    if len(blocks) > n:
        raise ValueError(
            f"{len(blocks)} partitions cannot ride a {n}-position mesh: "
            "rows beyond the mesh size would be silently dropped. "
            "Repartition the table or widen the mesh.")
    cap = max(b.capacity for b in blocks)
    out = []
    for i in range(n):
        if i < len(blocks):
            b = blocks[i]
            if b.capacity < cap:
                b = _pad_block(b, cap)
            out.append(b)
        else:
            out.append(_empty_like(blocks[0], cap))
    return out


def _pad_block(b: TableBlock, cap: int) -> TableBlock:
    pad = cap - b.capacity
    cols = {}
    for name, c in b.columns.items():
        vals = jnp.concatenate(
            [c.values, jnp.zeros((pad,) + c.values.shape[1:], c.values.dtype)])
        validity = None
        if c.validity is not None:
            validity = jnp.concatenate([c.validity,
                                        jnp.zeros(pad, jnp.bool_)])
        cols[name] = Column(vals, validity, c.dtype, c.dict_values)
    mask = jnp.concatenate([b.row_mask, jnp.zeros(pad, jnp.bool_)])
    return TableBlock(cols, mask)


def _empty_like(b: TableBlock, cap: int) -> TableBlock:
    cols = {}
    for name, c in b.columns.items():
        cols[name] = Column(
            jnp.zeros((cap,) + c.values.shape[1:], c.values.dtype),
            None if c.validity is None else jnp.zeros(cap, jnp.bool_),
            c.dtype, c.dict_values)
    return TableBlock(cols, jnp.zeros(cap, jnp.bool_))


class SpmdExecutor:
    """Executes a plan inside shard_map: self.axis is the mesh axis name."""

    def __init__(self, tables: Dict[str, TableBlock], axis: str):
        self.tables = tables
        self.axis = axis

    def run(self, node: PN.PlanNode) -> TableBlock:
        if isinstance(node, PN.MemoryScan):
            b = self.tables[node.table]
            if node.projection:
                b = b.project(list(node.projection))
            return b
        if isinstance(node, PN.Filter):
            return filter_block(self.run(node.child), node.predicate)
        if isinstance(node, PN.Project):
            exprs = [E.Alias(e, name) for name, e in node.exprs]
            return project_block(self.run(node.child), exprs)
        if isinstance(node, PN.Agg):
            fused = self._try_collective_agg(node)
            if fused is not None:
                return fused
            return _agg_block(self.run(node.child), node)
        if isinstance(node, PN.Sort):
            return sort_block(self.run(node.child), list(node.keys),
                              limit=node.fetch)
        if isinstance(node, PN.Limit):
            return head_limit(self.run(node.child), node.limit, node.offset)
        if isinstance(node, PN.Exchange):
            child = self.run(node.child)
            p = node.partitioning
            if isinstance(p, PT.SinglePartitioning):
                return gather_to_single(child, self.axis)
            return all_to_all_exchange(child, p, self.axis)
        if isinstance(node, PN.Join):
            return self._join(node)
        if isinstance(node, PN.Union):
            return J.concat_blocks([self.run(c) for c in node.children_nodes])
        if isinstance(node, PN.Expand):
            b = self.run(node.child)
            pieces = [project_block(b, [E.Alias(e, n) for n, e in proj])
                      for proj in node.projections]
            return J.concat_blocks(pieces)
        if isinstance(node, PN.Window):
            return window_block(self.run(node.child), list(node.partition_by),
                                list(node.order_by), list(node.funcs),
                                node.group_limit, node.output_window_cols)
        if isinstance(node, PN.Generate):
            from auron_tpu.ops.generate import generate_block
            return generate_block(self.run(node.child), node)
        if isinstance(node, PN.Rename):
            return self.run(node.child).rename(dict(node.mapping))
        if isinstance(node, PN.Debug):
            return self.run(node.child)
        if isinstance(node, PN.Coalesce):
            child = self.run(node.child)
            if node.num_partitions == 1:
                return gather_to_single(child, self.axis)
            return all_to_all_exchange(
                child, PT.RoundRobinPartitioning(node.num_partitions),
                self.axis)
        raise NotImplementedError(
            f"SPMD execution for {type(node).__name__}")

    def _try_collective_agg(self, node: PN.Agg):
        """Aggregation by collective (SURVEY §7.2: "the distributed FINAL is
        a pure psum over the dense arrays — no shuffle at all").

        When Agg(final) sits on Exchange(hash on the SAME keys) and every
        shard's partial aggregate came out in the dense direct layout
        (capacity == mixed-radix domain product), the row shuffle is
        redundant: the dense state vectors are domain-aligned across shards,
        so the final merge is an elementwise psum/pmin/pmax over the mesh —
        O(num_groups) traffic instead of O(rows).
        """
        if node.mode != "final" or not isinstance(node.child, PN.Exchange):
            return None
        part = node.child.partitioning
        if not isinstance(part, PT.HashPartitioning):
            return None
        if tuple(part.key_names) != tuple(n for n, _ in node.keys):
            return None
        kinds = {c.kind for c in node.calls}
        if not kinds <= {"sum", "count", "count_star", "min", "max", "avg"}:
            return None
        partial = self.run(node.child.child)
        expected = _dense_segment_count(node, partial)
        if expected is None or partial.capacity != expected:
            return None
        return _psum_final(partial, node, self.axis)

    def _join(self, node: PN.Join) -> TableBlock:
        left = self.run(node.left)
        right = self.run(node.right)
        filter_fn = None
        if node.condition is not None:
            cond = node.condition

            def filter_fn(block, _c=cond):
                c = materialize(evaluate(_c, block), block.capacity)
                ok = c.values.astype(jnp.bool_)
                if c.validity is not None:
                    ok = ok & c.validity
                return ok

        # build_sequential is deliberately NOT forwarded: a partitioned
        # build shard holds a SUBSET of rows, so "key == lo + row_position"
        # no longer holds on-shard (the scatter-built position table does)
        if node.build == "left":
            spec = J.JoinSpec(node.right_keys, node.left_keys,
                              _SWAP[node.join_type], node.null_aware,
                              node.existence_col,
                              build_domain=node.build_domain,
                          build_unique=node.build_unique)
            probe, build = right, left
        else:
            spec = J.JoinSpec(node.left_keys, node.right_keys, node.join_type,
                              node.null_aware, node.existence_col,
                              build_domain=node.build_domain,
                          build_unique=node.build_unique)
            probe, build = left, right
        if node.strategy in ("sort_merge", "shuffled_hash"):
            import dataclasses
            node = dataclasses.replace(node, strategy="partitioned")
        if spec.null_aware and spec.join_type == J.LEFT_ANTI \
                and node.strategy != "broadcast":
            # NOT IN: one build-side NULL anywhere must suppress every probe
            # row, and partitioned exchanges send all NULL keys to a single
            # shard. Only a replicated build side is correct (Spark keeps
            # null-aware anti broadcast-only too, auron.proto:502).
            raise ValueError(
                "null-aware anti join requires strategy='broadcast' under "
                "SPMD (the build side must be replicated)")
        if node.strategy == "broadcast":
            if spec.join_type in (J.RIGHT, J.FULL, J.RIGHT_SEMI,
                                  J.RIGHT_ANTI):
                # every shard would emit/flag unmatched BUILD rows
                # independently, duplicating them — the planner must use a
                # partitioned exchange for build-side-outer join types
                raise ValueError(
                    "broadcast join cannot produce build-side-outer rows "
                    "under SPMD; use strategy='partitioned'")
            build = all_gather_block(build, self.axis)
        elif node.strategy == "skewed":
            # children arrive UN-exchanged; the skew handler routes both
            # sides itself (heavy probe keys salted, heavy build rows
            # replicated — see parallel/skew.py). Probe-side join types only.
            if spec.join_type not in (J.INNER, J.LEFT, J.LEFT_SEMI,
                                      J.LEFT_ANTI, J.EXISTENCE):
                raise ValueError(
                    "skewed join supports probe-side join types only")
            from auron_tpu.parallel.skew import skewed_join_exchange
            n = jax.lax.axis_size(self.axis)
            probe, build = skewed_join_exchange(
                probe, build, list(spec.left_keys), list(spec.right_keys),
                self.axis, n)
        return J.join_blocks(probe, build, spec, node.out_capacity, filter_fn)


def run_plan_spmd(plan: PN.PlanNode, mesh: Mesh,
                  tables: Dict[str, Sequence[TableBlock]],
                  axis: str = "p",
                  stacked_tables: Optional[Dict[str, TableBlock]] = None):
    """Compile + run the whole plan as one SPMD program on the mesh.

    ``tables`` maps name -> per-partition block lists (will be padded to the
    mesh size). Returns the per-device output blocks (stacked layout).

    ``stacked_tables`` (multi-host mode): pre-assembled GLOBAL stacked
    blocks (parallel/multihost.py make_global_table) — no host holds the
    whole table, so the host-side stats/skew passes are skipped (dense
    hints may be supplied on the plan by the caller) and ``tables`` is
    ignored.
    """
    n = mesh.shape[axis]
    if stacked_tables is None:
        # plan-time stats from the concrete host blocks (inside shard_map
        # all values are tracers — the only chance to fill dense hints)
        from auron_tpu.plan.execute import Session as _S
        from auron_tpu.plan.stats import annotate_plan
        stats_session = _S()
        for name, blocks in tables.items():
            stats_session.register(name, list(blocks))
        from auron_tpu.plan.prune import prune_plan
        plan = annotate_plan(prune_plan(plan, stats_session), stats_session)
        # skew auto-detection: heavy-hitter probe keys flip partitioned
        # joins to the skew-handled form before the program compiles
        from auron_tpu.parallel.skew import auto_skew_rewrite
        plan = auto_skew_rewrite(plan, tables)

        stacked = {}
        for name, blocks in tables.items():
            blocks = pad_partitions(list(blocks), n)
            stacked[name] = stack_partitions(blocks)
    else:
        stacked = dict(stacked_tables)

    # Overflow-checked execution with capacity regrow (runtime/overflow.py):
    # the per-device program returns its traced overflow counters alongside
    # the result; the host maxes them over the mesh and re-runs with grown
    # capacities when any static bound was exceeded.
    from auron_tpu import config as C
    from auron_tpu.runtime import overflow as OV
    overrides: Dict[str, float] = {}
    for _attempt in range(OV.MAX_ATTEMPTS):
        with C.conf.scoped_overrides(overrides):
            meta_cell: list = []

            def per_device(local_tables: Dict[str, TableBlock]):
                # shard_map delivers [1, cap, ...] shards; peel device axis
                peeled = {k: jax.tree.map(lambda a: a[0], v)
                          for k, v in local_tables.items()}
                with OV.collect() as sc:
                    out = SpmdExecutor(peeled, axis).run(plan)
                meta_cell[:] = sc.meta()
                vals = sc.values()
                ov = (jnp.stack(vals)[None] if vals
                      else jnp.zeros((1, 0), jnp.int64))
                return jax.tree.map(lambda a: a[None], out), ov

            specs = jax.tree.map(lambda _: P(axis), stacked)
            fn = jax.shard_map(per_device, mesh=mesh, in_specs=(specs,),
                               out_specs=(P(axis), P(axis)))
            out, ov = jax.jit(fn)(stacked)
            if meta_cell:
                if jax.process_count() > 1:
                    # ov is sharded across processes; every host needs the
                    # global max to take the same regrow decision
                    from jax.experimental import multihost_utils as MH
                    ov_np = np.asarray(MH.process_allgather(ov, tiled=True))
                else:
                    ov_np = np.asarray(ov)
                values = list(ov_np.max(axis=0))
            else:
                values = []
            grown = OV.check(meta_cell, values, overrides)
        if grown is None:
            return out
        overrides = grown
    raise RuntimeError(
        f"overflow regrow did not converge after {OV.MAX_ATTEMPTS} "
        f"attempts (overrides={overrides})")


def unstack_result(stacked: TableBlock) -> List[TableBlock]:
    """Host-side: stacked [n, cap] result -> per-partition blocks."""
    n = stacked.row_mask.shape[0]
    out = []
    for i in range(n):
        out.append(jax.tree.map(lambda a: a[i], stacked))
    return out


def _dense_segment_count(node: "PN.Agg", partial: TableBlock):
    """Expected dense-layout capacity (mixed-radix product incl. NULL slots)
    for the partial block, or None when a key cannot be dense."""
    hints = dict(node.domains)
    total = 1
    for name, _ in node.keys:
        c = partial.columns.get(name)
        if c is None:
            return None
        if c.dtype.is_string and c.dict_values is not None:
            total *= len(c.dict_values) + 1
        elif c.dtype.name == "bool":
            total *= 3
        elif name in hints and c.dtype.is_integer:
            lo, hi = hints[name]
            total *= int(hi - lo) + 1
        else:
            return None
    return total


def _psum_final(partial: TableBlock, node: "PN.Agg", axis: str) -> TableBlock:
    """Merge dense partial aggregates across the mesh with collectives."""
    cols: Dict[str, Column] = {}
    key_names = {n for n, _ in node.keys}

    def _valid_of(c: Column):
        if c.validity is None:
            return jnp.ones(c.values.shape[0], jnp.bool_)
        return c.validity

    post_avg = []
    for call in node.calls:
        k = call.kind
        if k == "avg":
            snm, cnm = f"{call.name}#s", f"{call.name}#c"
            sc, cc = partial.columns[snm], partial.columns[cnm]
            from auron_tpu.dtypes import FLOAT64
            cv = jax.lax.psum(cc.values, axis)
            if sc.dtype.name == "decimal128":
                from auron_tpu.ops import decimal128 as d128
                ok = _valid_of(sc)
                hi, lo = d128.hi_lo(sc.values)
                limbs = d128._limbs4(jnp.where(ok, hi, 0),
                                     jnp.where(ok, lo, 0))
                sums = [jax.lax.psum(l, axis) for l in limbs]
                out_l, carry = [], jnp.zeros_like(sums[0])
                for t in sums:
                    t = t + carry
                    out_l.append(t & np.int64(0xFFFFFFFF))
                    carry = t >> np.int64(32)
                svf = d128.to_f64(*d128._from_limbs4(*out_l)) \
                    / float(10 ** sc.dtype.params[1])
            else:
                sv = jax.lax.psum(jnp.where(_valid_of(sc), sc.values, 0),
                                  axis)
                svf = sv.astype(jnp.float64)
                if sc.dtype.name == "decimal64":
                    # scale-preserving scaled-int sum: unscale before
                    # dividing
                    svf = svf / float(10 ** sc.dtype.params[1])
            vals = svf / jnp.maximum(
                cv.astype(jnp.float64), 1.0)
            cols[call.name] = Column.of(vals, FLOAT64, cv > 0)
            post_avg.append(call.name)
            continue
        c = partial.columns[call.name]
        if k in ("count", "count_star"):
            cols[call.name] = Column(jax.lax.psum(c.values, axis), None,
                                     c.dtype, c.dict_values)
        elif k == "sum":
            if c.dtype.name == "decimal128":
                # psum of raw limb pairs would drop inter-limb carries:
                # reduce each 32-bit limb plane separately, then propagate
                # (same identity as aggregate._sum_decimal128)
                from auron_tpu.ops import decimal128 as d128
                ok = _valid_of(c)
                hi, lo = d128.hi_lo(c.values)
                limbs = d128._limbs4(jnp.where(ok, hi, 0),
                                     jnp.where(ok, lo, 0))
                sums = [jax.lax.psum(l, axis) for l in limbs]
                out_l, carry = [], jnp.zeros_like(sums[0])
                for t in sums:
                    t = t + carry
                    out_l.append(t & np.int64(0xFFFFFFFF))
                    carry = t >> np.int64(32)
                s_hi, s_lo = d128._from_limbs4(*out_l)
                nn = jax.lax.psum(ok.astype(jnp.int32), axis)
                cols[call.name] = Column(d128.pack(s_hi, s_lo), nn > 0,
                                         c.dtype, None)
                continue
            s = jax.lax.psum(jnp.where(_valid_of(c), c.values, 0), axis)
            nn = jax.lax.psum(_valid_of(c).astype(jnp.int32), axis)
            cols[call.name] = Column(s, nn > 0, c.dtype, c.dict_values)
        else:  # min / max
            is_min = k == "min"
            from auron_tpu.ops.aggregate import _minmax_identity
            if c.dtype.name == "decimal128":
                from auron_tpu.ops import decimal128 as d128
                ok = _valid_of(c)
                op_hi, op_lo = d128.orderable_ops(c.values)
                ident = (np.iinfo(np.int64).max if is_min
                         else np.iinfo(np.int64).min)
                red = jax.lax.pmin if is_min else jax.lax.pmax
                m_hi = red(jnp.where(ok, op_hi, ident), axis)
                win = ok & (op_hi == m_hi)
                m_lo = red(jnp.where(win, op_lo, ident), axis)
                nn = jax.lax.psum(ok.astype(jnp.int32), axis)
                cols[call.name] = Column(
                    d128.pack(m_hi, m_lo ^ np.int64(-2**63)), nn > 0,
                    c.dtype, None)
                continue
            if c.dtype.is_raw_string:
                # byte planes: word-by-word collective refinement, rows
                # tied on the winning prefix compete on the next word
                # (aggregate._minmax_raw_string across the mesh axis)
                ok = _valid_of(c)
                ident = jnp.asarray(np.int32(
                    np.iinfo(np.int32).max if is_min
                    else np.iinfo(np.int32).min))
                red = jax.lax.pmin if is_min else jax.lax.pmax
                tied, planes = ok, []
                for w in range(c.values.shape[1]):
                    vw = c.values[:, w]
                    m = red(jnp.where(tied, vw, ident), axis)
                    planes.append(m)
                    tied = tied & (vw == m)
                nn = jax.lax.psum(ok.astype(jnp.int32), axis)
                cols[call.name] = Column(jnp.stack(planes, axis=1), nn > 0,
                                         c.dtype, None)
                continue
            if c.dtype.is_string:
                # dictionary CODES are first-seen-ordered, not
                # lexicographic: translate code -> lexicographic rank,
                # reduce on ranks, map the winning rank back to a code
                # (same trick segment_aggregate uses; a raw pmin/pmax on
                # codes would pick the wrong string for derived dicts)
                from auron_tpu.expr.strings import sort_rank_table
                rank = sort_rank_table(c.dict_values)
                nvals = len(c.dict_values)
                ranks = jnp.take(jnp.asarray(rank),
                                 jnp.clip(c.values, 0, nvals - 1))
                ident = (np.iinfo(np.int32).max if is_min
                         else np.iinfo(np.int32).min)
                masked = jnp.where(_valid_of(c), ranks,
                                   jnp.asarray(ident, ranks.dtype))
                m = jax.lax.pmin(masked, axis) if is_min \
                    else jax.lax.pmax(masked, axis)
                inv = np.empty_like(rank)
                inv[rank] = np.arange(len(rank), dtype=rank.dtype)
                code = jnp.take(jnp.asarray(inv),
                                jnp.clip(m, 0, nvals - 1))
                nn = jax.lax.psum(_valid_of(c).astype(jnp.int32), axis)
                cols[call.name] = Column(code.astype(c.values.dtype), nn > 0,
                                         c.dtype, c.dict_values)
                continue
            ident = _minmax_identity(c.dtype, is_min)
            masked = jnp.where(_valid_of(c), c.values,
                               jnp.asarray(ident, c.values.dtype))
            m = jax.lax.pmin(masked, axis) if is_min \
                else jax.lax.pmax(masked, axis)
            nn = jax.lax.psum(_valid_of(c).astype(jnp.int32), axis)
            cols[call.name] = Column(m, nn > 0, c.dtype, c.dict_values)
    for name in key_names:
        cols[name] = partial.columns[name]  # domain order: same on all shards
    mask = jax.lax.psum(partial.row_mask.astype(jnp.int32), axis) > 0
    # keep the (replicated) result only on shard 0 so downstream gathers
    # don't duplicate rows
    me = jax.lax.axis_index(axis)
    mask = mask & (me == 0)
    ordered = {n: cols[n] for n, _ in node.keys}
    for call in node.calls:
        ordered[call.name] = cols[call.name]
    return TableBlock(ordered, mask)
