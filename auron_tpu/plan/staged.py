"""Planner-integrated out-of-core execution (the staged path).

The reference runs EVERY operator under one MemManager that spills
transparently when the working set exceeds budget
(/root/reference/native-engine/auron-memmgr/src/lib.rs:308-428,
sort_exec.rs:341-446, agg/agg_table.rs:723-840). This engine's analog:
when a plan's estimated working set exceeds the session's MemoryBudget,
the output boundary routes it through THIS executor, which streams
host-staged compressed chunks (io/staging.StagedTable) through each
operator with bounded HBM:

- scans stage (or reuse already-staged) tables chunk by chunk
- filter/project/rename map chunks independently
- sort        -> ops/external_sort.sort_staged  (device runs + k-way merge)
- group-by    -> ops/external_agg.aggregate_staged (sort + boundary carry)
- join        -> broadcast streaming when the build side fits HBM, else
                 ops/external_join.join_staged (radix buckets)
- limit/fetch -> stream until satisfied

No user opt-in: Session.sql_result consults should_stage() and picks this
path automatically (the "grow -> spill" decision of lib.rs:381-427 made
once per plan instead of per-allocation — static shapes mean the working
set is estimable up front). Plans using operators outside this set fall
back to the in-HBM executor (can_stage() is honest).
"""

from __future__ import annotations

import json
import struct
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from auron_tpu import config
from auron_tpu.block import TableBlock
from auron_tpu.runtime.metrics import block_bytes
from auron_tpu.expr import nodes as E
from auron_tpu.expr.eval import filter_block, project_block
from auron_tpu.io.serde import deserialize_block, serialize_block
from auron_tpu.io.staging import StagedTable
from auron_tpu.plan import nodes as PN


def _payload_device_bytes(payload: bytes) -> int:
    """Decompressed (device-resident) size of one staged payload, from the
    serde header — no decompression needed."""
    hlen = struct.unpack("<I", payload[4:8])[0]
    header = json.loads(payload[8:8 + hlen].decode())
    return sum(c["raw_len"] for c in header["cols"])


def staged_device_bytes(staged: StagedTable) -> int:
    return sum(_payload_device_bytes(p) for p in staged.payloads)


# ---------------------------------------------------------------------------
# estimation + support surface
# ---------------------------------------------------------------------------


def _table_bytes(s, name: str) -> int:
    staged = getattr(s, "staged_tables", {}).get(name)
    if staged is not None:
        return staged_device_bytes(staged)
    return sum(block_bytes(b) for b in s.tables[name])


def estimate_plan_bytes(plan: PN.PlanNode, s) -> int:
    """Peak working-set estimate (bytes) of the in-HBM executor on this
    plan: scans cost their table, joins co-resident inputs + comparable
    output, sorts double their input. Deliberately coarse — the decision
    it feeds has a 2x-safe budget, and tests pin behavior with explicit
    tiny budgets."""
    def est(n) -> Tuple[int, int]:  # (output_bytes, peak_bytes)
        if isinstance(n, PN.MemoryScan):
            b = _table_bytes(s, n.table)
            return b, b
        if isinstance(n, PN.Join):
            lo, lp = est(n.left)
            ro, rp = est(n.right)
            out = lo + ro
            return out, max(lp, rp, lo + ro + out)
        if isinstance(n, PN.Sort):
            o, p = est(n.child)
            return o, max(p, 2 * o)
        if isinstance(n, (PN.Agg, PN.Window)):
            o, p = est(n.child)
            return o, max(p, 2 * o)
        if isinstance(n, PN.Union):
            pairs = [est(c) for c in n.children_nodes]
            total = sum(o for o, _ in pairs)
            return total, max(max(p for _, p in pairs), total)
        if isinstance(n, PN.Expand):
            o, p = est(n.child)
            k = max(len(n.projections), 1)
            return o * k, max(p, o * k)
        child = getattr(n, "child", None)
        if child is not None:
            return est(child)
        return 0, 0
    return est(plan)[1]


_STREAM_NODES = (PN.MemoryScan, PN.Filter, PN.Project, PN.Rename,
                 PN.Sort, PN.Limit, PN.Agg, PN.Join, PN.Window,
                 PN.Union, PN.Expand, PN.Exchange)


# Exchange nodes are pass-throughs on the staged path: hash/range/rr/
# single routing only PERMUTES rows for parallel placement, and every
# staged operator re-establishes its own required distribution globally
# (sort_staged/aggregate_staged/_window_staged sort the whole stream;
# joins bucket it). The staged stream is one partition by construction —
# the n=1 short-circuit of the in-HBM path (7247c03), generalized.

_AGG_KINDS = ("sum", "count", "count_star", "min", "max", "avg",
              "stddev", "stddev_samp", "count_distinct")

# kinds the GROUP-ALIGNED fallback additionally accepts: whole groups
# are materialized per chunk, so anything the in-HBM agg executes works
# — including host UDAFs (the reference's UDAF accumulator spill analog,
# SparkUDAFWrapperContext.scala:174-235: here the "spill" is the sorted
# host-staged stream itself, values re-materialized per complete group)
_ALIGNED_EXTRA_KINDS = ("first", "first_ignores_null", "collect_list",
                        "collect_set", "approx_count_distinct", "py_udaf")


def _agg_mergeable(plan: PN.Agg) -> bool:
    """True when every call rides the partial-state merge protocol
    (bounded HBM even when one group spans many chunks)."""
    distinct_exprs = set()
    for c in plan.calls:
        if c.kind not in _AGG_KINDS or c.filter is not None \
                or c.fn is not None:
            return False
        if c.kind == "count_distinct":
            # one shared distinct expression adds ONE trailing sort key
            # (several would each need their own global order, like
            # Spark's multi-distinct expansion) — and only mode single
            if plan.mode != "single":
                return False
            distinct_exprs.add(repr(c.expr))
    return len(distinct_exprs) <= 1


def _agg_alignable(plan: PN.Agg) -> bool:
    """True when the group-aligned fallback applies: single mode, keyed,
    every kind executable by the in-HBM agg over whole groups."""
    if plan.mode != "single" or not plan.keys:
        return False
    ok = _AGG_KINDS + _ALIGNED_EXTRA_KINDS
    for c in plan.calls:
        if c.kind not in ok:
            return False
        if c.kind == "py_udaf" and \
                not config.conf.get(config.UDAF_FALLBACK_ENABLE):
            return False
    return True


def can_stage(plan: PN.PlanNode, s) -> bool:
    if not isinstance(plan, _STREAM_NODES):
        return False
    if isinstance(plan, PN.MemoryScan):
        return plan.table in s.tables or \
            plan.table in getattr(s, "staged_tables", {})
    if isinstance(plan, PN.Agg):
        if not (_agg_mergeable(plan) or _agg_alignable(plan)):
            return False
        return can_stage(plan.child, s)
    if isinstance(plan, PN.Window):
        # window requires partition-grouped sorted input
        # (window/window_context.rs:48-176); sort_staged provides it and
        # chunk boundaries are realigned to partition boundaries
        return can_stage(plan.child, s)
    if isinstance(plan, PN.Join):
        return can_stage(plan.left, s) and can_stage(plan.right, s)
    if isinstance(plan, PN.Union):
        return all(can_stage(c, s) for c in plan.children_nodes)
    return can_stage(plan.child, s)


def should_stage(plan: PN.PlanNode, s) -> bool:
    """The planner's out-of-core decision: a budget exists, the estimated
    in-HBM working set exceeds it (or an input is already host-staged),
    and the plan shape is streamable."""
    if not config.conf.get("auron.exec.external.enable"):
        return False
    budget = getattr(s, "memory_budget", None)
    staged_inputs = _refs_staged_table(plan, s)
    if budget is None and not staged_inputs:
        return False
    over = budget is not None and \
        estimate_plan_bytes(plan, s) > budget.budget
    if not (over or staged_inputs):
        return False
    return can_stage(plan, s)


def _refs_staged_table(plan, s) -> bool:
    staged = getattr(s, "staged_tables", {})
    if isinstance(plan, PN.MemoryScan):
        return plan.table in staged
    found = False
    import dataclasses as _dc
    if not _dc.is_dataclass(plan):
        return False
    for f in _dc.fields(plan):
        v = getattr(plan, f.name)
        for item in (v if isinstance(v, (list, tuple)) else [v]):
            if isinstance(item, PN.PlanNode):
                found = found or _refs_staged_table(item, s)
    return found


# ---------------------------------------------------------------------------
# execution
# ---------------------------------------------------------------------------


def _map_chunks(staged: StagedTable, fn) -> StagedTable:
    out = []
    for chunk in staged.blocks():
        res = fn(chunk)
        if bool(np.asarray(res.row_mask).any()):
            out.append(serialize_block(res))
        del chunk, res
    return StagedTable(out)


def _chunk_budget_rows(s) -> int:
    """Rows per staged chunk sized from the budget (bounded HBM).

    Floor 64Ki rows: below that the per-chunk device dispatch dominates
    (each chunk pays a program launch; through the axon tunnel, 50-160ms)
    — the same amortization argument as the reference's batch-size floor
    (datafusion-ext-commons/src/lib.rs:93-117). Real budgets (>=1 GB)
    sit far above the floor; only artificial test budgets hit it."""
    budget = getattr(s, "memory_budget", None)
    if budget is None:
        return 1 << 20
    # a chunk should use ~1/8 of the budget at ~64B/row so several
    # operands + the output coexist
    return max(int(budget.budget // (8 * 64)), 1 << 16)


def _rechunk(staged: StagedTable, max_rows: int) -> StagedTable:
    """Split chunks whose live-row count exceeds the budget-derived chunk
    size — a registered 1M-row in-HBM block must not ride the staged path
    whole (round-4 verdict #4: scan chunks ignored the budget). Serde
    compacts live rows, so each split payload deserializes at its own
    (smaller) rounded capacity."""
    from auron_tpu.ops.selection import head_limit
    out: List[bytes] = []
    for i in range(staged.num_partitions):
        if _payload_rows(staged.payloads[i]) <= max_rows:
            out.append(staged.payloads[i])
            continue
        chunk = staged.block(i)
        live = int(np.asarray(chunk.row_mask).sum())
        for off in range(0, live, max_rows):
            out.append(serialize_block(head_limit(chunk, max_rows, off)))
        del chunk
    return StagedTable(out)


def _payload_rows(payload: bytes) -> int:
    hlen = struct.unpack("<I", payload[4:8])[0]
    return json.loads(payload[8:8 + hlen].decode())["n"]


def _scan(node: PN.MemoryScan, s) -> StagedTable:
    staged = getattr(s, "staged_tables", {}).get(node.table)
    if staged is None:
        staged = StagedTable.from_blocks(s.tables[node.table])
    staged = _rechunk(staged, _chunk_budget_rows(s))
    if node.projection:
        proj = list(node.projection)
        staged = _map_chunks(
            staged, lambda b: TableBlock(
                {k: b.columns[k] for k in proj if k in b.columns},
                b.row_mask))
    return staged


def _limit_staged(staged: StagedTable, limit: int, offset: int = 0
                  ) -> StagedTable:
    out, seen = [], 0
    want = offset + limit
    for chunk in staged.blocks():
        from auron_tpu.ops.selection import head_limit
        live = int(np.asarray(chunk.row_mask).sum())
        if seen >= want:
            break
        lo = max(offset - seen, 0)
        take = max(min(live, want - seen) - lo, 0)
        if take > 0:
            res = head_limit(chunk, take, lo)
            out.append(serialize_block(res))
        seen += live
    return StagedTable(out)


def _agg_group_aligned(node: PN.Agg, s) -> StagedTable:
    """Staged aggregation for call kinds WITHOUT a mergeable partial
    state (first / collect / py_udaf / multi-distinct): sort the stream
    by the group keys, realign chunk boundaries to group boundaries, and
    run the ordinary in-HBM agg on each chunk of whole groups."""
    import dataclasses as _dc

    from auron_tpu.ops.external_sort import sort_staged
    from auron_tpu.ops.sort import SortKey
    from auron_tpu.plan.execute import _agg_block
    key_names = [n for n, _ in node.keys]
    child = _exec(node.child, s)

    def addkeys(b: TableBlock) -> TableBlock:
        kb = project_block(b, [E.Alias(e, n) for n, e in node.keys])
        cols = dict(b.columns)
        cols.update(kb.columns)
        return TableBlock(cols, b.row_mask)

    pre = _map_chunks(child, addkeys)
    sorted_runs = sort_staged(pre, [SortKey(k) for k in key_names],
                              getattr(s, "memory_budget", None))
    node2 = _dc.replace(node, keys=tuple(
        (n, E.Column(n)) for n, _ in node.keys))
    out: List[bytes] = []
    for chunk in _group_aligned_chunks(sorted_runs, key_names):
        res = _agg_block(chunk, node2)
        if bool(np.asarray(res.row_mask).any()):
            out.append(serialize_block(res))
    return StagedTable(out)


def _agg_staged(node: PN.Agg, s) -> StagedTable:
    from auron_tpu.dtypes import FLOAT64
    from auron_tpu.ops.external_agg import (_finalize, _merge_specs,
                                            _partial_specs,
                                            aggregate_staged,
                                            mark_first_occurrences)
    from auron_tpu.ops.sort import SortKey
    if not _agg_mergeable(node):
        return _agg_group_aligned(node, s)
    key_names = [n for n, _ in node.keys]
    triples = []
    distinct_col: Optional[str] = None
    if node.mode == "final":
        # inputs are the state columns a partial stage emitted; no
        # input projection — _merge_specs reads them by state name
        triples = [(c.name, c.kind, None) for c in node.calls]
        pre = _exec(node.child, s)
    else:
        proj = [E.Alias(e, n) for n, e in node.keys]
        for c in node.calls:
            in_name = None
            if c.expr is not None:
                in_name = f"{c.name}#in"
                proj.append(E.Alias(c.expr, in_name))
                if c.kind in ("stddev", "stddev_samp"):
                    # exact-merge (sum, sum-of-squares, count) states;
                    # square in f64 like the in-HBM path (_call_specs)
                    sq = c.expr.cast(FLOAT64) * c.expr.cast(FLOAT64)
                    proj.append(E.Alias(sq, f"{in_name}#sq"))
                if c.kind == "count_distinct":
                    distinct_col = in_name
            triples.append((c.name, c.kind, in_name))
        child = _exec(node.child, s)
        pre = _map_chunks(child, lambda b: project_block(b, proj))
    if key_names:
        return aggregate_staged(pre, key_names, triples,
                                mode=node.mode,
                                distinct_col=distinct_col)
    # keyless (global) aggregate: stream partials, merge with a carry;
    # a count_distinct sorts the stream by the distinct expression first
    # so first-occurrence flags can ride the generic sum protocol
    from auron_tpu.ops.aggregate import groupby_sorted
    from auron_tpu.ops.join import concat_blocks
    from auron_tpu.ops.external_sort import sort_staged
    dflag_names = [f"{name}#dflag" for name, kind, _ in triples
                   if kind == "count_distinct"]
    if distinct_col is not None:
        pre = sort_staged(pre, [SortKey(distinct_col)],
                          getattr(s, "memory_budget", None))
    psp = _partial_specs(triples) if node.mode != "final" else \
        list(_merge_specs(triples))
    carry: Optional[TableBlock] = None
    dcarry: Optional[tuple] = None
    for chunk in pre.blocks():
        if distinct_col is not None:
            chunk, dcarry = mark_first_occurrences(
                chunk, [], distinct_col, dflag_names, dcarry)
        partial = groupby_sorted(
            chunk, [],
            [(spec, chunk.columns[col] if col else None)
             for spec, col in psp])
        if carry is not None:
            both = concat_blocks([carry, partial])
            partial = groupby_sorted(
                both, [],
                [(spec, both.columns[src])
                 for spec, src in _merge_specs(triples)])
        carry = partial
    if carry is None:
        from auron_tpu.plan.execute import execute_plan
        return StagedTable([serialize_block(b)
                            for b in execute_plan(node, s)])
    return StagedTable([serialize_block(
        carry if node.mode == "partial"
        else _finalize(carry, [], triples))])


def _join_staged(node: PN.Join, s) -> StagedTable:
    from auron_tpu.ops import join as J
    from auron_tpu.ops.external_join import join_staged
    from auron_tpu.plan.execute import _SWAP

    left = _exec(node.left, s)
    right = _exec(node.right, s)
    filter_fn = None
    if node.condition is not None:
        from auron_tpu.expr.eval import evaluate, materialize
        import jax.numpy as jnp
        cond = node.condition

        def filter_fn(block, _c=cond):
            c = evaluate(_c, block)
            keep = materialize(c, block.capacity)
            ok = keep.values.astype(jnp.bool_)
            if keep.validity is not None:
                ok = ok & keep.validity
            return ok

    if node.build == "left":
        spec = J.JoinSpec(node.right_keys, node.left_keys,
                          _SWAP[node.join_type], node.null_aware,
                          node.existence_col)
        probe, build = right, left
    else:
        spec = J.JoinSpec(node.left_keys, node.right_keys, node.join_type,
                          node.null_aware, node.existence_col)
        probe, build = left, right

    budget = getattr(s, "memory_budget", None)
    build_bytes = staged_device_bytes(build)
    bcast_cap = (budget.budget // 4) if budget is not None else (1 << 30)
    if build_bytes <= bcast_cap and build.num_partitions > 0:
        # broadcast streaming: build resident, probe streams chunk by chunk
        from auron_tpu.ops.join import concat_blocks
        bblocks = [deserialize_block(p) for p in build.payloads]
        bblk = bblocks[0] if len(bblocks) == 1 else concat_blocks(bblocks)

        def jn(chunk):
            counts = np.asarray(J.join_match_counts(chunk, bblk, spec))
            live = np.asarray(chunk.row_mask)
            total = int(counts[live].sum()) if live.any() else 0
            cap = max(total + int(live.sum()), 1)
            return J.join_blocks(chunk, bblk, spec, out_capacity=cap,
                                 filter_fn=filter_fn)
        if spec.join_type in (J.RIGHT, J.FULL):
            # build-side outer rows are global state; keep those joins on
            # the bucketed path where unmatched tracking is bucket-local
            pass
        else:
            return _map_chunks(probe, jn)
    total = staged_device_bytes(probe) + build_bytes
    per_bucket = (budget.budget // 4) if budget is not None else (1 << 30)
    n_buckets = 1
    while n_buckets * per_bucket < total and n_buckets < 256:
        n_buckets *= 2
    return join_staged(probe, build, spec, n_buckets=n_buckets,
                       filter_fn=filter_fn)


def _group_aligned_chunks(sorted_runs: StagedTable, part: List[str]):
    """Yield blocks whose chunk boundaries ALIGN with group boundaries.

    Input: key-sorted staged runs (sort_staged output). Each chunk's
    trailing (possibly incomplete) group is held back and prepended to
    the next chunk, so every yielded block contains only WHOLE groups —
    the reference's partition-grouped-input contract
    (window/window_context.rs:48-176). HBM stays O(chunk) as long as no
    single group exceeds a chunk; a larger group is carried whole
    (correct, softer bound). With no keys, the whole stream is one
    group: chunks are concatenated (callers should avoid that shape).
    """
    from auron_tpu.ops.join import concat_blocks
    from auron_tpu.ops.selection import head_limit

    def trailing_run(chunk: TableBlock) -> int:
        """Live-rank of the first row of the trailing group (rows
        ordered by the group keys; mask-aware, dictionary codes are
        consistent within one block)."""
        mask = np.asarray(chunk.row_mask)
        live_idx = np.flatnonzero(mask)
        same = np.ones(len(live_idx), bool)
        for p in part:
            c = chunk.columns[p]
            vals = np.asarray(c.values)[live_idx]
            if vals.ndim > 1:
                same &= (vals == vals[-1]).all(axis=1)
            else:
                same &= vals == vals[-1]
            if c.validity is not None:
                va = np.asarray(c.validity)[live_idx]
                same &= va == va[-1]
        return len(live_idx) - int(same.sum())

    carry: Optional[TableBlock] = None
    n_parts = sorted_runs.num_partitions
    for i in range(n_parts):
        chunk = sorted_runs.block(i)
        if carry is not None:
            chunk = concat_blocks([carry, chunk])
            carry = None
        live = int(np.asarray(chunk.row_mask).sum())
        if live == 0:
            continue
        if i == n_parts - 1 or not part:
            yield chunk
            continue
        start = trailing_run(chunk)
        if start == 0:
            # a single group spans the whole chunk: carry it whole
            # (compacted so the next concat stays live-dense)
            carry = deserialize_block(serialize_block(chunk))
            continue
        finished = head_limit(chunk, start, 0)
        carry = deserialize_block(serialize_block(
            head_limit(chunk, live - start, start)))
        yield finished
    if carry is not None:
        yield carry


def _window_staged(node: PN.Window, s) -> StagedTable:
    """Window over host-staged input with bounded HBM: sort_staged
    provides the global (partition_by, order_by) order, then
    _group_aligned_chunks guarantees window_block only ever sees whole
    partitions."""
    from auron_tpu.ops.external_sort import sort_staged
    from auron_tpu.ops.sort import SortKey
    from auron_tpu.ops.window import window_block

    child = _exec(node.child, s)
    part = list(node.partition_by)
    keys = [SortKey(p) for p in part] + list(node.order_by)
    sorted_runs = sort_staged(child, keys,
                              getattr(s, "memory_budget", None))
    out: List[bytes] = []
    for chunk in _group_aligned_chunks(sorted_runs, part):
        done = window_block(chunk, part, list(node.order_by),
                            list(node.funcs), node.group_limit,
                            node.output_window_cols)
        if bool(np.asarray(done.row_mask).any()):
            out.append(serialize_block(done))
    return StagedTable(out)


def _exec(node: PN.PlanNode, s) -> StagedTable:
    if isinstance(node, PN.MemoryScan):
        return _scan(node, s)
    if isinstance(node, PN.Filter):
        return _map_chunks(_exec(node.child, s),
                           lambda b: filter_block(b, node.predicate))
    if isinstance(node, PN.Project):
        exprs = [E.Alias(e, name) for name, e in node.exprs]
        return _map_chunks(_exec(node.child, s),
                           lambda b: project_block(b, exprs))
    if isinstance(node, PN.Rename):
        mapping = dict(node.mapping)
        return _map_chunks(
            _exec(node.child, s),
            lambda b: TableBlock({mapping.get(k, k): c
                                  for k, c in b.columns.items()},
                                 b.row_mask))
    if isinstance(node, PN.Limit):
        return _limit_staged(_exec(node.child, s), node.limit, node.offset)
    if isinstance(node, PN.Sort):
        from auron_tpu.ops.external_sort import sort_staged
        out = sort_staged(_exec(node.child, s), list(node.keys),
                          getattr(s, "memory_budget", None))
        if node.fetch is not None:
            out = _limit_staged(out, node.fetch)
        return out
    if isinstance(node, PN.Agg):
        return _agg_staged(node, s)
    if isinstance(node, PN.Window):
        return _window_staged(node, s)
    if isinstance(node, PN.Join):
        return _join_staged(node, s)
    if isinstance(node, PN.Union):
        return _union_staged(node, s)
    if isinstance(node, PN.Exchange):
        return _exec(node.child, s)
    if isinstance(node, PN.Expand):
        def expand(b, _projs=node.projections):
            from auron_tpu.ops.join import concat_blocks
            pieces = [project_block(b, [E.Alias(e, n) for n, e in proj])
                      for proj in _projs]
            return concat_blocks(pieces)
        return _map_chunks(_exec(node.child, s), expand)
    raise NotImplementedError(
        f"staged executor: {type(node).__name__}")


def _union_staged(node: PN.Union, s) -> StagedTable:
    """UNION ALL: children stream sequentially; numeric dtype differences
    across children are union-coerced per chunk from one sample per child
    (the in-HBM executor's unify_block_dtypes, q5's decimal/float mix).
    Raw-string width mismatches cannot be widened safely from a sample
    (later chunks may hold longer strings) — those bail loudly."""
    from auron_tpu.expr.cast import cast_column
    from auron_tpu.ops.join import unify_block_dtypes
    outs = [_exec(c, s) for c in node.children_nodes]
    samples = [(i, deserialize_block(o.payloads[0]))
               for i, o in enumerate(outs) if o.payloads]
    per_child_targets: Dict[int, Dict[str, object]] = {}
    if len(samples) >= 2:
        unified = unify_block_dtypes([b for _, b in samples])
        for (i, orig), uni in zip(samples, unified):
            t = {}
            for name, c in orig.columns.items():
                u = uni.columns[name]
                if (c.dtype.name, c.dtype.params) != \
                        (u.dtype.name, u.dtype.params):
                    if u.dtype.is_raw_string:
                        raise NotImplementedError(
                            "staged UNION with raw-string width "
                            "mismatch across children")
                    t[name] = u.dtype
            if t:
                per_child_targets[i] = t
    payloads: List[bytes] = []
    for i, o in enumerate(outs):
        targets = per_child_targets.get(i)
        if not targets:
            payloads.extend(o.payloads)
            continue
        for chunk in o.blocks():
            cols = dict(chunk.columns)
            for name, to in targets.items():
                cols[name] = cast_column(cols[name], to, chunk.capacity)
            payloads.append(serialize_block(
                TableBlock(cols, chunk.row_mask)))
    return StagedTable(payloads)


def execute_plan_staged(plan: PN.PlanNode, s) -> StagedTable:
    """Run the plan with bounded HBM; result stays host-staged."""
    from auron_tpu.plan.prune import prune_plan
    # prune only (no stats annotation: dense-domain hints need whole-table
    # scans, which is exactly what this path avoids)
    plan = prune_plan(plan, s)
    return _exec(plan, s)


def collect_staged(plan: PN.PlanNode, s):
    """Staged execution -> one pandas DataFrame at the output boundary."""
    import pandas as pd
    staged = execute_plan_staged(plan, s)
    frames = [deserialize_block(p).to_pandas() for p in staged.payloads]
    if not frames:
        # schema-correct empty result via the in-HBM path on empty inputs
        from auron_tpu.plan.prune import output_names
        return pd.DataFrame(columns=output_names(plan, s))
    return pd.concat(frames, ignore_index=True)
