"""Column pruning — push required-column sets down to the scans.

Reference analog: datafusion-ext-plans/src/common/column_pruning.rs (pushdown
of projections through the operator tree). On TPU this matters doubly:
every column that survives a join costs a row gather, and gathers are the
slowest primitive on the chip — so joins over pruned inputs are directly
proportionally faster.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Set

from auron_tpu.expr import nodes as E
from auron_tpu.plan import nodes as PN


def expr_refs(e: E.Expr) -> Set[str]:
    out: Set[str] = set()

    def visit(v):
        if isinstance(v, E.Expr):
            walk(v)
        elif isinstance(v, tuple):
            # CaseWhen.branches is a tuple of (cond, value) PAIRS — recurse
            # into nested tuples, not just one level
            for item in v:
                visit(item)

    def walk(x):
        if isinstance(x, E.Column):
            out.add(x.name)
            return
        for f in getattr(x, "__dataclass_fields__", {}):
            visit(getattr(x, f))
    walk(e)
    return out


def output_names(node: PN.PlanNode, session) -> List[str]:
    if isinstance(node, PN.MemoryScan):
        names = session.tables[node.table][0].names
        return [n for n in names if not node.projection
                or n in node.projection]
    if isinstance(node, (PN.ParquetScan, PN.OrcScan, PN.LakehouseScan)):
        return list(node.projection) if node.projection else []
    if isinstance(node, PN.Project):
        return [n for n, _ in node.exprs]
    if isinstance(node, PN.Rename):
        m = dict(node.mapping)
        return [m.get(n, n) for n in output_names(node.child, session)]
    if isinstance(node, PN.Agg):
        out = [n for n, _ in node.keys]
        for c in node.calls:
            if c.kind == "avg" and node.mode == "partial":
                out += [f"{c.name}#s", f"{c.name}#c"]
            elif c.kind in ("stddev", "stddev_samp") and \
                    node.mode == "partial":
                out += [f"{c.name}#s", f"{c.name}#q", f"{c.name}#c"]
            elif c.kind in ("collect_list", "collect_set"):
                out += [f"{c.name}#vals", f"{c.name}#len"]
            else:
                out.append(c.name)
        return out
    if isinstance(node, PN.Join):
        out = output_names(node.left, session) + \
            output_names(node.right, session)
        if node.join_type == "existence":
            out.append(node.existence_col)
        return out
    if isinstance(node, PN.Union):
        return output_names(node.children_nodes[0], session)
    if isinstance(node, PN.BlockTransform):
        from auron_tpu.expr.collections import transform_output_names
        return output_names(node.child, session) + \
            [n for n in transform_output_names(node.fn, node.params)
             if n not in output_names(node.child, session)]
    if isinstance(node, PN.Expand):
        return [n for n, _ in node.projections[0]]
    if isinstance(node, PN.Window):
        return output_names(node.child, session) + \
            ([f.name for f in node.funcs] if node.output_window_cols else [])
    if isinstance(node, PN.Generate):
        if node.kind == "json_tuple":
            return output_names(node.child, session) + \
                [f"{node.out_name}{i}" for i in range(len(node.fields))]
        base = [n for n in output_names(node.child, session)
                if n not in (f"{node.column}#vals", f"{node.column}#len")]
        extra = [node.pos_name] if node.kind == "posexplode" else []
        return base + extra + [node.out_name]
    kids = node.children
    if kids:
        return output_names(kids[0], session)
    return []


_PRUNE_MEMO = None
_NEED_UNION = None  # pass-1 record: id(node) -> union of needed sets
_USE_UNION = None   # pass-2 override: same map, consumed instead of recorded
_PRUNED_NEEDED = None  # pass-2 record: id(pruned node) -> needed set


def prune_plan(plan: PN.PlanNode, session) -> PN.PlanNode:
    # memoize rebuilds so DAG sharing survives pruning (a CTE consumed by
    # N branches stays ONE node and executes once, not N times)
    global _PRUNE_MEMO, _NEED_UNION, _USE_UNION, _PRUNED_NEEDED
    outer, outer_union, outer_use, outer_pn = \
        _PRUNE_MEMO, _NEED_UNION, _USE_UNION, _PRUNED_NEEDED
    try:
        # semantic rewrites first (null-rejection join reassociation,
        # rollup re-aggregation) so every execution path — eager,
        # whole-plan jit, staged — plans the same optimized tree
        # (plan/rewrite.py). Join REORDERING runs after pruning below:
        # multi-role dimensions (three date_dim scans in one query) carry
        # colliding column names until pruning strips the unreferenced
        # ones, and reordering never changes column requirements, so the
        # pruned tree stays exactly pruned.
        from auron_tpu.plan.rewrite import (reassociate_left_joins,
                                            reaggregate_rollups,
                                            reorder_inner_joins)
        plan = reassociate_left_joins(plan, session)
        plan = reaggregate_rollups(plan, session)
        needed = set(output_names(plan, session))
        # TWO passes. A node shared by consumers with different column
        # needs (rollup levels over one agg, CTE branches) must be pruned
        # ONCE with the union of those needs — per-consumer pruning would
        # split it into N copies that each execute. Pass 1 records the
        # union of needed-at-entry per node (needs propagation is
        # union-distributive, so one recording pass reaches the fixpoint);
        # pass 2 prunes each node once with its union, memoized by id.
        _PRUNE_MEMO, _NEED_UNION, _USE_UNION = {}, {}, None
        _PRUNED_NEEDED = None
        _prune(plan, needed, session)
        _PRUNE_MEMO, _USE_UNION = {}, _NEED_UNION
        _NEED_UNION, _PRUNED_NEEDED = None, {}
        pruned = _prune(plan, needed, session)
        reordered = reorder_inner_joins(pruned, session,
                                        needed_above=_PRUNED_NEEDED)
        # DPP analog last: interval dimensions need the PRUNED column
        # set (the eliminated join may only emit the key + constants)
        from auron_tpu.plan.rewrite import prune_interval_dims
        return prune_interval_dims(reordered, session,
                                   needed_above=_PRUNED_NEEDED)
    finally:
        _PRUNE_MEMO, _NEED_UNION, _USE_UNION, _PRUNED_NEEDED = \
            outer, outer_union, outer_use, outer_pn


def _prune(node: PN.PlanNode, needed: Set[str], session) -> PN.PlanNode:
    if _PRUNE_MEMO is not None:
        if _USE_UNION is not None:
            needed = _USE_UNION.get(id(node), needed)
            key = id(node)
        else:
            if _NEED_UNION is not None:
                _NEED_UNION.setdefault(id(node), set()).update(needed)
            key = (id(node), frozenset(needed))
        hit = _PRUNE_MEMO.get(key)
        if hit is None:
            hit = _prune_impl(node, needed, session)
            # pin the source node: id()-keyed caches must keep it alive
            _PRUNE_MEMO[key] = hit
            _PRUNE_MEMO.setdefault(("pin", id(node)), node)
            if _PRUNED_NEEDED is not None:
                _PRUNED_NEEDED[id(hit)] = frozenset(needed)
        return hit
    return _prune_impl(node, needed, session)


def _prune_impl(node: PN.PlanNode, needed: Set[str],
                session) -> PN.PlanNode:
    if isinstance(node, PN.MemoryScan):
        avail = [n for n in session.tables[node.table][0].names
                 if not node.projection or n in node.projection]
        proj = tuple(n for n in avail if n in needed)
        if len(proj) == len(avail) and not node.projection:
            return node
        return dataclasses.replace(node, projection=proj or tuple(avail[:1]))
    if isinstance(node, (PN.ParquetScan, PN.OrcScan, PN.LakehouseScan)):
        return node
    if isinstance(node, PN.Filter):
        child_needed = needed | expr_refs(node.predicate)
        return dataclasses.replace(
            node, child=_prune(node.child, child_needed, session))
    if isinstance(node, PN.Project):
        keep = tuple((n, e) for n, e in node.exprs if n in needed)
        child_needed: Set[str] = set()
        for _, e in keep:
            child_needed |= expr_refs(e)
        return dataclasses.replace(
            node, exprs=keep or node.exprs[:1],
            child=_prune(node.child, child_needed or
                         expr_refs(node.exprs[0][1]), session))
    if isinstance(node, PN.Agg):
        child_needed: Set[str] = set()
        for _, e in node.keys:
            child_needed |= expr_refs(e)
        for c in node.calls:
            if c.expr is not None:
                child_needed |= expr_refs(c.expr)
            if c.filter is not None:
                child_needed |= expr_refs(c.filter)
        if node.mode == "final":
            # final consumes partial state columns by name
            child_needed |= set(output_names(node, session))
            for c in node.calls:
                if c.kind == "avg":
                    child_needed |= {f"{c.name}#s", f"{c.name}#c"}
                elif c.kind in ("stddev", "stddev_samp"):
                    child_needed |= {f"{c.name}#s", f"{c.name}#q",
                                     f"{c.name}#c"}
                else:
                    child_needed.add(c.name)
        return dataclasses.replace(
            node, child=_prune(node.child, child_needed, session))
    if isinstance(node, PN.Sort):
        child_needed = needed | {k.column for k in node.keys}
        return dataclasses.replace(
            node, child=_prune(node.child, child_needed, session))
    if isinstance(node, PN.Limit):
        return dataclasses.replace(
            node, child=_prune(node.child, needed, session))
    if isinstance(node, PN.Join):
        want = set(needed)
        want |= set(node.left_keys) | set(node.right_keys)
        if node.condition is not None:
            want |= expr_refs(node.condition)
        lnames = set(output_names(node.left, session))
        rnames = set(output_names(node.right, session))
        return dataclasses.replace(
            node,
            left=_prune(node.left, want & lnames, session),
            right=_prune(node.right, want & rnames, session))
    if isinstance(node, PN.Exchange):
        p = node.partitioning
        extra = set(getattr(p, "key_names", ()) or ())
        for k in getattr(p, "sort_keys", ()) or ():
            extra.add(k.column)
        return dataclasses.replace(
            node, child=_prune(node.child, needed | extra, session))
    if isinstance(node, PN.Union):
        return dataclasses.replace(
            node, children_nodes=tuple(
                _prune(c, needed, session) for c in node.children_nodes))
    if isinstance(node, PN.Window):
        extra = set(node.partition_by) | {k.column for k in node.order_by}
        extra |= {f.input for f in node.funcs if f.input}
        return dataclasses.replace(
            node, child=_prune(node.child, needed | extra, session))
    if isinstance(node, PN.Generate):
        if node.kind == "json_tuple":
            gen = {f"{node.out_name}{i}" for i in range(len(node.fields))}
            return dataclasses.replace(
                node, child=_prune(node.child,
                                   (needed | {node.column}) - gen, session))
        extra = {f"{node.column}#vals", f"{node.column}#len"}
        return dataclasses.replace(
            node, child=_prune(node.child, (needed | extra) -
                               {node.out_name, node.pos_name}, session))
    if isinstance(node, PN.Rename):
        inv = {b: a for a, b in node.mapping}
        child_needed = {inv.get(n, n) for n in needed}
        return dataclasses.replace(
            node, child=_prune(node.child, child_needed, session))
    if isinstance(node, PN.BlockTransform):
        from auron_tpu.expr.collections import transform_output_names
        gen = set(transform_output_names(node.fn, node.params))
        child_needed = (needed - gen) | set(node.params[1:2])
        # params[1] is the source column for split/str_to_map; map ops name
        # their inputs via plane prefixes — keep those too
        for prefix in node.params[1:]:
            if isinstance(prefix, str):
                child_needed |= {f"{prefix}#keys", f"{prefix}#vals",
                                 f"{prefix}#len", prefix} &                     set(output_names(node.child, session))
        return dataclasses.replace(
            node, child=_prune(node.child, child_needed, session))
    if isinstance(node, PN.Expand):
        child_needed: Set[str] = set()
        for proj in node.projections:
            for _, e in proj:
                child_needed |= expr_refs(e)
        return dataclasses.replace(
            node, child=_prune(node.child, child_needed, session))
    if isinstance(node, (PN.Debug, PN.Coalesce)):
        return dataclasses.replace(
            node, child=_prune(node.child, needed, session))
    if isinstance(node, PN.BuildBloom):
        return dataclasses.replace(
            node, child=_prune(node.child, needed | {node.column}, session))
    return node
