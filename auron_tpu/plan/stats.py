"""Plan-time statistics: int-column range propagation + hint annotation.

Replaces run-time AQE checks for jitted plans: under `jax.jit` every
intermediate is a tracer, so eager stats (plan/execute.py's
`_eager_int_range` / `_with_build_domain`) cannot fire. This pass computes
column value ranges ONCE from the registered (concrete) tables, propagates
them bottom-up through the plan, and rewrites nodes with the hints the
executor's fast paths consume:

* `Agg.domains`  — dense direct aggregation (segment matmul, no sort)
* `Join.build_domain` (via spec at execution) — dense surrogate-key probe

The reference keeps statistics host-side in Spark (driver planning, AQE);
this is the single-process analog. Ranges are CONTRACTS derived from real
data at plan time — exact for scans, widened conservatively elsewhere.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import numpy as np

from auron_tpu.expr import nodes as E
from auron_tpu.plan import nodes as PN

Range = Tuple[int, int, bool]  # (lo, hi) half-open + values-unique flag

MAX_AGG_DOMAIN = 1 << 13
MAX_JOIN_DOMAIN = 1 << 22


_ANNOT_MEMO = None


def annotate_plan(plan: PN.PlanNode, session) -> PN.PlanNode:
    """Return an equivalent plan with domain hints filled from table stats.
    Rebuilds are memoized by source node so DAG sharing survives (shared
    CTE subtrees stay one node)."""
    global _ANNOT_MEMO
    outer = _ANNOT_MEMO
    _ANNOT_MEMO = {}
    try:
        new_plan, _ = _walk_memo(plan, session)
        return new_plan
    finally:
        _ANNOT_MEMO = outer


def _walk_memo(node, session):
    if _ANNOT_MEMO is None:
        return _walk(node, session)
    hit = _ANNOT_MEMO.get(id(node))
    if hit is None:
        hit = _walk(node, session)
        _ANNOT_MEMO[id(node)] = hit
        _ANNOT_MEMO.setdefault(("pin", id(node)), node)
    return hit


def _table_ranges(session, table: str) -> Dict[str, Range]:
    cache = getattr(session, "_stats_cache", None)
    if cache is None:
        cache = session._stats_cache = {}
    hit = cache.get(table)
    if hit is not None:
        return hit
    out: Dict[str, Range] = {}
    try:
        blocks = list(session.tables[table])
    except Exception:
        cache[table] = out
        return out
    for name in blocks[0].names:
        c0 = blocks[0].columns[name]
        if not c0.dtype.is_integer:
            continue
        lo, hi = None, None
        ok = True
        for b in blocks:
            c = b.columns[name]
            import jax.core
            if isinstance(c.values, jax.core.Tracer):
                ok = False
                break
            sel = np.asarray(b.row_mask)
            if c.validity is not None:
                sel = sel & np.asarray(c.validity)
            vals = np.asarray(c.values)[sel]
            if vals.size == 0:
                continue
            mn, mx = int(vals.min()), int(vals.max())
            lo = mn if lo is None else min(lo, mn)
            hi = mx if hi is None else max(hi, mx)
        if ok and lo is not None:
            total = 0
            unique = None
            for b in blocks:
                c = b.columns[name]
                sel = np.asarray(b.row_mask)
                if c.validity is not None:
                    sel = sel & np.asarray(c.validity)
                total += int(sel.sum())
            span = hi + 1 - lo
            if span == total:
                unique = True  # perfectly dense surrogate keys
            elif total <= (1 << 22) and len(blocks) == 1:
                c = blocks[0].columns[name]
                sel = np.asarray(blocks[0].row_mask)
                if c.validity is not None:
                    sel = sel & np.asarray(c.validity)
                vals = np.asarray(c.values)[sel]
                unique = bool(len(np.unique(vals)) == len(vals))
            else:
                unique = False
            out[name] = (lo, hi + 1, unique)
    cache[table] = out
    return out


def _walk(node: PN.PlanNode, s) -> Tuple[PN.PlanNode, Dict[str, Range]]:
    if isinstance(node, PN.MemoryScan):
        r = dict(_table_ranges(s, node.table))
        if node.projection:
            r = {k: v for k, v in r.items() if k in node.projection}
        return node, r
    if isinstance(node, (PN.Filter, PN.Limit, PN.Sort, PN.Debug,
                         PN.Coalesce, PN.Exchange, PN.Window,
                         PN.BuildBloom)):
        child, r = _walk_memo(node.children[0], s)
        return dataclasses.replace(node, **{_child_field(node): child}), r
    if isinstance(node, PN.Project):
        child, r = _walk_memo(node.child, s)
        out = {}
        exprs = []
        for name, e in node.exprs:
            exprs.append((name, _fill_cast_domains(e, r)))
            base = _column_of(e)
            if base is not None and base in r:
                out[name] = r[base]
        return dataclasses.replace(node, child=child,
                                   exprs=tuple(exprs)), out
    if isinstance(node, PN.Rename):
        child, r = _walk_memo(node.child, s)
        m = dict(node.mapping)
        return (dataclasses.replace(node, child=child),
                {m.get(k, k): v for k, v in r.items()})
    if isinstance(node, PN.Join):
        left, rl = _walk_memo(node.left, s)
        right, rr = _walk_memo(node.right, s)
        merged = dict(rl)
        merged.update(rr)
        build_keys = node.left_keys if node.build == "left" else \
            node.right_keys
        build_ranges = rl if node.build == "left" else rr
        bd = node.build_domain
        uniq = False
        seq = False
        if len(build_keys) == 1:
            rng = build_ranges.get(build_keys[0])
            if rng is not None and rng[1] - rng[0] <= MAX_JOIN_DOMAIN:
                if bd is None:
                    bd = (rng[0], rng[1])
                uniq = bool(rng[2])
                if uniq and bd == (rng[0], rng[1]):
                    build_node = node.left if node.build == "left" \
                        else node.right
                    seq = _sequential_key(build_node, build_keys[0], s)
        new = dataclasses.replace(node, left=left, right=right,
                                  build_domain=bd, build_unique=uniq,
                                  build_sequential=seq)
        # columns that pass through a join may be duplicated (probe fanout)
        # -> uniqueness is not preserved
        merged = {k: (v[0], v[1], False) for k, v in merged.items()}
        return new, merged
    if isinstance(node, PN.Union):
        outs = []
        merged: Dict[str, Range] = {}
        for c in node.children_nodes:
            nc, r = _walk_memo(c, s)
            outs.append(nc)
            for k, v in r.items():
                if k in merged:
                    merged[k] = (min(merged[k][0], v[0]),
                                 max(merged[k][1], v[1]), False)
                else:
                    merged[k] = v
        return dataclasses.replace(node, children_nodes=tuple(outs)), merged
    if isinstance(node, PN.Agg):
        child, r = _walk_memo(node.child, s)
        hints = dict(node.domains)
        for name, e in node.keys:
            if name in hints:
                continue
            base = _column_of(e)
            rng = r.get(base) if base else None
            if rng is not None and rng[1] - rng[0] <= MAX_AGG_DOMAIN:
                hints[name] = (rng[0], rng[1])
        new = dataclasses.replace(node, child=child,
                                  domains=tuple(hints.items()))
        # output ranges: keys keep their ranges and become UNIQUE (when
        # grouping by a single key, every output key value appears once)
        out = {}
        if len(node.keys) == 1:
            for name, e in node.keys:
                base = _column_of(e)
                if base in r:
                    out[name] = (r[base][0], r[base][1], True)
        else:
            out = {name: r[_column_of(e)] for name, e in node.keys
                   if _column_of(e) in r}
        return new, out
    # leaf/other nodes: rebuild children generically where possible
    if isinstance(node, PN.Generate):
        child, r = _walk_memo(node.child, s)
        # explode DUPLICATES rows: ranges survive, uniqueness does not
        return (dataclasses.replace(node, child=child),
                {k: (v[0], v[1], False) for k, v in r.items()})
    if isinstance(node, PN.Expand):
        child, r = _walk_memo(node.child, s)
        return dataclasses.replace(node, child=child), {}
    return node, {}


def _sequential_key(node, key: str, s) -> bool:
    """True when the build subtree is a scan (through pass-through
    projections/renames) whose `key` column is EXACTLY lo + row_position
    over a prefix of live rows — then the dense join's position table is
    the identity and both its scatter and its 8M-row probe gather vanish
    (ops/join.py _unique_dense_join sequential path). Concrete check at
    plan time; like build_domain, a contract trusted under jit."""
    import jax.core
    while True:
        if isinstance(node, PN.Project):
            base = None
            for name, e in node.exprs:
                if name == key:
                    base = _column_of(e)
            if base is None:
                return False
            key, node = base, node.child
            continue
        if isinstance(node, PN.Rename):
            inv = {new: old for old, new in node.mapping}
            key, node = inv.get(key, key), node.child
            continue
        break
    if not isinstance(node, PN.MemoryScan):
        return False
    if node.projection and key not in node.projection:
        return False
    blocks = s.tables.get(node.table)
    if not blocks or len(blocks) != 1:
        return False
    b = blocks[0]
    c = b.columns.get(key)
    if c is None or not c.dtype.is_integer:
        return False
    if isinstance(c.values, jax.core.Tracer) or \
            isinstance(b.row_mask, jax.core.Tracer):
        return False
    mask = np.asarray(b.row_mask)
    n = int(mask.sum())
    if n == 0 or not mask[:n].all():
        return False
    if c.validity is not None and not np.asarray(c.validity)[:n].all():
        return False
    vals = np.asarray(c.values)[:n]
    return bool(np.array_equal(
        vals, vals[0] + np.arange(n, dtype=vals.dtype)))


def _child_field(node) -> str:
    for f in dataclasses.fields(node):
        if isinstance(getattr(node, f.name), PN.PlanNode):
            return f.name
    raise ValueError(f"no child field on {type(node).__name__}")


def _fill_cast_domains(e: E.Expr, ranges: Dict[str, Range]) -> E.Expr:
    """Rewrite Cast(col -> string) with the column's known value range so
    the output dictionary can be built statically under jit (expr/cast.py
    _cast_to_string traced path)."""
    if isinstance(e, E.Alias):
        c = _fill_cast_domains(e.child, ranges)
        return e if c is e.child else dataclasses.replace(e, child=c)
    if isinstance(e, E.Cast):
        c = _fill_cast_domains(e.child, ranges)
        dom = e.domain
        if dom is None and e.to.is_string:
            base = _column_of(e.child)
            rng = ranges.get(base) if base else None
            if rng is not None:
                dom = (rng[0], rng[1])
        if c is e.child and dom is e.domain:
            return e
        return dataclasses.replace(e, child=c, domain=dom)
    if isinstance(e, E.BinaryOp):
        l = _fill_cast_domains(e.left, ranges)
        r = _fill_cast_domains(e.right, ranges)
        if l is e.left and r is e.right:
            return e
        return dataclasses.replace(e, left=l, right=r)
    if isinstance(e, (E.Not, E.IsNull)):
        c = _fill_cast_domains(e.child, ranges)
        return e if c is e.child else dataclasses.replace(e, child=c)
    if isinstance(e, E.ScalarFunc):
        args = tuple(_fill_cast_domains(a, ranges) for a in e.args)
        if all(a is b for a, b in zip(args, e.args)):
            return e
        return dataclasses.replace(e, args=args)
    if isinstance(e, E.CaseWhen):
        branches = tuple((_fill_cast_domains(w, ranges),
                          _fill_cast_domains(t, ranges))
                         for w, t in e.branches)
        other = None if e.otherwise is None \
            else _fill_cast_domains(e.otherwise, ranges)
        return dataclasses.replace(e, branches=branches, otherwise=other)
    return e


def _column_of(e: E.Expr) -> Optional[str]:
    while isinstance(e, E.Alias):
        e = e.child
    if isinstance(e, E.Column):
        return e.name
    return None


# ---------------------------------------------------------------------------
# Row-count upper-bound propagation — the broadcast-sizing stat
# (AuronConvertStrategy.scala:126-194 sizes builds from plan statistics;
# the scan-chain walk it replaces returned None for anything but a bare
# scan, so derived dimensions never broadcast).
# ---------------------------------------------------------------------------

def estimated_rows(plan: PN.PlanNode, session) -> Optional[int]:
    """Upper bound on the live-row count of ``plan``'s result, or None when
    no sound bound exists (e.g. a fan-out join). Upper bounds are the right
    polarity for the broadcast decision: a broadcast chosen under the
    threshold can never blow past it."""
    import jax.core

    def walk(node) -> Optional[int]:
        if isinstance(node, PN.MemoryScan):
            total = 0
            for b in session.tables[node.table]:
                if isinstance(b.row_mask, jax.core.Tracer):
                    return None
                total += int(np.asarray(b.row_mask).sum())
            return total
        if isinstance(node, (PN.Filter, PN.Project, PN.Rename,
                             PN.Window, PN.Coalesce, PN.Exchange)):
            return walk(node.child)
        if isinstance(node, PN.Limit):
            c = walk(node.child)
            return node.limit if c is None else min(c, node.limit)
        if isinstance(node, PN.Sort):
            c = walk(node.child)
            if node.fetch is not None:
                return node.fetch if c is None else min(c, node.fetch)
            return c
        if isinstance(node, PN.Agg):
            if not node.keys:
                return 1
            return walk(node.child)  # <= input rows
        if isinstance(node, PN.Union):
            parts = [walk(c) for c in node.children_nodes]
            return None if any(p is None for p in parts) else sum(parts)
        if isinstance(node, PN.Join):
            probe = walk(node.left)
            if probe is None:
                return None
            if node.join_type in ("left_semi", "left_anti", "existence"):
                return probe  # probe-only outputs
            build = walk(node.right)
            # inner/left joins cannot expand past probe rows when the build
            # key set is at most one row per key; without uniqueness the
            # fan-out is unbounded. A 1-row bound on either side is always
            # safe for inner.
            if node.join_type in ("inner", "left"):
                if node.build_unique or (build is not None and build <= 1):
                    return probe  # at most one build row per probe row
            if node.join_type == "full" and node.build_unique \
                    and build is not None:
                return probe + build
            return None
        if isinstance(node, PN.Expand):
            c = walk(node.child)
            return None if c is None else c * len(node.projections)
        if isinstance(node, PN.Generate):
            return None  # data-dependent expansion
        kids = node.children
        if len(kids) == 1:
            return walk(kids[0])
        return None

    return walk(plan)
