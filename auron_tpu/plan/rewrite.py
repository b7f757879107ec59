"""Semantic plan rewrites (null-rejection based join reassociation).

The reference inherits these from Spark's optimizer (EliminateOuterJoin +
join reordering run long before AuronConvertStrategy sees the plan); this
engine plans from its own Frame/SQL front-ends, so the rewrite lives here.

The one implemented today is the q93-class shape, which is also the
general "left join materialized before its null-rejecting consumer"
pattern:

    (A LEFT JOIN B on kA=kB)  INNER JOIN  C  on  B.x = C.y
  ==                                       -- NULL never equals anything,
    A INNER JOIN (B INNER JOIN C on x=y)   -- so null-extended rows die in
                                           -- the C join: the LEFT is
                                           -- really an INNER, and inner
                                           -- joins reassociate freely.

Why it matters on this hardware: the left join runs FIRST in the original
tree, so its build side is ALL of B (5M store_returns rows at sf=500 —
sort + gather over the full table, and at 50M probe rows the intermediate
crashed the worker under HBM pressure); after the rewrite B is pre-shrunk
by the selective C join (reason 28 keeps ~1/55 of returns) before the big
join ever runs. This is exactly the filter-pushdown-through-join the
reference gets from Spark for free.

Safety conditions (checked structurally):
  * the upper join is a plain equi INNER (no extra condition, not
    null-aware) with a broadcast build — C must be visible whole,
    otherwise moving it under B's exchange would re-partition it;
  * the lower join is a plain equi LEFT;
  * every upper-join probe key resolves to the lower join's RIGHT side
    (the null-producing side), unambiguously (no name collision with the
    left side).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

from auron_tpu.plan import nodes as PN


def _names(node, session) -> Optional[set]:
    from auron_tpu.plan.prune import output_names
    try:
        return set(output_names(node, session))
    except Exception:
        return None


def _try_reassociate(j: PN.PlanNode, session) -> Optional[PN.PlanNode]:
    if not isinstance(j, PN.Join) or j.join_type != "inner" \
            or j.condition is not None or j.null_aware \
            or j.strategy != "broadcast":
        return None
    lower = j.left
    if not isinstance(lower, PN.Join) or lower.join_type != "left" \
            or lower.condition is not None or lower.null_aware:
        return None
    b_side = lower.right
    exch = b_side if isinstance(b_side, PN.Exchange) else None
    b = b_side.child if exch is not None else b_side
    b_names = _names(b, session)
    a = lower.left.child if isinstance(lower.left, PN.Exchange) \
        else lower.left
    a_names = _names(a, session)
    if b_names is None or a_names is None:
        return None
    keys = set(j.left_keys)
    if not keys <= b_names or keys & a_names:
        return None
    # B' = B INNER C (broadcast, same keys as the upper join)
    bc = dataclasses.replace(j, left=b, out_capacity=None)
    new_right = dataclasses.replace(exch, child=bc) if exch is not None \
        else bc
    return dataclasses.replace(lower, right=new_right, join_type="inner",
                               out_capacity=None)


def reassociate_left_joins(plan: PN.PlanNode, session) -> PN.PlanNode:
    """Bottom-up single pass; DAG sharing preserved via an id-keyed memo.
    A chain of null-rejecting dimension joins above one left join rewrites
    fully: after the first rotation the lower join is INNER, and further
    upper joins keyed on B-side columns no longer need rewriting to be
    cheap (the selective build already shrank)."""
    memo: dict = {}

    def walk(node):
        if not isinstance(node, PN.PlanNode):
            return node
        hit = memo.get(id(node))
        if hit is not None:
            return hit
        changes = {}
        for f in dataclasses.fields(node):
            v = getattr(node, f.name)
            if isinstance(v, PN.PlanNode):
                nv = walk(v)
                if nv is not v:
                    changes[f.name] = nv
            elif isinstance(v, tuple) and v and \
                    all(isinstance(x, PN.PlanNode) for x in v):
                nv = tuple(walk(x) for x in v)
                if any(x is not y for x, y in zip(nv, v)):
                    changes[f.name] = nv
        node2 = dataclasses.replace(node, **changes) if changes else node
        new = _try_reassociate(node2, session)
        out = new if new is not None else node2
        memo[id(node)] = out
        return out

    return walk(plan)
