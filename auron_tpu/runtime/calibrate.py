"""Measured-capacity calibration: the whole-plan-jit AQE analog.

Under whole-plan jit every output shape is static, so join expansions and
explode fan-outs must be PREALLOCATED from estimates — and in a join
chain the default ``probe_capacity * factor`` sizing compounds per join
(at sf=500 a three-join chain reached 3.2e9-row buffers and failed HBM
allocation before the first byte moved). The reference sizes these
adaptively at run time (datafusion-ext-plans join output batching /
Spark AQE); the TPU-native equivalent is a one-shot EAGER calibration
pass: run the (pruned+annotated) plan once with eager exact sizing, have
each expanding operator record its true output row count against its
plan-node identity, then rebuild the plan with those measurements as
``out_capacity`` hints and trace THAT. The compiled program allocates
exactly what the data needs; the overflow-regrow loop remains underneath
as the correctness net (a hinted capacity still records its traced
overflow counter and regrows by the grown config factor).

Scope protocol mirrors runtime/overflow.py: ``with collect() as caps:``
activates recording; ``record(node, rows)`` is called by ops/plan layers
whenever an exact output size is known for an expanding node; the dict
maps ``id(node) -> max observed rows`` (a node can execute once per
partition). ``apply(plan, caps)`` rebuilds the tree (DAG-sharing
preserved) with rounded capacities on Join/Generate nodes.
"""

from __future__ import annotations

import dataclasses
import threading
from contextlib import contextmanager
from typing import Dict, Optional

_TLS = threading.local()


def _active() -> Optional[dict]:
    return getattr(_TLS, "caps", None)


def active() -> bool:
    return _active() is not None


@contextmanager
def collect():
    prev = _active()
    _TLS.caps = {}
    try:
        yield _TLS.caps
    finally:
        _TLS.caps = prev


def record(node, rows) -> None:
    """Record an exact output row count for an expanding plan node (join
    expansion / explode). ``rows`` must be a concrete host int — callers
    only invoke this on the eager path where totals are concrete."""
    caps = _active()
    if caps is None or rows is None:
        return
    key = id(node)
    r = int(rows)
    if r > caps.get(key, -1):
        caps[key] = r


def record_live(node, rows) -> None:
    """Record a node's measured LIVE output rows (max over partitions).
    Selective Filter/Join nodes whose live count is far below their block
    capacity get a ``shrink_to`` in the rebuilt tree — the executor then
    compacts their output so downstream ops run at the data's true size
    (the static-shape analog of Arrow's dynamic batch shrinking)."""
    caps = _active()
    if caps is None or rows is None:
        return
    key = (id(node), "live")
    r = int(rows)
    if r > caps.get(key, -1):
        caps[key] = r


def prepass_roots(plan):
    """Minimal forest whose execution records every capacity ``apply``
    can consume. The calibration prepass only needs Join/Generate output
    sizes and Join/Filter live counts — aggregations, windows and sorts
    ABOVE the topmost measured nodes are pure prepass cost (a q67-class
    rollup executes a 50M-row 8-key aggregation on the host for hints
    nobody reads). Returns the topmost measured nodes; a Filter only
    counts as measured when no Agg/Window sits below it (its own shrink
    hint is group-sized and not worth executing an aggregation for —
    deeper measured nodes are still collected through it)."""
    from auron_tpu.plan import nodes as PN

    blocking_memo: dict = {}

    def blocked(n) -> bool:
        hit = blocking_memo.get(id(n))
        if hit is None:
            hit = isinstance(n, (PN.Agg, PN.Window)) or \
                any(blocked(c) for c in n.children)
            blocking_memo[id(n)] = hit
        return hit

    roots: list = []
    seen: set = set()

    def walk(n):
        if id(n) in seen:
            return
        seen.add(id(n))
        if isinstance(n, (PN.Join, PN.Generate)) or \
                (isinstance(n, PN.Filter) and not blocked(n)):
            roots.append(n)
            return
        for c in n.children:
            walk(c)

    walk(plan)
    return roots


def apply(plan, caps: Dict[int, int]):
    """Rebuild ``plan`` with measured capacities as out_capacity hints.

    Keys of ``caps`` are id()s of nodes in THIS tree (the calibration run
    executed the same objects). Sharing (CTE DAGs) is preserved via an
    id-keyed memo so a shared subtree stays shared in the rebuilt tree.
    """
    from auron_tpu.block import round_capacity
    from auron_tpu.plan import nodes as PN

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
                if any(a is not b for a, b in zip(nv, v)):
                    changes[f.name] = nv
        measured = caps.get(id(node))
        if measured is not None and \
                isinstance(node, (PN.Join, PN.Generate)) and \
                node.out_capacity is None:
            changes["out_capacity"] = round_capacity(max(measured, 1))
        live = caps.get((id(node), "live"))
        if live is not None and isinstance(node, (PN.Join, PN.Filter)) \
                and node.shrink_to is None:
            changes["shrink_to"] = round_capacity(max(live, 1))
        new = dataclasses.replace(node, **changes) if changes else node
        memo[id(node)] = new
        return new

    return walk(plan)
