"""Null-rejection join reassociation (plan/rewrite.py) — the q93-class
rewrite: (A LEFT B) INNER C on B.x=C.y  ==  A INNER (B INNER C).

Reference analog: Spark's EliminateOuterJoin + predicate pushdown run
before AuronConvertStrategy ever sees a plan; this engine owns its
planner, so the rewrite (and its safety conditions) are tested here."""

import numpy as np
import pandas as pd

from auron_tpu import config
from auron_tpu.expr.nodes import col, lit
from auron_tpu.plan import Session
from auron_tpu.plan import nodes as PN
from auron_tpu.plan.builder import table
from auron_tpu.plan.prune import prune_plan
from auron_tpu.plan.rewrite import reassociate_left_joins

from conftest import sorted_rows


def _tables(s: Session):
    rng = np.random.default_rng(5)
    a = pd.DataFrame({"ak": np.arange(4000, dtype=np.int64),
                      "v": rng.integers(0, 100, 4000).astype(np.int64)})
    # B matches half of A; bx carries the C key (some without C match)
    b = pd.DataFrame({"bk": np.arange(0, 4000, 2, dtype=np.int64),
                      "bx": (np.arange(2000, dtype=np.int64) % 40),
                      "w": np.arange(2000, dtype=np.int64)})
    c = pd.DataFrame({"cy": np.arange(10, dtype=np.int64),
                      "name": [f"r{i}" for i in range(10)]})
    s.register_pandas("a", a)
    s.register_pandas("b", b)
    s.register_pandas("c", c)
    return a, b, c


def _oracle(a, b, c):
    j = (a.merge(b, left_on="ak", right_on="bk", how="left")
         .merge(c, left_on="bx", right_on="cy"))
    return j


def _find_joins(node, acc):
    import dataclasses
    if isinstance(node, PN.Join):
        acc.append(node)
    for f in dataclasses.fields(node):
        v = getattr(node, f.name)
        if isinstance(v, PN.PlanNode):
            _find_joins(v, acc)
        elif isinstance(v, tuple):
            for x in v:
                if isinstance(x, PN.PlanNode):
                    _find_joins(x, acc)
    return acc


def test_left_inner_reassociates_and_matches():
    s = Session()
    a, b, c = _tables(s)
    f = (table(s, "a")
         .join(table(s, "b"), ("ak",), ("bk",), how="left",
               strategy="partitioned")
         .join(table(s, "c"), ("bx",), ("cy",)))
    new = reassociate_left_joins(f.plan, s)
    joins = _find_joins(new, [])
    # every join is now INNER, and the B-C join sits BELOW the big join
    assert all(j.join_type == "inner" for j in joins)
    top = joins[0]
    assert top.left_keys == ("ak",)
    inner_bc = _find_joins(top.right, [])
    assert inner_bc and inner_bc[0].left_keys == ("bx",)
    # differential: rewritten plan (via normal execution) matches pandas
    got = f.collect()
    want = _oracle(a, b, c)[["ak", "v", "bk", "bx", "w", "cy", "name"]]
    assert sorted_rows(got[want.columns.tolist()]) == sorted_rows(want)
    # and under whole-plan jit
    got_jit = f.collect(jit=True)
    assert sorted_rows(got_jit[want.columns.tolist()]) == sorted_rows(want)


def test_no_rewrite_when_keys_from_left_side():
    """INNER join keyed on A's columns does NOT null-reject B's side —
    the LEFT join must survive."""
    s = Session()
    a, b, c = _tables(s)
    f = (table(s, "a")
         .join(table(s, "b"), ("ak",), ("bk",), how="left",
               strategy="partitioned")
         .join(table(s, "c"), ("v",), ("cy",)))  # key from A!
    new = reassociate_left_joins(f.plan, s)
    kinds = sorted(j.join_type for j in _find_joins(new, []))
    assert kinds == ["inner", "left"]
    got = f.collect()
    want = (a.merge(b, left_on="ak", right_on="bk", how="left")
            .merge(c, left_on="v", right_on="cy"))
    assert len(got) == len(want)


def test_no_rewrite_for_outer_consumer():
    """A LEFT-join consumer above the lower LEFT join keeps everything."""
    s = Session()
    a, b, c = _tables(s)
    f = (table(s, "a")
         .join(table(s, "b"), ("ak",), ("bk",), how="left",
               strategy="partitioned")
         .join(table(s, "c"), ("bx",), ("cy",), how="left"))
    new = reassociate_left_joins(f.plan, s)
    kinds = sorted(j.join_type for j in _find_joins(new, []))
    assert kinds == ["left", "left"]
    got = f.collect()
    want = (a.merge(b, left_on="ak", right_on="bk", how="left")
            .merge(c, left_on="bx", right_on="cy", how="left"))
    assert len(got) == len(want)


def test_rewrite_fires_inside_prune_plan():
    """prune_plan is the choke point every execution path crosses."""
    s = Session()
    _tables(s)
    f = (table(s, "a")
         .join(table(s, "b"), ("ak",), ("bk",), how="left",
               strategy="partitioned")
         .join(table(s, "c"), ("bx",), ("cy",)))
    pruned = prune_plan(f.plan, s)
    assert all(j.join_type == "inner" for j in _find_joins(pruned, []))
