"""Planner-integrated out-of-core execution (round-2 verdict missing #1).

The reference spills every operator transparently under one MemManager
(auron-memmgr/src/lib.rs:308-428); here the analogous decision happens
once per plan: a tiny configured MemoryBudget must make Session.sql_result
route through plan/staged.py (external sort/agg + radix join over
host-staged chunks) with NO user opt-in, and the answers must equal the
in-HBM executor's bit for bit.
"""

import numpy as np
import pandas as pd
import pytest

import auron_tpu.plan.builder  # noqa: F401 — installs Session.table
from auron_tpu.expr.nodes import col, lit
from auron_tpu.ops.sort import SortKey
from auron_tpu.plan import Session
from auron_tpu.plan import staged as ST
from auron_tpu.runtime.memory import MemoryBudget

TINY = 1_000_000  # 1 MB — far below every working set used here


@pytest.fixture
def sess(rng):
    n = 60_000
    fact = pd.DataFrame({
        "k": rng.integers(0, 2000, n).astype(np.int64),
        "d": rng.integers(0, 300, n).astype(np.int64),
        "v": rng.random(n).round(3),
    })
    dim = pd.DataFrame({
        "id": np.arange(2000, dtype=np.int64),
        "grp": rng.integers(0, 37, 2000).astype(np.int64),
        "name": rng.choice(["ae", "be", "ce"], 2000),
    })
    s = Session()
    s.register_pandas("fact", fact)
    s.register_pandas("dim", dim)
    s.memory_budget = MemoryBudget(budget_bytes=TINY)
    return s, fact, dim


def test_decision_no_budget_no_staging(rng):
    s = Session()
    s.register_pandas("t", pd.DataFrame({"a": np.arange(10)}))
    f = s.table("t").filter(col("a") > lit(3))
    assert not ST.should_stage(f.plan, s)  # no budget -> in-HBM path


def test_decision_budget_forces_staging(sess):
    s, fact, dim = sess
    f = s.table("fact").groupby("d").agg(t=("sum", col("v")))
    assert ST.should_stage(f.plan, s)
    # a generous budget turns it back off
    s.memory_budget = MemoryBudget(budget_bytes=1 << 34)
    assert not ST.should_stage(f.plan, s)


def test_staged_filter_join_agg_matches_pandas(sess):
    s, fact, dim = sess
    f = (s.table("fact").filter(col("d") < lit(150))
         .join(s.table("dim"), ("k",), ("id",))
         .groupby("grp").agg(total=("sum", col("v")),
                             n=("count_star", None),
                             m=("avg", col("v"))))
    assert ST.should_stage(f.plan, s)
    got = f.collect().sort_values("grp").reset_index(drop=True)
    assert s.metrics["planner"]["staged_executor"] >= 1
    w = fact[fact.d < 150].merge(dim, left_on="k", right_on="id")
    want = (w.groupby("grp")
            .agg(total=("v", "sum"), n=("v", "size"), m=("v", "mean"))
            .reset_index().sort_values("grp").reset_index(drop=True))
    assert (got["grp"].values == want["grp"].values).all()
    assert (got["n"].values == want["n"].values).all()
    assert np.allclose(got["total"], want["total"], rtol=1e-9)
    assert np.allclose(got["m"], want["m"], rtol=1e-9)


def test_staged_equals_inmem_executor(sess):
    s, fact, dim = sess
    f = (s.table("fact").join(s.table("dim"), ("k",), ("id",))
         .groupby("grp", "name").agg(t=("sum", col("v"))))
    staged = f.collect().sort_values(["grp", "name"]).reset_index(drop=True)
    s.memory_budget = MemoryBudget(budget_bytes=1 << 34)  # in-HBM now
    inmem = f.collect().sort_values(["grp", "name"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(staged, inmem, check_dtype=False)


@pytest.mark.parametrize("how", ["inner", "left", "left_semi", "left_anti",
                                 "full"])
def test_radix_join_types(rng, how):
    """Big-big join (both sides over budget) through the bucketed path."""
    n = 30_000
    a = pd.DataFrame({"k": rng.integers(0, 800, n).astype(np.int64),
                      "v": rng.random(n).round(3)})
    b = pd.DataFrame({"k2": rng.integers(400, 1200, n).astype(np.int64),
                      "w": rng.random(n).round(3)})
    s = Session()
    s.register_pandas("a", a)
    s.register_pandas("b", b)
    s.memory_budget = MemoryBudget(budget_bytes=200_000)
    f = (s.table("a").join(s.table("b"), ("k",), ("k2",), how=how)
         .groupby("k").agg(n=("count_star", None)))
    assert ST.should_stage(f.plan, s)
    got = f.collect().sort_values("k").reset_index(drop=True)
    m = a.merge(b, left_on="k", right_on="k2", how={
        "inner": "inner", "left": "left", "full": "outer",
        "left_semi": "inner", "left_anti": "left"}[how])
    if how == "left_semi":
        m = a[a.k.isin(b.k2)]
    elif how == "left_anti":
        m = a[~a.k.isin(b.k2)]
    grp = m.groupby("k", dropna=False).size().reset_index(name="n")
    grp = grp.dropna(subset=["k"]) if how != "full" else grp
    got_d = dict(zip(got["k"].astype("Int64"), got["n"]))
    want_d = dict(zip(grp["k"].astype("Int64"), grp["n"]))
    assert got_d == want_d


def test_null_aware_anti_global_null(rng):
    """NOT IN with a null build key empties the result — decided globally
    before bucketing."""
    a = pd.DataFrame({"k": np.arange(5000, dtype=np.int64)})
    b = pd.DataFrame({"k2": pd.array([1, None, 7] * 2000,
                                     dtype="Int64")})
    s = Session()
    s.register_pandas("a", a)
    s.register_pandas("b", b)
    s.memory_budget = MemoryBudget(budget_bytes=50_000)
    f = s.table("a").join(s.table("b"), ("k",), ("k2",), how="left_anti",
                          null_aware=True)
    got = f.collect()
    assert len(got) == 0


def test_staged_sort_topk_and_limit(sess):
    s, fact, dim = sess
    f = (s.table("fact")
         .sort(SortKey("v", ascending=False), SortKey("k"), limit=25))
    assert ST.should_stage(f.plan, s)
    got = f.collect().reset_index(drop=True)
    want = fact.sort_values(["v", "k"], ascending=[False, True],
                            kind="stable").head(25).reset_index(drop=True)
    assert np.allclose(got["v"], want["v"])
    assert (got["k"].values == want["k"].values).all()


def test_staged_keyless_agg(sess):
    s, fact, dim = sess
    f = s.table("fact").groupby().agg(t=("sum", col("v")),
                                      n=("count_star", None),
                                      mx=("max", col("v")))
    got = f.collect()
    assert int(got["n"][0]) == len(fact)
    assert np.isclose(float(got["t"][0]), fact.v.sum())
    assert float(got["mx"][0]) == fact.v.max()


def test_unsupported_shape_falls_back(sess):
    """Plans outside the streamable surface run in-HBM even over budget
    (can_stage is honest; no wrong answers, no crash)."""
    s, fact, dim = sess
    f = (s.table("fact")
         .groupby("d").agg(fv=("first", col("v"))))  # 'first' unsupported
    assert not ST.should_stage(f.plan, s)
    got = f.collect()
    assert len(got) == fact["d"].nunique()


def test_tpcds_q3_shape_under_tiny_budget():
    """The done-criterion: a verbatim TPC-DS query at a scale whose join
    working set exceeds the configured budget, routed staged by the
    planner alone, exact vs the pandas oracle."""
    from auron_tpu.tpcds.runner import (QUERIES, frames_match,
                                        generate_cached,
                                        make_session_pruned)
    tables = generate_cached(2, 0, 0.0)
    for q in ("q3", "q43", "q55"):
        s = make_session_pruned(tables, [q], num_partitions=1)
        s.memory_budget = MemoryBudget(budget_bytes=TINY)
        build, oracle = QUERIES[q]
        frame = build(s)
        assert ST.should_stage(frame.plan, s), q
        got = frame.collect()
        assert s.metrics["planner"]["staged_executor"] >= 1, q
        assert frames_match(got, oracle(tables)), q
