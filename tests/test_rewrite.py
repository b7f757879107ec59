"""Null-rejection join reassociation (plan/rewrite.py) — the q93-class
rewrite: (A LEFT B) INNER C on B.x=C.y  ==  A INNER (B INNER C).

Reference analog: Spark's EliminateOuterJoin + predicate pushdown run
before AuronConvertStrategy ever sees a plan; this engine owns its
planner, so the rewrite (and its safety conditions) are tested here."""

import numpy as np
import pandas as pd

from auron_tpu import config
from auron_tpu.expr.nodes import col, lit
from auron_tpu.ops.sort import SortKey
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


# ---------------------------------------------------------------------------
# Inner-join reordering (reorder_inner_joins): measured-selectivity greedy
# with dependency respect — the q25-class rewrite.
# ---------------------------------------------------------------------------

def _star_tables(s: Session):
    rng = np.random.default_rng(7)
    n = 20_000
    fact = pd.DataFrame({
        "f_date": rng.integers(0, 1000, n).astype(np.int64),
        "f_item": rng.integers(0, 200, n).astype(np.int64),
        "f_v": rng.normal(size=n)})
    dates = pd.DataFrame({"d_sk": np.arange(1000, dtype=np.int64),
                          "d_year": (np.arange(1000) // 100).astype(np.int64)})
    items = pd.DataFrame({"i_sk": np.arange(200, dtype=np.int64),
                          "i_brand": (np.arange(200) % 13).astype(np.int64)})
    other = pd.DataFrame({
        "o_item": rng.integers(0, 200, 5000).astype(np.int64),
        "o_w": rng.integers(0, 9, 5000).astype(np.int64)})
    s.register_pandas("fact", fact)
    s.register_pandas("dates", dates)
    s.register_pandas("items", items)
    s.register_pandas("other", other)
    return fact, dates, items, other


def test_reorder_moves_selective_dim_first():
    from auron_tpu.plan.rewrite import reorder_inner_joins
    s = Session()
    fact, dates, items, other = _star_tables(s)
    # original order: expanding fact-fact join FIRST, selective date LAST
    f = (table(s, "fact")
         .join(table(s, "other"), ("f_item",), ("o_item",))
         .join(table(s, "items"), ("f_item",), ("i_sk",))
         .join(table(s, "dates").filter(col("d_year") == lit(3)),
               ("f_date",), ("d_sk",)))
    new = reorder_inner_joins(f.plan, s)
    joins = _find_joins(new, [])
    # spine top-down is [last applied ... first applied]: the selective
    # filtered date join must now be FIRST (deepest), the fan-out join last
    spine = [j.right_keys for j in joins]
    assert spine[0] == ("o_item",), spine
    assert spine[-1] == ("d_sk",), spine
    # differential, eager + jit
    want = (fact.merge(other, left_on="f_item", right_on="o_item")
            .merge(items, left_on="f_item", right_on="i_sk")
            .merge(dates[dates["d_year"] == 3],
                   left_on="f_date", right_on="d_sk"))
    got = f.collect()
    cols = want.columns.tolist()
    assert sorted_rows(got[cols]) == sorted_rows(want)
    got_jit = f.collect(jit=True)
    assert sorted_rows(got_jit[cols]) == sorted_rows(want)


def test_reorder_respects_dependencies():
    """A join keyed on ANOTHER build side's output can only run after it:
    dim2 joins on other's o_w column, so it must stay after other even
    though it is more selective."""
    from auron_tpu.plan.rewrite import reorder_inner_joins
    s = Session()
    fact, dates, items, other = _star_tables(s)
    dim2 = pd.DataFrame({"w_sk": np.arange(9, dtype=np.int64),
                         "w_tag": np.arange(9, dtype=np.int64) * 10})
    s.register_pandas("dim2", dim2)
    f = (table(s, "fact")
         .join(table(s, "other"), ("f_item",), ("o_item",))
         .join(table(s, "dim2").filter(col("w_tag") <= lit(10)),
               ("o_w",), ("w_sk",))
         .join(table(s, "dates").filter(col("d_year") == lit(3)),
               ("f_date",), ("d_sk",)))
    new = reorder_inner_joins(f.plan, s)
    joins = _find_joins(new, [])
    order_bottom_up = [j.right_keys for j in reversed(joins)]
    # date first (selective, ready); dim2 only after other
    assert order_bottom_up.index(("o_item",)) < \
        order_bottom_up.index(("w_sk",))
    assert order_bottom_up[0] == ("d_sk",)
    want = (fact.merge(other, left_on="f_item", right_on="o_item")
            .merge(dim2[dim2["w_tag"] <= 10], left_on="o_w",
                   right_on="w_sk")
            .merge(dates[dates["d_year"] == 3],
                   left_on="f_date", right_on="d_sk"))
    got = f.collect()
    assert sorted_rows(got[want.columns.tolist()]) == sorted_rows(want)


def test_reorder_barrier_on_outer_join():
    """Outer joins are spine barriers: nothing moves across them."""
    from auron_tpu.plan.rewrite import reorder_inner_joins
    s = Session()
    fact, dates, items, other = _star_tables(s)
    f = (table(s, "fact")
         .join(table(s, "other"), ("f_item",), ("o_item",), how="left",
               strategy="partitioned")
         .join(table(s, "dates").filter(col("d_year") == lit(3)),
               ("f_date",), ("d_sk",)))
    before = [j.right_keys for j in _find_joins(f.plan, [])]
    new = reorder_inner_joins(f.plan, s)
    after = [j.right_keys for j in _find_joins(new, [])]
    assert before == after


# ---------------------------------------------------------------------------
# Rollup re-aggregation (reaggregate_rollups): UNION of grouping sets over
# one shared child -> finest agg once + re-agg per level (q67-class).
# ---------------------------------------------------------------------------

def _count_fact_aggs(p):
    import dataclasses
    seen, acc = set(), []

    def walk(n):
        if id(n) in seen or not dataclasses.is_dataclass(n):
            return
        seen.add(id(n))
        if isinstance(n, PN.Agg) and not isinstance(n.child, PN.Agg):
            acc.append(n)
        for f in dataclasses.fields(n):
            v = getattr(n, f.name)
            for x in (v if isinstance(v, tuple) else [v]):
                if isinstance(x, PN.PlanNode):
                    walk(x)
    walk(p)
    return len(acc)


def test_rollup_reaggregates_from_finest_level():
    s = Session()
    rng = np.random.default_rng(11)
    n = 6000
    df = pd.DataFrame({
        "a": rng.integers(0, 5, n).astype(np.int64),
        "b": rng.integers(0, 7, n).astype(np.int64),
        "v": rng.integers(0, 100, n).astype(np.int64)})
    s.register_pandas("t", df)
    t = table(s, "t")
    lv2 = t.groupby("a", "b").agg(sv=("sum", col("v")),
                                  cnt=("count_star", None),
                                  mx=("max", col("v")))
    lv1 = t.groupby("a").agg(sv=("sum", col("v")),
                             cnt=("count_star", None),
                             mx=("max", col("v"))) \
        .with_columns(b=lit(-1)).select("a", "b", "sv", "cnt", "mx")
    lv2s = lv2.select("a", "b", "sv", "cnt", "mx")
    u = lv2s.union(lv1)
    pruned = prune_plan(u.plan, s)
    assert _count_fact_aggs(u.plan) == 2
    assert _count_fact_aggs(pruned) == 1
    # differential: engine result (which executes the pruned/rewritten
    # plan) matches the two-level pandas rollup, eager and jit
    g2 = df.groupby(["a", "b"]).agg(sv=("v", "sum"), cnt=("v", "size"),
                                    mx=("v", "max")).reset_index()
    g1 = df.groupby(["a"]).agg(sv=("v", "sum"), cnt=("v", "size"),
                               mx=("v", "max")).reset_index()
    g1["b"] = np.int64(-1)
    want = pd.concat([g2, g1[g2.columns.tolist()]], ignore_index=True)
    got = u.collect()
    assert sorted_rows(got[want.columns.tolist()]) == sorted_rows(want)
    got_jit = u.collect(jit=True)
    assert sorted_rows(got_jit[want.columns.tolist()]) == sorted_rows(want)


def test_rollup_reaggregates_avg_via_partial_final():
    """avg RE-AGGREGATES exactly through the shared-partial scheme (sum +
    count state merges under regrouping) — the q22-class shape."""
    s = Session()
    rng = np.random.default_rng(13)
    df = pd.DataFrame({"a": rng.integers(0, 4, 3000).astype(np.int64),
                       "b": rng.integers(0, 3, 3000).astype(np.int64),
                       "v": rng.normal(size=3000) * 50})
    s.register_pandas("t", df)
    t = table(s, "t")
    lv2 = t.groupby("a", "b").agg(m=("avg", col("v"))) \
        .select("a", "b", "m")
    lv1 = t.groupby("a").agg(m=("avg", col("v"))) \
        .with_columns(b=lit(-1)).select("a", "b", "m")
    u = lv2.union(lv1)
    pruned = prune_plan(u.plan, s)
    assert _count_fact_aggs(pruned) == 1  # one shared partial
    g2 = df.groupby(["a", "b"]).agg(m=("v", "mean")).reset_index()
    g1 = df.groupby(["a"]).agg(m=("v", "mean")).reset_index()
    g1["b"] = np.int64(-1)
    want = pd.concat([g2, g1[g2.columns.tolist()]], ignore_index=True)
    for jit in (False, True):
        got = u.collect(jit=jit)
        assert sorted_rows(got[want.columns.tolist()]) == sorted_rows(want)


def test_rollup_skips_non_reaggregable():
    """collect_set state cannot merge through partial/final — no rewrite."""
    s = Session()
    df = pd.DataFrame({"a": np.arange(100, dtype=np.int64) % 4,
                       "b": np.arange(100, dtype=np.int64) % 3,
                       "v": np.arange(100, dtype=np.int64) % 7})
    s.register_pandas("t", df)
    t = table(s, "t")
    lv2 = t.groupby("a", "b").agg(m=("collect_set", col("v")))
    lv1 = t.groupby("a").agg(m=("collect_set", col("v"))) \
        .with_columns(b=lit(-1))
    u = lv2.select("a", "b", "m#vals", "m#len").union(
        lv1.select("a", "b", "m#vals", "m#len"))
    pruned = prune_plan(u.plan, s)
    assert _count_fact_aggs(pruned) == 2  # untouched


def test_shared_subtree_pruned_once_with_union_of_needs():
    """Two consumers needing DIFFERENT columns of one shared agg: pruning
    must keep the agg a single shared node (union of needs), not split it
    into per-consumer copies that each execute."""
    s = Session()
    df = pd.DataFrame({"k": np.arange(50, dtype=np.int64) % 5,
                       "x": np.arange(50, dtype=np.int64),
                       "y": np.arange(50, dtype=np.int64) * 2})
    s.register_pandas("t", df)
    base = table(s, "t").groupby("k").agg(sx=("sum", col("x")),
                                          sy=("sum", col("y")))
    left = base.select("k", "sx")
    right = base.select(k2=col("k"), sy=col("y" "s"[0] + "y")) \
        if False else base.select("k", "sy")
    u = left.union(right.rename(sy="sx"))
    pruned = prune_plan(u.plan, s)
    aggs = []
    import dataclasses

    def walk(n, seen):
        if id(n) in seen or not dataclasses.is_dataclass(n):
            return
        seen.add(id(n))
        if isinstance(n, PN.Agg):
            aggs.append(n)
        for f in dataclasses.fields(n):
            v = getattr(n, f.name)
            for x in (v if isinstance(v, tuple) else [v]):
                if isinstance(x, PN.PlanNode):
                    walk(x, seen)
    walk(pruned, set())
    assert len(aggs) == 1, [a.calls for a in aggs]
    # and the single agg kept BOTH call columns (union of needs)
    assert sorted(c.name for c in aggs[0].calls) == ["sx", "sy"]


def test_prepass_roots_skips_rollup_agg(monkeypatch):
    """The calibration prepass must execute joins/filters but NOT the
    rollup aggregation above them (q67-class: a 50M-row host aggregation
    recorded nothing). Interval-dim elimination is disabled so the join
    survives as the measured root (its own test is below)."""
    from auron_tpu import config as _c
    monkeypatch.setitem(_c.conf._overrides,
                        "auron.optimizer.dim.interval.prune", False)
    from auron_tpu.runtime.calibrate import prepass_roots
    s = Session()
    fact, dates, items, other = _star_tables(s)
    j = (table(s, "fact")
         .join(table(s, "dates").filter(col("d_year") == lit(3)),
               ("f_date",), ("d_sk",)))
    lv2 = j.groupby("f_date", "f_item").agg(sv=("sum", col("f_v")))
    lv1 = j.groupby("f_date").agg(sv=("sum", col("f_v")))
    u = lv2.select("f_date", "f_item", "sv").union(
        lv1.with_columns(f_item=lit(-1)).select("f_date", "f_item", "sv"))
    top = u.sort(SortKey("f_date"), SortKey("f_item"), limit=10)
    pruned = prune_plan(top.plan, s)
    roots = prepass_roots(pruned)
    # exactly one measured root: the (shared) join — no Agg/Sort/Union
    assert len(roots) == 1 and isinstance(roots[0], PN.Join)
    # a filter ABOVE an agg is not a root; the join below it is
    f2 = (table(s, "fact").groupby("f_item")
          .agg(sv=("sum", col("f_v")))
          .filter(col("sv") > lit(0.0)))
    roots2 = prepass_roots(prune_plan(f2.plan, s))
    assert roots2 == []  # scan-only below the agg: nothing measured
    # jit end-to-end still exact with the trimmed prepass
    got = top.collect(jit=True)
    assert len(got) == 10


def test_execute_forest_shares_common_subtrees():
    from auron_tpu.plan.execute import execute_forest
    from auron_tpu.plan import nodes as PN2
    s = Session()
    df = pd.DataFrame({"k": np.arange(100, dtype=np.int64) % 5,
                       "v": np.arange(100, dtype=np.float64)})
    s.register_pandas("t", df)
    base = PN2.Filter(PN2.MemoryScan("t"), col("v") >= lit(0.0))
    r1 = PN2.Filter(base, col("k") == lit(1))
    r2 = PN2.Filter(base, col("k") == lit(2))
    out = execute_forest([r1, r2], s)
    assert len(out) == 2
    import numpy as _np
    n1 = sum(int(_np.asarray(b.row_mask).sum()) for b in out[0])
    n2 = sum(int(_np.asarray(b.row_mask).sum()) for b in out[1])
    assert n1 == 20 and n2 == 20


def test_reorder_moves_dims_past_semi_join():
    """Semi/anti joins are pure probe filters: selective dimension joins
    may move below them, and results stay exact."""
    from auron_tpu.plan.rewrite import reorder_inner_joins
    s = Session()
    fact, dates, items, other = _star_tables(s)
    sub = pd.DataFrame({"s_item": np.arange(0, 200, 3, dtype=np.int64)})
    s.register_pandas("sub", sub)
    f = (table(s, "fact")
         .join(table(s, "sub"), ("f_item",), ("s_item",), how="left_semi")
         .join(table(s, "items"), ("f_item",), ("i_sk",))
         .join(table(s, "dates").filter(col("d_year") == lit(3)),
               ("f_date",), ("d_sk",)))
    new = reorder_inner_joins(f.plan, s)
    joins = _find_joins(new, [])
    order_bottom_up = [j.right_keys for j in reversed(joins)]
    assert order_bottom_up[0] == ("d_sk",)  # selective dim moved first
    want = fact[fact["f_item"].isin(sub["s_item"])]
    want = (want.merge(items, left_on="f_item", right_on="i_sk")
            .merge(dates[dates["d_year"] == 3],
                   left_on="f_date", right_on="d_sk"))
    for jit in (False, True):
        got = f.collect(jit=jit)
        assert sorted_rows(got[want.columns.tolist()]) == sorted_rows(want)


def test_reorder_anti_join_stays_exact():
    from auron_tpu.plan.rewrite import reorder_inner_joins
    s = Session()
    fact, dates, items, other = _star_tables(s)
    sub = pd.DataFrame({"s_item": np.arange(0, 200, 4, dtype=np.int64)})
    s.register_pandas("sub2", sub)
    f = (table(s, "fact")
         .join(table(s, "sub2"), ("f_item",), ("s_item",), how="left_anti")
         .join(table(s, "dates").filter(col("d_year") == lit(3)),
               ("f_date",), ("d_sk",)))
    new = reorder_inner_joins(f.plan, s)
    order_bottom_up = [j.right_keys for j in
                       reversed(_find_joins(new, []))]
    assert order_bottom_up[0] == ("d_sk",)
    want = fact[~fact["f_item"].isin(sub["s_item"])]
    want = want.merge(dates[dates["d_year"] == 3],
                      left_on="f_date", right_on="d_sk")
    got = f.collect()
    assert sorted_rows(got[want.columns.tolist()]) == sorted_rows(want)


def test_interval_dim_elimination_matches_join():
    """The DPP analog: an inner broadcast join against a filtered
    sequential dimension whose surviving keys are one contiguous run and
    whose other surviving columns are constant rewrites to a range
    predicate + literal injection — same rows, no join."""
    from auron_tpu import config as _c
    from auron_tpu.plan.prune import prune_plan
    from auron_tpu.plan.rewrite import prune_interval_dims
    s = Session()
    fact, dates, items, other = _star_tables(s)
    f = (table(s, "fact")
         .join(table(s, "dates").filter(col("d_year") == lit(3)),
               ("f_date",), ("d_sk",))
         .groupby("d_year").agg(t=("sum", col("f_v")),
                                n=("count_star", None)))
    pruned = prune_plan(f.plan, s)
    txt = pruned.pretty() if hasattr(pruned, "pretty") else repr(pruned)
    assert "Join" not in txt, "dimension join should be eliminated"
    got = f.collect().reset_index(drop=True)
    w = fact.merge(dates[dates.d_year == 3], left_on="f_date",
                   right_on="d_sk")
    want = w.groupby("d_year").agg(t=("f_v", "sum"),
                                   n=("f_v", "size")).reset_index()
    assert (got["n"].values == want["n"].values).all()
    assert np.allclose(got["t"], want["t"], rtol=1e-9)
    assert (got["d_year"].values == want["d_year"].values).all()
    # non-contiguous key sets split into runs (d_year in {1, 3})
    f2 = (table(s, "fact")
          .join(table(s, "dates").filter((col("d_year") == lit(1)) |
                                         (col("d_year") == lit(3))),
                ("f_date",), ("d_sk",))
          .groupby().agg(n=("count_star", None)))
    assert "Join" not in repr(prune_plan(f2.plan, s))
    got2 = int(f2.collect()["n"][0])
    want2 = len(fact[((fact.f_date // 100) == 1) |
                     ((fact.f_date // 100) == 3)])
    assert got2 == want2
    # a NON-constant surviving dim column blocks the rewrite
    f3 = (table(s, "fact")
          .join(table(s, "dates").filter(col("d_sk") < lit(250)),
                ("f_date",), ("d_sk",))
          .groupby("d_year").agg(n=("count_star", None)))
    assert "Join" in repr(prune_plan(f3.plan, s))
    got3 = f3.collect().sort_values("d_year").reset_index(drop=True)
    w3 = fact.merge(dates[dates.d_sk < 250], left_on="f_date",
                    right_on="d_sk")
    want3 = w3.groupby("d_year").size().reset_index(name="n") \
        .sort_values("d_year").reset_index(drop=True)
    assert (got3["n"].values == want3["n"].values).all()
