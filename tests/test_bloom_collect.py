"""Bloom runtime filters + collect_list/collect_set aggregates."""

import jax.numpy as jnp
import numpy as np
import pandas as pd

from auron_tpu.block import TableBlock
from auron_tpu.expr.nodes import col, func
from auron_tpu.ops import bloom as B
from auron_tpu.parallel.partition import SinglePartitioning
from auron_tpu.plan import (Agg, AggCall, Exchange, Filter, MemoryScan,
                            Session, execute_plan)


def test_bloom_no_false_negatives(rng):
    n = 5000
    vals = rng.integers(0, 1 << 30, n)
    df = pd.DataFrame({"x": vals})
    b = TableBlock.from_pandas(df)
    m, k = B.optimal_params(n, fpp=0.03)
    bf = B.build_bloom(b["x"], b.row_mask, m, k)
    # every inserted value must probe positive
    hits = B.might_contain(bf, b["x"])
    assert bool(jnp.all(hits.values | ~b.row_mask))
    # false-positive rate on disjoint values must be low
    probe_df = pd.DataFrame({"x": rng.integers(1 << 31, 1 << 40, n)})
    pb = TableBlock.from_pandas(probe_df)
    fp = B.might_contain(bf, pb["x"])
    rate = float(jnp.sum(fp.values & pb.row_mask)) / n
    assert rate < 0.1, rate


def test_bloom_runtime_filter_in_plan(rng):
    n = 2000
    fact = pd.DataFrame({"k": rng.integers(0, 1000, n),
                         "v": rng.normal(size=n)})
    dim_keys = rng.choice(1000, 40, replace=False)
    dim = pd.DataFrame({"k2": dim_keys})
    s = Session()
    s.register_pandas("fact", fact)
    db = TableBlock.from_pandas(dim)
    m, k = B.optimal_params(len(dim))
    bf = B.build_bloom(db["k2"], db.row_mask, m, k)
    B.put_resource("rf1", bf)
    plan = Filter(MemoryScan("fact"),
                  func("might_contain", col("k"), params=("rf1",)))
    got = s.sql_result(plan)
    # superset of the true semi-join (bloom may keep false positives)
    true_keys = set(dim_keys.tolist())
    assert set(fact[fact["k"].isin(true_keys)].index).issubset(
        set(fact.index[fact["k"].isin(set(got["k"]))]))
    assert got["k"].isin(true_keys).mean() > 0.5  # mostly real hits


def test_collect_list_and_set(rng):
    df = pd.DataFrame({
        "g": [1, 1, 1, 2, 2, 3],
        "v": [5, 5, 7, 9, 9, 11],
    })
    s = Session().register_pandas("t", df)
    plan = Agg(Exchange(MemoryScan("t"), SinglePartitioning()),
               keys=(("g", col("g")),),
               calls=(AggCall("lst", "collect_list", col("v"), max_len=8),
                      AggCall("st", "collect_set", col("v"), max_len=8)),
               mode="single")
    blocks = execute_plan(plan, s)
    b = blocks[0]
    mask = np.asarray(b.row_mask)
    g = np.asarray(b["g"].values)[mask]
    lst_vals = np.asarray(b["lst#vals"].values)[mask]
    lst_len = np.asarray(b["lst#len"].values)[mask]
    st_len = np.asarray(b["st#len"].values)[mask]
    got = {int(gi): sorted(lst_vals[i, :lst_len[i]].tolist())
           for i, gi in enumerate(g)}
    assert got == {1: [5, 5, 7], 2: [9, 9], 3: [11]}
    got_set_lens = {int(gi): int(st_len[i]) for i, gi in enumerate(g)}
    assert got_set_lens == {1: 2, 2: 1, 3: 1}


def test_collect_feeds_explode(rng):
    """collect_list -> Generate(explode) round-trips the rows."""
    from auron_tpu.plan.nodes import Generate
    df = pd.DataFrame({"g": [1, 1, 2], "v": [4, 6, 8]})
    s = Session().register_pandas("t", df)
    agg = Agg(Exchange(MemoryScan("t"), SinglePartitioning()),
              keys=(("g", col("g")),),
              calls=(AggCall("lst", "collect_list", col("v"), max_len=4),),
              mode="single")
    plan = Generate(agg, "lst", kind="explode", out_name="v", out_capacity=16)
    got = s.sql_result(plan)
    want = df.sort_values(["g", "v"]).reset_index(drop=True)
    got = got.sort_values(["g", "v"]).reset_index(drop=True)
    np.testing.assert_array_equal(got["g"], want["g"])
    np.testing.assert_array_equal(got["v"], want["v"])


def test_build_bloom_plan_node(rng):
    from auron_tpu.plan.nodes import BuildBloom
    from auron_tpu.expr.nodes import func
    fact = pd.DataFrame({"k": rng.integers(0, 1000, 3000),
                         "v": rng.normal(size=3000)})
    dim = pd.DataFrame({"k2": rng.choice(1000, 50, replace=False)})
    s = Session()
    s.register_pandas("fact", fact)
    s.register_pandas("dim", dim)
    # tee the dim scan through BuildBloom, then semi-filter the fact scan
    bloom_side = BuildBloom(MemoryScan("dim"), "k2", "rf_dim", 50)
    execute_plan(bloom_side, s)  # builds + registers the filter
    plan = Filter(MemoryScan("fact"),
                  func("might_contain", col("k"), params=("rf_dim",)))
    got = s.sql_result(plan)
    true_keys = set(dim["k2"])
    # no false negatives
    assert set(fact[fact["k"].isin(true_keys)]["v"]).issubset(set(got["v"]))


def test_collection_functions(rng):
    """array/map/struct surface over plane columns (spark_map.rs parity)."""
    import jax.numpy as jnp
    from auron_tpu.block import Column, TableBlock
    from auron_tpu.dtypes import INT32, INT64
    from auron_tpu.expr.collections import make_map_columns, make_struct_columns
    from auron_tpu.expr.eval import evaluate, materialize
    from auron_tpu.expr.nodes import col, func, lit

    vals = jnp.asarray(np.array([[1, 2, 3], [4, 5, 0], [7, 0, 0]],
                                dtype=np.int64))
    keys = jnp.asarray(np.array([[10, 20, 30], [40, 50, 0], [70, 0, 0]],
                                dtype=np.int64))
    lens = jnp.asarray(np.array([3, 2, 1], dtype=np.int32))
    block = TableBlock({
        "arr#vals": Column.of(vals, INT64),
        "arr#len": Column.of(lens, INT32),
        "ks#vals": Column.of(keys, INT64),
        "ks#len": Column.of(lens, INT32),
    }, jnp.ones(3, dtype=bool))

    sz = materialize(evaluate(func("size", params=("arr",)), block), 3)
    assert list(np.asarray(sz.values)) == [3, 2, 1]

    has2 = materialize(evaluate(func("array_contains",
                                     params=("arr", 2)), block), 3)
    assert list(np.asarray(has2.values)) == [True, False, False]

    el = materialize(evaluate(func("element_at_array",
                                   params=("arr", 2)), block), 3)
    assert list(np.asarray(el.values)[np.asarray(el.validity)]) == [2, 5]

    block = make_map_columns(block, "m", "ks", "arr")
    got = materialize(evaluate(func("map_get", params=("m", 40)), block), 3)
    v = np.asarray(got.validity)
    assert list(np.asarray(got.values)[v]) == [4]

    rev = materialize(evaluate(func("array_reverse",
                                    params=("arr",)), block), 3)
    np.testing.assert_array_equal(np.asarray(rev.values)[0], [3, 2, 1])

    block = make_struct_columns(block, "st", a=lit(7), b=lit(8))
    assert "st.a" in block.names and "st.b" in block.names


def test_distributed_count_distinct(rng):
    """count_distinct over multiple partitions: rows co-locate by key via
    hash exchange, per-partition exact distinct (no single-point gather)."""
    import auron_tpu.plan.builder  # noqa: F401
    n = 3000
    df = pd.DataFrame({"g": rng.integers(0, 30, n),
                       "v": rng.integers(0, 40, n)})
    s = Session().register_pandas("t", df, num_partitions=4)
    out = (s.table("t").groupby("g")
           .agg(d=("count_distinct", col("v")),
                c=("count_star", None)).collect())
    want = df.groupby("g").agg(d=("v", "nunique"),
                               c=("v", "size")).reset_index()
    got = out.sort_values("g").reset_index(drop=True)
    want = want.sort_values("g").reset_index(drop=True)
    np.testing.assert_array_equal(got["g"], want["g"])
    np.testing.assert_array_equal(got["d"], want["d"])
    np.testing.assert_array_equal(got["c"], want["c"])
