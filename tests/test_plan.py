"""Plan executor end-to-end vs pandas oracles.

Differential-oracle style of the reference's AuronQueryTest (run each query
against a trusted engine and compare rows; SURVEY.md §4) with pandas as the
vanilla engine.
"""

import jax
import numpy as np
import pandas as pd
import pytest

from auron_tpu.expr.nodes import col, lit
from auron_tpu.ops.sort import SortKey
from auron_tpu.parallel.partition import (HashPartitioning,
                                          RangePartitioning,
                                          RoundRobinPartitioning,
                                          SinglePartitioning,
                                          sample_range_bounds)
from auron_tpu.plan import (Agg, AggCall, Coalesce, Exchange, Expand, Filter,
                            Join, Limit, MemoryScan, Project, Rename, Session,
                            Sort, Union, Window, execute_plan)
from auron_tpu.plan.nodes import Generate, ParquetScan


def _result(plan, session):
    return session.sql_result(plan)


from conftest import sorted_rows as _rows  # noqa: E402


@pytest.fixture
def sess(rng):
    n = 2000
    df = pd.DataFrame({
        "k": rng.integers(0, 50, n),
        "g": rng.choice(["a", "b", "c", "d"], n),
        "v": rng.normal(size=n).round(3),
        "w": rng.integers(0, 1000, n),
        "u": np.arange(n),  # unique id (window-order tiebreak)
    })
    dim = pd.DataFrame({
        "k2": np.arange(50),
        "name": [f"key{i}" for i in range(50)],
        "grp": [i % 5 for i in range(50)],
    })
    s = Session()
    s.register_pandas("fact", df, num_partitions=3)
    s.register_pandas("dim", dim, num_partitions=1)
    s._df = df
    s._dim = dim
    return s


def test_filter_project(sess):
    plan = Project(
        Filter(MemoryScan("fact"), col("v") > lit(0.0)),
        (("k", col("k")), ("v2", col("v") * lit(2.0))))
    got = _result(plan, sess)
    want = sess._df[sess._df["v"] > 0][["k", "v"]].copy()
    want["v2"] = want.pop("v") * 2
    assert _rows(got) == _rows(want)


def test_agg_single_mode(sess):
    plan = Agg(MemoryScan("fact"),
               keys=(("k", col("k")),),
               calls=(AggCall("s", "sum", col("v")),
                      AggCall("c", "count_star"),
                      AggCall("m", "max", col("w")),
                      AggCall("a", "avg", col("v"))),
               mode="single")
    # single-mode agg is per-partition; gather to one partition first
    plan = Agg(Exchange(MemoryScan("fact"), SinglePartitioning()),
               keys=(("k", col("k")),),
               calls=(AggCall("s", "sum", col("v")),
                      AggCall("c", "count_star"),
                      AggCall("m", "max", col("w")),
                      AggCall("a", "avg", col("v"))),
               mode="single")
    got = _result(plan, sess)
    want = sess._df.groupby("k").agg(
        s=("v", "sum"), c=("v", "size"), m=("w", "max"), a=("v", "mean")
    ).reset_index()
    assert _rows(got) == _rows(want)


def test_agg_partial_final(sess):
    partial = Agg(MemoryScan("fact"),
                  keys=(("k", col("k")),),
                  calls=(AggCall("s", "sum", col("v")),
                         AggCall("c", "count_star"),
                         AggCall("mn", "min", col("w")),
                         AggCall("a", "avg", col("v"))),
                  mode="partial")
    final = Agg(Exchange(partial, HashPartitioning(("k",), 4)),
                keys=(("k", col("k")),),
                calls=(AggCall("s", "sum", col("v")),
                       AggCall("c", "count_star"),
                       AggCall("mn", "min", col("w")),
                       AggCall("a", "avg", col("v"))),
                mode="final")
    got = _result(final, sess)
    want = sess._df.groupby("k").agg(
        s=("v", "sum"), c=("v", "size"), mn=("w", "min"), a=("v", "mean")
    ).reset_index()
    assert _rows(got) == _rows(want)


def test_agg_string_keys_direct_path(sess):
    partial = Agg(MemoryScan("fact"), keys=(("g", col("g")),),
                  calls=(AggCall("c", "count_star"),
                         AggCall("s", "sum", col("w"))),
                  mode="partial")
    final = Agg(Exchange(partial, HashPartitioning(("g",), 2)),
                keys=(("g", col("g")),),
                calls=(AggCall("c", "count_star"),
                       AggCall("s", "sum", col("w"))),
                mode="final")
    got = _result(final, sess)
    want = sess._df.groupby("g").agg(
        c=("g", "size"), s=("w", "sum")).reset_index()
    assert _rows(got) == _rows(want)


def test_agg_with_filter_clause(sess):
    plan = Agg(Exchange(MemoryScan("fact"), SinglePartitioning()),
               keys=(("k", col("k")),),
               calls=(AggCall("cpos", "count_star", filter=col("v") > lit(0.0)),
                      AggCall("spos", "sum", col("v"),
                              filter=col("v") > lit(0.0))),
               mode="single")
    got = _result(plan, sess)
    df = sess._df
    want = df.groupby("k").apply(
        lambda g: pd.Series({
            "cpos": int((g["v"] > 0).sum()),
            "spos": g.loc[g["v"] > 0, "v"].sum()}),
        include_groups=False).reset_index()
    assert _rows(got) == _rows(want)


def test_broadcast_join(sess):
    plan = Join(MemoryScan("fact"), MemoryScan("dim"),
                ("k",), ("k2",), join_type="inner", strategy="broadcast")
    got = _result(plan, sess)
    want = sess._df.merge(sess._dim, left_on="k", right_on="k2")
    assert _rows(got) == _rows(want)


def test_partitioned_join(sess):
    n = 4
    left = Exchange(MemoryScan("fact"), HashPartitioning(("k",), n))
    right = Exchange(MemoryScan("dim"), HashPartitioning(("k2",), n))
    plan = Join(left, right, ("k",), ("k2",), join_type="left",
                strategy="partitioned")
    got = _result(plan, sess)
    want = sess._df.merge(sess._dim, left_on="k", right_on="k2", how="left")
    assert _rows(got) == _rows(want)


def test_build_left_join(sess):
    plan = Join(MemoryScan("dim"), MemoryScan("fact"),
                ("k2",), ("k",), join_type="inner", strategy="broadcast",
                build="left", out_capacity=1 << 13)
    got = _result(plan, sess)
    want = sess._dim.merge(sess._df, left_on="k2", right_on="k")
    assert _rows(got) == _rows(want)


def test_global_sort_with_range_exchange(sess):
    keys = (SortKey("w", ascending=False), SortKey("k"))
    blocks = sess.tables["fact"]
    bounds = sample_range_bounds(blocks, keys, 3)
    plan = Sort(Exchange(MemoryScan("fact"),
                         RangePartitioning(keys, 3, bounds)), keys)
    blocks_out = execute_plan(plan, sess)
    dfs = [b.to_pandas() for b in blocks_out]
    got = pd.concat(dfs, ignore_index=True)
    want = sess._df.sort_values(["w", "k"], ascending=[False, True],
                                kind="stable")
    np.testing.assert_array_equal(got["w"].to_numpy(), want["w"].to_numpy())
    # partition boundaries must respect global order (desc on w)
    maxes = [d["w"].max() for d in dfs if len(d)]
    mins = [d["w"].min() for d in dfs if len(d)]
    for i in range(len(maxes) - 1):
        assert mins[i] >= maxes[i + 1]


def test_top_k(sess):
    plan = Sort(Exchange(
        Sort(MemoryScan("fact"), (SortKey("w"),), fetch=10),
        SinglePartitioning()), (SortKey("w"),), fetch=10)
    got = _result(plan, sess)
    want = sess._df.nsmallest(10, "w")
    assert list(got["w"]) == list(want["w"])


def test_limit_union_rename_coalesce(sess):
    lim = Limit(MemoryScan("fact"), 5)
    got = _result(lim, sess)
    assert len(got) == 15  # 5 per partition x 3 partitions

    u = Union((MemoryScan("dim"), MemoryScan("dim")))
    got = _result(u, sess)
    assert len(got) == 2 * len(sess._dim)

    r = Rename(MemoryScan("dim"), (("k2", "key"),))
    got = _result(r, sess)
    assert "key" in got.columns and "k2" not in got.columns

    c = Coalesce(MemoryScan("fact"), 1)
    got = _result(c, sess)
    assert len(got) == len(sess._df)


def test_expand_rollup(sess):
    # ROLLUP-style: (k, w) and (k, NULL)
    plan = Expand(MemoryScan("fact"), (
        (("k", col("k")), ("v", col("v"))),
        (("k", col("k")), ("v", lit(None, dtype=None) if False else
                           col("v") * lit(0.0))),
    ))
    got = _result(plan, sess)
    assert len(got) == 2 * len(sess._df)


def test_round_robin_exchange(sess):
    plan = Exchange(MemoryScan("fact"), RoundRobinPartitioning(4))
    blocks = execute_plan(plan, sess)
    sizes = [int(b.num_rows()) for b in blocks]
    assert sum(sizes) == len(sess._df)
    assert max(sizes) - min(sizes) <= 3  # balanced


def test_window_functions(sess):
    from auron_tpu.ops.window import WindowFunc
    plan = Window(Exchange(MemoryScan("fact"), SinglePartitioning()),
                  partition_by=("g",), order_by=(SortKey("w"), SortKey("u")),
                  funcs=(WindowFunc("rn", "row_number"),
                         WindowFunc("rk", "rank"),
                         WindowFunc("dr", "dense_rank"),
                         WindowFunc("cs", "sum", input="v"),
                         WindowFunc("ld", "lead", input="w", offset=1)))
    got = _result(plan, sess)
    df = sess._df.sort_values(["g", "w", "u"], kind="stable")
    grp = df.groupby("g")
    want = df.copy()
    want["rn"] = grp.cumcount() + 1
    want["rk"] = grp["w"].rank(method="min").astype(np.int64)  # note: rank by w only
    want["dr"] = grp["w"].rank(method="dense").astype(np.int64)
    want["cs"] = grp["v"].cumsum()
    want["ld"] = grp["w"].shift(-1)
    # ties: our rank/dense over (w, k) vs pandas over w — with k tiebreak the
    # (w,k) pairs are almost surely unique; compare via joint sort
    got_s = got.sort_values(["g", "w", "u"], kind="stable").reset_index(drop=True)
    want_s = want.reset_index(drop=True)
    np.testing.assert_array_equal(got_s["rn"], want_s["rn"])
    np.testing.assert_allclose(got_s["cs"], want_s["cs"], rtol=1e-6)
    lead_got = got_s["ld"].to_numpy(dtype=float)
    lead_want = want_s["ld"].to_numpy(dtype=float)
    np.testing.assert_array_equal(np.isnan(lead_got), np.isnan(lead_want))
    np.testing.assert_array_equal(lead_got[~np.isnan(lead_got)],
                                  lead_want[~np.isnan(lead_want)])


def test_window_group_limit(sess):
    from auron_tpu.ops.window import WindowFunc
    plan = Window(Exchange(MemoryScan("fact"), SinglePartitioning()),
                  partition_by=("g",), order_by=(SortKey("w"), SortKey("k")),
                  funcs=(WindowFunc("rn", "row_number"),),
                  group_limit=3)
    got = _result(plan, sess)
    assert len(got) == 4 * 3  # 4 groups x top-3
    assert (got.groupby("g").size() == 3).all()


def test_generate_explode():
    import jax.numpy as jnp
    from auron_tpu.block import Column, TableBlock
    from auron_tpu.dtypes import INT32, INT64
    vals = jnp.asarray(np.array([[1, 2, 3], [4, 0, 0], [0, 0, 0], [5, 6, 0]],
                                dtype=np.int64))
    lens = jnp.asarray(np.array([3, 1, 0, 2], dtype=np.int32))
    ids = jnp.asarray(np.array([10, 20, 30, 40], dtype=np.int64))
    block = TableBlock(
        {"id": Column.of(ids, INT64),
         "arr#vals": Column.of(vals, INT64),
         "arr#len": Column.of(lens, INT32)},
        jnp.ones(4, dtype=bool))
    s = Session().register("t", block)
    plan = Generate(MemoryScan("t"), "arr", kind="posexplode",
                    out_capacity=16)
    got = _result(plan, s)
    want = pd.DataFrame({
        "id": [10, 10, 10, 20, 40, 40],
        "pos": [0, 1, 2, 0, 0, 1],
        "col": [1, 2, 3, 4, 5, 6]})
    assert _rows(got) == _rows(want)
    # OUTER keeps empty-array rows with NULL element
    plan = Generate(MemoryScan("t"), "arr", kind="explode", outer=True,
                    out_capacity=16)
    got = _result(plan, s)
    assert len(got) == 7 and got["col"].isna().sum() == 1


def test_parquet_roundtrip(tmp_path, sess):
    from auron_tpu.io.parquet import write_parquet
    path = str(tmp_path / "fact.parquet")
    write_parquet(sess.tables["fact"], path)
    plan = Filter(ParquetScan((path,), num_partitions=2),
                  col("w") < lit(100))
    got = _result(plan, sess)
    want = sess._df[sess._df["w"] < 100]
    assert _rows(got) == _rows(want)


def test_whole_plan_jit(sess):
    """A full stage jits into one XLA program over block pytrees."""
    blocks = sess.tables["fact"]

    def stage(blocks):
        s = Session()
        s.register("fact", blocks)
        partial = Agg(MemoryScan("fact"), keys=(("k", col("k")),),
                      calls=(AggCall("s", "sum", col("v")),), mode="partial")
        final = Agg(Exchange(partial, HashPartitioning(("k",), 2)),
                    keys=(("k", col("k")),),
                    calls=(AggCall("s", "sum", col("v")),), mode="final")
        return execute_plan(final, s)

    jitted = jax.jit(stage)
    out = jitted(blocks)
    got = pd.concat([b.to_pandas() for b in out], ignore_index=True)
    want = sess._df.groupby("k").agg(s=("v", "sum")).reset_index()
    assert _rows(got) == _rows(want)


def test_plan_wire_roundtrip(sess):
    """The JSON wire contract (auron.proto analog) reproduces results."""
    from auron_tpu.plan.wire import plan_from_json, plan_to_json
    plan = Agg(Exchange(
        Join(Filter(MemoryScan("fact"), col("v") > lit(0.0)),
             MemoryScan("dim"), ("k",), ("k2",), strategy="broadcast",
             out_capacity=4096),
        HashPartitioning(("grp",), 2)),
        keys=(("grp", col("grp")),),
        calls=(AggCall("s", "sum", col("v")), AggCall("c", "count_star")),
        mode="single")
    data = plan_to_json(plan)
    plan2 = plan_from_json(data)
    a = _result(plan, sess)
    b = _result(plan2, sess)
    assert _rows(a) == _rows(b)
    assert len(data) > 100
