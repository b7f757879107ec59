"""Randomized differential fuzzing.

The reference's tier-1 strategy (SURVEY.md §4): random data vs a trusted
oracle under tiny resource budgets that force the stress paths — here:
random dtypes/nulls/duplicates for joins+aggs vs pandas, tiny exchange pair
capacities that REQUIRE the skew handler, and randomized window frames.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from auron_tpu.block import TableBlock
from auron_tpu.ops import join as J
from auron_tpu.ops.sort import SortKey
from auron_tpu.plan import (Agg, AggCall, Exchange, MemoryScan, Session,
                            execute_plan)
from auron_tpu.parallel.partition import HashPartitioning

from conftest import sorted_rows


def _rand_frame(rng, n, null_p=0.15, key_card=20):
    df = pd.DataFrame({
        "k": rng.integers(0, key_card, n),
        "f": rng.normal(size=n).round(3),
        "i": rng.integers(-1000, 1000, n),
        "s": rng.choice(["aa", "bb", "cc", "dd", None], n,
                        p=[0.3, 0.3, 0.2, 0.1, 0.1]),
        "b": rng.random(n) < 0.5,
    })
    mask = rng.random(n) < null_p
    df.loc[mask, "f"] = np.nan
    return df


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_fuzz_join_all_types(seed):
    rng = np.random.default_rng(seed)
    n_l, n_r = rng.integers(50, 400), rng.integers(20, 300)
    card = int(rng.integers(3, 40))
    l = _rand_frame(rng, n_l, key_card=card)
    r = pd.DataFrame({"j": rng.integers(0, card, n_r),
                      "w": rng.normal(size=n_r).round(3)})
    # null keys on both sides
    l.loc[rng.random(n_l) < 0.1, "k"] = np.nan
    r.loc[rng.random(n_r) < 0.1, "j"] = np.nan
    lb, rb = TableBlock.from_pandas(l), TableBlock.from_pandas(r)

    lk_valid = l["k"].notna()
    rk_valid = r["j"].notna()
    inner = l[lk_valid].merge(r[rk_valid], left_on="k", right_on="j")

    got = J.join_blocks(lb, rb, J.JoinSpec(("k",), ("j",), J.INNER),
                        out_capacity=1 << 14).to_pandas()
    assert sorted_rows(got) == sorted_rows(inner)

    got = J.join_blocks(lb, rb, J.JoinSpec(("k",), ("j",), J.LEFT_SEMI)
                        ).to_pandas()
    want = l[l["k"].isin(set(r.loc[rk_valid, "j"]))]
    assert sorted_rows(got) == sorted_rows(want)

    got = J.join_blocks(lb, rb, J.JoinSpec(("k",), ("j",), J.LEFT_ANTI)
                        ).to_pandas()
    want = l[~l["k"].isin(set(r.loc[rk_valid, "j"]))]
    assert sorted_rows(got) == sorted_rows(want)


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_fuzz_agg_partial_final(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(200, 3000))
    df = _rand_frame(rng, n, key_card=int(rng.integers(2, 50)))
    s = Session().register_pandas("t", df, num_partitions=3)
    partial = Agg(MemoryScan("t"), keys=(("k", __import__(
        "auron_tpu.expr.nodes", fromlist=["col"]).col("k")),),
        calls=(AggCall("sf", "sum", _c("f")),
               AggCall("si", "sum", _c("i")),
               AggCall("mn", "min", _c("f")),
               AggCall("mx", "max", _c("i")),
               AggCall("c", "count", _c("f")),
               AggCall("cs", "count_star")),
        mode="partial")
    final = Agg(Exchange(partial, HashPartitioning(("k",), 3)),
                keys=partial.keys, calls=partial.calls, mode="final")
    blocks = execute_plan(final, s)
    got = pd.concat([b.to_pandas() for b in blocks], ignore_index=True)
    want = df.groupby("k").agg(
        sf=("f", "sum"), si=("i", "sum"), mn=("f", "min"), mx=("i", "max"),
        c=("f", "count"), cs=("k", "size")).reset_index()
    # pandas sum of all-NaN group is 0.0; SQL gives NULL — align
    allnan = df.groupby("k")["f"].apply(lambda g: g.isna().all())
    want.loc[want["k"].map(allnan).fillna(False), "sf"] = np.nan
    assert sorted_rows(got) == sorted_rows(want)


def _c(name):
    from auron_tpu.expr.nodes import col
    return col(name)


@pytest.mark.parametrize("seed", [21, 22])
def test_fuzz_tiny_exchange_capacity_with_skew_handler(seed):
    """Pair capacity so small that plain hash routing MUST drop rows for a
    hot key; the skewed join still conserves every row."""
    from jax.sharding import Mesh
    from auron_tpu.plan import Join
    from auron_tpu.parallel.spmd import run_plan_spmd, unstack_result
    rng = np.random.default_rng(seed)
    n = 2048
    hot = rng.random(n) < 0.6
    keys = np.where(hot, 3, rng.integers(0, 64, n))
    fact = pd.DataFrame({"k": keys.astype(np.int32),
                         "v": rng.normal(size=n).round(3)})
    dim = pd.DataFrame({"j": np.arange(64, dtype=np.int32),
                        "w": np.arange(64, dtype=np.int32) * 2})
    parts = np.array_split(np.arange(n), 8)
    tables = {"fact": [TableBlock.from_pandas(fact.iloc[i], capacity=256)
                       for i in parts],
              "dim": [TableBlock.from_pandas(dim, capacity=64)]}
    mesh = Mesh(np.array(jax.devices()[:8]), ("p",))
    plan = Join(MemoryScan("fact"), MemoryScan("dim"), ("k",), ("j",),
                join_type="inner", strategy="skewed", out_capacity=1024)
    stacked = run_plan_spmd(plan, mesh, tables)
    got = pd.concat([b.to_pandas() for b in unstack_result(stacked)],
                    ignore_index=True)
    want = fact.merge(dim, left_on="k", right_on="j")
    assert sorted_rows(got) == sorted_rows(want)


@pytest.mark.parametrize("seed", [31, 32])
def test_fuzz_window_vs_pandas(seed):
    from auron_tpu.ops.window import WindowFunc, window_block
    rng = np.random.default_rng(seed)
    n = int(rng.integers(100, 1500))
    df = pd.DataFrame({
        "g": rng.integers(0, 8, n),
        "o": rng.permutation(n),  # unique order key
        "v": rng.normal(size=n).round(3),
    })
    b = TableBlock.from_pandas(df)
    out = window_block(b, ["g"], [SortKey("o")],
                       [WindowFunc("rn", "row_number"),
                        WindowFunc("cs", "sum", input="v"),
                        WindowFunc("mx", "max", input="v", cumulative=False),
                        WindowFunc("lg", "lag", input="v", offset=1)])
    got = out.to_pandas().sort_values(["g", "o"]).reset_index(drop=True)
    w = df.sort_values(["g", "o"], kind="stable").reset_index(drop=True)
    grp = w.groupby("g")
    w["rn"] = grp.cumcount() + 1
    w["cs"] = grp["v"].cumsum()
    w["mx"] = grp["v"].transform("max")
    w["lg"] = grp["v"].shift(1)
    np.testing.assert_array_equal(got["rn"], w["rn"])
    np.testing.assert_allclose(got["cs"], w["cs"], rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(got["mx"], w["mx"], rtol=1e-9)
    lg_g = got["lg"].to_numpy(dtype=float)
    lg_w = w["lg"].to_numpy(dtype=float)
    np.testing.assert_array_equal(np.isnan(lg_g), np.isnan(lg_w))
    np.testing.assert_allclose(lg_g[~np.isnan(lg_g)], lg_w[~np.isnan(lg_w)])


@pytest.mark.parametrize("seed", [41])
def test_fuzz_sort_stability_and_nulls(seed):
    rng = np.random.default_rng(seed)
    n = 500
    df = pd.DataFrame({
        "a": rng.integers(0, 10, n).astype(float),
        "b": rng.normal(size=n).round(2),
    })
    df.loc[rng.random(n) < 0.2, "a"] = np.nan
    b = TableBlock.from_pandas(df)
    from auron_tpu.ops.sort import sort_block
    out = sort_block(b, [SortKey("a", ascending=False, nulls_first=False),
                         SortKey("b")]).to_pandas()
    want = df.sort_values(["a", "b"], ascending=[False, True],
                          na_position="last", kind="stable")
    np.testing.assert_allclose(
        out["b"].to_numpy(), want["b"].to_numpy(), rtol=1e-9)


def test_window_last_value(rng):
    from auron_tpu.ops.window import WindowFunc, window_block
    df = pd.DataFrame({"g": [1, 1, 1, 2, 2], "o": [1, 2, 3, 1, 2],
                       "v": [10., 20., 30., 40., 50.]})
    b = TableBlock.from_pandas(df)
    out = window_block(b, ["g"], [SortKey("o")],
                       [WindowFunc("lv", "last_value", input="v",
                                   cumulative=False),
                        WindowFunc("lc", "last_value", input="v")])
    got = out.to_pandas().sort_values(["g", "o"]).reset_index(drop=True)
    assert list(got["lv"]) == [30., 30., 30., 50., 50.]
    # cumulative: frame ends at current row (unique order keys)
    assert list(got["lc"]) == [10., 20., 30., 40., 50.]


@pytest.mark.parametrize("seed", [71, 72, 73])
def test_fuzz_raw_string_keys_spmd_join_agg(seed):
    """Raw byte-plane string keys through the full distributed pipeline:
    hash exchange, join, partial/final agg — vs pandas, with nulls,
    duplicates, and keys colliding on prefixes."""
    from jax.sharding import Mesh
    from auron_tpu import config
    from auron_tpu.dtypes import STRING_RAW
    from auron_tpu.expr import strings_raw as SR
    from auron_tpu.plan import Join
    from auron_tpu.parallel.spmd import run_plan_spmd, unstack_result

    rng = np.random.default_rng(seed)
    n = 1536
    base = [f"k-{i:03d}" for i in range(48)]
    # prefix-colliding long keys force multi-word compares
    base += [f"k-{i:03d}-suffix-{j}" for i in range(8) for j in range(3)]
    keys = np.array([base[rng.integers(0, len(base))] for _ in range(n)],
                    dtype=object)
    null_rows = rng.random(n) < 0.08
    fact = pd.DataFrame({"k": np.where(null_rows, None, keys),
                         "v": rng.integers(0, 100, n).astype(np.int64)})
    dim_keys = np.array(sorted(set(base) - {base[1], base[5]}), dtype=object)
    dim = pd.DataFrame({"j": dim_keys,
                        "w": np.arange(len(dim_keys), dtype=np.int64)})

    W = max((SR.max_bytes(keys) + 3) // 4, 1)
    parts = np.array_split(np.arange(n), 8)
    tables = {
        "fact": [TableBlock.from_numpy(
            {"k": np.where(null_rows, "", keys)[i],
             "v": fact["v"].to_numpy()[i]},
            {"k": STRING_RAW(W)},
            validity={"k": ~null_rows[i]}, capacity=256)
            for i in parts],
        "dim": [TableBlock.from_numpy({"j": dim_keys,
                                       "w": dim["w"].to_numpy()},
                                      {"j": STRING_RAW(W)})]}
    mesh = Mesh(np.array(jax.devices()[:8]), ("p",))
    from auron_tpu.expr.nodes import col
    join = Join(Exchange(MemoryScan("fact"), HashPartitioning(("k",), 8)),
                Exchange(MemoryScan("dim"), HashPartitioning(("j",), 8)),
                ("k",), ("j",), join_type="inner", strategy="partitioned",
                out_capacity=1024)
    plan = Agg(join, keys=(("j", col("j")),),
               calls=(AggCall("s", "sum", col("v")),
                      AggCall("c", "count_star")), mode="single")
    stacked = run_plan_spmd(plan, mesh, tables)
    got = pd.concat([b.to_pandas() for b in unstack_result(stacked)],
                    ignore_index=True)
    # distributed single-mode agg leaves per-shard partials: re-aggregate
    got = got.groupby("j").agg(s=("s", "sum"), c=("c", "sum")).reset_index()
    want = fact.dropna(subset=["k"]).merge(
        dim, left_on="k", right_on="j").groupby("j").agg(
        s=("v", "sum"), c=("v", "size")).reset_index()
    got = got.sort_values("j").reset_index(drop=True)
    want = want.sort_values("j").reset_index(drop=True)
    assert got["j"].tolist() == want["j"].tolist()
    assert got["s"].tolist() == want["s"].tolist()
    assert got["c"].tolist() == want["c"].tolist()
