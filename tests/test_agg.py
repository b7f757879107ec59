"""Grouped aggregation vs pandas oracle — sorted and direct strategies."""

import jax
import numpy as np
import pandas as pd
import pytest

from auron_tpu import TableBlock
from auron_tpu.ops.aggregate import (AggSpec, groupby_direct, groupby_sorted)


def run_groupby(b, keys, aggs, direct_domains=None):
    if direct_domains is not None:
        fn = lambda blk: groupby_direct(blk, keys, [
            (s, blk.columns[c] if c else None) for s, c in aggs],
            direct_domains)
    else:
        fn = lambda blk: groupby_sorted(blk, keys, [
            (s, blk.columns[c] if c else None) for s, c in aggs])
    return jax.jit(fn)(b).to_pandas()


@pytest.mark.parametrize("direct", [False, True])
def test_groupby_sum_count_minmax(rng, direct):
    n = 2000
    df = pd.DataFrame({
        "k": rng.integers(0, 7, n).astype(np.int32),
        "v": rng.normal(size=n),
        "w": rng.integers(-100, 100, n).astype(np.int64),
    })
    df.loc[df.index % 11 == 0, "v"] = None
    b = TableBlock.from_pandas(df)
    aggs = [(AggSpec("sum_v", "sum"), "v"),
            (AggSpec("cnt_v", "count"), "v"),
            (AggSpec("cnt", "count_star"), None),
            (AggSpec("min_w", "min"), "w"),
            (AggSpec("max_w", "max"), "w")]
    got = run_groupby(b, ["k"], aggs, [7] if direct else None)
    got = got.sort_values("k").reset_index(drop=True)
    want = df.groupby("k").agg(
        sum_v=("v", "sum"), cnt_v=("v", "count"), cnt=("k", "size"),
        min_w=("w", "min"), max_w=("w", "max")).reset_index()
    np.testing.assert_array_equal(got["k"].to_numpy(), want["k"].to_numpy())
    np.testing.assert_allclose(got["sum_v"].to_numpy(),
                               want["sum_v"].to_numpy(), rtol=1e-9)
    np.testing.assert_array_equal(got["cnt_v"].to_numpy(), want["cnt_v"].to_numpy())
    np.testing.assert_array_equal(got["cnt"].to_numpy(), want["cnt"].to_numpy())
    np.testing.assert_array_equal(got["min_w"].to_numpy(), want["min_w"].to_numpy())
    np.testing.assert_array_equal(got["max_w"].to_numpy(), want["max_w"].to_numpy())


def test_groupby_null_keys_group_together():
    df = pd.DataFrame({"k": [1.0, None, 1.0, None, 2.0],
                       "v": [1, 2, 3, 4, 5]})
    b = TableBlock.from_pandas(df)
    got = run_groupby(b, ["k"], [(AggSpec("s", "sum"), "v")])
    got = got.sort_values("k", na_position="last").reset_index(drop=True)
    np.testing.assert_allclose(got["s"].to_numpy(), [4, 5, 6])
    assert got["k"].isna().tolist() == [False, False, True]


def test_groupby_string_keys():
    df = pd.DataFrame({"s": ["b", "a", "b", "c", "a", "b"],
                       "v": [1, 2, 3, 4, 5, 6]})
    b = TableBlock.from_pandas(df)
    # direct path over dictionary codes (domain = dict size)
    d = len(b["s"].dict_values)
    for domains in (None, [d]):
        got = run_groupby(b, ["s"], [(AggSpec("s_v", "sum"), "v")], domains)
        got = got.sort_values("s").reset_index(drop=True)
        assert got["s"].tolist() == ["a", "b", "c"]
        np.testing.assert_array_equal(got["s_v"].to_numpy(), [7, 10, 4])


def test_groupby_multi_key_direct_and_sorted(rng):
    n = 500
    df = pd.DataFrame({
        "a": rng.integers(0, 4, n).astype(np.int32),
        "b": rng.integers(0, 3, n).astype(np.int32),
        "v": rng.integers(0, 10, n).astype(np.int64),
    })
    blk = TableBlock.from_pandas(df)
    want = df.groupby(["a", "b"])["v"].sum().reset_index().sort_values(["a", "b"])
    for domains in (None, [4, 3]):
        got = run_groupby(blk, ["a", "b"], [(AggSpec("sv", "sum"), "v")], domains)
        got = got.sort_values(["a", "b"]).reset_index(drop=True)
        np.testing.assert_array_equal(got["a"], want["a"].to_numpy())
        np.testing.assert_array_equal(got["b"], want["b"].to_numpy())
        np.testing.assert_array_equal(got["sv"], want["v"].to_numpy())


def test_sum_of_all_null_group_is_null():
    df = pd.DataFrame({"k": [1, 1, 2], "v": [None, None, 5.0]})
    b = TableBlock.from_pandas(df)
    got = run_groupby(b, ["k"], [(AggSpec("s", "sum"), "v"),
                                 (AggSpec("c", "count"), "v")])
    got = got.sort_values("k").reset_index(drop=True)
    assert got["s"].isna().tolist() == [True, False]
    np.testing.assert_array_equal(got["c"].to_numpy(), [0, 1])


def test_first_and_first_ignores_null():
    df = pd.DataFrame({"k": [1, 1, 1, 2], "v": [None, 7.0, 8.0, None]})
    b = TableBlock.from_pandas(df)
    got = run_groupby(b, ["k"], [(AggSpec("f", "first"), "v"),
                                 (AggSpec("fn", "first_ignores_null"), "v")])
    got = got.sort_values("k").reset_index(drop=True)
    assert got["f"].isna().tolist() == [True, True]
    assert got["fn"].tolist()[0] == 7.0
    assert got["fn"].isna().tolist() == [False, True]


def test_distinct_keys_cardinality_equals_rows(rng):
    # every key unique -> num_groups == num_rows (stresses gid capacity)
    n = 300
    df = pd.DataFrame({"k": np.arange(n, dtype=np.int64),
                       "v": np.ones(n, dtype=np.int64)})
    b = TableBlock.from_pandas(df)
    got = run_groupby(b, ["k"], [(AggSpec("s", "sum"), "v")])
    assert len(got) == n
    np.testing.assert_array_equal(np.sort(got["k"].to_numpy()), np.arange(n))


def test_fuzz_groupby_against_pandas(rng):
    """Reference-style fuzz (agg_exec.rs:803): random keys, oracle compare."""
    for trial in range(3):
        n = int(rng.integers(50, 4000))
        card = int(rng.integers(1, 50))
        df = pd.DataFrame({
            "k": rng.integers(0, card, n).astype(np.int64),
            "v": rng.integers(-1000, 1000, n).astype(np.int64),
        })
        b = TableBlock.from_pandas(df)
        got = run_groupby(b, ["k"], [(AggSpec("s", "sum"), "v"),
                                     (AggSpec("c", "count_star"), None)])
        got = got.sort_values("k").reset_index(drop=True)
        want = df.groupby("k").agg(s=("v", "sum"), c=("v", "size")).reset_index()
        np.testing.assert_array_equal(got["k"].to_numpy(), want["k"].to_numpy())
        np.testing.assert_array_equal(got["s"].to_numpy(), want["s"].to_numpy())
        np.testing.assert_array_equal(got["c"].to_numpy(), want["c"].to_numpy())


def test_decimal_sum_and_arithmetic(rng):
    """Decimal64 end-to-end: exact scaled-int sums + arithmetic (the
    reference's money-typed TPC-DS columns; check_overflow/make_decimal
    analog is the scaled-int64 representation itself)."""
    import pandas as pd
    from auron_tpu.block import TableBlock
    from auron_tpu.dtypes import DECIMAL64
    from auron_tpu.expr.nodes import col
    from auron_tpu.plan import Agg, AggCall, MemoryScan, Session, execute_plan

    n = 4000
    cents = rng.integers(0, 100_000, n)  # price in cents
    df = pd.DataFrame({"k": rng.integers(0, 20, n), "price": cents / 100.0})
    dec = DECIMAL64(18, 2)
    block = TableBlock.from_numpy(
        {"k": df["k"].to_numpy(), "price": cents.astype(np.int64)},
        dtypes={"price": dec})
    s = Session().register("t", block)
    plan = Agg(MemoryScan("t"), keys=(("k", col("k")),),
               calls=(AggCall("total", "sum", col("price")),
                      AggCall("mx", "max", col("price"))), mode="single")
    out = execute_plan(plan, s)[0].to_pandas()
    want = df.groupby("k").agg(total=("price", "sum"),
                               mx=("price", "max")).reset_index()
    got = out.sort_values("k").reset_index(drop=True)
    want = want.sort_values("k").reset_index(drop=True)
    np.testing.assert_allclose(got["total"], want["total"], rtol=1e-12)
    np.testing.assert_allclose(got["mx"], want["mx"], rtol=1e-12)


def test_mixed_radix_key_packing_equivalence():
    """Packed (dict/bool) + unpacked (int/float) group keys produce exactly
    the groups pandas does — stale codes under NULL slots, radix overflow
    spill-over to extra operands, and >2^31 product all covered."""
    import pandas as pd
    from auron_tpu.block import TableBlock
    from auron_tpu.ops.aggregate import AggSpec, groupby_sorted

    rng = np.random.default_rng(17)
    n = 700
    df = pd.DataFrame({
        "s1": rng.choice(["a", "b", "c", None], n),
        "b": rng.random(n) < 0.5,
        "s2": rng.choice([f"x{i}" for i in range(40)], n),
        "i": rng.integers(-5, 5, n),  # unbounded: flushes the accumulator
        "s3": rng.choice(["p", "q"], n),
        "v": rng.integers(0, 100, n).astype(np.int64),
    })
    blk = TableBlock.from_pandas(df)
    out = groupby_sorted(blk, ["s1", "b", "s2", "i", "s3"],
                         [(AggSpec("sv", "sum"), blk.columns["v"]),
                          (AggSpec("c", "count_star"), None)]).to_pandas()
    want = df.groupby(["s1", "b", "s2", "i", "s3"], dropna=False).agg(
        sv=("v", "sum"), c=("v", "size")).reset_index()
    keys = ["s1", "b", "s2", "i", "s3"]
    got = out.sort_values(keys).reset_index(drop=True)
    want = want.sort_values(keys).reset_index(drop=True)
    assert len(got) == len(want)
    assert got["sv"].tolist() == want["sv"].tolist()
    assert got["c"].tolist() == want["c"].tolist()
