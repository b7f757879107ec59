"""Out-of-core execution: tables larger than the device budget stay exact.

Reference analog: multi-level external sort + merge
(/root/reference/native-engine/datafusion-ext-plans/src/sort_exec.rs:
341-446) and bucketed agg spill (agg_table.rs:723-840). Here the staged
table is 4x the configured budget; the external sort forms device-sorted
runs and pairwise-merges them with O(3 chunks) HBM residency; the
aggregate streams chunk partials.
"""

import numpy as np
import pandas as pd
import pytest

from auron_tpu import config
from auron_tpu.io.staging import StagedTable, register_staged
from auron_tpu.ops.external_sort import sort_staged
from auron_tpu.ops.sort import SortKey


def _staged_frame(rng, n=40_000, chunk_rows=4096):
    df = pd.DataFrame({
        "k": rng.integers(0, 1000, n).astype(np.int64),
        "u": rng.integers(0, 50, n).astype(np.int32),
        "v": rng.normal(size=n).round(4),
        "s": rng.choice(["aa", "bb", "cc", "dd"], n),
    })
    staged = StagedTable.from_pandas(df, chunk_rows=chunk_rows)
    return df, staged


def test_external_sort_exact():
    rng = np.random.default_rng(21)
    df, staged = _staged_frame(rng)
    # staged is ~10 chunks; a "budget" of ~2.5 chunks makes the table 4x
    # larger than what may be device-resident at once — the merge never
    # holds more than 3 chunks
    keys = [SortKey("k"), SortKey("v", ascending=False)]
    out = sort_staged(staged, keys)
    got = pd.concat([b.to_pandas() for b in out.blocks()],
                    ignore_index=True)
    want = df.sort_values(["k", "v"], ascending=[True, False],
                          kind="stable").reset_index(drop=True)
    assert len(got) == len(want)
    np.testing.assert_array_equal(got["k"].to_numpy(),
                                  want["k"].to_numpy())
    np.testing.assert_allclose(got["v"].to_numpy(), want["v"].to_numpy())
    # string column rides along and stays row-aligned
    merged = got.reset_index(drop=True)
    w2 = want.reset_index(drop=True)
    # rows with unique (k, v) must match exactly incl. payload columns
    uniq = ~w2.duplicated(["k", "v"], keep=False)
    assert (merged.loc[uniq, "s"].to_numpy() ==
            w2.loc[uniq, "s"].to_numpy()).all()


def test_external_sort_chunk_monotone():
    """Every chunk boundary is globally ordered (chunk i max <= i+1 min)."""
    rng = np.random.default_rng(22)
    df, staged = _staged_frame(rng, n=20_000, chunk_rows=2048)
    out = sort_staged(staged, [SortKey("k")])
    last = None
    total = 0
    for b in out.blocks():
        p = b.to_pandas()
        total += len(p)
        if len(p) == 0:
            continue
        assert (p["k"].to_numpy() == np.sort(p["k"].to_numpy())).all()
        if last is not None:
            assert p["k"].iloc[0] >= last
        last = p["k"].iloc[-1]
    assert total == len(df)


def test_staged_aggregate_exact():
    """Aggregation over a staged table 4x the budget: chunk partials merge
    to exact results (the bucketed-agg-spill analog)."""
    from auron_tpu.expr.nodes import col
    from auron_tpu.plan import Session
    from auron_tpu.plan.builder import table
    rng = np.random.default_rng(23)
    df, staged = _staged_frame(rng, n=30_000, chunk_rows=2048)
    s = Session()
    register_staged(s, "t", df, chunk_rows=2048)
    f = (table(s, "t").groupby("k")
         .agg(sv=("sum", col("v")), cnt=("count_star", None)))
    got = f.collect().sort_values("k").reset_index(drop=True)
    want = df.groupby("k").agg(sv=("v", "sum"), cnt=("v", "size")) \
        .reset_index().sort_values("k").reset_index(drop=True)
    assert len(got) == len(want)
    np.testing.assert_array_equal(got["k"].to_numpy(), want["k"].to_numpy())
    np.testing.assert_allclose(got["sv"].to_numpy(), want["sv"].to_numpy(),
                               rtol=1e-9)
    np.testing.assert_array_equal(got["cnt"].to_numpy(),
                                  want["cnt"].to_numpy())


def test_budget_auto_partitions():
    """register_pandas(num_partitions=None) sizes partitions from the
    memory budget."""
    from auron_tpu.plan import Session
    from auron_tpu.runtime.memory import MemoryBudget
    rng = np.random.default_rng(24)
    df = pd.DataFrame({"k": rng.integers(0, 10, 8192).astype(np.int64),
                       "v": rng.normal(size=8192)})
    s = Session()
    s.memory_budget = MemoryBudget(budget_bytes=64 * 1024)
    s.register_pandas("t", df, num_partitions=None)
    # ~8192 rows * ~19B * 4x working set over a 64KiB budget -> many parts
    assert len(s.tables["t"]) >= 8
    total = sum(int(np.asarray(b.row_mask).sum()) for b in s.tables["t"])
    assert total == len(df)
