"""Out-of-core aggregation (ops/external_agg.py) vs pandas: tables staged
as many host chunks, each far smaller than the full working set — the
done-criterion from the reference's spillable AggExec (agg_table.rs
spill/merge loop): exact group-by results at any size."""

import numpy as np
import pandas as pd
import pytest

from auron_tpu.io.staging import StagedTable
from auron_tpu.ops.external_agg import aggregate_staged


def _run(df, keys, aggs, chunk_rows):
    staged = StagedTable.from_pandas(df, chunk_rows=chunk_rows)
    out = aggregate_staged(staged, keys, aggs)
    frames = [out.block(i).to_pandas() for i in range(out.num_partitions)]
    return pd.concat(frames, ignore_index=True)


def test_external_agg_exact_vs_pandas():
    rng = np.random.default_rng(0)
    n = 20_000
    df = pd.DataFrame({
        "g": rng.choice([f"grp-{i:03d}" for i in range(300)], n),
        "h": rng.integers(0, 4, n).astype(np.int32),
        "v": rng.integers(-50, 50, n).astype(np.int64),
        "f": rng.normal(size=n).round(3),
    })
    got = _run(df, ["g", "h"],
               [("s", "sum", "v"), ("c", "count_star", None),
                ("m", "min", "f"), ("x", "max", "f"),
                ("a", "avg", "v")], chunk_rows=1500)
    want = df.groupby(["g", "h"]).agg(
        s=("v", "sum"), c=("v", "size"), m=("f", "min"), x=("f", "max"),
        a=("v", "mean")).reset_index()
    got = got.sort_values(["g", "h"]).reset_index(drop=True)
    want = want.sort_values(["g", "h"]).reset_index(drop=True)
    assert len(got) == len(want)
    assert got["g"].tolist() == want["g"].tolist()
    assert got["h"].tolist() == want["h"].tolist()
    assert got["s"].tolist() == want["s"].tolist()
    assert got["c"].tolist() == want["c"].tolist()
    np.testing.assert_allclose(got["m"], want["m"], rtol=1e-9)
    np.testing.assert_allclose(got["x"], want["x"], rtol=1e-9)
    np.testing.assert_allclose(got["a"], want["a"], rtol=1e-9)


def test_external_agg_group_spanning_chunks():
    """One giant group spanning EVERY chunk (the boundary-carry path) plus
    singleton groups; also groups out of first-seen order."""
    n = 8000
    rng = np.random.default_rng(1)
    g = np.where(rng.random(n) < 0.7, "hot",
                 rng.choice([f"k{i}" for i in range(50)], n))
    df = pd.DataFrame({"g": g, "v": np.arange(n, dtype=np.int64)})
    got = _run(df, ["g"], [("s", "sum", "v"), ("c", "count_star", None)],
               chunk_rows=700)
    want = df.groupby("g").agg(s=("v", "sum"),
                               c=("v", "size")).reset_index()
    got = got.sort_values("g").reset_index(drop=True)
    want = want.sort_values("g").reset_index(drop=True)
    assert got["g"].tolist() == want["g"].tolist()
    assert got["s"].tolist() == want["s"].tolist()
    assert got["c"].tolist() == want["c"].tolist()


def test_external_agg_nulls_and_tiny_chunks():
    rng = np.random.default_rng(2)
    n = 3000
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", None], n),
        "v": rng.normal(size=n).round(2)})
    df.loc[rng.random(n) < 0.2, "v"] = np.nan
    got = _run(df, ["g"], [("s", "sum", "v"), ("c", "count", "v"),
                           ("a", "avg", "v")], chunk_rows=200)
    want = df.groupby("g", dropna=False).agg(
        s=("v", "sum"), c=("v", "count"), a=("v", "mean")).reset_index()
    key = lambda d: d.sort_values(  # noqa: E731
        "g", na_position="last").reset_index(drop=True)
    got, want = key(got), key(want)
    assert len(got) == len(want)
    assert got["c"].tolist() == want["c"].tolist()
    np.testing.assert_allclose(got["s"], want["s"], rtol=1e-7)
    np.testing.assert_allclose(got["a"], want["a"], rtol=1e-7)


def test_external_agg_raw_string_keys_decimal_values():
    """Composition: raw byte-plane group keys + decimal64 sums through the
    out-of-core path."""
    from auron_tpu.block import TableBlock
    from auron_tpu.dtypes import DECIMAL64, STRING_RAW
    from auron_tpu.expr import strings_raw as SR
    rng = np.random.default_rng(5)
    n = 6000
    keys = np.array([f"acct-{rng.integers(0, 200):05d}" for _ in range(n)],
                    dtype=object)
    cents = rng.integers(-10 ** 6, 10 ** 6, n)
    W = max((SR.max_bytes(keys) + 3) // 4, 1)
    chunks = []
    for i in range(0, n, 500):
        chunks.append(TableBlock.from_numpy(
            {"g": keys[i:i + 500], "d": cents[i:i + 500].astype(np.int64)},
            {"g": STRING_RAW(W), "d": DECIMAL64(18, 2)}))
    staged = StagedTable.from_blocks(chunks)
    out = aggregate_staged(staged, ["g"],
                           [("s", "sum", "d"), ("c", "count_star", None)])
    got = pd.concat([out.block(i).to_pandas()
                     for i in range(out.num_partitions)], ignore_index=True)
    want = pd.DataFrame({"g": keys, "c100": cents}).groupby("g").agg(
        s=("c100", "sum"), c=("c100", "size")).reset_index()
    got = got.sort_values("g").reset_index(drop=True)
    want = want.sort_values("g").reset_index(drop=True)
    assert got["g"].tolist() == want["g"].tolist()
    assert got["c"].tolist() == want["c"].tolist()
    np.testing.assert_allclose(got["s"].to_numpy(),
                               want["s"].to_numpy() / 100.0, rtol=1e-12)
