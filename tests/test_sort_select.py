"""Selection compaction, sort, limit vs numpy/pandas oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from auron_tpu import TableBlock
from auron_tpu.ops.selection import compact, head_limit
from auron_tpu.ops.sort import SortKey, sort_block, top_k_block


def test_compact_is_stable():
    b = TableBlock.from_numpy({"x": np.arange(10, dtype=np.int64)})
    b = b.filter_mask(b["x"].values % 3 != 0)
    c, n = compact(b)
    assert int(n) == 6
    np.testing.assert_array_equal(
        np.asarray(c["x"].values)[:6], [1, 2, 4, 5, 7, 8])
    np.testing.assert_array_equal(np.asarray(c.row_mask)[:7],
                                  [True] * 6 + [False])


def test_sort_multi_key_with_nulls(rng):
    n = 500
    df = pd.DataFrame({
        "a": rng.integers(0, 5, n),
        "b": rng.normal(size=n),
    })
    df.loc[df.index % 7 == 0, "b"] = None
    b = TableBlock.from_pandas(df)
    s = sort_block(b, [SortKey("a", ascending=True),
                       SortKey("b", ascending=False)])
    got = s.to_pandas()
    want = df.sort_values(["a", "b"], ascending=[True, False],
                          na_position="last", kind="stable").reset_index(drop=True)
    np.testing.assert_array_equal(got["a"].to_numpy(), want["a"].to_numpy())
    np.testing.assert_allclose(got["b"].to_numpy(), want["b"].to_numpy())


def test_sort_nulls_first_ascending(rng):
    df = pd.DataFrame({"x": [3.0, None, 1.0, 2.0, None]})
    b = TableBlock.from_pandas(df)
    got = sort_block(b, [SortKey("x", ascending=True)]).to_pandas()
    # Spark default: nulls first on ascending
    assert got["x"].isna().tolist() == [True, True, False, False, False]
    np.testing.assert_allclose(got["x"].dropna().to_numpy(), [1.0, 2.0, 3.0])


def test_sort_negative_zero_and_nan():
    vals = np.array([1.0, -0.0, 0.0, np.nan, -1.0, np.inf, -np.inf])
    b = TableBlock.from_numpy({"x": vals})
    got = np.asarray(sort_block(b, [SortKey("x")])["x"].values)[:7]
    # NaN last (greater than +inf), -0.0 before 0.0
    assert np.isnan(got[-1])
    np.testing.assert_array_equal(
        got[:6], [-np.inf, -1.0, -0.0, 0.0, 1.0, np.inf])
    assert np.signbit(got[2]) and not np.signbit(got[3])


def test_sort_strings():
    b = TableBlock.from_pandas(pd.DataFrame({"s": ["pear", "apple", "fig", "apple"]}))
    got = sort_block(b, [SortKey("s")]).to_pandas()["s"].tolist()
    assert got == ["apple", "apple", "fig", "pear"]


def test_top_k_and_limit():
    b = TableBlock.from_numpy({"x": np.array([5, 1, 9, 3, 7], np.int64)})
    t = top_k_block(b, [SortKey("x", ascending=False)], 2)
    np.testing.assert_array_equal(t.to_pandas()["x"].to_numpy(), [9, 7])
    l = head_limit(b, 2, offset=1)
    np.testing.assert_array_equal(l.to_pandas()["x"].to_numpy(), [1, 9])


def test_sort_under_jit(rng):
    df = pd.DataFrame({"k": rng.integers(0, 100, 1000)})
    b = TableBlock.from_pandas(df)
    run = jax.jit(lambda blk: sort_block(blk, [SortKey("k")]))
    got = run(b).to_pandas()["k"].to_numpy()
    np.testing.assert_array_equal(got, np.sort(df["k"].to_numpy()))


def test_batched_take_chunked_exact(rng):
    """Huge-index stacked takes run as a lax.scan over index chunks
    (TPU gather temps are 512 B/index regardless of plane count — one
    50M-index 2-D take cannot even compile; BENCH_NOTES). The chunked
    form must stay bit-exact across every plane kind, eager and jit."""
    from auron_tpu.config import conf
    from auron_tpu.ops.selection import batched_take

    N, NI = 1000, 3000
    arrays = {
        "i32": jnp.asarray(rng.integers(-2**31, 2**31, N).astype(np.int32)),
        "f32": jnp.asarray(rng.standard_normal(N).astype(np.float32)),
        "i64a": jnp.asarray(rng.integers(-2**62, 2**62, N)),
        "i64b": jnp.asarray(rng.integers(-2**62, 2**62, N)),
        "f64": jnp.asarray(rng.standard_normal(N)),
        "i8": jnp.asarray(rng.integers(0, 2, N).astype(np.int8)),
    }
    idx = jnp.asarray(rng.integers(0, N, NI).astype(np.int32))
    want = {k: np.asarray(v)[np.asarray(idx)] for k, v in arrays.items()}
    old = conf.get("auron.take.chunk.rows")
    try:
        for chunk in (old, 1024, 700):  # direct, even and ragged chunking
            conf.set("auron.take.chunk.rows", chunk)
            for got in (batched_take(arrays, idx),
                        jax.jit(batched_take)(arrays, idx)):
                for k in arrays:
                    assert got[k].dtype == arrays[k].dtype
                    np.testing.assert_array_equal(np.asarray(got[k]),
                                                  want[k])
    finally:
        conf.set("auron.take.chunk.rows", old)
