"""Fused Mosaic segment-sum kernel vs the oracle paths.

The pallas_call runs in interpreter mode on the CPU test mesh
(auron.pallas.interpret); on TPU the same kernel compiles via Mosaic.
Exactness contract: integer sums EXACT (16-bit magnitude planes, double-f32
accumulators, plane sums < 2^40); float sums ~1e-7 relative (hi/lo split).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from auron_tpu import config
from auron_tpu.ops import pallas_kernels as PK


def test_kernel_matches_segment_sum():
    rng = np.random.default_rng(31)
    n, d = 10_000, 37
    gid = jnp.asarray(rng.integers(0, d, n).astype(np.int32))
    planes = jnp.asarray(
        np.stack([rng.integers(0, 65535, n).astype(np.float32),
                  rng.normal(size=n).astype(np.float32),
                  (rng.random(n) < 0.5).astype(np.float32)], axis=1))
    got = PK.pallas_segment_sum_planes(planes, gid, d, interpret=True)
    want = np.stack(
        [np.bincount(np.asarray(gid), weights=np.asarray(planes[:, j]),
                     minlength=d) for j in range(3)], axis=1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=1e-5)
    # integer plane is exact
    np.testing.assert_array_equal(np.asarray(got[:, 0]), want[:, 0])


def test_batcher_int_exact_large_values():
    rng = np.random.default_rng(32)
    n, d = 4096, 16
    gid = jnp.asarray(rng.integers(0, d, n).astype(np.int32))
    # values spanning far beyond f32's 2^24 integer range
    vals = rng.integers(-2**43, 2**43, n)
    b = PK.SumBatcher(gid, d, interpret=True)
    t = b.request_sum(jnp.asarray(vals))
    tc = b.request_count(jnp.ones(n, bool))
    b.finalize()
    want = np.bincount(np.asarray(gid), weights=None, minlength=d)
    got_cnt = np.asarray(tc())
    np.testing.assert_array_equal(got_cnt, want)
    want_sum = pd.Series(vals).groupby(np.asarray(gid)).sum()
    got_sum = np.asarray(t())
    np.testing.assert_array_equal(got_sum,
                                  want_sum.reindex(range(d),
                                                   fill_value=0).to_numpy())


def test_groupby_through_fused_kernel():
    """Whole-query differential with the fused path forced on (interpret)."""
    from auron_tpu.expr.nodes import col
    from auron_tpu.plan import Session
    from auron_tpu.plan.builder import table
    rng = np.random.default_rng(33)
    n = 5000
    df = pd.DataFrame({
        "k": rng.integers(0, 50, n).astype(np.int64),
        "v": rng.normal(size=n).round(4),
        "q": rng.integers(0, 100, n).astype(np.int64)})
    df.loc[rng.random(n) < 0.1, "v"] = np.nan
    s = Session()
    s.register_pandas("t", df)
    with config.conf.scoped(auron__pallas__interpret=True,
                            auron__pallas__fused__agg__enable=True):
        f = (table(s, "t").groupby("k")
             .agg(sv=("sum", col("v")), sq=("sum", col("q")),
                  c=("count_star", None), cv=("count", col("v")),
                  av=("avg", col("v"))))
        got = f.collect().sort_values("k").reset_index(drop=True)
    want = df.groupby("k").agg(
        sv=("v", "sum"), sq=("q", "sum"), c=("v", "size"),
        cv=("v", "count"), av=("v", "mean")).reset_index()
    np.testing.assert_array_equal(got["k"], want["k"])
    np.testing.assert_allclose(got["sv"], want["sv"], rtol=2e-5, atol=1e-6)
    np.testing.assert_array_equal(got["sq"], want["sq"])
    np.testing.assert_array_equal(got["c"], want["c"])
    np.testing.assert_array_equal(got["cv"], want["cv"])
    np.testing.assert_allclose(got["av"], want["av"], rtol=2e-5, atol=1e-6)


def test_mxu_gather_through_join():
    """The one-hot MXU gather path (forced via interpret mode) produces the
    same join results as XLA's gather."""
    import pandas as pd
    from auron_tpu.plan import Session
    from auron_tpu.plan.builder import table
    rng = np.random.default_rng(91)
    n = 70_000
    fact = pd.DataFrame({"k": rng.integers(0, 500, n).astype(np.int32),
                         "v": rng.normal(size=n)})
    dim = pd.DataFrame({"j": np.arange(500, dtype=np.int32),
                        "grp": (np.arange(500) % 7).astype(np.int32),
                        "w": rng.normal(size=500).astype(np.float32)})
    s = Session()
    s.register_pandas("f", fact)
    s.register_pandas("d", dim)
    from auron_tpu.expr.nodes import col
    q = (table(s, "f").join(table(s, "d"), ("k",), ("j",))
         .groupby("grp").agg(sv=("sum", col("v")),
                             sw=("sum", col("w"))))
    base = q.collect().sort_values("grp").reset_index(drop=True)
    with config.conf.scoped(auron__pallas__interpret=True,
                            auron__gather__mxu__max__table=1 << 17):
        mxu = q.collect().sort_values("grp").reset_index(drop=True)
    np.testing.assert_array_equal(base["grp"], mxu["grp"])
    np.testing.assert_allclose(base["sv"], mxu["sv"], rtol=1e-12)
    np.testing.assert_allclose(base["sw"], mxu["sw"], rtol=1e-12)
