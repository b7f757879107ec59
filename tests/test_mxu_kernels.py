"""One-hot (MXU) aggregation kernels vs scatter-based oracles.

These kernels are the TPU fast path (auto-enabled on tpu backends only);
here they run on CPU and must match jax.ops.segment_* exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from auron_tpu.ops.pallas_kernels import (onehot_segment_count,
                                          onehot_segment_minmax,
                                          onehot_segment_sum)


@pytest.fixture
def data(rng):
    n, d = 10_000, 257
    gid = jnp.asarray(rng.integers(0, d, n).astype(np.int32))
    vals = jnp.asarray(rng.normal(size=n) * 1e6)
    ints = jnp.asarray(rng.integers(-10**12, 10**12, n))
    flags = jnp.asarray(rng.random(n) < 0.7)
    return n, d, gid, vals, ints, flags


def test_sum_float_within_double_tolerance(data):
    # float sums via f32 MXU blocks carry ~1e-7 relative error (documented
    # in pallas_kernels.onehot_segment_sum) — the same double-tolerance bar
    # the reference's QueryResultComparator applies engine-vs-Spark.
    n, d, gid, vals, _, _ = data
    got = onehot_segment_sum(vals, gid, d)
    want = jax.ops.segment_sum(vals, gid, d)
    scale = float(jnp.max(jnp.abs(want)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=scale * 1e-6)


def test_sum_exact_int64(data):
    n, d, gid, _, ints, _ = data
    got = onehot_segment_sum(ints, gid, d).astype(jnp.int64)
    want = jax.ops.segment_sum(ints, gid, d)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_count(data):
    n, d, gid, _, _, flags = data
    got = onehot_segment_count(flags, gid, d)
    want = jax.ops.segment_sum(flags.astype(jnp.int64), gid, d)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("is_min", [True, False])
def test_minmax(data, is_min):
    n, d, gid, vals, ints, _ = data
    ident = np.inf if is_min else -np.inf
    got = onehot_segment_minmax(vals, gid, d, ident, is_min)
    seg = jax.ops.segment_min if is_min else jax.ops.segment_max
    want = seg(vals, gid, d)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # ints exact
    iident = np.iinfo(np.int64).max if is_min else np.iinfo(np.int64).min
    got = onehot_segment_minmax(ints, gid, d, iident, is_min)
    want = seg(ints, gid, d)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_mxu_path_via_config(data, monkeypatch):
    """Force the MXU path through segment_aggregate and compare."""
    from auron_tpu.ops import pallas_kernels as PK
    from auron_tpu.ops.aggregate import AggSpec, segment_aggregate
    from auron_tpu.block import Column
    from auron_tpu.dtypes import FLOAT64
    n, d, gid, vals, ints, flags = data
    live = jnp.ones(n, jnp.bool_)
    col = Column.of(vals, FLOAT64)
    specs = [(AggSpec("s", "sum"), col), (AggSpec("c", "count_star"), None),
             (AggSpec("mx", "max"), col)]
    base = segment_aggregate(gid, d, live, specs)
    monkeypatch.setattr(PK, "use_mxu_segments", lambda *_: True)
    fast = segment_aggregate(gid, d, live, specs)
    scale = float(jnp.max(jnp.abs(base["s"].values)))
    np.testing.assert_allclose(np.asarray(base["s"].values),
                               np.asarray(fast["s"].values),
                               rtol=2e-6, atol=scale * 1e-6)
    np.testing.assert_array_equal(np.asarray(base["c"].values),
                                  np.asarray(fast["c"].values))
    np.testing.assert_array_equal(np.asarray(base["mx"].values),
                                  np.asarray(fast["mx"].values))
