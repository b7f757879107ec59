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


def test_onehot_batcher_matches_oracle():
    """OneHotBatcher (the XLA-path cross-column fusion): every count/sum
    of one GROUP BY rides ONE _scan_dot; results must equal per-call
    numpy oracles exactly (ints) / to f64 tolerance (floats)."""
    import numpy as np
    from auron_tpu.ops import pallas_kernels as PK

    rng = np.random.default_rng(3)
    n, d = 70_000, 37
    gid = rng.integers(0, d, n).astype(np.int32)
    fvals = rng.normal(size=n) * 1e6
    ivals = rng.integers(-(2**40), 2**40, n)
    flags = rng.random(n) < 0.3

    b = PK.OneHotBatcher(jnp.asarray(gid), d)
    tf = b.request_sum(jnp.asarray(fvals))
    ti = b.request_sum(jnp.asarray(ivals))
    tc = b.request_count(jnp.asarray(flags))
    b.finalize()

    want_f = np.zeros(d)
    np.add.at(want_f, gid, fvals)
    want_i = np.zeros(d, np.int64)
    np.add.at(want_i, gid, ivals)
    want_c = np.zeros(d, np.int64)
    np.add.at(want_c, gid, flags.astype(np.int64))

    # float sums carry f32 block-accumulation error relative to the GROSS
    # magnitude (the kernel's documented contract; signs cancel here) —
    # integer sums and counts must be bit-exact
    gross = np.zeros(d)
    np.add.at(gross, gid, np.abs(fvals))
    np.testing.assert_allclose(np.asarray(tf()), want_f,
                               atol=1e-5 * gross.max(), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(ti()), want_i)
    np.testing.assert_array_equal(np.asarray(tc()), want_c)


def test_segment_aggregate_with_forced_onehot_batcher(monkeypatch):
    """Force the TPU-only MXU gate on CPU so the batched one-hot path is
    exercised end-to-end through segment_aggregate."""
    import numpy as np
    from auron_tpu.ops import aggregate as AG
    from auron_tpu.ops import pallas_kernels as PK
    from auron_tpu.block import Column
    from auron_tpu.dtypes import FLOAT64, INT64

    monkeypatch.setattr(PK, "use_mxu_segments", lambda d, r: True)
    rng = np.random.default_rng(5)
    n, d = 40_000, 11
    gid = jnp.asarray(rng.integers(0, d, n).astype(np.int64))
    live = jnp.asarray(rng.random(n) < 0.9)
    fv = rng.normal(size=n)
    iv = rng.integers(0, 1000, n)
    cols = {
        "s": Column.of(jnp.asarray(fv), FLOAT64),
        "c": Column.of(jnp.asarray(iv), INT64),
    }
    aggs = [
        (AG.AggSpec("sf", "sum"), cols["s"]),
        (AG.AggSpec("si", "sum"), cols["c"]),
        (AG.AggSpec("n", "count"), cols["s"]),
        (AG.AggSpec("star", "count_star"), None),
        (AG.AggSpec("mx", "max"), cols["c"]),
    ]
    out = AG.segment_aggregate(gid, d, live, aggs)
    lv = np.asarray(live)
    g = np.asarray(gid)
    want_sf = np.zeros(d)
    np.add.at(want_sf, g[lv], fv[lv])
    want_si = np.zeros(d, np.int64)
    np.add.at(want_si, g[lv], iv[lv])
    want_n = np.zeros(d, np.int64)
    np.add.at(want_n, g[lv], 1)
    np.testing.assert_allclose(np.asarray(out["sf"].values), want_sf,
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out["si"].values), want_si)
    np.testing.assert_array_equal(np.asarray(out["n"].values), want_n)
    np.testing.assert_array_equal(np.asarray(out["star"].values), want_n)
    want_mx = np.full(d, -(2**62), np.int64)
    np.maximum.at(want_mx, g[lv], iv[lv])
    got_mx = np.asarray(out["mx"].values)
    sel = want_n > 0
    np.testing.assert_array_equal(got_mx[sel], want_mx[sel])
