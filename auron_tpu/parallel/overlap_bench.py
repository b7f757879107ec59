"""Exchange–compute overlap: measured, not assumed (round-2 verdict #6).

The north star names "exchange overlapped with operator compute via
double-buffered pipelines". Three competing formulations of the same
shuffled aggregation (per-device rows -> global per-key sums+counts) are
built and measured here:

  mono     one all_to_all of [n_dest, pair_cap] row lanes, then one
           segment aggregation over the received rows (the engine's
           default exchange->agg path).
  chunked  the same, but the lane axis is split into K independent
           all_to_all slices (auron.exchange.chunks) — XLA's async
           collective scheduler may overlap slice i+1's transfer with
           slice i's downstream compute.
  ring     per-destination DENSE partials computed locally ([n, G] via
           one segment-sum), then ONE reduce_scatter over the mesh axis.
           reduce_scatter is XLA's native pipelined ring — each hop's
           add overlaps the next hop's transfer by construction, which
           IS the double-buffered pipeline, with traffic O(n*G) instead
           of O(rows). This is the general form of the psum final-agg
           fast path (spmd._psum_final) and exact for any algebraic
           aggregate once the key domain is known.

All three are exactness-checked against a local oracle every run. On
this machine only an 8-virtual-device CPU mesh exists (one real TPU chip
— a 1-device mesh has no collectives), so wall times characterize
relative shape, not ICI; the jax.profiler trace (--trace) records how
XLA actually schedules the collectives. Run:

  python -m auron_tpu.parallel.overlap_bench --rows 200000 --groups 512
"""

from __future__ import annotations

import argparse
import json
import time
from functools import partial
from typing import Dict

import numpy as np


def build_variants(n: int, cap: int, groups: int, axis: str = "p"):
    import jax
    import jax.numpy as jnp
    from auron_tpu import config
    from auron_tpu.parallel.exchange import all_to_all_exchange_ids
    from auron_tpu.block import Column, TableBlock
    from auron_tpu.dtypes import FLOAT32, INT32

    def as_block(keys, vals, mask):
        return TableBlock({"k": Column.of(keys, INT32),
                           "v": Column.of(vals, FLOAT32)}, mask)

    def rows_path(keys, vals, mask, chunks: int):
        keys, vals, mask = (x.reshape(-1) for x in (keys, vals, mask))
        with config.conf.scoped(auron__exchange__chunks=chunks):
            block = as_block(keys, vals, mask)
            ids = (block.columns["k"].values % n).astype(jnp.int32)
            got = all_to_all_exchange_ids(block, ids, axis)
        k = got.columns["k"].values
        v = got.columns["v"].values
        ok = got.row_mask
        gid = jnp.where(ok, k, groups).astype(jnp.int32)
        s = jax.ops.segment_sum(jnp.where(ok, v, 0.0), gid, groups + 1)
        c = jax.ops.segment_sum(ok.astype(jnp.int32), gid, groups + 1)
        return s[:groups], c[:groups]

    def ring_path(keys, vals, mask):
        keys, vals, mask = (x.reshape(-1) for x in (keys, vals, mask))
        # dense per-destination partials: gid = dest * G + key; ONE local
        # segment-sum builds [n, G]; reduce_scatter hands each device its
        # own destination row, pipelined ring under the hood
        dest = (keys % n).astype(jnp.int32)
        gid = jnp.where(mask, dest * groups + keys, n * groups)
        gid = gid.astype(jnp.int32)
        s = jax.ops.segment_sum(jnp.where(mask, vals, 0.0), gid,
                                n * groups + 1)[:n * groups]
        c = jax.ops.segment_sum(mask.astype(jnp.int32), gid,
                                n * groups + 1)[:n * groups]
        s = jax.lax.psum_scatter(s.reshape(n, groups), axis,
                                 scatter_dimension=0, tiled=False)
        c = jax.lax.psum_scatter(c.reshape(n, groups), axis,
                                 scatter_dimension=0, tiled=False)
        return s.reshape(groups), c.reshape(groups)

    return {
        "mono": partial(rows_path, chunks=1),
        "chunked4": partial(rows_path, chunks=4),
        "chunked8": partial(rows_path, chunks=8),
        "ring": ring_path,
    }


def run(rows: int = 200_000, groups: int = 512, iters: int = 5,
        trace: bool = False) -> Dict:
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P

    devs = np.array(jax.devices())
    n = len(devs)
    mesh = Mesh(devs, ("p",))
    cap = max(rows // n, 8)
    rng = np.random.default_rng(0)
    keys = rng.integers(0, groups, (n, cap)).astype(np.int32)
    vals = rng.normal(size=(n, cap)).astype(np.float32)
    mask = np.ones((n, cap), bool)
    # local oracle (keys route to device k%n; ring/mono agree on totals)
    df_s = np.zeros(groups)
    df_c = np.zeros(groups, np.int64)
    np.add.at(df_s, keys.ravel(), vals.ravel().astype(np.float64))
    np.add.at(df_c, keys.ravel(), 1)

    variants = build_variants(n, cap, groups)
    results = {}
    for name, fn in variants.items():
        smapped = jax.jit(jax.shard_map(
            fn, mesh=mesh, in_specs=(P("p"), P("p"), P("p")),
            out_specs=(P("p"), P("p"))))
        s, c = smapped(keys, vals, mask)  # compile + warm
        # exactness: device d holds totals for keys ≡ d (mod n)
        s_h = np.asarray(s).reshape(n, groups)
        c_h = np.asarray(c).reshape(n, groups)
        got_s = np.array([s_h[g % n, g] for g in range(groups)])
        got_c = np.array([c_h[g % n, g] for g in range(groups)])
        # f32 accumulation over ~rows/groups values; sums of zero-mean
        # data need an absolute floor
        assert np.allclose(got_s, df_s, rtol=1e-3, atol=0.05), \
            f"{name} sum mismatch"
        assert (got_c == df_c).all(), f"{name} count mismatch"
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            s, c = smapped(keys, vals, mask)
            float(jnp.sum(s.ravel()[:4]))  # scalar sync (tunnel-safe)
            ts.append(time.perf_counter() - t0)
        entry = {"wall_ms": round(float(np.median(ts)) * 1e3, 3),
                 "best_ms": round(float(np.min(ts)) * 1e3, 3)}
        if trace:
            from auron_tpu.runtime import roofline
            _, d = roofline.capture(lambda: smapped(keys, vals, mask))
            parsed = roofline.parse_trace_dir(d)
            coll = {}
            for plane, events in parsed.items():
                for ev_name, ev in events.items():
                    low = ev_name.lower()
                    if any(t in low for t in ("alltoall", "all-to-all",
                                              "reducescatter",
                                              "reduce-scatter",
                                              "collective", "permute")):
                        coll[ev_name] = {"count": ev["count"],
                                         "total_us": round(
                                             ev["total_us"], 1)}
            entry["collective_events"] = coll
            entry["trace_dir"] = d
        results[name] = entry
    return {"devices": n, "rows_per_device": cap, "groups": groups,
            "backend": jax.default_backend(), "variants": results}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=200_000)
    p.add_argument("--groups", type=int, default=512)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--trace", action="store_true")
    args = p.parse_args()
    print(json.dumps(run(args.rows, args.groups, args.iters, args.trace)))


if __name__ == "__main__":
    main()
