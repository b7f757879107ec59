"""Pallas TPU kernels for the engine's hot primitives.

Rationale (measured, see BENCH notes): XLA TPU lowers scatter-with-duplicates
(segment_sum) and random gather to slow serialized forms — they are the
engine's bottleneck primitives. The MXU-native replacement for grouped
aggregation is ONE-HOT MATMUL: a block of rows becomes a [rows_blk, d]
one-hot matrix multiplied against the value vector, accumulated over a
sequential grid into a VMEM-resident [d] accumulator — all FLOPs on the MXU,
no scatter at all. (Reference's analog is the SIMD agg hash map,
agg/agg_hash_map.rs — same job, opposite hardware mapping.)

Kernels fall back to plain XLA (`segment_sum`) on non-TPU backends or when
shapes don't fit (config auron.pallas.enable gates usage).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from auron_tpu import config

ROW_BLOCK = 1024
MAX_DIRECT_SEGMENTS = 8192  # one-hot width cap (VMEM: 1024x8192xf32 = 32MB/4)


def use_mxu_segments(num_segments: int, rows: int) -> bool:
    """MXU one-hot aggregation pays off on TPU for bounded segment counts
    (measured 16x over XLA scatter segment_sum at 8M rows).
    ``auron.mxu.segments.force`` routes non-TPU backends through the same
    path (slower there — differential testing only)."""
    backend_ok = jax.default_backend() == "tpu" or \
        config.conf.get(config.MXU_SEGMENTS_FORCE)
    return (backend_ok
            and config.conf.get(config.PALLAS_ENABLE)
            and num_segments <= MAX_DIRECT_SEGMENTS
            and rows >= (1 << 15))


SUBBLOCKS = 16  # minimum sub-blocks per scan step

# Per-step one-hot budget: S (sub-blocks per step) scales so the
# [S, blk, d] one-hot intermediate stays within this many bytes. The
# scan is SEQUENTIAL — with the old fixed S=16 a 50M-row aggregation at
# blk=256 ran 12,200 latency-bound steps, a measured ~6s floor that
# dominated q3/q42/q55 whole-query compute at sf=500 (BENCH_SCALE_r05:
# all three pinned at 6.0-6.1s despite different shapes). Small segment
# counts (the common case: brands ~1k, categories ~11) now take
# thousands of sub-blocks per step; the worst case d=8192 still gets
# S=32. Exactness is untouched: the f32 bound is per-SUB-BLOCK (blk
# rows), and the per-step reduction over S sub-block sums is pairwise.
ONEHOT_STEP_BYTES = 256 << 20


def _scan_dot(planes, gid, d: int, blk: int):
    """Shared scan: per-sub-block [k,blk]x[blk,d] one-hot dot in f32 (MXU)
    with f64 carry across steps. Each scan step processes SUBBLOCKS
    sub-blocks via a batched dot_general — the f32 accumulation bound
    (per-sub-block sums over ``blk`` rows) is unchanged, but scan-step
    launch overhead drops 16x. ALL planes ride ONE stacked [S,k,blk] dot:
    the one-hot is built once per step, and the MXU — whose row dimension
    pads to 128 regardless — does k planes for the price of one (a lone
    [1,blk] row-vector dot uses 1/128 of the array). f64 matmul is ~300x
    slower on TPU (emulated) — the carry is the only f64 work. Returns
    list of [d] f64 plane sums.
    """
    n = planes[0].shape[0]
    k = len(planes)
    S = max(SUBBLOCKS, ONEHOT_STEP_BYTES // max(blk * d * 4, 1))
    S = min(S, max((n + blk - 1) // blk, 1), 1 << 16)
    step = blk * S
    pad = (-n) % step
    if pad:
        planes = [jnp.concatenate([p, jnp.zeros(pad, p.dtype)])
                  for p in planes]
        gid = jnp.concatenate([gid, jnp.zeros(pad, gid.dtype)])
    nb = (n + pad) // step
    p2 = [p.reshape(nb, S, blk) for p in planes]
    gid2 = gid.reshape(nb, S, blk).astype(jnp.int32)

    def body(carry, xs):
        acc, comp = carry
        g = xs[-1]                                     # [S, blk]
        oh = (g[:, :, None] ==
              jax.lax.broadcasted_iota(jnp.int32, (S, blk, d), 2)
              ).astype(jnp.float32)
        x = jnp.stack(xs[:-1], axis=1)                 # [S, k, blk]
        # batched [S,k,blk] @ [S,blk,d] -> [S,k,d]; per-sub-block sums
        # stay within the f32 exactness bound, then sum in f64
        # precision=HIGHEST is load-bearing: the TPU default is a single
        # bf16 MXU pass (8-bit mantissa) — q43's day-sums drifted 6e-5
        # relative at sf=500 and the 16-bit integer magnitude planes
        # (values to 65535) would not even round-trip. HIGHEST keeps the
        # f32 per-sub-block exactness bound the batching preserved from
        # the per-call path it replaced.
        sub = jax.lax.dot_general(
            x, oh,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)        # [S, k, d]
        step = jnp.sum(sub.astype(jnp.float64), axis=0)
        # Kahan-compensated carry: on the real TPU the x64 rewriter
        # DEMOTES these f64 accumulators to f32, and a plain f32 carry
        # over thousands of scan steps drifts past differential tolerance
        # at 1M-row groups (q43 at sf=500, measured). Compensation keeps
        # the error at ~1 ulp of the total in whatever precision the
        # backend actually runs; in real f64 (CPU) it only tightens.
        y = step - comp
        t = acc + y
        comp = (t - acc) - y
        return (t, comp), None

    acc0 = (jnp.zeros((k, d), jnp.float64), jnp.zeros((k, d), jnp.float64))
    (accs, _comp), _ = jax.lax.scan(body, acc0, tuple(p2) + (gid2,))
    return [accs[i] for i in range(k)]


class OneHotBatcher:
    """Cross-column fusion for the XLA one-hot path (the default MXU
    aggregation): collect every count/sum plane of one GROUP BY and run
    them through ONE _scan_dot. Without batching, each aggregate call
    spins its own lax.scan over the same gid — the one-hot is rebuilt per
    call and every dot is a [1,blk] row-vector (1/128 MXU row usage); a
    7-aggregate query (q43's day-name pivot) pays that 21 times over.

    API mirrors SumBatcher (requests return closures resolved after
    finalize()); integer sums ride four 16-bit magnitude planes (exact:
    256-row blocks keep per-dot sums <= 2^24, see onehot_segment_sum),
    floats ride hi/lo f32 splitting with the same 256-row bound.
    """

    BLK = 256

    def __init__(self, gid32, num_segments: int):
        self.gid = gid32
        self.d = int(num_segments)
        self.planes = []
        self._sums = None

    def _add(self, plane) -> int:
        self.planes.append(plane.astype(jnp.float32))
        return len(self.planes) - 1

    def request_count(self, flags):
        idx = self._add(flags.astype(jnp.float32))
        return lambda: self._sums[idx].astype(jnp.int64)

    def request_sum(self, vals):
        if jnp.issubdtype(vals.dtype, jnp.integer) or \
                vals.dtype == jnp.bool_:
            v = vals.astype(jnp.int64)
            idxs = []
            rest = v
            for _ in range(3):
                idxs.append(self._add((rest & 0xFFFF).astype(jnp.float32)))
                rest = rest >> 16  # arithmetic shift
            idxs.append(self._add(rest.astype(jnp.float32)))  # signed top

            def resolve_int():
                total = jnp.zeros(self.d, jnp.int64)
                for k, i in enumerate(idxs):
                    total = total + \
                        (self._sums[i].astype(jnp.int64) << (16 * k))
                return total
            return resolve_int
        v64 = vals.astype(jnp.float64)
        hi = v64.astype(jnp.float32)
        lo = (v64 - hi.astype(jnp.float64)).astype(jnp.float32)
        ih, il = self._add(hi), self._add(lo)
        return lambda: self._sums[ih] + self._sums[il]

    def finalize(self):
        if not self.planes:
            return
        self._sums = _scan_dot(self.planes, self.gid, self.d, self.BLK)


def onehot_segment_sum(values, gid, num_segments: int, out_dtype=None):
    """sum(values) per segment via blocked one-hot matmul (MXU path).

    Exactness strategy per input class:
    * integers (incl. decimal64 backing): EXACT — four 16-bit magnitude
      planes, each plane's per-block f32 dot sums <= 255*65535 < 2^24, f64
      recombination.
    * floats: hi/lo f32 value planes with 256-row blocks; worst-case block
      accumulation error ~1e-7 relative (differential comparators use
      relative tolerance, like the reference's QueryResultComparator).
    gid must be int32 in [0, num_segments); rows to drop carry weight 0.
    """
    d = int(num_segments)
    if jnp.issubdtype(values.dtype, jnp.integer) or \
            values.dtype == jnp.bool_:
        out_dtype = out_dtype or jnp.int64
        v = values.astype(jnp.int64)
        # signed split: v = sum(plane_k * 2^(16k)); planes 0-2 in [0, 65535],
        # plane 3 signed. Exact for |segment sum| < 2^53 (f64 recombination).
        planes = []
        rest = v
        for _ in range(3):
            planes.append((rest & 0xFFFF).astype(jnp.float32))
            rest = rest >> 16  # arithmetic shift
        planes.append(rest.astype(jnp.float32))  # signed top plane (v >> 48)
        plane_sums = _scan_dot(planes, gid, d, 256)
        # recombine in int64: each plane sum is an exact integer in f64;
        # shifting/adding as int64 matches Java/Spark wraparound exactly
        total = jnp.zeros(d, jnp.int64)
        for k, s in enumerate(plane_sums):
            total = total + (s.astype(jnp.int64) << (16 * k))
        return total.astype(out_dtype)
    out_dtype = out_dtype or jnp.float64
    v64 = values.astype(jnp.float64)
    hi = v64.astype(jnp.float32)
    lo = (v64 - hi.astype(jnp.float64)).astype(jnp.float32)
    s_hi, s_lo = _scan_dot([hi, lo], gid, d, 256)
    return (s_hi + s_lo).astype(out_dtype)


def onehot_segment_count(flags, gid, num_segments: int):
    """count of True flags per segment — EXACT (block sums <= ROW_BLOCK,
    far under f32's 2^24 integer range)."""
    (s,) = _scan_dot([flags.astype(jnp.float32)], gid, int(num_segments),
                     ROW_BLOCK)
    return s.astype(jnp.int64)


def onehot_segment_minmax(values, gid, num_segments: int, identity,
                          is_min: bool):
    """Per-segment min/max via blocked compare-select (VPU, no scatter).

    Works in the values' own dtype (exact): the [blk, d] one-hot select is
    elementwise, never a lossy matmul.
    """
    n = values.shape[0]
    d = int(num_segments)
    blk = ROW_BLOCK
    pad = (-n) % blk
    if pad:
        values = jnp.concatenate(
            [values, jnp.full(pad, identity, values.dtype)])
        gid = jnp.concatenate([gid, jnp.zeros(pad, gid.dtype)])
    nb = (n + pad) // blk
    vals2 = values.reshape(nb, blk)
    gid2 = gid.reshape(nb, blk).astype(jnp.int32)
    ident = jnp.asarray(identity, values.dtype)
    combine = jnp.minimum if is_min else jnp.maximum
    reduce_ = (lambda x: jnp.min(x, axis=0)) if is_min else \
        (lambda x: jnp.max(x, axis=0))

    def body(acc, xs):
        v, g = xs
        oh = (g[:, None] == jax.lax.broadcasted_iota(jnp.int32, (blk, d), 1))
        contrib = jnp.where(oh, v[:, None], ident)
        return combine(acc, reduce_(contrib)), None

    acc0 = jnp.full(d, ident)
    acc, _ = jax.lax.scan(body, acc0, (vals2, gid2))
    return acc


# ---------------------------------------------------------------------------
# True Pallas (Mosaic) kernel: fused multi-plane segment sum.
#
# One grid pass over the rows builds each [SUB, d] one-hot tile ONCE in VMEM
# and contracts it against EVERY value plane on the MXU; the [d, P]
# accumulator lives in VMEM across the whole grid as a double-f32
# (TwoSum-compensated) pair, so per-block f32 dot results accumulate with
# ~48-bit effective precision — exact for the 16-bit integer magnitude
# planes (plane sums < 2^40) and ~1e-7-relative for float hi/lo planes.
# Replaces the lax.scan + dot_general path (which re-reads gid and carries
# accumulators through the scan) with a single kernel: gid is read once,
# one-hot never touches HBM, and every aggregate column in the GROUP BY
# shares the pass. Reference analog: the SIMD agg hash map
# (agg/agg_hash_map.rs:26-100) — same job, MXU-shaped.
# ---------------------------------------------------------------------------

SUB = 256        # rows per one-hot dot (float accuracy ~2e-6 rel; int
                 # 12-bit planes stay far inside the f32-exact bound)
TILE_ROWS = 2048  # rows per grid step (SUB * 8)


def _fused_kernel(gid_ref, vals_ref, hi_ref, lo_ref, acc_hi, acc_lo):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_hi[:] = jnp.zeros_like(acc_hi)
        acc_lo[:] = jnp.zeros_like(acc_lo)

    d = hi_ref.shape[0]
    for k in range(TILE_ROWS // SUB):
        g = gid_ref[0, k, :]                                     # [SUB]
        oh = (g[:, None] ==
              jax.lax.broadcasted_iota(jnp.int32, (SUB, d), 1)
              ).astype(jnp.float32)                              # [SUB, d]
        v = vals_ref[k * SUB:(k + 1) * SUB, :]                   # [SUB, P]
        # HIGHEST: full-f32 MXU passes — the default single bf16 pass
        # truncates the value planes' mantissas
        sub = jax.lax.dot_general(
            oh, v, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)                 # [d, P]
        # TwoSum into VMEM scratch (scratch persists across the sequential
        # grid; writing out_refs every step would force a serializing
        # read-modify-write of the output window)
        a = acc_hi[:]
        s = a + sub
        z = s - a
        err = (a - (s - z)) + (sub - z)
        acc_hi[:] = s
        acc_lo[:] = acc_lo[:] + err

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        hi_ref[:] = acc_hi[:]
        lo_ref[:] = acc_lo[:]


def pallas_segment_sum_planes(planes, gid, num_segments: int,
                              interpret: bool = False):
    """planes: [n, P] f32 (pre-masked); gid: [n] int32 in [0, d).
    Returns [d, P] f64 sums (hi + lo recombined)."""
    n, P = planes.shape
    d = int(num_segments)
    pad = (-n) % TILE_ROWS
    if pad:
        planes = jnp.concatenate(
            [planes, jnp.zeros((pad, P), planes.dtype)])
        # padded rows carry weight 0 in every plane; any segment id works
        gid = jnp.concatenate([gid, jnp.zeros(pad, gid.dtype)])
    n_pad = n + pad
    grid = n_pad // TILE_ROWS
    # Mosaic block-shape rule: last two dims divisible by (8, 128) — the
    # gid tile rides as [1, SUBBLOCKS, SUB] (8 x 256)
    gid2 = gid.reshape(grid, TILE_ROWS // SUB, SUB)
    # Mosaic cannot lower the i64 index-map constants produced under the
    # engine's global x64 mode — trace the pallas_call with x64 off (all
    # kernel dtypes are explicit f32/i32, so nothing changes numerically)
    from jax._src.config import enable_x64  # no public ctx in this jax
    with enable_x64(False):
        hi, lo = pl.pallas_call(
            _fused_kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((1, TILE_ROWS // SUB, SUB),
                             lambda i: (i, 0, 0)),
                pl.BlockSpec((TILE_ROWS, P), lambda i: (i, 0)),
            ],
            out_specs=(
                pl.BlockSpec((d, P), lambda i: (0, 0)),
                pl.BlockSpec((d, P), lambda i: (0, 0)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((d, P), jnp.float32),
                jax.ShapeDtypeStruct((d, P), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((d, P), jnp.float32),
                pltpu.VMEM((d, P), jnp.float32),
            ],
            interpret=interpret,
        )(gid2, planes)
    return hi.astype(jnp.float64) + lo.astype(jnp.float64)


def use_pallas_fused(num_segments: int, rows: int) -> bool:
    """The fused kernel needs the [SUB, d] one-hot + [d, P] accumulators in
    VMEM; d <= 4096 keeps the one-hot tile at 4MB."""
    if not config.conf.get(config.PALLAS_FUSED_ENABLE):
        return False
    if num_segments > 4096:
        return False
    if config.conf.get(config.PALLAS_INTERPRET):
        return True  # testing on CPU: no row floor
    return jax.default_backend() == "tpu" and rows >= (1 << 15)


class SumBatcher:
    """Cross-column fusion: collect every count/sum plane of one GROUP BY,
    run ONE fused kernel, hand back per-request slices.

    Requests return closures resolved after finalize(); integer sums ride
    four 16-bit magnitude planes (exact, see onehot_segment_sum), floats
    ride hi/lo f32 splitting.
    """

    def __init__(self, gid32, num_segments: int, interpret: bool = False):
        self.gid = gid32
        self.d = int(num_segments)
        self.planes = []
        self.interpret = interpret
        self._sums = None

    def _add(self, plane) -> int:
        self.planes.append(plane.astype(jnp.float32))
        return len(self.planes) - 1

    def request_count(self, flags):
        idx = self._add(flags.astype(jnp.float32))
        return lambda: self._sums[:, idx].astype(jnp.int64)

    def request_sum(self, vals):
        if jnp.issubdtype(vals.dtype, jnp.integer) or \
                vals.dtype == jnp.bool_:
            v = vals.astype(jnp.int64)
            # 12-bit magnitude planes: plane value < 4096, so a SUB-row
            # f32 dot stays exact (extra planes are free — the MXU lane
            # dimension pads to 128 anyway)
            idxs = []
            rest = v
            for _ in range(5):
                idxs.append(self._add((rest & 0xFFF).astype(jnp.float32)))
                rest = rest >> 12
            idxs.append(self._add(rest.astype(jnp.float32)))  # signed top

            def resolve_int():
                total = jnp.zeros(self.d, jnp.int64)
                for k, i in enumerate(idxs):
                    total = total + \
                        (self._sums[:, i].astype(jnp.int64) << (12 * k))
                return total
            return resolve_int
        v64 = vals.astype(jnp.float64)
        hi = v64.astype(jnp.float32)
        lo = (v64 - hi.astype(jnp.float64)).astype(jnp.float32)
        ih, il = self._add(hi), self._add(lo)
        return lambda: self._sums[:, ih] + self._sums[:, il]

    def finalize(self):
        if not self.planes:
            return
        mat = jnp.stack(self.planes, axis=1)
        self._sums = pallas_segment_sum_planes(
            mat, self.gid, self.d, interpret=self.interpret)
