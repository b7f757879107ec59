"""Per-operator metrics + speed-of-light roofline accounting.

Reference analog: DataFusion MetricsSet pushed into the Spark SQL metrics
tree at task end (/root/reference/native-engine/auron/src/metrics.rs:9-45,
metric catalog NativeHelper.scala:167-199). Here a query runs as one XLA
program, so metrics come from two sources:

* plan-level: rows in/out and bytes-touched estimates per operator
  (exact — computed from static schemas + traced row counts), and
* run-level: wall time per jitted stage, compared against a per-backend
  speed-of-light bound (HBM bytes/s) -> roofline fraction, the BASELINE.json
  "per-operator speed-of-light roofline accounting" requirement.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import numpy as np


# Spec-sheet peak HBM bandwidth (bytes/s) per backend generation — the
# FALLBACK roofline denominator when measurement is disabled. The live
# denominator is the STREAM triad measured on the actual device at first
# use (runtime/roofline.py; auron.roofline.measure.peak).
PEAK_HBM_BPS = {
    "tpu": 1.2e12,     # ~TPU v4/v5e class
    "cpu": 5.0e10,
    "gpu": 2.0e12,
}


def peak_bps() -> float:
    from auron_tpu import config
    if config.conf.get(config.ROOFLINE_MEASURE_PEAK):
        from auron_tpu.runtime import roofline
        try:
            return roofline.measured_peak_bps()
        except Exception:
            pass  # measurement unavailable (no device) -> spec fallback
    return PEAK_HBM_BPS.get(jax.default_backend(), 1e11)


@dataclass
class OpMetrics:
    op: str
    rows_out: int = 0
    bytes_touched: int = 0
    wall_s: float = 0.0

    def as_dict(self):
        return {"op": self.op, "rows_out": self.rows_out,
                "bytes_touched": self.bytes_touched,
                "wall_s": round(self.wall_s, 6)}


@dataclass
class StageMetrics:
    """One jitted stage: wall time + aggregate byte traffic estimate."""

    name: str
    wall_s: float = 0.0
    bytes_touched: int = 0
    ops: List[OpMetrics] = field(default_factory=list)

    @property
    def achieved_bps(self) -> float:
        return self.bytes_touched / self.wall_s if self.wall_s > 0 else 0.0

    @property
    def roofline_fraction(self) -> float:
        return self.achieved_bps / peak_bps()

    def report(self) -> str:
        lines = [f"stage {self.name}: {self.wall_s*1e3:.2f} ms, "
                 f"{self.bytes_touched/1e6:.1f} MB touched, "
                 f"{self.achieved_bps/1e9:.1f} GB/s "
                 f"({self.roofline_fraction*100:.1f}% of roofline)"]
        for m in self.ops:
            lines.append(f"  {m.op}: rows_out={m.rows_out} "
                         f"bytes={m.bytes_touched/1e6:.1f}MB")
        return "\n".join(lines)

    def as_json(self) -> str:
        return json.dumps({
            "stage": self.name, "wall_s": self.wall_s,
            "bytes": self.bytes_touched,
            "achieved_gbps": self.achieved_bps / 1e9,
            "roofline_fraction": self.roofline_fraction,
            "ops": [m.as_dict() for m in self.ops]})


def block_bytes(block) -> int:
    """In-HBM footprint of a block (values + validity + mask)."""
    total = block.capacity  # row mask, 1 byte/bool
    for c in block.columns.values():
        width = np.dtype(c.dtype.np_dtype).itemsize
        n = int(np.prod(c.values.shape))
        total += n * width
        if c.validity is not None:
            total += block.capacity
    return total


def plan_bytes_estimate(plan, session) -> Dict[str, int]:
    """Static walk: per-node bytes-touched estimate (inputs + outputs, one
    read + one write — the speed-of-light traffic for a fused pass)."""
    from auron_tpu.plan import nodes as PN
    out: Dict[str, int] = {}

    def cap_bytes(node) -> int:
        if isinstance(node, PN.MemoryScan):
            blocks = session.tables[node.table]
            return sum(block_bytes(b) for b in blocks)
        kids = node.children
        return sum(cap_bytes(c) for c in kids) if kids else 0

    def walk(node):
        nb = cap_bytes(node)
        out[f"{type(node).__name__}@{id(node):x}"] = nb
        for c in node.children:
            walk(c)

    walk(plan)
    return out


class StageTimer:
    """Times a jitted stage with block_until_ready and logs the roofline."""

    def __init__(self, name: str, bytes_touched: int = 0):
        self.metrics = StageMetrics(name, bytes_touched=bytes_touched)

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self.metrics

    def __exit__(self, *exc):
        self.metrics.wall_s = time.perf_counter() - self._t0
        return False


def timed_run(name: str, fn, *args, bytes_touched: int = 0) -> tuple:
    """Run fn, block until device-ready, return (result, StageMetrics)."""
    with StageTimer(name, bytes_touched) as m:
        out = fn(*args)
        jax.block_until_ready(jax.tree.leaves(out))
    return out, m


# ---------------------------------------------------------------------------
# Traced per-operator counters for JITTED runs (metrics.rs:9-45 push-back
# analog). Wall-clock per op is meaningless inside one fused XLA program;
# what IS observable per operator are its traced output-row counts, which
# ride the program outputs like the overflow counters do, plus the static
# bytes-touched estimates. The host assembles both into the metrics tree
# after execution.
# ---------------------------------------------------------------------------

import threading as _threading

_op_tls = _threading.local()


class OpCounterScope:
    def __init__(self):
        self.entries: List = []  # (key, traced rows_out scalar)

    def keys(self):
        return [k for k, _ in self.entries]

    def values(self):
        return [v for _, v in self.entries]


def record_op_rows(key: str, blocks) -> None:
    """Called from the executor per node; no-op outside a scope."""
    scope = getattr(_op_tls, "scope", None)
    if scope is None:
        return
    import jax.numpy as jnp
    total = None
    for b in blocks:
        r = jnp.sum(b.row_mask.astype(jnp.int32))
        total = r if total is None else total + r
    if total is not None:
        scope.entries.append((key, total))


from contextlib import contextmanager as _ctx


@_ctx
def collect_op_counters():
    prev = getattr(_op_tls, "scope", None)
    sc = OpCounterScope()
    _op_tls.scope = sc
    try:
        yield sc
    finally:
        _op_tls.scope = prev
