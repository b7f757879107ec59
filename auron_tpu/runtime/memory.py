"""HBM memory budgeting — the spill-free answer to auron-memmgr.

The reference's MemManager gives every spillable consumer a fair share of
the process budget and forces disk/JVM-heap spills on overflow
(/root/reference/native-engine/auron-memmgr/src/lib.rs:213-428). On TPU the
strategy inverts: we SIZE computations to the HBM budget up front —
capacity bucketing, chunked multi-pass plans, host-RAM staging as the
overflow tier (the serde in io/serde.py) — instead of reacting to pressure
mid-flight, because an XLA program cannot grow its working set dynamically.

This module provides the sizing arithmetic: per-row byte widths from
schemas, suggested capacities for a byte budget (the
compute_suggested_batch_size analog, datafusion-ext-commons/src/lib.rs:
93-117), and plan-level peak estimates used to pick partition counts.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from auron_tpu import config
from auron_tpu.block import round_capacity
from auron_tpu.runtime.metrics import block_bytes

MIN_CAPACITY = 32


def row_bytes(schema) -> int:
    """Bytes per row for a schema (values + validity + mask share)."""
    total = 1  # row mask
    for f in schema:
        total += np.dtype(f.dtype.np_dtype).itemsize
        if f.nullable:
            total += 1
    return total


def suggested_capacity(budget_bytes: int, per_row: int,
                       floor: int = MIN_CAPACITY) -> int:
    """Largest capacity bucket whose block fits the budget (floor 32 rows —
    the reference floors at 20, lib.rs:115)."""
    cap = max(budget_bytes // max(per_row, 1), floor)
    bucket = round_capacity(cap)
    while bucket * per_row > budget_bytes and bucket > floor:
        bucket //= 2
    return max(bucket, floor)


def _device_memory_bytes() -> Optional[int]:
    """Queryable memory of the default device (None when the backend
    doesn't report it — e.g. the CPU test mesh)."""
    try:
        import jax
        stats = jax.devices()[0].memory_stats()
        if stats and "bytes_limit" in stats:
            return int(stats["bytes_limit"])
    except Exception:  # noqa: BLE001 — stats are best-effort everywhere
        pass
    return None


class MemoryBudget:
    """Tracks estimated HBM residency; advises chunk counts for plans."""

    def __init__(self, budget_bytes: Optional[int] = None):
        if budget_bytes:
            self.budget = budget_bytes
        else:
            frac = config.conf.get(config.MEMORY_BUDGET_FRACTION)
            self.budget = config.conf.get(config.MEMORY_BUDGET_BYTES)
            if frac > 0:
                dev_mem = _device_memory_bytes()
                if dev_mem:
                    self.budget = int(dev_mem * frac)
        self.registered: Dict[str, int] = {}

    def register_table(self, name: str, blocks) -> int:
        total = sum(block_bytes(b) for b in blocks)
        self.registered[name] = total
        return total

    @property
    def used(self) -> int:
        return sum(self.registered.values())

    @property
    def headroom(self) -> int:
        return max(self.budget - self.used, 0)

    def suggest_partitions(self, total_rows: int, per_row: int,
                           working_factor: float = 4.0) -> int:
        """How many partitions so one partition's working set (input +
        intermediates, ~working_factor x input) fits the headroom."""
        per_part_budget = max(self.headroom, 1)
        need = int(total_rows * per_row * working_factor)
        n = max((need + per_part_budget - 1) // per_part_budget, 1)
        # round up to a power of two for mesh friendliness
        p = 1
        while p < n:
            p *= 2
        return p

    def fits(self, blocks) -> bool:
        return sum(block_bytes(b) for b in blocks) <= self.headroom

    def dump_status(self) -> str:
        """Per-consumer residency report (the reference dumps every
        MemConsumer's status at exit, auron-memmgr/src/lib.rs:143-163)."""
        lines = [f"memory budget: {self.budget:,} B, "
                 f"used {self.used:,} B, headroom {self.headroom:,} B"]
        for name, b in sorted(self.registered.items(),
                              key=lambda kv: -kv[1]):
            pct = 100.0 * b / max(self.budget, 1)
            lines.append(f"  {name}: {b:,} B ({pct:.1f}%)")
        return "\n".join(lines)
