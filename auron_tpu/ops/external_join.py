"""Out-of-core partitioned hash join over host-staged tables.

The reference joins never exceed memory because every operator can spill
through MemManager (/root/reference/native-engine/auron-memmgr/src/
lib.rs:308-428) and the hash join falls back to sort-merge when the build
side outgrows its budget (broadcast_join_exec.rs:404-479). The TPU analog
is the classic radix join reshaped for this engine's host-RAM staging tier
(io/staging.py):

1. PARTITION: stream both inputs chunk by chunk; murmur3-hash the join
   keys (the same spark-compatible hash the exchange uses,
   parallel/partition.py) into ``n_buckets`` buckets; each chunk's rows
   scatter host-side into per-bucket compressed payloads. Peak HBM = one
   chunk.
2. JOIN: for each bucket, materialize the probe+build payload groups into
   HBM, run the normal sorted-probe kernel (ops/join.py join_blocks —
   exact output sizing via join_match_counts, all 7 join types), then
   stream the result back to host. Peak HBM = one bucket pair + output.

Key equality implies equal bucket, so every match is bucket-local; outer
semantics (unmatched probe/build rows) are also bucket-local. The one
GLOBAL property — null-aware anti join's "any build-side null key kills
everything" (NOT IN) — is handled by a streaming pre-scan, after which
the per-bucket joins run as plain anti joins.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import numpy as np

from auron_tpu.block import Column, TableBlock
from auron_tpu.io.serde import deserialize_block, serialize_block
from auron_tpu.io.staging import StagedTable
from auron_tpu.ops import join as J
from auron_tpu.parallel.partition import HashPartitioning, partition_ids


class _HostView:
    """Numpy-backed TableBlock stand-in accepted by serialize_block —
    bucket scatter must not round-trip each bucket through the device."""

    def __init__(self, columns, row_mask, capacity):
        self.columns = columns
        self.row_mask = row_mask
        self.capacity = capacity


def _host_columns(block: TableBlock):
    return {name: Column(np.asarray(c.values),
                         None if c.validity is None
                         else np.asarray(c.validity),
                         c.dtype, c.dict_values)
            for name, c in block.columns.items()}


def bucket_staged(staged: StagedTable, key_names: Sequence[str],
                  n_buckets: int, seed: int = 42) -> List[List[bytes]]:
    """Hash-partition a staged table into per-bucket payload lists.

    One devicechunk pass: partition ids compute on device, the scatter
    itself is host-side numpy (one device->host pull per chunk, not per
    bucket)."""
    part = HashPartitioning(tuple(key_names), n_buckets, seed=seed)
    buckets: List[List[bytes]] = [[] for _ in range(n_buckets)]
    for chunk in staged.blocks():
        ids = np.asarray(partition_ids(chunk, part))
        mask = np.asarray(chunk.row_mask)
        host_cols = _host_columns(chunk)
        for k in range(n_buckets):
            sel = mask & (ids == k)
            if not sel.any():
                continue
            buckets[k].append(serialize_block(
                _HostView(host_cols, sel, chunk.capacity)))
    return buckets


def _materialize(payloads: List[bytes]) -> Optional[TableBlock]:
    if not payloads:
        return None
    blocks = [deserialize_block(p) for p in payloads]
    return blocks[0] if len(blocks) == 1 else J.concat_blocks(blocks)


def _empty_like(staged: StagedTable) -> TableBlock:
    b = deserialize_block(staged.payloads[0])
    import jax.numpy as jnp
    return TableBlock(b.columns, jnp.zeros_like(b.row_mask))


def _has_null_keys(staged: StagedTable, key_names: Sequence[str]) -> bool:
    for chunk in staged.blocks():
        mask = np.asarray(chunk.row_mask)
        for k in key_names:
            v = chunk.columns[k].validity
            if v is not None and bool((mask & ~np.asarray(v)).any()):
                return True
    return False


def join_staged(probe: StagedTable, build: StagedTable, spec: J.JoinSpec,
                n_buckets: int = 8,
                filter_fn: Optional[Callable] = None) -> StagedTable:
    """Radix join of two staged tables; exact for every join type the
    in-HBM kernel supports. Output is a StagedTable (one payload per
    non-empty bucket result)."""
    if probe.num_partitions == 0 or build.num_partitions == 0:
        return StagedTable([])
    if spec.null_aware and spec.join_type == J.LEFT_ANTI:
        # NOT IN: one null build key anywhere empties the result globally
        # (join.py handles the same rule in-HBM; here it must be decided
        # BEFORE bucketing because nulls only co-locate with nulls)
        if _has_null_keys(build, spec.right_keys):
            out = _empty_like(probe)
            return StagedTable([serialize_block(out)])
        import dataclasses
        spec = dataclasses.replace(spec, null_aware=False)
    pb = bucket_staged(probe, spec.left_keys, n_buckets)
    bb = bucket_staged(build, spec.right_keys, n_buckets)
    out_payloads: List[bytes] = []
    keep_probe_unmatched = spec.join_type in (
        J.LEFT, J.FULL, J.LEFT_ANTI, J.EXISTENCE)
    keep_build_unmatched = spec.join_type in (J.RIGHT, J.FULL)
    for k in range(n_buckets):
        left = _materialize(pb[k])
        right = _materialize(bb[k])
        if left is None and right is None:
            continue
        if left is None:
            if keep_build_unmatched:
                # emit build rows as unmatched against an empty probe
                left = _empty_like(probe)
            else:
                continue
        if right is None:
            if not keep_probe_unmatched:
                continue
            right = _empty_like(build)
        counts = np.asarray(J.join_match_counts(left, right, spec))
        live = np.asarray(left.row_mask)
        total = int(counts[live].sum()) if live.any() else 0
        cap = max(total + int(live.sum()) + int(
            np.asarray(right.row_mask).sum()), 1)
        out = J.join_blocks(left, right, spec, out_capacity=cap,
                            filter_fn=filter_fn)
        if bool(np.asarray(out.row_mask).any()):
            out_payloads.append(serialize_block(out))
        del left, right, out
    return StagedTable(out_payloads)
