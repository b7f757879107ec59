"""Distributed exchange: the shuffle data plane as XLA collectives.

Replaces the reference's entire shuffle stack — native partition-sorted
compacted files + Spark block-manager transport
(/root/reference/native-engine/datafusion-ext-plans/src/shuffle/
buffered_data.rs:123-358, AuronShuffleManager.scala) — with an in-program
exchange over the mesh interconnect (ICI within a slice, DCN across hosts):

1. per-row destination ids (murmur3 pmod — bit-exact Spark placement,
   parallel/partition.py),
2. one stable sort by destination = the radix partition-sort
   (buffered_data.rs:291-358's analog, but on the sort unit),
3. counts per destination + exclusive offsets (the "offsets index" of the
   shuffle file format becomes two tiny vectors),
4. `lax.all_to_all` on a [n_dest, pair_cap] staging layout — ragged rows ride
   a padded lane with their liveness mask; the mask itself is exchanged so
   receivers need no second counts round-trip.

Everything happens inside the jitted SPMD program: exchange overlaps with
adjacent compute under XLA's async collective scheduling, which is the
overlap the reference could never get across its JNI/file boundary.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from auron_tpu import config
from auron_tpu.block import Column, TableBlock
from auron_tpu.parallel.partition import partition_ids


def default_pair_capacity(capacity: int, n_dest: int, slack: float = 2.0
                          ) -> int:
    """Static per-(src,dst) row capacity. Uniform keys need cap/n; slack
    covers moderate skew (heavy skew is split by the skew handler before the
    exchange, parallel/skew.py)."""
    base = max(capacity // max(n_dest, 1), 1)
    cap = int(base * slack)
    return max(((cap + 7) // 8) * 8, 8)


def all_to_all_exchange(block: TableBlock, part, axis_name: str,
                        pair_capacity: Optional[int] = None) -> TableBlock:
    """Inside shard_map: route rows to the device == their partition id."""
    from auron_tpu.parallel.partition import RoundRobinPartitioning
    if isinstance(part, RoundRobinPartitioning):
        # salt by device position (reference mod.rs:190-202: per-map-task
        # offset) so destination 0 doesn't receive every shard's head rows
        live_rank = jnp.cumsum(block.row_mask.astype(jnp.int64)) - 1
        me = jax.lax.axis_index(axis_name).astype(jnp.int64)
        ids = ((live_rank + part.start + me) % part.num_partitions
               ).astype(jnp.int32)
        return all_to_all_exchange_ids(block, ids, axis_name, pair_capacity)
    return all_to_all_exchange_ids(block, partition_ids(block, part),
                                   axis_name, pair_capacity)


def all_to_all_exchange_ids(block: TableBlock, ids, axis_name: str,
                            pair_capacity: Optional[int] = None
                            ) -> TableBlock:
    """Exchange with caller-provided destination ids (skew handler path).

    ``ids`` >= n or a dead row mean "drop" (sentinel routing). Returns the
    local output block (capacity = n_dest * pair_capacity). The true
    per-destination row count is recorded as a traced overflow counter
    (runtime/overflow.py); if it ever exceeds ``pair_capacity`` the
    execution boundary regrows the pair slack and re-runs, so rows are never
    silently lost. The skew handler pre-splits heavy keys (parallel/skew.py)
    to keep the lanes balanced in the first place.
    """
    n = jax.lax.axis_size(axis_name)
    cap = block.capacity
    C = pair_capacity or default_pair_capacity(
        cap, n, config.conf.get(config.EXCHANGE_PAIR_SLACK))

    ids = jnp.where(block.row_mask, ids, n)  # dead rows -> sentinel bucket

    # partition-sort rows by destination (stable)
    iota = jnp.arange(cap, dtype=jnp.int32)
    _, perm = jax.lax.sort((ids, iota), dimension=0, is_stable=True,
                           num_keys=1)
    sorted_ids = jnp.take(ids, perm)
    counts = jax.ops.segment_sum(jnp.ones(cap, jnp.int32),
                                 jnp.clip(ids, 0, n), n + 1)[:n]
    offsets = jnp.cumsum(counts) - counts  # exclusive
    from auron_tpu.runtime import overflow
    overflow.record("exchange", jnp.max(counts), C)

    # staging gather indices: slot (p, i) <- sorted row offsets[p]+i
    slot_p = jax.lax.broadcasted_iota(jnp.int32, (n, C), 0)
    slot_i = jax.lax.broadcasted_iota(jnp.int32, (n, C), 1)
    src_pos = jnp.take(offsets, slot_p) + slot_i
    slot_live = slot_i < jnp.take(counts, slot_p)
    src_row = jnp.take(perm, jnp.clip(src_pos, 0, cap - 1))

    # Batch staging: group same-dtype 1-D columns, ONE gather per group
    # (TPU gather cost is per index, not per byte) and ONE all_to_all per
    # group (fewer collective launches).
    groups: Dict[str, list] = {}
    arrays: Dict = {}
    for name, c in block.columns.items():
        key = (name, "v")
        arrays[key] = c.values
        dkey = str(c.values.dtype) if c.values.ndim == 1 else f"2d:{name}"
        groups.setdefault(dkey, []).append(key)
        if c.validity is not None:
            arrays[(name, "n")] = c.validity
            groups.setdefault("bool", []).append((name, "n"))
    groups.setdefault("bool", []).insert(0, "#mask")
    arrays["#mask"] = block.row_mask

    # optional chunked collectives: slice the per-pair lane axis so XLA can
    # pipeline independent transfers (EXCHANGE_CHUNKS > 1; the reference's
    # analog is its ~4MB shuffle block framing, ipc_compression.rs:72-80)
    n_chunks = max(int(config.conf.get(config.EXCHANGE_CHUNKS)), 1)
    n_chunks = min(n_chunks, C)
    bounds = [(C * i // n_chunks, C * (i + 1) // n_chunks)
              for i in range(n_chunks)]

    def chunked_swap(staged):
        if n_chunks == 1:
            return jax.lax.all_to_all(staged, axis_name, split_axis=0,
                                      concat_axis=0, tiled=True)
        parts = [jax.lax.all_to_all(staged[:, c0:c1], axis_name,
                                    split_axis=0, concat_axis=0, tiled=True)
                 for c0, c1 in bounds]
        return jnp.concatenate(parts, axis=1)

    swapped: Dict = {}
    for dkey, keys in groups.items():
        if dkey.startswith("2d:"):
            (key,) = keys
            staged = jnp.take(arrays[key], src_row.reshape(-1), axis=0)
            staged = staged.reshape((n, C) + arrays[key].shape[1:])
            got = chunked_swap(staged)
            swapped[key] = got.reshape((n * C,) + arrays[key].shape[1:])
            continue
        stacked = jnp.stack([arrays[k] for k in keys], axis=1)  # [cap, k]
        staged = jnp.take(stacked, src_row.reshape(-1), axis=0)
        staged = staged.reshape(n, C, len(keys))
        if dkey == "bool":
            staged = staged & slot_live[:, :, None]
        got = chunked_swap(staged)
        flat = got.reshape(n * C, len(keys))
        for j, k in enumerate(keys):
            swapped[k] = flat[:, j]

    out_mask = swapped["#mask"]
    out_cols: Dict[str, Column] = {}
    for name, c in block.columns.items():
        validity = swapped.get((name, "n"))
        out_cols[name] = Column(swapped[(name, "v")], validity, c.dtype,
                                c.dict_values)
    return TableBlock(out_cols, out_mask)


def all_gather_block(block: TableBlock, axis_name: str) -> TableBlock:
    """Replicate the full table on every device (broadcast-build side;
    reference NativeBroadcastExchangeBase.scala:217-316's TorrentBroadcast
    becomes one all_gather over ICI)."""
    def ag(arr):
        g = jax.lax.all_gather(arr, axis_name, axis=0, tiled=True)
        return g

    cols = {}
    for name, c in block.columns.items():
        vals = ag(c.values)
        validity = None if c.validity is None else ag(c.validity)
        cols[name] = Column(vals, validity, c.dtype, c.dict_values)
    return TableBlock(cols, ag(block.row_mask))


def gather_to_single(block: TableBlock, axis_name: str) -> TableBlock:
    """SinglePartitioning under SPMD: all rows live on device 0, other
    devices keep dead copies (static shapes everywhere)."""
    full = all_gather_block(block, axis_name)
    me = jax.lax.axis_index(axis_name)
    return full.with_mask(jnp.where(me == 0, full.row_mask, False))
