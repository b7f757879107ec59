"""Multi-host runtime scaffolding (SURVEY §7.2 L5').

The reference scales out through Spark's cluster manager: one JVM
executor per host, tasks pull shuffle blocks over Netty, and the native
engine never sees the other hosts (auron/src/rt.rs per-task runtimes;
shuffle transport in the JVM). The TPU-native shape is inverted: ONE
SPMD program spans every chip of every host — `jax.distributed`
initializes the cross-host runtime, the global `Mesh` covers
(hosts × local chips), and cross-host movement happens inside the
compiled program as XLA collectives riding ICI within a slice and DCN
across slices. There is no block-manager analog to port; placement and
transport ARE the sharding annotations.

What this module provides over raw jax APIs:
  * `init_multihost()` — idempotent `jax.distributed.initialize` with
    env-based defaults (a no-op single-process when unconfigured).
  * `global_mesh(axis)` — a Mesh over ALL addressable+remote devices,
    ordered host-major so partition p lives on host p // chips_per_host
    (the table-placement contract run_plan_spmd assumes).
  * `host_local_partitions(n)` — which of n hash partitions this host
    must feed (data loading: each host reads only its own shards, the
    multi-host analog of register_pandas).
  * `make_global_table(...)` — assemble a global device array from
    host-local partition blocks via
    `jax.make_array_from_single_device_arrays`.
"""

from __future__ import annotations

import os
from typing import Dict, List, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_multihost(coordinator: str = None, num_processes: int = None,
                   process_id: int = None) -> bool:
    """Idempotent jax.distributed.initialize. Reads the standard env
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or
    the TPU pod metadata jax discovers on its own). Returns True when a
    multi-process runtime is (already) up, False for single-process."""
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator is None and num_processes is None:
        return jax.process_count() > 1  # single-process dev/test run
    # NOTE: jax.process_count() must NOT run before initialize — it
    # initializes the local backend and distributed.initialize then
    # refuses ("must be called before backends"). Check the distributed
    # client state instead (caught by the real 2-process test).
    from jax._src import distributed as _dist
    if getattr(_dist.global_state, "client", None) is not None:
        return jax.process_count() > 1  # already initialized (idempotent)
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes, process_id=process_id)
    return jax.process_count() > 1


def global_mesh(axis: str = "part") -> Mesh:
    """1-D mesh over every device in the job, host-major: devices are
    ordered by (process_index, local ordinal) so the partition→host map
    is contiguous and DCN hops only happen at host boundaries of the
    exchange's all_to_all."""
    devs = sorted(jax.devices(),
                  key=lambda d: (d.process_index, d.id))
    return Mesh(np.array(devs), (axis,))


def host_local_partitions(num_partitions: int) -> List[int]:
    """The hash-partition ids THIS host is responsible for feeding —
    each host loads only its slice of the table (scan locality; the
    Spark-executor data-locality analog)."""
    devs = sorted(jax.devices(),
                  key=lambda d: (d.process_index, d.id))
    mine = [i for i, d in enumerate(devs)
            if d.process_index == jax.process_index()]
    if num_partitions != len(devs):
        raise ValueError(
            f"partitions ({num_partitions}) must equal global devices "
            f"({len(devs)}) — one mesh position per partition")
    return mine


def make_global_table(mesh: Mesh, axis: str,
                      local_blocks: Dict[int, "object"]):
    """Assemble the global [n_partitions, capacity] stacked arrays from
    this host's partition blocks (jax.make_array_from_single_device_
    arrays — no host gathers the whole table)."""
    from auron_tpu.block import Column, TableBlock
    devs = list(mesh.devices.ravel())
    local_ids = host_local_partitions(len(devs))
    missing = [i for i in local_ids if i not in local_blocks]
    if missing:
        raise ValueError(f"host must provide partitions {missing}")
    sample = local_blocks[local_ids[0]]
    sharding = NamedSharding(mesh, P(axis))

    def build(column_of):
        shards = []
        for i in local_ids:
            arr = np.asarray(column_of(local_blocks[i]))[None]
            shards.append(jax.device_put(arr, devs[i]))
        shape = (len(devs),) + shards[0].shape[1:]
        return jax.make_array_from_single_device_arrays(
            shape, sharding, shards)

    cols = {}
    for name, c in sample.columns.items():
        vals = build(lambda b, n=name: b.columns[n].values)
        validity = None
        if c.validity is not None:
            validity = build(lambda b, n=name: b.columns[n].validity)
        cols[name] = Column(vals, validity, c.dtype, c.dict_values)
    mask = build(lambda b: b.row_mask)
    return TableBlock(cols, mask)
