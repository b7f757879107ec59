"""Skew-aware repartitioning — heavy-hitter splitting at exchange time.

The reference has NO native skew handling (it leans on Spark AQE's
stage-granular skew-join splitting; SURVEY.md §2.5). This component is new,
required by the north star: without it, one hot key funnels all its rows to
one chip and the exchange's static per-pair capacity overflows.

Design (static shapes throughout):

1. Each shard folds its live keys into a size-S count sketch
   (bucket = murmur3(key) & (S-1)); a ``psum`` over the mesh axis gives the
   GLOBAL per-bucket histogram — one tiny collective, no key materialization.
2. Buckets holding more than ``frac`` of all rows are *heavy*. False
   positives only cost extra replication, never correctness.
3. Probe side: heavy rows are salted round-robin across all devices instead
   of hashed; light rows follow normal Spark-pmod routing.
4. Build side: light rows exchange normally; heavy rows are compacted into a
   bounded side-block and ``all_gather``-replicated to every device, then
   concatenated with the local build shard.

After this, the standard partition-wise sorted-probe join is correct for
probe-side join types (inner / left / left_semi / left_anti / existence):
every salted probe row finds all matching build rows locally because those
build rows are replicated. Build-side-outer types (right/full) must not use
skewed routing (replicated build rows would emit duplicate unmatched rows) —
the planner keeps plain hash routing for them.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from auron_tpu import config
from auron_tpu.block import Column, TableBlock
from auron_tpu.ops.hashing import column_hash_inputs, hash_columns_murmur3, pmod
from auron_tpu.ops.join import concat_blocks
from auron_tpu.ops.selection import take_block
from auron_tpu.parallel.exchange import all_to_all_exchange_ids

SKETCH_SIZE = 1 << 12  # 4096 buckets


def _key_hashes(block: TableBlock, key_names: Sequence[str]) -> jnp.ndarray:
    cols = [column_hash_inputs(block.columns[k]) for k in key_names]
    return hash_columns_murmur3(cols, block.capacity, seed=42)


def heavy_bucket_mask(hashes, live, axis_name: str,
                      frac: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Global count sketch over the mesh; returns (per-bucket heavy flags,
    per-row bucket ids)."""
    bucket = (hashes.astype(jnp.uint32) & np.uint32(SKETCH_SIZE - 1)) \
        .astype(jnp.int32)
    local = jax.ops.segment_sum(live.astype(jnp.int64),
                                jnp.where(live, bucket, 0), SKETCH_SIZE)
    glob = jax.lax.psum(local, axis_name)
    total = jnp.sum(glob)
    heavy = glob > (total.astype(jnp.float64) * frac).astype(jnp.int64)
    return heavy, bucket


def skewed_join_exchange(probe: TableBlock, build: TableBlock,
                         probe_keys: Sequence[str],
                         build_keys: Sequence[str],
                         axis_name: str,
                         num_partitions: int,
                         frac: Optional[float] = None,
                         heavy_capacity: Optional[int] = None,
                         pair_capacity: Optional[int] = None
                         ) -> Tuple[TableBlock, TableBlock]:
    """Exchange both join sides with heavy keys split + replicated.

    Returns (local probe shard, local build shard incl. replicated heavies).
    """
    n = num_partitions
    frac = frac if frac is not None else \
        config.conf.get(config.SKEW_HEAVY_HITTER_FRACTION)

    p_hash = _key_hashes(probe, probe_keys)
    b_hash = _key_hashes(build, build_keys)
    heavy, p_bucket = heavy_bucket_mask(p_hash, probe.row_mask, axis_name,
                                        frac)
    b_bucket = (b_hash.astype(jnp.uint32) & np.uint32(SKETCH_SIZE - 1)) \
        .astype(jnp.int32)
    p_heavy = jnp.take(heavy, p_bucket) & probe.row_mask
    b_heavy = jnp.take(heavy, b_bucket) & build.row_mask

    # probe routing: heavy -> salted round robin, light -> spark pmod
    me = jax.lax.axis_index(axis_name)
    salt = jnp.cumsum(p_heavy.astype(jnp.int32)) - 1
    rr = ((salt + me) % n).astype(jnp.int32)
    p_ids = jnp.where(p_heavy, rr, pmod(p_hash, n))
    probe_out = all_to_all_exchange_ids(probe, p_ids, axis_name,
                                        pair_capacity)

    # build: light rows exchange normally; heavy rows replicate everywhere
    light_build = build.with_mask(build.row_mask & ~b_heavy)
    build_out = all_to_all_exchange_ids(light_build, pmod(b_hash, n),
                                        axis_name, pair_capacity)

    hcap = heavy_capacity or max(
        int(build.capacity * config.conf.get(config.SKEW_HEAVY_FACTOR)), 128)
    heavy_block = _compact_into(build.with_mask(b_heavy), hcap)
    from auron_tpu.parallel.exchange import all_gather_block
    heavy_all = all_gather_block(heavy_block, axis_name)
    return probe_out, concat_blocks([build_out, heavy_all])


def _compact_into(block: TableBlock, capacity: int) -> TableBlock:
    """Compact live rows into a (smaller) static capacity.

    The true live count rides a traced overflow counter; if it exceeds the
    capacity the execution boundary regrows SKEW_HEAVY_FACTOR and re-runs
    (runtime/overflow.py), so heavy rows are never silently lost."""
    idx = jnp.nonzero(block.row_mask, size=capacity, fill_value=0)[0]
    n = jnp.sum(block.row_mask.astype(jnp.int32))
    from auron_tpu.runtime import overflow
    overflow.record("skew_heavy", n, capacity)
    new_mask = jnp.arange(capacity) < n
    return take_block(block, idx, new_mask)


# ---------------------------------------------------------------------------
# Planner-side auto-detection (north-star item; the reference delegates skew
# to Spark AQE's stage-granular splitting, SURVEY.md §2.5). Concrete table
# stats are available before the SPMD program compiles — sample the probe
# key's heavy-hitter fraction and rewrite qualifying partitioned joins to
# the skew-handled form (dropping the hash exchanges the handler replaces).
# ---------------------------------------------------------------------------

_PROBE_SIDE_TYPES = ("inner", "left", "left_semi", "left_anti", "existence")


def _scan_under(node):
    from auron_tpu.plan import nodes as PN
    while isinstance(node, (PN.Filter, PN.Rename)):
        node = node.child
    return node if isinstance(node, PN.MemoryScan) else None


def _heavy_fraction(blocks, key: str, sample: int = 1 << 16) -> float:
    """Max single-key row share across the table (host-side, sampled)."""
    taken = 0
    vals = []
    for b in blocks:
        if key not in b.columns:
            return 0.0
        c = b.columns[key]
        import jax.core
        if isinstance(c.values, jax.core.Tracer):
            return 0.0
        sel = np.asarray(b.row_mask)
        if c.validity is not None:
            sel = sel & np.asarray(c.validity)
        v = np.asarray(c.values)[sel]
        vals.append(v[: max(sample - taken, 0)])
        taken += len(vals[-1])
        if taken >= sample:
            break
    if not vals:
        return 0.0
    allv = np.concatenate(vals)
    if allv.size == 0:
        return 0.0
    _, counts = np.unique(allv, return_counts=True)
    return float(counts.max() / allv.size)


def auto_skew_rewrite(plan, tables):
    """Rewrite Join[partitioned] -> Join[skewed] when the probe key's
    heavy-hitter fraction exceeds SKEW_HEAVY_HITTER_FRACTION.

    Honors SKEW_DETECT_ENABLE; only probe-side join types qualify (the
    handler's correctness envelope). The hash exchanges the builder placed
    under a partitioned join are dropped — the skew handler routes both
    sides itself.
    """
    import dataclasses
    from auron_tpu.plan import nodes as PN
    if not config.conf.get(config.SKEW_DETECT_ENABLE):
        return plan
    thresh = config.conf.get(config.SKEW_HEAVY_HITTER_FRACTION)

    def walk(node):
        if isinstance(node, PN.Join) and node.strategy == "partitioned" \
                and len(node.left_keys) == 1 \
                and node.join_type in _PROBE_SIDE_TYPES \
                and node.condition is None \
                and isinstance(node.left, PN.Exchange) \
                and isinstance(node.right, PN.Exchange):
            sc = _scan_under(node.left.child)
            if sc is not None and sc.table in tables:
                frac = _heavy_fraction(tables[sc.table], node.left_keys[0])
                if frac > thresh:
                    return dataclasses.replace(
                        node,
                        left=walk(node.left.child),
                        right=walk(node.right.child),
                        strategy="skewed")
        kids = {}
        for f in node.__dataclass_fields__:
            v = getattr(node, f)
            if isinstance(v, PN.PlanNode):
                kids[f] = walk(v)
            elif isinstance(v, tuple) and v and \
                    all(isinstance(x, PN.PlanNode) for x in v):
                kids[f] = tuple(walk(x) for x in v)
        if kids:
            import dataclasses as dc
            return dc.replace(node, **kids)
        return node

    return walk(plan)
