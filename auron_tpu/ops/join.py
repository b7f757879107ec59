"""Equi-join kernels — sorted-probe join over HBM-resident blocks.

Replaces the reference's SIMD hash-map joins
(/root/reference/native-engine/datafusion-ext-plans/src/joins/join_hash_map.rs
8-wide group probing, broadcast_join_exec.rs joiner matrix, sort_merge_join_exec.rs
streaming merge) with ONE TPU-native algorithm: the build side is compacted and
sorted by its encoded key tuple, and every probe row finds its match range
``[lo, hi)`` with a vectorized lexicographic binary search (log2(cap) fully
vectorized compare passes — no data-dependent control flow, no scatter
collisions, everything static-shape). Match ranges expand into a
capacity-bounded output block via prefix sums, the standard XLA join-expansion
trick. The same kernel therefore serves BroadcastHashJoin, ShuffledHashJoin
and SortMergeJoin plan nodes (the reference's SMJ-fallback distinction
disappears: sorted probing IS the merge join, and it never degrades on
oversized builds because there is no hash table to blow up).

Join-type matrix (reference joiner files joins/bhj/{full,semi}_join.rs,
joins/smj/{full,semi,existence}_join.rs): Inner, Left, Right, Full, LeftSemi,
LeftAnti (incl. null-aware NOT IN semantics, auron.proto:502), RightSemi,
RightAnti, Existence. Join filters (inequality conditions) are applied on the
expanded candidate pairs, then outer-row recovery is recomputed — matching
the reference's post-filter join semantics.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from auron_tpu import config
from auron_tpu.block import Column, TableBlock, round_capacity
from auron_tpu.dtypes import BOOL
from auron_tpu.expr.strings import unify_string_columns
from auron_tpu.ops.selection import take_block
from auron_tpu.ops.sort import orderable_values

INNER = "inner"
LEFT = "left"
RIGHT = "right"
FULL = "full"
LEFT_SEMI = "left_semi"
LEFT_ANTI = "left_anti"
RIGHT_SEMI = "right_semi"
RIGHT_ANTI = "right_anti"
EXISTENCE = "existence"

_PROBE_SIDE_TYPES = {INNER, LEFT, LEFT_SEMI, LEFT_ANTI, EXISTENCE}


@dataclass(frozen=True)
class JoinSpec:
    """Equi-join description: key column names on each side.

    ``join_type`` uses left/right relative to (probe=left, build=right)
    framing at this layer; the plan layer maps Spark build-side choices onto
    it. ``null_aware`` applies NOT IN semantics to LEFT_ANTI.
    ``existence_col`` names the appended bool column for EXISTENCE joins.

    ``build_domain``: optional (lo, hi) half-open int range of the single
    build key — the TPU fast path. Random gathers are the slowest primitive
    on TPU (no hardware gather), so when build keys are dense surrogate keys
    (every TPC-DS dim) the probe uses two dense-table lookups
    (first_pos[key], count[key]) instead of a ~20-step binary search: ~10x
    fewer gather passes. The planner infers the range eagerly from concrete
    build data (plan/execute.py), so it is always valid by construction.
    """

    left_keys: Tuple[str, ...]
    right_keys: Tuple[str, ...]
    join_type: str = INNER
    null_aware: bool = False
    existence_col: str = "exists#"
    build_domain: Optional[Tuple[int, int]] = None
    # True when the build key is verified UNIQUE (dimension surrogate keys):
    # matches are 0/1, so inner/left joins skip the whole expansion pipeline
    # — probe columns stay in place (mask only) and build columns arrive via
    # a single batched gather. Set by plan/stats.py after checking the data.
    build_unique: bool = False
    # True when build keys are verified to equal lo + row_position over a
    # live prefix: the position table is the identity — no scatter, no
    # per-probe-row position gather (plan/stats.py _sequential_key).
    build_sequential: bool = False


def _encoded_keys(left: TableBlock, right: TableBlock,
                  spec: JoinSpec) -> Tuple[List, List, jnp.ndarray, jnp.ndarray]:
    """Per key column: comparable int encodings with unified dictionaries.

    Returns (left_ops, right_ops, left_keys_valid, right_keys_valid).
    """
    l_ops, r_ops = [], []
    l_valid = left.row_mask
    r_valid = right.row_mask
    for ln, rn in zip(spec.left_keys, spec.right_keys):
        lc, rc = left.columns[ln], right.columns[rn]
        if lc.dtype.name == "decimal128" or rc.dtype.name == "decimal128":
            # wide-decimal keys: rescale both sides to one decimal128 type,
            # then contribute TWO lexicographic operands (hi, flipped lo)
            from auron_tpu.dtypes import DECIMAL128
            from auron_tpu.expr.cast import cast_column
            from auron_tpu.ops import decimal128 as d128
            s = max(lc.dtype.params[1] if lc.dtype.is_decimal else 0,
                    rc.dtype.params[1] if rc.dtype.is_decimal else 0)
            lc = cast_column(lc, DECIMAL128(38, s), 0)
            rc = cast_column(rc, DECIMAL128(38, s), 0)
            l_ops.extend(d128.orderable_ops(lc.values))
            r_ops.extend(d128.orderable_ops(rc.values))
            if lc.validity is not None:
                l_valid = l_valid & lc.validity
            if rc.validity is not None:
                r_valid = r_valid & rc.validity
            continue
        if lc.dtype.is_raw_string or rc.dtype.is_raw_string:
            # raw byte planes ARE orderable encodings: one operand per
            # word; a dictionary-encoded other side converts with one
            # plane-table gather (expr/strings_raw.py)
            from auron_tpu.expr import strings_raw as SR
            W = max(SR.width_words(c.dtype) if c.dtype.is_raw_string
                    else (SR.max_bytes(c.dict_values) + 3) // 4 or 1
                    for c in (lc, rc))
            for c, ops in ((lc, l_ops), (rc, r_ops)):
                planes = SR.pad_planes(c.values, W) if c.dtype.is_raw_string \
                    else SR.dict_column_as_planes(c, W)
                ops.extend(planes[:, w] for w in range(W))
            if lc.validity is not None:
                l_valid = l_valid & lc.validity
            if rc.validity is not None:
                r_valid = r_valid & rc.validity
            continue
        if lc.dtype.is_string or rc.dtype.is_string:
            (lc, rc), _ = unify_string_columns([lc, rc])
        elif lc.dtype.name != rc.dtype.name and \
                (lc.dtype.is_integer or lc.dtype.is_float) and \
                (rc.dtype.is_integer or rc.dtype.is_float):
            # mixed-type keys (e.g. nullable float64 fk vs int32 sk): the
            # orderable encodings of different dtypes are NOT comparable
            # (floats use the sign-flipped bit trick) — promote the raw
            # values to one numeric dtype first
            from auron_tpu.dtypes import type_from_name
            common_np = jnp.promote_types(lc.values.dtype, rc.values.dtype)
            cdt = type_from_name(str(common_np))
            lc = Column(lc.values.astype(common_np), lc.validity, cdt, None)
            rc = Column(rc.values.astype(common_np), rc.validity, cdt, None)
        lv, rv = orderable_values(lc), orderable_values(rc)
        # keep the narrowest common int type: int64 is software-emulated on
        # TPU, so int32 keys (all TPC-DS surrogate keys) stay int32
        common = jnp.promote_types(lv.dtype, rv.dtype)
        if common == jnp.bool_:
            common = jnp.dtype(jnp.int8)
        l_ops.append(lv.astype(common))
        r_ops.append(rv.astype(common))
        if lc.validity is not None:
            l_valid = l_valid & lc.validity
        if rc.validity is not None:
            r_valid = r_valid & rc.validity
    return l_ops, r_ops, l_valid, r_valid


def _lex_search(build_ops: Sequence[jnp.ndarray], n_build: int,
                probe_ops: Sequence[jnp.ndarray], side: str):
    """Vectorized lexicographic searchsorted.

    ``build_ops`` are sorted ascending (lexicographic, joinable rows first up
    to traced count n_build). Returns per-probe-row insertion points.
    """
    m = probe_ops[0].shape[0]
    cap = build_ops[0].shape[0]
    lo = jnp.zeros(m, jnp.int32)
    hi = jnp.broadcast_to(jnp.asarray(n_build, jnp.int32), (m,))
    steps = max(int(np.ceil(np.log2(max(cap, 2)))) + 1, 1)
    for _ in range(steps):
        mid = (lo + hi) >> 1
        safe = jnp.clip(mid, 0, cap - 1)
        lt = jnp.zeros(m, jnp.bool_)
        eq = jnp.ones(m, jnp.bool_)
        for b_op, p_op in zip(build_ops, probe_ops):
            bv = jnp.take(b_op, safe)
            lt = lt | (eq & (bv < p_op))
            eq = eq & (bv == p_op)
        go_right = (lt | eq) if side == "right" else lt
        cont = lo < hi
        lo = jnp.where(cont & go_right, mid + 1, lo)
        hi = jnp.where(cont & ~go_right, mid, hi)
    return lo


def _build_sorted(r_ops, joinable, build_cap: int):
    """Stable-sort build rows (joinable first) by key tuple; returns
    (build_perm, sorted_ops, n_build, run_len_at_pos)."""
    sort_ops = [~joinable] + [jnp.where(joinable, op, 0) for op in r_ops]
    iota_b = jnp.arange(build_cap, dtype=jnp.int32)
    *_, build_perm = jax.lax.sort(
        tuple(sort_ops) + (iota_b,), dimension=0, is_stable=True,
        num_keys=len(sort_ops))
    n_build = jnp.sum(joinable.astype(jnp.int32))
    sorted_ops = [jnp.take(jnp.where(joinable, op, 0), build_perm)
                  for op in r_ops]
    # equal-key run lengths in the sorted layout (build-side only, small):
    # probing needs just ONE binary search (leftmost) + these lengths,
    # instead of a second 'right' search — half the probe gather passes.
    start = jnp.zeros(build_cap, jnp.bool_).at[0].set(True)
    for op in sorted_ops:
        prev = jnp.concatenate([op[:1], op[:-1]])
        start = start | (op != prev)
    start = start.at[0].set(True)
    rid = jnp.cumsum(start.astype(jnp.int32)) - 1
    run_len = jax.ops.segment_sum(
        (iota_b < n_build).astype(jnp.int32), rid, build_cap)
    run_len_at_pos = jnp.take(run_len, rid)
    return build_perm, sorted_ops, n_build, run_len_at_pos


def _probe_ranges(l_ops, r_ops, l_valid, joinable, build_cap: int,
                  spec: "JoinSpec"):
    """Per-probe-row match range: returns (lo, matches, build_perm), where
    build rows [lo, lo+matches) in the sorted build layout match the row."""
    dense = (spec.build_domain is not None and len(r_ops) == 1)
    build_perm, sorted_ops, n_build, run_len_at = _build_sorted(
        r_ops, joinable, build_cap)
    if dense:
        lo_d, hi_d = spec.build_domain
        d = int(hi_d - lo_d)
        key_sorted = sorted_ops[0]
        iota_b = jnp.arange(build_cap, dtype=jnp.int32)
        in_build = iota_b < n_build
        start = jnp.zeros(build_cap, jnp.bool_).at[0].set(True)
        prev = jnp.concatenate([key_sorted[:1], key_sorted[:-1]])
        start = (start | (key_sorted != prev)) & in_build
        code = jnp.clip(key_sorted - lo_d, 0, d - 1).astype(jnp.int32)
        scatter_idx = jnp.where(start, code, d)
        first_pos = jnp.full(d, 0, jnp.int32).at[scatter_idx].set(
            iota_b, mode="drop")
        cnt = jax.ops.segment_sum(in_build.astype(jnp.int32),
                                  jnp.where(in_build, code, d), d + 1)[:d]
        pk = l_ops[0]
        in_range = (pk >= lo_d) & (pk < hi_d) & l_valid
        pki = jnp.clip(pk - lo_d, 0, d - 1).astype(jnp.int32)
        from auron_tpu.ops.selection import batched_take
        got = batched_take({"fp": first_pos, "cnt": cnt}, pki)
        lo = jnp.where(in_range, got["fp"], 0)
        matches = jnp.where(in_range, got["cnt"], 0)
        return lo, matches, build_perm
    lo = _lex_search(sorted_ops, n_build, l_ops, "left")
    safe = jnp.clip(lo, 0, build_cap - 1)
    eq = lo < n_build
    for b_op, p_op in zip(sorted_ops, l_ops):
        eq = eq & (jnp.take(b_op, safe) == p_op)
    matches = jnp.where(l_valid & eq, jnp.take(run_len_at, safe), 0)
    return lo, matches, build_perm


def _run_starts(offsets_at: jnp.ndarray, eff: jnp.ndarray,
                total: jnp.ndarray, out_cap: int):
    """For output slot j, the owning probe row.

    offsets_at[p] = exclusive prefix sum of per-probe output counts; row p
    owns slots [offsets_at[p], offsets_at[p]+eff[p]). Instead of a
    searchsorted (log2(out_cap) random gathers — slow on TPU), scatter a
    mark at each owning row's start offset, prefix-sum to get the owner's
    rank, and map rank -> row through the compacted eff>0 row list: three
    linear passes + one gather with monotone indices.
    """
    probe_cap = offsets_at.shape[0]
    has = eff > 0
    start_idx = jnp.where(has, offsets_at, out_cap).astype(jnp.int32)
    marks = jnp.zeros(out_cap, jnp.int32).at[start_idx].add(1, mode="drop")
    owner_rank = jnp.cumsum(marks) - 1  # rank among eff>0 rows
    from auron_tpu.ops.selection import first_live_indices
    rows_with = first_live_indices(has, probe_cap)
    owner = jnp.take(rows_with, jnp.clip(owner_rank, 0, probe_cap - 1))
    j = jnp.arange(out_cap, dtype=offsets_at.dtype)
    live = (j < total) & (owner_rank >= 0)
    return owner, live


def _null_build_columns(build: TableBlock, gather_idx, valid) -> Dict[str, Column]:
    from auron_tpu.ops.selection import batched_take
    arrays = {}
    for name, c in build.columns.items():
        arrays[(name, "v")] = c.values
        if c.validity is not None:
            arrays[(name, "n")] = c.validity
    taken = batched_take(arrays, gather_idx)
    cols = {}
    for name, c in build.columns.items():
        v = valid if c.validity is None else (valid & taken[(name, "n")])
        cols[name] = Column(taken[(name, "v")], v, c.dtype, c.dict_values)
    return cols


def join_blocks(left: TableBlock, right: TableBlock, spec: JoinSpec,
                out_capacity: Optional[int] = None,
                filter_fn=None) -> TableBlock:
    """Execute the join. ``left`` is the probe side, ``right`` the build side.

    ``filter_fn(block) -> bool array`` evaluates an extra (non-equi) join
    condition over the joined candidate block; pairs failing it are treated
    as non-matches (outer semantics recomputed afterwards).
    """
    jt = spec.join_type
    if spec.build_domain is not None and not (
            left.columns[spec.left_keys[0]].dtype.is_integer and
            right.columns[spec.right_keys[0]].dtype.is_integer):
        # dense-domain lookups index by RAW int key value; mixed or float
        # keys are order-encoded (bit tricks) and must take the sorted path
        import dataclasses
        spec = dataclasses.replace(spec, build_domain=None)
    l_ops, r_ops, l_valid, r_valid = _encoded_keys(left, right, spec)
    build_cap = right.capacity
    probe_cap = left.capacity

    joinable = r_valid  # live & all keys non-null
    if (spec.build_unique and spec.build_domain is not None
            and len(r_ops) == 1 and filter_fn is None
            and jt in (INNER, LEFT, LEFT_SEMI, LEFT_ANTI, EXISTENCE)):
        return _unique_dense_join(left, right, spec, l_ops[0], r_ops[0],
                                  l_valid, joinable)
    lo, matches, build_perm = _probe_ranges(l_ops, r_ops, l_valid, joinable,
                                            build_cap, spec)

    if filter_fn is None and jt in (LEFT_SEMI, LEFT_ANTI, EXISTENCE):
        return _probe_only(left, matches, l_valid, right.row_mask, joinable,
                           spec)

    # ---- expansion: candidate pairs --------------------------------------
    left_outerish = jt in (LEFT, FULL)
    # left-outer rows with no match still occupy one output slot
    eff = jnp.where(left.row_mask,
                    jnp.maximum(matches, 1) if (left_outerish and filter_fn is None)
                    else matches, 0)
    if filter_fn is not None and (left_outerish or jt in
                                  (LEFT_SEMI, LEFT_ANTI, EXISTENCE)):
        eff = jnp.where(left.row_mask, matches, 0)  # recover outer rows later
    offsets = jnp.cumsum(eff) - eff  # exclusive prefix sum
    total = jnp.sum(eff)
    if out_capacity is None:
        factor = config.conf.get(config.JOIN_OUT_FACTOR)
        out_capacity = round_capacity(int(probe_cap * factor))
    from auron_tpu.runtime import overflow
    overflow.record("join", total, out_capacity)
    if config.conf.get(config.DEBUG_CHECKS):
        def _warn(t):
            jax.debug.print(
                "WARNING join output overflow: {t} rows > capacity {c} "
                "(rows dropped; raise out_capacity / JOIN_OUT_FACTOR)",
                t=t, c=out_capacity)
        jax.lax.cond(total > out_capacity, _warn, lambda t: None, total)
    owner, pair_live = _run_starts(offsets, eff, total, out_capacity)
    owner = jnp.clip(owner, 0, probe_cap - 1)

    # ONE batched gather by `owner` covers expansion metadata (offsets /
    # match counts / range starts) AND every probe column+validity — TPU
    # gathers cost per-index, so batching here is the join's biggest win.
    from auron_tpu.ops.selection import batched_take
    arrays = {"#off": offsets.astype(jnp.int32),
              "#match": matches.astype(jnp.int32),
              "#lo": lo.astype(jnp.int32)}
    for name, c in left.columns.items():
        arrays[(name, "v")] = c.values
        if c.validity is not None:
            arrays[(name, "n")] = c.validity
    taken = batched_take(arrays, owner)
    within = jnp.arange(out_capacity, dtype=jnp.int32) - taken["#off"]
    has_match = taken["#match"] > 0
    b_sorted_pos = taken["#lo"] + within
    b_row = jnp.take(build_perm, jnp.clip(b_sorted_pos, 0, build_cap - 1))

    l_gidx = owner
    out_cols = {}
    for name, c in left.columns.items():
        out_cols[name] = Column(taken[(name, "v")], taken.get((name, "n")),
                                c.dtype, c.dict_values)
    build_valid_row = pair_live & has_match
    out_cols.update(_null_build_columns(right, b_row, build_valid_row))
    pair_block = TableBlock(out_cols, pair_live)

    # ---- join filter ------------------------------------------------------
    if filter_fn is not None:
        keep = filter_fn(pair_block)
        pair_matched = pair_live & has_match & keep
        # per-probe-row surviving match count (segment sum over owners)
        surv = jax.ops.segment_sum(
            pair_matched.astype(jnp.int32),
            jnp.where(pair_live, l_gidx, 0), probe_cap)
        if jt in (LEFT_SEMI, LEFT_ANTI, EXISTENCE):
            return _probe_only(left, surv, l_valid, right.row_mask, joinable,
                               spec)
        pair_block = pair_block.with_mask(pair_matched)
        matched_probe = surv > 0
    else:
        pair_matched = pair_live & has_match
        matched_probe = matches > 0
        if jt in (INNER, RIGHT, RIGHT_SEMI, RIGHT_ANTI):
            pair_block = pair_block.with_mask(pair_matched)
        # LEFT/FULL keep the padded no-match slots (build side nulled)

    if jt in (LEFT, FULL) and filter_fn is not None:
        # recover unmatched probe rows: append region of probe_cap slots
        pair_block = _append_unmatched_probe(pair_block, left, right,
                                             matched_probe)
    if jt in (RIGHT, FULL, RIGHT_SEMI, RIGHT_ANTI):
        # matched flags on build rows: scatter from surviving pairs
        b_matched = jax.ops.segment_max(
            pair_matched.astype(jnp.int32),
            jnp.where(pair_matched, b_row, 0), build_cap) > 0
        if jt == RIGHT_SEMI:
            return right.with_mask(right.row_mask & b_matched)
        if jt == RIGHT_ANTI:
            return right.with_mask(right.row_mask & ~b_matched)
        pair_block = _append_unmatched_build(pair_block, left, right,
                                             b_matched)
    return pair_block


def _unique_dense_join(left: TableBlock, right: TableBlock, spec: "JoinSpec",
                       pk, bk, l_valid, joinable) -> TableBlock:
    """Dimension-join fast path: unique dense build keys.

    No sort, no expansion, no probe-side gathers: scatter build row ids into
    a dense position table (distinct indices — the fast scatter), probe with
    ONE gather, mask-filter the probe block in place, and fetch build
    columns with one batched gather. ~2 gathers total for an 8M-row join vs
    ~8+ for the general path.
    """
    jt = spec.join_type
    lo_d, hi_d = spec.build_domain
    d = int(hi_d - lo_d)
    probe_cap = left.capacity

    in_range = (pk >= lo_d) & (pk < hi_d) & l_valid
    pki = jnp.clip(pk - lo_d, 0, d - 1).astype(jnp.int32)
    if spec.build_sequential:
        # position table verified to be the identity (build keys are
        # lo + row_position): the probe needs NO scatter and NO position
        # gather — key arithmetic alone yields the build row
        b_row = jnp.where(in_range, pki, -1)
        matched = in_range
    else:
        code = jnp.clip(bk - lo_d, 0, d - 1).astype(jnp.int32)
        scatter_idx = jnp.where(joinable, code, d)
        iota_b = jnp.arange(right.capacity, dtype=jnp.int32)
        pos_table = jnp.full(d, -1, jnp.int32).at[scatter_idx].set(
            iota_b, mode="drop")
        b_row = jnp.where(in_range, jnp.take(pos_table, pki), -1)
        matched = b_row >= 0

    if jt == LEFT_SEMI:
        return left.with_mask(left.row_mask & matched)
    if jt == LEFT_ANTI:
        keep = left.row_mask & ~matched
        if spec.null_aware:
            build_has_null = jnp.sum(
                (right.row_mask & ~joinable).astype(jnp.int32)) > 0
            keep = keep & l_valid & jnp.broadcast_to(~build_has_null,
                                                     keep.shape)
        return left.with_mask(keep)
    if jt == EXISTENCE:
        return left.with_columns({spec.existence_col: Column.of(matched,
                                                                BOOL)})
    # INNER / LEFT: probe columns untouched; build columns one gather
    bcols = _null_build_columns(right, jnp.clip(b_row, 0, right.capacity - 1),
                                matched)
    out = left.with_columns(bcols)
    if jt == INNER:
        return out.with_mask(left.row_mask & matched)
    return out  # LEFT: unmatched keep NULL build columns


def _probe_only(left: TableBlock, match_counts, l_valid, right_live,
                right_joinable, spec: JoinSpec) -> TableBlock:
    """Semi/anti/existence outputs: probe block + mask/flag, zero movement."""
    jt = spec.join_type
    matched = match_counts > 0
    if jt == LEFT_SEMI:
        return left.with_mask(left.row_mask & matched)
    if jt == LEFT_ANTI:
        keep = left.row_mask & ~matched
        if spec.null_aware:
            # NOT IN semantics: a probe row survives only if its key is
            # non-NULL, it matched nothing, AND the build side holds no
            # live row with a NULL key (x NOT IN (..., NULL) is never true).
            build_has_null = jnp.sum(
                (right_live & ~right_joinable).astype(jnp.int32)) > 0
            keep = keep & l_valid & jnp.broadcast_to(~build_has_null,
                                                     keep.shape)
        return left.with_mask(keep)
    # EXISTENCE: left block + bool column
    flag = Column.of(matched, BOOL)
    return left.with_columns({spec.existence_col: flag})


def join_match_counts(left: TableBlock, right: TableBlock, spec: JoinSpec):
    """Match counts per probe row (used by null-aware anti + planners)."""
    l_ops, r_ops, l_valid, r_valid = _encoded_keys(left, right, spec)
    _, matches, _ = _probe_ranges(l_ops, r_ops, l_valid, r_valid,
                                  right.capacity, spec)
    return matches


def _append_unmatched_probe(pair_block: TableBlock, left: TableBlock,
                            right: TableBlock, matched_probe) -> TableBlock:
    """Concatenate probe rows that matched nothing (build columns NULL)."""
    extra_live = left.row_mask & ~matched_probe
    cols = {}
    for name, c in left.columns.items():
        cols[name] = c
    idx = jnp.arange(left.capacity, dtype=jnp.int32)
    cols.update(_null_build_columns(
        right, jnp.zeros(left.capacity, jnp.int32),
        jnp.zeros(left.capacity, jnp.bool_)))
    del idx
    extra = TableBlock(cols, extra_live)
    return concat_blocks([pair_block, extra])


def _append_unmatched_build(pair_block: TableBlock, left: TableBlock,
                            right: TableBlock, b_matched) -> TableBlock:
    extra_live = right.row_mask & ~b_matched
    cols = {}
    for name, c in left.columns.items():
        vals = jnp.zeros((right.capacity,) + c.values.shape[1:],
                         c.values.dtype)
        cols[name] = Column(vals, jnp.zeros(right.capacity, jnp.bool_),
                            c.dtype, c.dict_values)
    for name, c in right.columns.items():
        cols[name] = c
    extra = TableBlock(cols, extra_live)
    return concat_blocks([pair_block, extra])


def union_common_dtype(dts) -> "DataType":
    """Spark's UNION type coercion (TypeCoercion.findWiderType): decimal
    with float -> double, decimal with int -> the decimal, mixed ints ->
    widest, date32 with timestamp64 -> timestamp64."""
    from auron_tpu.dtypes import FLOAT32, FLOAT64, TIMESTAMP64
    out = dts[0]
    for d in dts[1:]:
        if d.name == out.name and d.params == out.params:
            continue
        names = {d.name, out.name}
        if "string_raw" in names:
            if not names <= {"string", "string_raw"}:
                raise TypeError(f"union of {out!r} and {d!r}")
            # widest raw plane set wins; dictionary sides convert by gather
            from auron_tpu.dtypes import STRING_RAW
            w = max(dt.params[0] for dt in (d, out) if dt.is_raw_string)
            out = STRING_RAW(w)
            continue
        if "string" in names:
            raise TypeError(f"union of {out!r} and {d!r}")
        if "decimal128" in names:
            if d.is_float or out.is_float:
                out = FLOAT64
            else:
                # Spark findWiderType for decimals: keep every integral
                # and fractional digit of both sides (int64 counts as 19,0)
                from auron_tpu.dtypes import (_adjust_precision_scale,
                                              decimal_type)

                def _ps(t):
                    return t.params if t.is_decimal else (19, 0)
                p1, s1 = _ps(d)
                p2, s2 = _ps(out)
                s = max(s1, s2)
                p = max(p1 - s1, p2 - s2) + s
                out = decimal_type(*_adjust_precision_scale(p, s))
            continue
        if "decimal64" in names:
            if d.is_float or out.is_float:
                out = FLOAT64
            elif d.name == "decimal64" and out.name == "decimal64":
                out = d if d.params[1] > out.params[1] else out
            else:
                out = d if d.name == "decimal64" else out
        elif d.is_float or out.is_float:
            out = FLOAT32 if names == {"float32"} else FLOAT64
        elif names == {"date32", "timestamp64"}:
            out = TIMESTAMP64
        else:  # integer widths / bool: keep the wider operand
            rank = {"bool": 0, "int8": 1, "int16": 2, "int32": 3, "int64": 4,
                    "date32": 3, "timestamp64": 4}
            out = d if rank.get(d.name, 4) > rank.get(out.name, 4) else out
    return out


def unify_block_dtypes(blocks: Sequence[TableBlock]) -> List[TableBlock]:
    """Cast same-named columns across blocks to their union-coerced common
    dtype (q5: UNION of cast(0 AS DECIMAL) with a float measure column)."""
    from auron_tpu.expr.cast import cast_column
    names = [n for n in blocks[0].names
             if all(n in b.columns for b in blocks)]
    targets = {}
    for name in names:
        dts = [b.columns[name].dtype for b in blocks]
        if any(d.name != dts[0].name or d.params != dts[0].params
               for d in dts[1:]):
            to = union_common_dtype(dts)
            if to.is_raw_string:
                # value-aware widening: a dictionary side may hold strings
                # longer than any raw side's planes (union_common_dtype
                # sees only dtypes) — widen to fit the actual values
                from auron_tpu.dtypes import STRING_RAW
                from auron_tpu.expr import strings_raw as SR
                w = to.params[0]
                for b in blocks:
                    c = b.columns[name]
                    if c.dtype.is_string and c.dict_values is not None:
                        w = max(w, (SR.max_bytes(c.dict_values) + 3) // 4)
                to = STRING_RAW(w)
            targets[name] = to
    if not targets:
        return list(blocks)
    out = []
    for b in blocks:
        cols = dict(b.columns)
        for name, to in targets.items():
            cols[name] = cast_column(cols[name], to, b.capacity)
        out.append(TableBlock(cols, b.row_mask))
    return out


def concat_blocks(blocks: Sequence[TableBlock]) -> TableBlock:
    """Concatenate blocks along the row axis (schemas must match up to
    union-coercible dtypes — see unify_block_dtypes).

    The CoalesceBatches analog (reference execution_context.rs:146-233) —
    output capacity is the sum of inputs; callers compact when it pays.
    """
    blocks = unify_block_dtypes(blocks)
    names = blocks[0].names
    cols = {}
    for name in names:
        ref = blocks[0].columns[name]
        scols = [b.columns[name] for b in blocks]
        if ref.dtype.is_string:
            scols, _ = unify_string_columns(scols)
        have_validity = any(c.validity is not None for c in scols)
        vals = jnp.concatenate([c.values for c in scols])
        validity = None
        if have_validity:
            validity = jnp.concatenate([
                c.validity if c.validity is not None
                else jnp.ones(c.values.shape[0], jnp.bool_) for c in scols])
        cols[name] = Column(vals, validity, ref.dtype,
                            scols[0].dict_values if ref.dtype.is_string
                            else ref.dict_values)
    mask = jnp.concatenate([b.row_mask for b in blocks])
    return TableBlock(cols, mask)
