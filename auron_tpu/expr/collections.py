"""Array/map/struct expression kernels over fixed-width planes.

Reference surface: datafusion-ext-functions/src/spark_map.rs:1516
(map_from_arrays/from_entries/str_to_map/map lookups), spark_make_array.rs,
spark_array.rs (reverse/flatten), and the expression nodes get_map_value.rs,
get_indexed_field.rs, named_struct.rs.

TPU representation (shared with collect_list/Generate):
* array column ``a``  = ``a#vals`` [capacity, L] + ``a#len`` int
* map column ``m``    = ``m#keys`` [capacity, L] + ``m#vals`` [capacity, L]
                        + ``m#len``
* struct column ``s`` = flattened member columns ``s.field`` (structs are
  pure naming — the SoA layout IS the struct-of-arrays).

All lookups are vectorized compare+select over the L lanes — no per-row
control flow, L is static.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from auron_tpu.block import Column, TableBlock
from auron_tpu.dtypes import BOOL, INT32
from auron_tpu.expr.functions import register


def _planes(block: TableBlock, name: str, kind: str):
    vals = block.columns[f"{name}#{kind}"]
    length = block.columns[f"{name}#len"]
    return vals, length


@register("size")
def _size(block, name: str) -> Column:
    """size(array|map) — -1 for NULL (Spark legacy sizeOfNull)."""
    length = block.columns[f"{name}#len"]
    v = length.values.astype(jnp.int32)
    if length.validity is not None:
        v = jnp.where(length.validity, v, -1)
    return Column.of(v, INT32)


@register("array_contains")
def _array_contains(block, name: str, value) -> Column:
    vals, length = _planes(block, name, "vals")
    cap, L = vals.values.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (cap, L), 1)
    in_len = lane < length.values[:, None].astype(jnp.int32)
    hit = jnp.any((vals.values == jnp.asarray(value, vals.values.dtype))
                  & in_len, axis=1)
    return Column.of(hit, BOOL, length.validity)


@register("map_get")
def _map_get(block, name: str, key) -> Column:
    """element_at(map, key) — NULL when absent (get_map_value.rs). String
    keys resolve through the key dictionary; first lane match wins (so
    map_concat places later maps first for LAST_WIN semantics)."""
    keys, length = _planes(block, name, "keys")
    vals = block.columns[f"{name}#vals"]
    cap, L = keys.values.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (cap, L), 1)
    in_len = lane < length.values[:, None].astype(jnp.int32)
    if isinstance(key, str):
        from auron_tpu.expr.strings import code_of_literal
        key = code_of_literal(keys.dict_values, key)
    eq = (keys.values == jnp.asarray(key, keys.values.dtype)) & in_len
    found = jnp.any(eq, axis=1)
    idx = jnp.argmax(eq, axis=1)
    out = jnp.take_along_axis(vals.values, idx[:, None], axis=1)[:, 0]
    validity = found if length.validity is None \
        else (found & length.validity)
    return Column(out, validity, vals.dtype, vals.dict_values)


@register("element_at_array")
def _element_at_array(block, name: str, index: int = 1) -> Column:
    """element_at(array, i) — 1-based, NULL out of bounds."""
    vals, length = _planes(block, name, "vals")
    cap, L = vals.values.shape
    i0 = index - 1 if index > 0 else None
    if i0 is None:
        # negative: from the end
        pos = length.values.astype(jnp.int32) + index
    else:
        pos = jnp.full(cap, i0, jnp.int32)
    ok = (pos >= 0) & (pos < length.values.astype(jnp.int32))
    out = jnp.take_along_axis(vals.values,
                              jnp.clip(pos, 0, L - 1)[:, None], axis=1)[:, 0]
    validity = ok if length.validity is None else (ok & length.validity)
    return Column(out, validity, vals.dtype, vals.dict_values)


@register("array_reverse")
def _array_reverse(block, name: str):
    """reverse(array) -> new plane columns (spark_array.rs)."""
    vals, length = _planes(block, name, "vals")
    cap, L = vals.values.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (cap, L), 1)
    ln = length.values[:, None].astype(jnp.int32)
    src = jnp.clip(ln - 1 - lane, 0, L - 1)
    rev = jnp.take_along_axis(vals.values, src, axis=1)
    in_len = lane < ln
    rev = jnp.where(in_len, rev, 0)
    return Column(rev, vals.validity, vals.dtype, vals.dict_values)


def make_map_columns(block: TableBlock, name: str, keys_col: str,
                     vals_col: str) -> TableBlock:
    """map_from_arrays: pair two array columns into a map (spark_map.rs)."""
    kv, kl = _planes(block, keys_col, "vals")
    vv, _ = _planes(block, vals_col, "vals")
    cols = dict(block.columns)
    cols[f"{name}#keys"] = kv
    cols[f"{name}#vals"] = vv
    cols[f"{name}#len"] = kl
    return TableBlock(cols, block.row_mask)


def make_struct_columns(block: TableBlock, name: str, **fields) -> TableBlock:
    """named_struct: flatten members as `name.field` columns."""
    from auron_tpu.expr.eval import evaluate, materialize
    cols = dict(block.columns)
    for f, e in fields.items():
        cols[f"{name}.{f}"] = materialize(evaluate(e, block), block.capacity)
    return TableBlock(cols, block.row_mask)


# ---------------------------------------------------------------------------
# Block transforms: functions whose OUTPUT is multiple plane columns
# (array/map constructors — spark_map.rs:1516 str_to_map / map_concat,
# spark_strings.rs split). Invoked through the BlockTransform plan node so
# they compose inside plans and under whole-plan jit (string dictionaries
# are host-side even when values are traced).
# ---------------------------------------------------------------------------

BLOCK_TRANSFORMS = {}


def _transform(name, out_names):
    def deco(fn):
        BLOCK_TRANSFORMS[name] = (fn, out_names)
        return fn
    return deco


def transform_output_names(fn: str, params) -> list:
    return BLOCK_TRANSFORMS[fn][1](params)


def apply_transform(block: TableBlock, fn: str, params) -> TableBlock:
    # constructors consume dictionary strings: raw byte-plane columns
    # convert for the transform's view (eager boundaries only), and any
    # column the transform merely passed through keeps its raw planes
    import jax.core
    raw = [n for n, c in block.columns.items()
           if c.dtype.is_raw_string
           and not isinstance(c.values, jax.core.Tracer)]
    view = block
    if raw:
        from auron_tpu.expr import strings_raw as SR
        view = block.with_columns(
            {n: SR.to_dictionary_column(block.columns[n]) for n in raw})
    out = BLOCK_TRANSFORMS[fn][0](view, *params)
    if raw:
        restore = {n: block.columns[n] for n in raw
                   if out.columns.get(n) is view.columns[n]}
        if restore:
            out = out.with_columns(restore)
    return out


@_transform("split", lambda p: [f"{p[0]}#vals", f"{p[0]}#len"])
def _split(block: TableBlock, out: str, src: str, delim: str,
           max_parts: int = 16) -> TableBlock:
    """split(str, delim) -> array planes. Each DISTINCT dictionary entry
    splits once host-side; per-row planes are pure gathers."""
    from auron_tpu.dtypes import STRING
    c = block.columns[src]
    parts_per = [s.split(delim) if s else [""] for s in c.dict_values]
    all_parts = sorted({p for ps in parts_per for p in ps[:max_parts]})
    code = {p: i for i, p in enumerate(all_parts)}
    nd = len(c.dict_values)
    plane = np.zeros((nd, max_parts), np.int32)
    lens = np.zeros(nd, np.int32)
    for i, ps in enumerate(parts_per):
        ps = ps[:max_parts]
        lens[i] = len(ps)
        for j, p in enumerate(ps):
            plane[i, j] = code[p]
    codes = jnp.clip(c.values, 0, nd - 1)
    cols = dict(block.columns)
    cols[f"{out}#vals"] = Column(jnp.asarray(plane)[codes], None, STRING,
                                 np.array(all_parts, dtype=object))
    cols[f"{out}#len"] = Column(jnp.asarray(lens)[codes], c.validity, INT32,
                                None)
    return TableBlock(cols, block.row_mask)


@_transform("str_to_map",
            lambda p: [f"{p[0]}#keys", f"{p[0]}#vals", f"{p[0]}#len"])
def _str_to_map(block: TableBlock, out: str, src: str,
                pair_delim: str = ",", kv_delim: str = ":",
                max_parts: int = 16) -> TableBlock:
    """str_to_map('a:1,b:2') -> string-keyed map planes (spark_map.rs)."""
    from auron_tpu.dtypes import STRING
    c = block.columns[src]
    keys_per, vals_per = [], []
    for s in c.dict_values:
        ks, vs = [], []
        for pair in (s.split(pair_delim) if s else [""])[:max_parts]:
            k, _, v = pair.partition(kv_delim)
            ks.append(k)
            vs.append(v)
        keys_per.append(ks)
        vals_per.append(vs)
    kd = sorted({k for ks in keys_per for k in ks})
    vd = sorted({v for vs in vals_per for v in vs})
    kcode = {k: i for i, k in enumerate(kd)}
    vcode = {v: i for i, v in enumerate(vd)}
    nd = len(c.dict_values)
    kplane = np.zeros((nd, max_parts), np.int32)
    vplane = np.zeros((nd, max_parts), np.int32)
    lens = np.zeros(nd, np.int32)
    for i, (ks, vs) in enumerate(zip(keys_per, vals_per)):
        lens[i] = len(ks)
        for j, (k, v) in enumerate(zip(ks, vs)):
            kplane[i, j] = kcode[k]
            vplane[i, j] = vcode[v]
    codes = jnp.clip(c.values, 0, nd - 1)
    cols = dict(block.columns)
    cols[f"{out}#keys"] = Column(jnp.asarray(kplane)[codes], None, STRING,
                                 np.array(kd, dtype=object))
    cols[f"{out}#vals"] = Column(jnp.asarray(vplane)[codes], None, STRING,
                                 np.array(vd, dtype=object))
    cols[f"{out}#len"] = Column(jnp.asarray(lens)[codes], c.validity,
                                INT32, None)
    return TableBlock(cols, block.row_mask)


@_transform("map_concat",
            lambda p: [f"{p[0]}#keys", f"{p[0]}#vals", f"{p[0]}#len"])
def _map_concat(block: TableBlock, out: str, m1: str, m2: str) -> TableBlock:
    """map_concat(m1, m2): later maps win on duplicate keys (Spark
    LAST_WIN) — m2's lanes are placed FIRST because map_get returns the
    first lane match."""
    from auron_tpu.expr.strings import unify_string_columns
    k1, v1 = block.columns[f"{m1}#keys"], block.columns[f"{m1}#vals"]
    k2, v2 = block.columns[f"{m2}#keys"], block.columns[f"{m2}#vals"]
    l1 = block.columns[f"{m1}#len"]
    l2 = block.columns[f"{m2}#len"]
    if k1.dtype.is_string:
        (k1, k2), _ = unify_string_columns([k1, k2])
    if v1.dtype.is_string:
        (v1, v2), _ = unify_string_columns([v1, v2])
    # compact m2's lanes against m1's by shifting m1 behind m2's length?
    # Static-lane layout: [m2 lanes | m1 lanes]; lookups scan lanes in
    # order and respect per-row lengths via a combined validity trick:
    # place m2's entries at [0, len2) and m1's at [L2, L2+len1) by rolling
    # m1's plane — a gather per lane.
    cap, L2 = k2.values.shape
    _, L1 = k1.values.shape
    # LAST_WIN dedup: m1 entries whose key also lives in m2 are SHADOWED —
    # drop them (compact kept m1 lanes left) so #len and map iteration see
    # one entry per key, like Spark
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (cap, L1), 1)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (cap, L2), 1)
    live1 = lane1 < l1.values.astype(jnp.int32)[:, None]
    live2 = lane2 < l2.values.astype(jnp.int32)[:, None]
    dup = jnp.any((k1.values[:, :, None] == k2.values[:, None, :])
                  & live2[:, None, :], axis=2)
    keep1 = live1 & ~dup
    order = jnp.argsort(~keep1, axis=1, stable=True)
    k1v = jnp.take_along_axis(k1.values, order, axis=1)
    v1v = jnp.take_along_axis(v1.values, order, axis=1)
    l1k = jnp.sum(keep1.astype(jnp.int32), axis=1)

    keys = jnp.concatenate([k2.values, k1v], axis=1)
    vals = jnp.concatenate([v2.values, v1v], axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (cap, L1 + L2), 1)
    len2 = l2.values.astype(jnp.int32)[:, None]
    # m1 entries must sit immediately after m2's live entries: shift left
    src = jnp.where(lane < len2, lane, lane - len2 + L2)
    src = jnp.clip(src, 0, L1 + L2 - 1)
    keys = jnp.take_along_axis(keys, src, axis=1)
    vals = jnp.take_along_axis(vals, src, axis=1)
    total = (l1k + l2.values.astype(jnp.int32))
    from auron_tpu.expr.eval import _combine_validity
    validity = _combine_validity(l1, l2)
    cols = dict(block.columns)
    cols[f"{out}#keys"] = Column(keys, None, k1.dtype, k1.dict_values)
    cols[f"{out}#vals"] = Column(vals, None, v1.dtype, v1.dict_values)
    cols[f"{out}#len"] = Column(total, validity, INT32, None)
    return TableBlock(cols, block.row_mask)


@_transform("map_from_arrays",
            lambda p: [f"{p[0]}#keys", f"{p[0]}#vals", f"{p[0]}#len"])
def _map_from_arrays(block: TableBlock, out: str, keys_col: str,
                     vals_col: str) -> TableBlock:
    return make_map_columns(block, out, keys_col, vals_col)


@_transform("make_array", lambda p: [f"{p[0]}#vals", f"{p[0]}#len"])
def _make_array(block: TableBlock, out: str, *cols: str) -> TableBlock:
    """array(c1, c2, ...) -> fixed-length array planes
    (spark_make_array.rs)."""
    from auron_tpu.expr.strings import unify_string_columns
    members = [block.columns[c] for c in cols]
    if members[0].dtype.is_string:
        members, _ = unify_string_columns(list(members))
    vals = jnp.stack([m.values for m in members], axis=1)
    cap = vals.shape[0]
    length = jnp.full(cap, len(members), jnp.int32)
    new = dict(block.columns)
    new[f"{out}#vals"] = Column(vals, None, members[0].dtype,
                               members[0].dict_values)
    new[f"{out}#len"] = Column(length, None, INT32, None)
    return TableBlock(new, block.row_mask)


@_transform("array_union", lambda p: [f"{p[0]}#vals", f"{p[0]}#len"])
def _array_union(block: TableBlock, out: str, a: str, b: str) -> TableBlock:
    """brickhouse array_union(a, b): per-row distinct union, first
    occurrence order (brickhouse/array_union.rs)."""
    from auron_tpu.expr.strings import unify_string_columns
    va, la = block.columns[f"{a}#vals"], block.columns[f"{a}#len"]
    vb, lb = block.columns[f"{b}#vals"], block.columns[f"{b}#len"]
    if va.dtype.is_string:
        (va, vb), _ = unify_string_columns([va, vb])
    cap, La = va.values.shape
    _, Lb = vb.values.shape
    L = La + Lb
    lane = jax.lax.broadcasted_iota(jnp.int32, (cap, L), 1)
    lena = la.values.astype(jnp.int32)[:, None]
    lenb = lb.values.astype(jnp.int32)[:, None]
    # [a's live lanes | b's live lanes] via the map_concat shift trick
    both = jnp.concatenate([va.values, vb.values], axis=1)
    src = jnp.where(lane < lena, lane, lane - lena + La)
    src = jnp.clip(src, 0, L - 1)
    vals = jnp.take_along_axis(both, src, axis=1)
    live = lane < (lena + lenb)
    # first-occurrence dedup: O(L^2) lane compare (L is a small static)
    eq_earlier = (vals[:, :, None] == vals[:, None, :]) & \
        (lane[:, None, :] < lane[:, :, None]) & live[:, None, :]
    dup = jnp.any(eq_earlier, axis=2)
    keep = live & ~dup
    # compact kept lanes left, preserving order
    order = jnp.argsort(jnp.where(keep, lane, L + lane), axis=1)
    vals = jnp.take_along_axis(vals, order, axis=1)
    nkeep = keep.sum(axis=1).astype(jnp.int32)
    in_len = lane < nkeep[:, None]
    vals = jnp.where(in_len, vals, 0)
    from auron_tpu.expr.eval import _combine_validity
    validity = _combine_validity(la, lb)
    new = dict(block.columns)
    new[f"{out}#vals"] = Column(vals, None, va.dtype, va.dict_values)
    new[f"{out}#len"] = Column(nkeep, validity, INT32, None)
    return TableBlock(new, block.row_mask)
