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
    """element_at(map, key) — NULL when absent (get_map_value.rs)."""
    keys, length = _planes(block, name, "keys")
    vals = block.columns[f"{name}#vals"]
    cap, L = keys.values.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (cap, L), 1)
    in_len = lane < length.values[:, None].astype(jnp.int32)
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
