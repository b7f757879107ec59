"""Generate (explode / posexplode) — row expansion over array columns.

Reference: generate_exec.rs:550 + generate/mod.rs. Arrays on TPU are
fixed-width planes: a list column ``name`` is carried as two block columns,
``name#vals`` (2-D values, shape [capacity, max_len]) and ``name#len``
(int32 per-row lengths). Explode expands rows with the same prefix-sum
expansion used by the join kernel: per-row output count = length (or
max(length,1) for OUTER), owner lookup via searchsorted.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from auron_tpu import config
from auron_tpu.block import Column, TableBlock, round_capacity
from auron_tpu.dtypes import INT32


def generate_block(block: TableBlock, node) -> TableBlock:
    if node.kind == "json_tuple":
        return json_tuple_block(block, node)
    vals_col = block.columns[f"{node.column}#vals"]
    len_col = block.columns[f"{node.column}#len"]
    cap, max_len = vals_col.values.shape
    lengths = jnp.clip(len_col.values.astype(jnp.int32), 0, max_len)
    if len_col.validity is not None:
        lengths = jnp.where(len_col.validity, lengths, 0)

    eff = jnp.where(block.row_mask,
                    jnp.maximum(lengths, 1) if node.outer else lengths, 0)
    offsets = jnp.cumsum(eff) - eff
    total = jnp.sum(eff)
    factor = config.conf.get(config.GENERATE_OUT_FACTOR)
    out_cap = node.out_capacity or round_capacity(
        int(cap * max(1, max_len // 2) * factor))
    from auron_tpu.runtime import overflow
    overflow.record("generate", total, out_cap)

    j = jnp.arange(out_cap, dtype=offsets.dtype)
    owner = jnp.clip(jnp.searchsorted(offsets, j, side="right") - 1, 0, cap - 1)
    live = j < total
    within = (j - jnp.take(offsets, owner)).astype(jnp.int32)
    has_elem = within < jnp.take(lengths, owner)

    cols = {}
    for name, c in block.columns.items():
        if name in (f"{node.column}#vals", f"{node.column}#len"):
            continue
        v = jnp.take(c.values, owner, axis=0)
        validity = None if c.validity is None else jnp.take(c.validity, owner)
        cols[name] = Column(v, validity, c.dtype, c.dict_values)
    elem = vals_col.values[owner, jnp.clip(within, 0, max_len - 1)]
    elem_valid = live & has_elem
    if vals_col.validity is not None and vals_col.validity.ndim == 2:
        elem_valid = elem_valid & vals_col.validity[
            owner, jnp.clip(within, 0, max_len - 1)]
    if node.kind == "posexplode":
        cols[node.pos_name] = Column.of(within, INT32, elem_valid)
    cols[node.out_name] = Column(elem, elem_valid, vals_col.dtype,
                                 vals_col.dict_values)
    return TableBlock(cols, live)


def json_tuple_block(block: TableBlock, node) -> TableBlock:
    """json_tuple generator (generate/json_tuple.rs:102): extract N fields
    from a json string column into string columns, row-aligned.

    Strings are host dictionaries, so each DISTINCT json document parses
    exactly once; per-field outputs are new dictionaries + a code-mapping
    gather — fully traceable under whole-plan jit."""
    import json

    src = block.columns[node.column]
    if src.dict_values is None:
        raise ValueError("json_tuple requires a string column")
    parsed = []
    for s in src.dict_values:
        try:
            doc = json.loads(s)
            parsed.append(doc if isinstance(doc, dict) else None)
        except (ValueError, TypeError):
            parsed.append(None)

    cols = dict(block.columns)
    from auron_tpu.dtypes import STRING
    codes_in = jnp.clip(src.values, 0, len(src.dict_values) - 1)
    for i, field in enumerate(node.fields):
        vals, ok = [], np.zeros(len(parsed), np.bool_)
        for j, doc in enumerate(parsed):
            v = None if doc is None else doc.get(field)
            if v is None:
                vals.append("")
            else:
                # Spark json_tuple: scalars as their json text (strings
                # unquoted), nested values as json
                vals.append(v if isinstance(v, str) else json.dumps(v))
                ok[j] = True
        uniq, inv = np.unique(np.array(vals, dtype=object).astype(str),
                              return_inverse=True)
        code_map = jnp.asarray(inv.astype(np.int32))
        ok_map = jnp.asarray(ok)
        out_codes = code_map[codes_in]
        validity = ok_map[codes_in]
        if src.validity is not None:
            validity = validity & src.validity
        cols[f"{node.out_name}{i}"] = Column(out_codes, validity, STRING,
                                             uniq.astype(object))
    return TableBlock(cols, block.row_mask)
