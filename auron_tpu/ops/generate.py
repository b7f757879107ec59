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


def _generate_out_cap(node, default_rows: int) -> int:
    """Output capacity for an expanding generate. An explicit/measured
    ``node.out_capacity`` is a HINT, not a guarantee: scale it by the
    grown GENERATE_OUT_FACTOR ratio so the overflow-regrow loop converges
    instead of re-running with an unchanged capacity (mirrors the join
    hint handling in plan/execute.py out_cap_for)."""
    factor = config.conf.get(config.GENERATE_OUT_FACTOR)
    if node.out_capacity is not None:
        f = factor / config.GENERATE_OUT_FACTOR.default
        if f > 1.0:
            return round_capacity(int(node.out_capacity * f) + 1)
        return node.out_capacity
    return round_capacity(int(default_rows * factor) + 1)


def generate_block(block: TableBlock, node) -> TableBlock:
    if node.kind == "json_tuple":
        return json_tuple_block(block, node)
    if node.kind == "py_udtf":
        return py_udtf_block(block, node)
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
    from auron_tpu.runtime import calibrate
    if calibrate.active():
        import jax.core
        if not isinstance(total, jax.core.Tracer):
            calibrate.record(node, int(total))  # jit-AQE measured size
    out_cap = _generate_out_cap(node, cap * max(1, max_len // 2))
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


def py_udtf_block(block: TableBlock, node) -> TableBlock:
    """Arbitrary host table function — the serialized-Spark-UDTF escape
    hatch (auron.proto:618-628, generate_exec.rs UDTF case) re-designed as
    a `jax.pure_callback` with static output capacity.

    ``node.fn(*row_values)`` is called once per live row with decoded
    python values (strings as str, NULL as None) and returns an iterable
    of output tuples matching ``node.out_fields``; OUTER emits one all-NULL
    output row for rows that generate nothing. The host computes the
    expansion (owner indices + field planes padded to out_capacity); the
    device gathers child columns by owner — so the op is traceable under
    whole-plan jit for non-string outputs. String output fields build
    data-dependent dictionaries and therefore require eager (non-traced)
    inputs, like PyUDF.
    """
    import jax

    cap = block.capacity
    arg_cols = [block.columns[a] for a in node.args]
    out_fields = list(node.out_fields)
    out_cap = _generate_out_cap(node, cap)

    decoders = []
    for c in arg_cols:
        decoders.append(("str", c.dict_values) if c.dtype.is_string
                        else ("rawstr", None) if c.dtype.is_raw_string
                        else ("raw", None))
    fn = node.fn
    outer = node.outer

    def expand(mask, validities, *arrays):
        decoded = []
        for (kind, dv), arr, va in zip(decoders, arrays, validities):
            arr = np.asarray(arr)
            if kind == "str":
                vals = np.asarray(dv, dtype=object)[
                    np.clip(arr, 0, len(dv) - 1)]
            elif kind == "rawstr":
                from auron_tpu.expr import strings_raw as SR
                vals = SR.decode_planes(arr)
            else:
                vals = arr.astype(object)
            if va is not None:
                vals = np.where(np.asarray(va), vals, None)
            decoded.append(vals)
        owners = []
        outs = [[] for _ in out_fields]
        ok = [[] for _ in out_fields]
        for i in np.flatnonzero(np.asarray(mask)):
            rows = list(fn(*(d[i] for d in decoded)) or ())
            if not rows and outer:
                rows = [tuple(None for _ in out_fields)]
            for row in rows:
                owners.append(i)
                for j, v in enumerate(row):
                    outs[j].append(v)
                    ok[j].append(v is not None)
        return owners, outs, ok, len(owners)

    tracing = isinstance(block.row_mask, jax.core.Tracer) or any(
        isinstance(c.values, jax.core.Tracer) for c in arg_cols)
    str_out = [f for f in out_fields if f[1].is_string]
    if str_out and tracing:
        raise NotImplementedError(
            f"py_udtf string outputs {[f[0] for f in str_out]} need eager "
            "inputs (data-dependent dictionaries cannot build under jit)")

    def _pad(lst, dtype, fill=0):
        a = np.full(out_cap, fill, dtype=dtype)
        a[:min(len(lst), out_cap)] = lst[:out_cap]
        return a

    new_dicts = {}

    # validity planes are appended after the value arrays; vidx maps each
    # argument to its validity's position (None = always valid)
    vidx, pos = [], len(arg_cols)
    for c in arg_cols:
        vidx.append(pos if c.validity is not None else None)
        pos += c.validity is not None

    def host_call(mask, *arrays):
        validities = [None if k is None else arrays[k] for k in vidx]
        owners, outs, ok, total = expand(mask, validities,
                                         *arrays[:len(arg_cols)])
        planes = [_pad(owners, np.int32),
                  np.asarray(min(total, out_cap), np.int32)]
        for j, (name, dt) in enumerate(out_fields):
            vals = outs[j]
            if dt.is_string:
                uniq, inv = np.unique(
                    np.asarray([v if v is not None else "" for v in vals],
                               dtype=object).astype(str),
                    return_inverse=True)
                new_dicts[name] = uniq
                planes.append(_pad(inv.astype(np.int32), np.int32))
            else:
                planes.append(_pad(
                    [_coerce_out(v, dt) for v in vals], dt.np_dtype))
            planes.append(_pad(ok[j], np.bool_, False))
        if total > out_cap:
            planes[1] = np.asarray(-total, np.int32)  # overflow marker
        return tuple(planes)

    shapes = [jax.ShapeDtypeStruct((out_cap,), np.int32),
              jax.ShapeDtypeStruct((), np.int32)]
    for name, dt in out_fields:
        shapes.append(jax.ShapeDtypeStruct((out_cap,), dt.np_dtype))
        shapes.append(jax.ShapeDtypeStruct((out_cap,), np.bool_))
    vargs = [c.values for c in arg_cols] + [
        c.validity for c in arg_cols if c.validity is not None]
    res = jax.pure_callback(host_call, tuple(shapes), block.row_mask,
                            *vargs, vmap_method="sequential")
    owner, total = res[0], res[1]
    from auron_tpu.runtime import overflow
    overflow.record("generate", jnp.abs(total.astype(jnp.int64)), out_cap)
    total = jnp.abs(total)

    live = jnp.arange(out_cap, dtype=jnp.int32) < total
    owner = jnp.clip(owner, 0, cap - 1)
    cols = {}
    for name, c in block.columns.items():
        v = jnp.take(c.values, owner, axis=0)
        validity = None if c.validity is None else jnp.take(c.validity,
                                                            owner)
        cols[name] = Column(v, validity, c.dtype, c.dict_values)
    for j, (name, dt) in enumerate(out_fields):
        vals, ok = res[2 + 2 * j], res[3 + 2 * j]
        cols[name] = Column(vals, ok & live, dt,
                            new_dicts.get(name) if dt.is_string else None)
    return TableBlock(cols, live)


def _coerce_out(v, dt):
    if v is None:
        return 0
    if dt.name == "date32":
        return np.datetime64(str(v), "D").astype(np.int32)
    if dt.name == "timestamp64" and not isinstance(v, (int, np.integer)):
        return np.datetime64(str(v), "us").astype(np.int64)
    if dt.name == "decimal64":
        return int(round(float(v) * 10 ** dt.params[1]))
    return v
