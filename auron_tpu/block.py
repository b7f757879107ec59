"""Fixed-capacity columnar blocks in HBM — the engine's batch format.

Re-designs Auron/Arrow record batches (reference: arrow RecordBatch flowing
through /root/reference/native-engine/datafusion-ext-plans operators) for XLA's
static-shape world:

* A ``TableBlock`` is a struct-of-arrays: each column is a dense ``values``
  array of static shape ``[capacity]`` plus an optional validity bitmap.
* Instead of Arrow's dynamic row counts, a block carries a boolean ``row_mask``
  of shape ``[capacity]``: True = live row. Filters just AND into the mask
  (a selection vector, no data movement — the fastest possible filter on a
  vector machine); compaction happens only where it pays (exchange, output).
* Capacities are padded to lane-friendly multiples so every kernel sees
  aligned static shapes and XLA recompiles only when the capacity *bucket*
  changes, not per row-count.

Blocks are registered JAX pytrees, so whole query pipelines over them can be
jitted / shard_mapped directly.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from auron_tpu import config
from auron_tpu.dtypes import (BOOL, DataType, Field, Schema, STRING,
                              TIMESTAMP64, type_from_name)


def _narrow_int64_enabled() -> bool:
    return bool(config.conf.get(config.INT_NARROW_ENABLE))


def narrow_int64_frame(df, dtypes=None):
    """Registration-time int64 -> int32 narrowing (config
    ``auron.int64.narrow.enable``). int64 is brutal on TPU: the x64
    rewriter splits every i64[N] into tiled s32[N,2] whose minor dim pads
    to 128 lanes (64x the HBM traffic) and i64 arithmetic is
    software-emulated, so int64 surrogate keys tax every join probe, sort
    and exchange. Columns whose concrete values fit comfortably in int32
    (2^30 headroom so a+b stays exact) are stored as int32 — sums still
    widen to int64 (aggregate._sum_dtype), mixed-width comparisons promote.

    This is a SESSION registration policy, not a block-level one: the
    decision is taken on the WHOLE column so every partition of one table
    agrees on the stored dtype (a per-partition min/max could narrow some
    partitions and not others, and SPMD stacking requires identical
    schemas), and ``TableBlock.from_pandas`` itself stays an exact dtype
    round-trip. Caller-pinned dtypes are never narrowed."""
    if not _narrow_int64_enabled():
        return df
    repl = {}
    for name in df.columns:
        if dtypes and name in dtypes:
            continue
        s = df[name]
        if s.dtype == np.int64 and (
                len(s) == 0 or (int(s.min()) >= -(1 << 30)
                                and int(s.max()) < (1 << 30))):
            repl[name] = s.astype(np.int32)
    return df.assign(**repl) if repl else df


def round_capacity(n: int, align: Optional[int] = None) -> int:
    """Round n up to a lane-friendly capacity bucket (power-of-two-ish)."""
    align = align or config.conf.get(config.CAPACITY_ALIGN)
    n = max(n, 1)
    # Bucket to {1, 1.25, 1.5, 1.75} x 2^k to bound recompiles, then align.
    k = max((n - 1).bit_length() - 2, 0)
    step = max(1 << k, 1)
    bucket = ((n + step - 1) // step) * step
    return ((bucket + align - 1) // align) * align


class Column:
    """One column: dense values [capacity] + optional validity mask.

    ``validity is None`` means "no nulls" (Arrow's null_count==0 fast path).
    For string columns, ``values`` are int32 dictionary codes; the dictionary
    itself lives host-side (``dict_values``, a numpy object array), outside
    the traced pytree so it never enters XLA programs.
    """

    __slots__ = ("values", "validity", "dtype", "dict_values")

    def __init__(self, values, validity=None, dtype: Optional[DataType] = None,
                 dict_values: Optional[np.ndarray] = None):
        self.values = values
        self.validity = validity
        if dtype is None:
            raise ValueError("Column requires a logical dtype")
        self.dtype = dtype
        self.dict_values = dict_values

    @property
    def capacity(self) -> int:
        return self.values.shape[0]

    def valid_at(self):
        """Validity as a dense bool array (all-True when validity is None).
        Scalar (0-d) literal columns yield a scalar True that broadcasts."""
        if self.validity is None:
            shape = getattr(self.values, "shape", ())
            return jnp.ones(shape[:1], dtype=jnp.bool_) if shape \
                else jnp.asarray(True)
        return self.validity

    def with_values(self, values, validity="_keep") -> "Column":
        v = self.validity if validity == "_keep" else validity
        return Column(values, v, self.dtype, self.dict_values)

    @staticmethod
    def of(values, dtype: DataType, validity=None,
           dict_values: Optional[np.ndarray] = None) -> "Column":
        """Fresh column of a given logical type (no inherited dictionary)."""
        return Column(values, validity, dtype, dict_values)

    # -- pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        if self.validity is None:
            return (self.values,), ("no_validity", self.dtype, _DictRef(self.dict_values))
        return (self.values, self.validity), ("validity", self.dtype, _DictRef(self.dict_values))

    @classmethod
    def tree_unflatten(cls, aux, children):
        tag, dtype, dict_ref = aux
        if tag == "no_validity":
            return cls(children[0], None, dtype, dict_ref.array)
        return cls(children[0], children[1], dtype, dict_ref.array)

    def __repr__(self):
        return f"Column({self.dtype!r}, cap={self.values.shape[0]}, " \
               f"nulls={'y' if self.validity is not None else 'n'})"


class _DictRef:
    """Hashable wrapper so a host-side dictionary can ride in pytree aux data.

    Compares by identity: two jit traces share a cache entry only if they use
    the very same dictionary object, which is the correct invalidation rule.
    """

    __slots__ = ("array",)

    def __init__(self, array: Optional[np.ndarray]):
        self.array = array

    def __hash__(self):
        return id(self.array)

    def __eq__(self, other):
        return isinstance(other, _DictRef) and other.array is self.array


jax.tree_util.register_pytree_node(
    Column, Column.tree_flatten, Column.tree_unflatten)


class TableBlock:
    """A batch of rows: named columns + row liveness mask, all [capacity]."""

    __slots__ = ("columns", "row_mask")

    def __init__(self, columns: Dict[str, Column], row_mask):
        self.columns = dict(columns)
        self.row_mask = row_mask

    # -- construction -------------------------------------------------------
    @staticmethod
    def from_numpy(data: Dict[str, np.ndarray],
                   dtypes: Optional[Dict[str, DataType]] = None,
                   capacity: Optional[int] = None,
                   validity: Optional[Dict[str, np.ndarray]] = None,
                   dictionaries: Optional[Dict[str, np.ndarray]] = None) -> "TableBlock":
        """Build a block from host arrays, padding to a capacity bucket."""
        if not data:
            raise ValueError("empty block")
        n = len(next(iter(data.values())))
        cap = capacity or round_capacity(n)
        if cap < n:
            raise ValueError(f"capacity {cap} < rows {n}")
        cols = {}
        for name, arr in data.items():
            arr = np.asarray(arr)
            if dtypes and name in dtypes:
                dt = dtypes[name]
            else:
                dt = _infer_dtype(arr)
            if arr.dtype.kind == "M":
                if dt.name == "timestamp64":
                    arr = arr.astype("datetime64[us]").astype(np.int64)
                else:  # date32: days
                    arr = arr.astype("datetime64[D]").astype(np.int32)
            elif arr.dtype.kind == "m":
                arr = arr.astype("timedelta64[us]").astype(np.int64)
            if dt.name == "decimal128":
                # unscaled python ints (object array) or [n, 2] limb planes
                from auron_tpu.ops import decimal128 as d128
                if arr.ndim == 1:
                    arr = d128.np_from_ints([int(v) for v in arr])
                padded = np.zeros((cap, 2), dtype=np.int64)
                padded[:n] = arr
            elif dt.name == "string_raw":
                from auron_tpu.expr import strings_raw as SR
                W = dt.params[0]
                if arr.ndim == 1:  # object array of str
                    arr = SR.encode_object_array(arr, W)
                padded = np.full((cap, W), np.int32(-0x80000000), np.int32)
                padded[:n] = arr
            else:
                padded = np.zeros(cap, dtype=dt.np_dtype)
                padded[:n] = arr.astype(dt.np_dtype, copy=False)
            val = None
            if validity and name in validity and validity[name] is not None:
                v = np.zeros(cap, dtype=np.bool_)
                v[:n] = validity[name]
                val = jnp.asarray(v)
            dv = dictionaries.get(name) if dictionaries else None
            cols[name] = Column(jnp.asarray(padded), val, dt, dv)
        mask = np.zeros(cap, dtype=np.bool_)
        mask[:n] = True
        return TableBlock(cols, jnp.asarray(mask))

    @staticmethod
    def from_pandas(df, dtypes: Optional[Dict[str, DataType]] = None,
                    capacity: Optional[int] = None) -> "TableBlock":
        """Build from a pandas DataFrame; strings are dictionary-encoded."""
        data, vals, dicts, dts = {}, {}, {}, dict(dtypes or {})
        for name in df.columns:
            s = df[name]
            npa = s.to_numpy()
            isna = s.isna().to_numpy()
            if npa.dtype == object:
                nonnull = [v for v, na in zip(npa, isna) if not na]
                if nonnull and all(isinstance(v, (bool, np.bool_)) for v in nonnull):
                    npa = np.array([bool(v) if not na else False
                                    for v, na in zip(npa, isna)])
                elif nonnull and all(
                        isinstance(v, (int, float, np.number)) for v in nonnull):
                    npa = np.array([float(v) if not na else 0.0
                                    for v, na in zip(npa, isna)])
            if npa.dtype == object or str(npa.dtype).startswith(("str", "<U")) \
                    or (dtypes and name in dtypes and dtypes[name].is_string):
                # dictionary-encode on host (native/strings.cpp when
                # available; np.unique-compatible sorted dictionary)
                filled = np.where(isna, "", npa.astype(object))
                from auron_tpu.expr.strings_host import dict_encode
                codes, uniq = dict_encode(filled)
                raw_w = _raw_promotion_words(dtypes, name, uniq, len(filled))
                if raw_w is not None:
                    # high-cardinality: raw byte planes, no host dictionary
                    from auron_tpu.expr import strings_raw as SR
                    from auron_tpu.dtypes import STRING_RAW
                    table = SR.encode_object_array(uniq, raw_w)
                    data[name] = table[codes]
                    dts[name] = STRING_RAW(raw_w)
                else:
                    data[name] = codes
                    dicts[name] = uniq
                    dts[name] = STRING
            elif isna.any():
                if np.issubdtype(npa.dtype, np.floating):
                    data[name] = np.nan_to_num(npa, nan=0.0)
                elif npa.dtype.kind in ("M", "m"):
                    filled = npa.copy()
                    filled[isna] = np.zeros((), npa.dtype)
                    data[name] = filled
                else:
                    data[name] = np.where(isna, 0, npa)
            else:
                data[name] = npa
            if isna.any():
                vals[name] = ~isna
        return TableBlock.from_numpy(data, dts, capacity, vals, dicts)

    # -- basic accessors ----------------------------------------------------
    @property
    def capacity(self) -> int:
        return self.row_mask.shape[0]

    @property
    def schema(self) -> Schema:
        return Schema([Field(n, c.dtype, c.validity is not None)
                       for n, c in self.columns.items()])

    @property
    def names(self) -> List[str]:
        return list(self.columns.keys())

    def num_rows(self):
        """Traced count of live rows."""
        return jnp.sum(self.row_mask.astype(jnp.int32))

    def column(self, name: str) -> Column:
        return self.columns[name]

    def __getitem__(self, name: str) -> Column:
        return self.columns[name]

    # -- functional updates --------------------------------------------------
    def with_mask(self, mask) -> "TableBlock":
        return TableBlock(self.columns, mask)

    def filter_mask(self, keep) -> "TableBlock":
        """AND a predicate into the row mask (the O(1)-movement filter)."""
        return TableBlock(self.columns, jnp.logical_and(self.row_mask, keep))

    def with_columns(self, new_cols: Dict[str, Column]) -> "TableBlock":
        cols = dict(self.columns)
        cols.update(new_cols)
        return TableBlock(cols, self.row_mask)

    def project(self, names: Sequence[str]) -> "TableBlock":
        return TableBlock({n: self.columns[n] for n in names}, self.row_mask)

    def rename(self, mapping: Dict[str, str]) -> "TableBlock":
        """Schema aliasing at stage seams (RenameColumnsExec parity)."""
        return TableBlock({mapping.get(n, n): c for n, c in self.columns.items()},
                          self.row_mask)

    # -- host-side output ---------------------------------------------------
    def to_pandas(self):
        """Gather live rows to host, decode dictionaries, return DataFrame.

        Output boundary only (analog of Auron's C2R seam,
        /root/reference/spark-extension/.../NativeHelper.scala:119-160).
        """
        import pandas as pd
        mask = np.asarray(self.row_mask)
        out = {}
        # list columns ride as plane pairs (X#vals [cap, max_len] + X#len);
        # the output boundary renders them as python lists (the C2R seam
        # materializes ArrayType the same way)
        plane_pairs = {n[:-5] for n in self.columns
                       if n.endswith("#vals") and f"{n[:-5]}#len"
                       in self.columns
                       and getattr(self.columns[n].values, "ndim", 1) == 2}
        for base in sorted(plane_pairs):
            vc, lc = self.columns[f"{base}#vals"], self.columns[f"{base}#len"]
            vals = np.asarray(vc.values)[mask]
            lens = np.clip(np.asarray(lc.values)[mask].astype(np.int64),
                           0, vals.shape[1] if vals.ndim == 2 else 0)
            if vc.dtype.name == "decimal64":
                _, scale = vc.dtype.params
                vals = vals.astype(np.float64) / (10 ** scale)
            elif vc.dtype.is_string and vc.dict_values is not None:
                vals = vc.dict_values[
                    np.clip(vals, 0, len(vc.dict_values) - 1)]
            ev = None if vc.validity is None or vc.validity.ndim != 2 \
                else np.asarray(vc.validity)[mask]
            rows = []
            for i in range(len(vals)):
                xs = vals[i, :lens[i]]
                if ev is not None:
                    rows.append([None if not ok else x.item()
                                 if hasattr(x, "item") else x
                                 for x, ok in zip(xs, ev[i, :lens[i]])])
                else:
                    rows.append([x.item() if hasattr(x, "item") else x
                                 for x in xs])
            out[base] = pd.Series(rows, dtype=object)
        for name, col in self.columns.items():
            if (name.endswith("#vals") and name[:-5] in plane_pairs) or \
                    (name.endswith("#len") and name[:-4] in plane_pairs):
                continue
            vals = np.asarray(col.values)[mask]
            if col.dtype.is_string and col.dict_values is not None:
                decoded = col.dict_values[np.clip(vals, 0, len(col.dict_values) - 1)]
                s = pd.Series(decoded, dtype=object)
            elif col.dtype.is_raw_string:
                from auron_tpu.expr import strings_raw as SR
                s = pd.Series(SR.decode_planes(vals), dtype=object)
            elif col.dtype.name == "timestamp64":
                s = pd.Series(vals.astype("datetime64[us]"))
            elif col.dtype.name == "date32":
                s = pd.Series(vals.astype("datetime64[D]"))
            elif col.dtype.name == "interval_dt":
                s = pd.Series(vals.astype("timedelta64[us]"))
            elif col.dtype.name == "interval_ym":
                # pandas has no year-month interval: surface raw months
                s = pd.Series(vals)
            elif col.dtype.name == "decimal64":
                _, scale = col.dtype.params
                s = pd.Series(vals.astype(np.float64) / (10 ** scale))
            elif col.dtype.name == "decimal128":
                from auron_tpu.ops import decimal128 as d128
                _, scale = col.dtype.params
                ints = d128.np_to_ints(vals)
                s = pd.Series([float(v) / (10 ** scale) for v in ints])
            else:
                s = pd.Series(vals)
            if col.validity is not None:
                nulls = ~np.asarray(col.validity)[mask]
                s = s.mask(nulls)
            out[name] = s
        return pd.DataFrame(out)

    # -- pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        names = tuple(self.columns.keys())
        return (tuple(self.columns[n] for n in names), self.row_mask), names

    @classmethod
    def tree_unflatten(cls, names, children):
        cols, mask = children
        return cls(dict(zip(names, cols)), mask)

    def __repr__(self):
        cols = ", ".join(f"{n}:{c.dtype!r}" for n, c in self.columns.items())
        return f"TableBlock(cap={self.capacity}, [{cols}])"


jax.tree_util.register_pytree_node(
    TableBlock,
    lambda b: b.tree_flatten(),
    lambda aux, ch: TableBlock.tree_unflatten(aux, ch))


def _raw_promotion_words(dtypes, name, uniq, n_rows) -> Optional[int]:
    """Plane width (words) when a string column qualifies for the raw
    byte-plane representation, else None (config-gated; explicit STRING
    dtype always wins; values are never truncated)."""
    if dtypes and name in dtypes:
        dt = dtypes[name]
        if dt.name == "string_raw":
            return dt.params[0]
        return None  # explicit STRING: keep the dictionary
    if not config.conf.get(config.RAW_STRING_ENABLE):
        return None
    if len(uniq) < config.conf.get(config.RAW_STRING_MIN_DISTINCT):
        return None
    if len(uniq) < config.conf.get(config.RAW_STRING_MIN_FRACTION) * n_rows:
        return None
    from auron_tpu.expr import strings_raw as SR
    mb = SR.max_bytes(uniq)
    limit = config.conf.get(config.RAW_STRING_MAX_BYTES)
    if mb > limit or any("\x00" in s for s in uniq if isinstance(s, str)):
        return None
    return max((mb + 3) // 4, 1)


def _infer_dtype(arr: np.ndarray) -> DataType:
    kind = arr.dtype.kind
    if kind == "b":
        return BOOL
    if kind in ("i", "u"):
        return type_from_name(f"int{arr.dtype.itemsize * 8}")
    if kind == "f":
        return type_from_name(f"float{arr.dtype.itemsize * 8}")
    if kind == "M":
        unit = np.datetime_data(arr.dtype)[0]
        if unit == "D":
            return type_from_name("date32")
        return type_from_name("timestamp64")  # stored as micros
    if kind == "m":
        return type_from_name("interval_dt")  # micros (DayTimeInterval)
    raise TypeError(f"cannot infer engine dtype for numpy dtype {arr.dtype}")
