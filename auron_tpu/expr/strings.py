"""String functions over dictionary-encoded columns.

The TPU has no varlen byte processing worth using for TPC-DS-scale string
work; instead every string column is dictionary-encoded at scan time
(SURVEY.md §7.4.5). A string function then runs ONCE over the (host-side)
dictionary at trace time and becomes a device gather:

    upper(s)        -> new dictionary (codes unchanged)
    length(s)       -> int lookup table[codes]
    s LIKE 'a%'     -> bool lookup table[codes]

This reproduces the *capability* of the reference's string kernels
(/root/reference/native-engine/datafusion-ext-functions/src/spark_strings.rs
and the StringStartsWith/EndsWith/Contains proto exprs, auron.proto:95-110)
with O(|dict|) host work and O(rows) device gathers.

Results are cached per (dictionary identity, function, params) so repeated
queries and retraces don't re-run host work.
"""

from __future__ import annotations

import fnmatch
import re
from typing import Callable, Dict, Tuple

import jax.numpy as jnp
import numpy as np

from auron_tpu.block import Column
from auron_tpu.dtypes import BOOL, INT32, STRING, DataType

# Every entry stores (pinned_source_arrays, value): holding a strong
# reference to the keyed array(s) guarantees their id() cannot be recycled
# for a different dictionary while the entry lives (id-aliasing would
# silently return a stale mapping).
_CACHE: Dict[Tuple, Tuple] = {}


def _dict_map(dict_values: np.ndarray, key: Tuple, fn: Callable[[str], object],
              out_dtype) -> np.ndarray:
    cache_key = (id(dict_values),) + key
    hit = _CACHE.get(cache_key)
    if hit is not None:
        return hit[1]
    out = np.array([fn(s) for s in dict_values], dtype=out_dtype)
    _CACHE[cache_key] = ((dict_values,), out)
    return out


def map_to_new_dictionary(col: Column, key: Tuple,
                          fn: Callable[[str], str]) -> Column:
    """string->string function: rewrite the dictionary.

    Non-injective functions (upper('a')/upper('A'), substring, trim...)
    produce DUPLICATE entries under different codes; grouping and rank
    machinery treat codes as identity, so equal outputs must share one
    code — the derived dictionary is deduped and codes remap (cached per
    (dict, fn) like the dictionary itself)."""
    cache_key = (id(col.dict_values), "dedup") + key
    hit = _CACHE.get(cache_key)
    if hit is None:
        new_dict = _dict_map(col.dict_values, key, fn, object)
        uniq, inv = np.unique(new_dict.astype(str), return_inverse=True)
        if len(uniq) == len(new_dict):
            hit = ((col.dict_values,), new_dict, None)
        else:
            hit = ((col.dict_values,), uniq.astype(object),
                   inv.astype(np.int32))
        _CACHE[cache_key] = hit
    _, d, inv = hit
    if inv is None:
        return Column(col.values, col.validity, STRING, d)
    codes = jnp.take(jnp.asarray(inv),
                     jnp.clip(col.values, 0, len(inv) - 1))
    return Column(codes, col.validity, STRING, d)


def map_to_values(col: Column, key: Tuple, fn: Callable[[str], object],
                  dtype: DataType) -> Column:
    """string->scalar function: lookup table gather."""
    table = _dict_map(col.dict_values, key, fn, dtype.np_dtype)
    codes = jnp.clip(col.values, 0, len(col.dict_values) - 1)
    return Column.of(jnp.asarray(table)[codes], dtype, col.validity)


def string_predicate(col: Column, kind: str, pattern: str) -> Column:
    """LIKE / startswith / endswith / contains / rlike as a bool gather."""
    if kind == "like":
        # SQL LIKE: % = any run, _ = any single char (escape not handled yet)
        rx = re.compile(
            "^" + re.escape(pattern).replace("%", ".*").replace("_", ".") + "$",
            re.DOTALL)
        fn = lambda s: bool(rx.match(s))
    elif kind == "rlike":
        rx = re.compile(pattern)
        fn = lambda s: bool(rx.search(s))
    elif kind == "startswith":
        fn = lambda s: s.startswith(pattern)
    elif kind == "endswith":
        fn = lambda s: s.endswith(pattern)
    elif kind == "contains":
        fn = lambda s: pattern in s
    else:
        raise ValueError(kind)
    return map_to_values(col, (kind, pattern), fn, BOOL)


def code_of_literal(dict_values: np.ndarray, value: str) -> int:
    """Dictionary code of a string literal, or -1 if absent (no row matches)."""
    cache_key = (id(dict_values), "idx", value)
    hit = _CACHE.get(cache_key)
    if hit is None:
        where = np.nonzero(dict_values == value)[0]
        hit = ((dict_values,), int(where[0]) if len(where) else -1)
        _CACHE[cache_key] = hit
    return hit[1]


def translate_codes(src_dict: np.ndarray, dst_dict: np.ndarray) -> np.ndarray:
    """Mapping src code -> dst code (-1 when absent), for cross-dictionary
    string comparisons/joins. Host-side, cached."""
    cache_key = (id(src_dict), "xlate", id(dst_dict))
    hit = _CACHE.get(cache_key)
    if hit is None:
        lookup = {s: i for i, s in enumerate(dst_dict)}
        arr = np.array([lookup.get(s, -1) for s in src_dict], dtype=np.int32)
        hit = ((src_dict, dst_dict), arr)
        _CACHE[cache_key] = hit
    return hit[1]


def unify_string_columns(cols):
    """Re-code string columns onto one merged dictionary.

    Needed wherever string values from different producers meet (CASE
    branches, coalesce, union): codes are only comparable within a single
    dictionary. Host work is O(sum |dict|), device work one gather per column.
    """
    import jax.numpy as jnp
    dicts = [c.dict_values for c in cols]
    if all(d is dicts[0] for d in dicts):
        return list(cols), dicts[0]
    merged = np.unique(np.concatenate([d.astype(object) for d in dicts]))
    out = []
    for c in cols:
        xlate = jnp.asarray(translate_codes(c.dict_values, merged))
        codes = jnp.clip(c.values, 0, len(c.dict_values) - 1)
        out.append(Column(xlate[codes], c.validity, STRING, merged))
    return out, merged


def sort_rank_table(dict_values: np.ndarray) -> np.ndarray:
    """Rank of each dictionary entry in lexicographic (UTF-8 byte) order.

    Lets ORDER BY / range comparisons on strings run as integer compares of
    rank[codes] — dictionary codes themselves are in first-seen order.
    """
    cache_key = (id(dict_values), "rank")
    hit = _CACHE.get(cache_key)
    if hit is not None:
        return hit[1]
    if hit is None:
        encoded = np.array([s.encode("utf-8") for s in dict_values], dtype=object)
        order = np.argsort(encoded, kind="stable")
        rank = np.empty(len(dict_values), dtype=np.int32)
        rank[order] = np.arange(len(dict_values), dtype=np.int32)
        _CACHE[cache_key] = ((dict_values,), rank)
        hit = rank
    return hit
