"""Host string-ingest kernels: native dictionary encode + hash planes.

The scan boundary is where strings cost: every ingest dictionary-encodes
(SURVEY §7.4.5 — the device only sees int32 codes), and every string hash
needs the dictionary packed into LE u32 word planes. Both were per-row
Python work; here pyarrow materializes arrow buffers (no Python loop) and
native/strings.cpp does the per-row scanning. numpy fallbacks keep every
environment working (native.py contract).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from auron_tpu import native


def _arrow_buffers(values: np.ndarray):
    """Object array of str -> (int32 offsets, uint8 data) arrow buffers."""
    import pyarrow as pa
    if values.dtype != object:
        values = values.astype(object)
    arr = pa.array(values, type=pa.string(), from_pandas=True)
    if arr.null_count:
        arr = arr.fill_null("")
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=np.int32,
                            count=len(arr) + 1 + arr.offset)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None \
        else np.zeros(0, np.uint8)
    if arr.offset:
        offsets = offsets[arr.offset:]
    return np.ascontiguousarray(offsets), np.ascontiguousarray(data)


def dict_encode(values: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(codes int32, sorted unique dictionary) — identical output contract
    to ``np.unique(values, return_inverse=True)`` swapped, with the per-row
    hashing in C++."""
    L = native.strings_lib()
    n = len(values)
    if L is None or n == 0:
        uniq, codes = np.unique(values.astype(str), return_inverse=True)
        return codes.astype(np.int32), uniq.astype(object)
    offsets, data = _arrow_buffers(values)
    codes = np.empty(n, np.int32)
    first_idx = np.empty(n, np.int64)
    import ctypes
    nd = L.auron_dict_encode(
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        native._as_u8p(data), n,
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        first_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    uniq_first = values[first_idx[:nd]].astype(str)
    order = np.argsort(uniq_first, kind="stable")
    remap = np.empty(nd, np.int32)
    remap[order.astype(np.int32)] = np.arange(nd, dtype=np.int32)
    L.auron_remap_codes(
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n,
        remap.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return codes, uniq_first[order].astype(object)


def byte_planes(dict_values: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Dictionary -> (u32 word planes [n, max_words], lens int32 [n]) for
    the device murmur3 (ops/hashing.py)."""
    L = native.strings_lib()
    n = len(dict_values)
    if L is None or n == 0:
        return None  # caller falls back to the python loop
    offsets, data = _arrow_buffers(np.asarray(dict_values, dtype=object))
    lens_all = np.diff(offsets)
    max_words = max(int((lens_all.max() if n else 0) + 3) // 4, 1)
    words = np.zeros((n, max_words), np.uint32)
    lens = np.empty(n, np.int32)
    import ctypes
    L.auron_byte_planes(
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        native._as_u8p(data), n, max_words,
        words.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return words, lens
