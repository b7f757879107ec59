"""Loader for the native C++ host library (builds on demand, caches .so).

Plays the role of the reference's cdylib loading
(/root/reference/auron-core/.../AuronAdaptor.java lib loading): the Python
driver compiles native/serde.cpp once per source change and binds it with
ctypes. Every caller must handle ``lib() is None`` (pure-numpy fallback) so
the engine works in environments without a toolchain.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Optional

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_REPO, "native", "serde.cpp")
_SRC_STRINGS = os.path.join(_REPO, "native", "strings.cpp")
_BUILD_DIR = os.path.join(_REPO, "native", "build")

_lib: Optional[ctypes.CDLL] = None
_tried = False
_strlib: Optional[ctypes.CDLL] = None
_strtried = False


def _compile(src: str, stem: str, extra=()) -> Optional[str]:
    if not os.path.exists(src):
        return None
    with open(src, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    so = os.path.join(_BUILD_DIR, f"lib{stem}-{tag}.so")
    if os.path.exists(so):
        return so
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", src,
           "-o", so + ".tmp", *extra]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(so + ".tmp", so)
        return so
    except (subprocess.SubprocessError, OSError):
        return None


def _build_so() -> Optional[str]:
    return _compile(_SRC, "auronserde", ("-lzstd",))


def lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, or None if unavailable."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    so = _build_so()
    if so is None:
        return None
    try:
        L = ctypes.CDLL(so)
    except OSError:
        return None
    c_u8p = ctypes.POINTER(ctypes.c_uint8)
    c_i32p = ctypes.POINTER(ctypes.c_int32)
    L.auron_transpose_bytes.argtypes = [c_u8p, ctypes.c_int64,
                                        ctypes.c_int32, c_u8p]
    L.auron_untranspose_bytes.argtypes = [c_u8p, ctypes.c_int64,
                                          ctypes.c_int32, c_u8p]
    L.auron_pack_bits.argtypes = [c_u8p, ctypes.c_int64, c_u8p]
    L.auron_unpack_bits.argtypes = [c_u8p, ctypes.c_int64, c_u8p]
    L.auron_zstd_bound.argtypes = [ctypes.c_int64]
    L.auron_zstd_bound.restype = ctypes.c_int64
    L.auron_zstd_compress.argtypes = [c_u8p, ctypes.c_int64, c_u8p,
                                      ctypes.c_int64, ctypes.c_int32]
    L.auron_zstd_compress.restype = ctypes.c_int64
    L.auron_zstd_decompress.argtypes = [c_u8p, ctypes.c_int64, c_u8p,
                                        ctypes.c_int64]
    L.auron_zstd_decompress.restype = ctypes.c_int64
    L.auron_compact_indices.argtypes = [c_u8p, ctypes.c_int64, c_i32p]
    L.auron_compact_indices.restype = ctypes.c_int64
    _lib = L
    return _lib


def _as_u8p(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def strings_lib() -> Optional[ctypes.CDLL]:
    """Native string-ingest kernels (native/strings.cpp), or None."""
    global _strlib, _strtried
    if _strtried:
        return _strlib
    _strtried = True
    so = _compile(_SRC_STRINGS, "auronstrings")
    if so is None:
        return None
    try:
        L = ctypes.CDLL(so)
    except OSError:
        return None
    c_u8p = ctypes.POINTER(ctypes.c_uint8)
    c_i32p = ctypes.POINTER(ctypes.c_int32)
    c_i64p = ctypes.POINTER(ctypes.c_int64)
    c_u32p = ctypes.POINTER(ctypes.c_uint32)
    L.auron_dict_encode.argtypes = [c_i32p, c_u8p, ctypes.c_int64,
                                    c_i32p, c_i64p]
    L.auron_dict_encode.restype = ctypes.c_int64
    L.auron_remap_codes.argtypes = [c_i32p, ctypes.c_int64, c_i32p]
    L.auron_byte_planes.argtypes = [c_i32p, c_u8p, ctypes.c_int64,
                                    ctypes.c_int32, c_u32p, c_i32p]
    _strlib = L
    return _strlib
