"""Block wire format: compact columnar serialization + compressed framing.

Re-designs the reference's custom batch serde + IPC compression
(/root/reference/native-engine/datafusion-ext-commons/src/io/batch_serde.rs:
bit-packed validity :193-215, byte-plane transposition of fixed-width
columns :30-66; io/ipc_compression.rs: [u32 len | zstd block]* framing with
~4MB target blocks :35-113) for this engine's host boundary: DCN broadcast
staging, the host-RAM overflow tier (the RSS-analog), and block caches.

Layout per block:
  u32 magic 'ATB1' | u32 header_len | header(json: schema, n, dicts)
  | per column: [bitmap?] byte-transposed values | compressed with zstd.

Hot byte work (transpose, bit-pack, zstd) runs in the native C++ library
(native/serde.cpp) with a pure-numpy fallback.
"""

from __future__ import annotations

import io
import json
import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

from auron_tpu import native
from auron_tpu.block import Column, TableBlock
from auron_tpu.dtypes import type_from_name

MAGIC = b"ATB1"


def _transpose(arr_bytes: np.ndarray, n: int, width: int) -> np.ndarray:
    L = native.lib()
    out = np.empty(n * width, dtype=np.uint8)
    if L is not None:
        L.auron_transpose_bytes(native._as_u8p(arr_bytes), n, width,
                                native._as_u8p(out))
    else:
        out[:] = arr_bytes.reshape(n, width).T.reshape(-1)
    return out


def _untranspose(planes: np.ndarray, n: int, width: int) -> np.ndarray:
    L = native.lib()
    out = np.empty(n * width, dtype=np.uint8)
    if L is not None:
        L.auron_untranspose_bytes(native._as_u8p(planes), n, width,
                                  native._as_u8p(out))
    else:
        out[:] = planes.reshape(width, n).T.reshape(-1)
    return out


def _pack_bits(bools: np.ndarray) -> np.ndarray:
    L = native.lib()
    n = len(bools)
    if L is not None:
        out = np.empty((n + 7) // 8, dtype=np.uint8)
        b = np.ascontiguousarray(bools.view(np.uint8))
        L.auron_pack_bits(native._as_u8p(b), n, native._as_u8p(out))
        return out
    return np.packbits(bools, bitorder="little")


def _unpack_bits(bits: np.ndarray, n: int) -> np.ndarray:
    L = native.lib()
    if L is not None:
        out = np.empty(n, dtype=np.uint8)
        L.auron_unpack_bits(native._as_u8p(bits), n, native._as_u8p(out))
        return out.view(np.bool_)
    return np.unpackbits(bits, count=n, bitorder="little").view(np.bool_)


def _zstd_compress(data: np.ndarray, level: int = 1) -> bytes:
    L = native.lib()
    if L is not None:
        bound = L.auron_zstd_bound(len(data))
        out = np.empty(bound, dtype=np.uint8)
        k = L.auron_zstd_compress(native._as_u8p(data), len(data),
                                  native._as_u8p(out), bound, level)
        if k > 0:
            return out[:k].tobytes()
    import zstandard
    return zstandard.ZstdCompressor(level=level).compress(data.tobytes())


def _zstd_decompress(data: bytes, out_size: int) -> np.ndarray:
    L = native.lib()
    src = np.frombuffer(data, dtype=np.uint8)
    if L is not None:
        out = np.empty(out_size, dtype=np.uint8)
        k = L.auron_zstd_decompress(native._as_u8p(src), len(src),
                                    native._as_u8p(out), out_size)
        if k == out_size:
            return out
    import zstandard
    return np.frombuffer(
        zstandard.ZstdDecompressor().decompress(data, max_output_size=out_size),
        dtype=np.uint8).copy()


def _compress(data: np.ndarray, level: int, codec: str) -> bytes:
    """Codec-dispatched payload compression (the reference's spill/IPC
    codec choice, auron.spill.compression.codec / ipc_compression.rs:
    lz4|zstd). 'none' trades host RAM for zero codec CPU."""
    if codec == "none":
        return data.tobytes()
    if codec == "zlib":
        import zlib
        return zlib.compress(data.tobytes(), max(min(level, 9), 0))
    return _zstd_compress(data, level)


def _decompress(data: bytes, out_size: int, codec: str) -> np.ndarray:
    if codec == "none":
        return np.frombuffer(data, dtype=np.uint8).copy()
    if codec == "zlib":
        import zlib
        return np.frombuffer(zlib.decompress(data), dtype=np.uint8).copy()
    return _zstd_decompress(data, out_size)


def serialize_block(block: TableBlock, compact: bool = True,
                    level: int = 1) -> bytes:
    """Block -> bytes. ``compact`` drops dead rows first (cuts wire bytes,
    like the reference compacts before shuffle write)."""
    mask = np.asarray(block.row_mask)
    if compact:
        sel = np.flatnonzero(mask)
    else:
        sel = np.arange(len(mask))
    n = len(sel)
    from auron_tpu import config as _cfg
    codec = _cfg.conf.get(_cfg.STAGING_CODEC)
    header = {"n": n, "capacity": block.capacity, "cols": []}
    if codec != "zstd":
        header["codec"] = codec
    payload = io.BytesIO()
    for name, c in block.columns.items():
        vals = np.asarray(c.values)[sel]
        colh = {"name": name, "dtype": c.dtype.name,
                "params": list(c.dtype.params) if c.dtype.params else None,
                "np": str(vals.dtype), "shape": list(vals.shape),
                "validity": c.validity is not None}
        if c.dict_values is not None:
            colh["dict"] = [str(s) for s in c.dict_values]
        raw = np.ascontiguousarray(vals).view(np.uint8).reshape(-1)
        width = vals.dtype.itemsize
        if vals.ndim == 1 and width > 1 and n > 0:
            raw = _transpose(raw, n, width)
            colh["transposed"] = True
        comp = _compress(raw, level, codec)
        colh["raw_len"] = int(raw.size)
        colh["comp_len"] = len(comp)
        payload.write(comp)
        if c.validity is not None:
            vbits = _pack_bits(np.asarray(c.validity)[sel])
            vcomp = _compress(vbits, level, codec)
            colh["vraw_len"] = int(vbits.size)
            colh["vcomp_len"] = len(vcomp)
            payload.write(vcomp)
        header["cols"].append(colh)
    hjson = json.dumps(header).encode()
    return MAGIC + struct.pack("<I", len(hjson)) + hjson + payload.getvalue()


def deserialize_block(data: bytes, capacity: Optional[int] = None
                      ) -> TableBlock:
    """Bytes -> block (live rows first, padded to a capacity bucket)."""
    import jax.numpy as jnp
    from auron_tpu.block import round_capacity

    assert data[:4] == MAGIC, "bad block magic"
    hlen = struct.unpack("<I", data[4:8])[0]
    header = json.loads(data[8:8 + hlen].decode())
    n = header["n"]
    codec = header.get("codec", "zstd")
    cap = capacity or round_capacity(max(n, 1))
    off = 8 + hlen
    cols: Dict[str, Column] = {}
    for colh in header["cols"]:
        comp = data[off:off + colh["comp_len"]]
        off += colh["comp_len"]
        raw = _decompress(comp, colh["raw_len"], codec)
        np_dtype = np.dtype(colh["np"])
        shape = colh["shape"]
        if colh.get("transposed"):
            raw = _untranspose(raw, n, np_dtype.itemsize)
        vals = raw.view(np_dtype).reshape(shape) if n > 0 else \
            np.zeros(shape, np_dtype)
        padded = np.zeros((cap,) + tuple(shape[1:]), np_dtype)
        padded[:n] = vals
        validity = None
        if colh["validity"]:
            vcomp = data[off:off + colh["vcomp_len"]]
            off += colh["vcomp_len"]
            vbits = _decompress(vcomp, colh["vraw_len"], codec)
            v = np.zeros(cap, np.bool_)
            v[:n] = _unpack_bits(vbits, n)
            validity = jnp.asarray(v)
        dt = type_from_name(colh["dtype"],
                            tuple(colh["params"]) if colh["params"] else None)
        dict_values = np.array(colh["dict"], dtype=object) \
            if "dict" in colh else None
        cols[colh["name"]] = Column(jnp.asarray(padded), validity, dt,
                                    dict_values)
    mask = np.zeros(cap, np.bool_)
    mask[:n] = True
    return TableBlock(cols, jnp.asarray(mask))


# ---------------------------------------------------------------------------
# Framed streams: [u32 len | block]* with ~4MB target frames
# (ipc_compression.rs:35-113 analog).
# ---------------------------------------------------------------------------

TARGET_FRAME_BYTES = 4 << 20


class BlockStreamWriter:
    def __init__(self, fileobj):
        self.f = fileobj
        self.frames = 0

    def write_block(self, block: TableBlock, level: int = 1):
        data = serialize_block(block, level=level)
        self.f.write(struct.pack("<I", len(data)))
        self.f.write(data)
        self.frames += 1


class BlockStreamReader:
    def __init__(self, fileobj):
        self.f = fileobj

    def __iter__(self):
        while True:
            lenb = self.f.read(4)
            if len(lenb) < 4:
                return
            (ln,) = struct.unpack("<I", lenb)
            yield deserialize_block(self.f.read(ln))
