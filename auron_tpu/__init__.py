"""auron-tpu: a TPU-native vectorized query-execution engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of Apache Auron
(the Spark/Flink native-execution accelerator, surveyed in SURVEY.md):
vectorized filter/projection, hash aggregation (partial/final), sort/top-k,
broadcast + shuffled hash joins, window functions, and a distributed exchange
— all over fixed-capacity columnar blocks resident in HBM, compiled from a
DataFusion-style physical-plan IR into SPMD programs over a `jax.sharding.Mesh`.

Where Auron's data plane is Spark shuffle files + Arrow IPC (reference:
/root/reference/native-engine/datafusion-ext-plans/src/shuffle/), ours is XLA
collectives (`all_to_all`, `psum`) over ICI/DCN inside a single jitted program.
Where Auron spills to disk under memory pressure (auron-memmgr), we size blocks
to an HBM budget and fall back to multi-pass chunked algorithms.

SQL engines need 64-bit integers and doubles; enable x64 before anything else.
"""

import os

import jax

jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: first compiles through the remote-compile
# tunnel run 40s-10min; cached reloads are sub-second. Opt out with
# AURON_TPU_COMPILE_CACHE=off.
_cache_dir = os.environ.get("AURON_TPU_COMPILE_CACHE",
                            os.path.expanduser("~/.cache/auron_tpu_xla"))
if _cache_dir.lower() not in ("off", "0", "false"):
    # partition by host CPU fingerprint: XLA:CPU AOT entries embed the
    # compiling machine's ISA features, and loading them on a different
    # host warns about (and risks) SIGILL — entries must not cross hosts
    try:
        import hashlib
        with open("/proc/cpuinfo", "rb") as _f:
            _flags = [ln for ln in _f.read().split(b"\n")
                      if ln.startswith((b"flags", b"model name"))][:2]
        _fp = hashlib.md5(b"|".join(_flags)).hexdigest()[:10]
    except OSError:
        _fp = "generic"
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(_cache_dir, _fp))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without the knobs
        pass

from auron_tpu.config import AuronConf, conf  # noqa: E402
from auron_tpu.block import Column, TableBlock  # noqa: E402
from auron_tpu.dtypes import (  # noqa: E402
    BOOL,
    DATE32,
    DECIMAL64,
    FLOAT32,
    FLOAT64,
    INT8,
    INT16,
    INT32,
    INT64,
    STRING,
    STRING_RAW,
    DECIMAL128,
    TIMESTAMP64,
    DataType,
    Field,
    Schema,
)

__version__ = "0.1.0"

__all__ = [
    "AuronConf",
    "conf",
    "Column",
    "TableBlock",
    "DataType",
    "Field",
    "Schema",
    "BOOL",
    "INT8",
    "INT16",
    "INT32",
    "INT64",
    "FLOAT32",
    "FLOAT64",
    "DATE32",
    "DECIMAL64",
    "DECIMAL128",
    "STRING",
    "STRING_RAW",
    "TIMESTAMP64",
]
