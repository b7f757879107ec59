"""Typed configuration registry.

Re-designs Auron's layered config system (reference:
/root/reference/auron-core/src/main/java/org/apache/auron/configuration/ConfigOption.java
and spark-extension/.../SparkAuronConfiguration.java:42-556 — ~80 typed options
with defaults, alternative keys and validation, read lazily by the native side
so there is a single source of truth).

Here the engine is a single Python process, so one registry serves both the
"driver" (plan compiler) and the "executor" (jitted stages). Options are typed,
documented, support alt-keys, and can be overridden per-session or via
environment variables (``AURON_TPU_<KEY>`` with dots replaced by underscores).
"""

from __future__ import annotations

import os
import threading
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Generic, List, Optional, TypeVar

T = TypeVar("T")

_REGISTRY: Dict[str, "ConfigOption"] = {}


@dataclass(frozen=True)
class ConfigOption(Generic[T]):
    """A typed config option with a default, docs, and optional alt keys."""

    key: str
    default: T
    dtype: type
    doc: str = ""
    alt_keys: tuple = ()
    validator: Optional[Callable[[T], bool]] = None

    def __post_init__(self):
        if self.key in _REGISTRY:
            raise ValueError(f"duplicate config key {self.key}")
        _REGISTRY[self.key] = self
        for k in self.alt_keys:
            _REGISTRY[k] = self


def _parse(dtype: type, raw: str) -> Any:
    if dtype is bool:
        return raw.strip().lower() in ("1", "true", "yes", "on")
    return dtype(raw)


class AuronConf:
    """A mutable bag of option overrides on top of the registry defaults."""

    def __init__(self, overrides: Optional[Dict[str, Any]] = None):
        self._overrides: Dict[str, Any] = dict(overrides or {})
        self._lock = threading.Lock()

    def get(self, opt: "ConfigOption[T] | str") -> T:
        if isinstance(opt, str):
            if opt not in _REGISTRY:
                raise KeyError(f"unknown config key {opt}")
            opt = _REGISTRY[opt]
        for key in (opt.key, *opt.alt_keys):
            if key in self._overrides:
                return self._overrides[key]
            env_key = "AURON_TPU_" + key.replace(".", "_").upper()
            if env_key in os.environ:
                return _parse(opt.dtype, os.environ[env_key])
        return opt.default

    def set(self, opt: "ConfigOption | str", value: Any) -> "AuronConf":
        key = opt if isinstance(opt, str) else opt.key
        if key not in _REGISTRY:
            raise KeyError(f"unknown config key {key}")
        reg = _REGISTRY[key]
        if reg.validator is not None and not reg.validator(value):
            raise ValueError(f"invalid value {value!r} for {key}")
        with self._lock:
            self._overrides[reg.key] = value
        return self

    def unset(self, opt: "ConfigOption | str") -> "AuronConf":
        key = opt if isinstance(opt, str) else opt.key
        with self._lock:
            self._overrides.pop(key, None)
        return self

    def scoped(self, **kv) -> "_ScopedConf":
        """Context manager that applies overrides and restores on exit."""
        return _ScopedConf(self, kv)

    def scoped_overrides(self, overrides: Dict[str, Any]) -> "_ScopedConf":
        """Like scoped() but takes dotted keys directly (regrow path)."""
        sc = _ScopedConf(self, {})
        sc._kv = dict(overrides)
        return sc

    @staticmethod
    def describe_all() -> List[str]:
        """Doc-gen (analog of SparkAuronConfigurationDocGenerator.java)."""
        seen = set()
        lines = []
        for key, opt in sorted(_REGISTRY.items()):
            if opt.key in seen or key != opt.key:
                continue
            seen.add(opt.key)
            lines.append(
                f"{opt.key} (default={opt.default!r}, type={opt.dtype.__name__}): {opt.doc}"
            )
        return lines


class _ScopedConf:
    def __init__(self, conf: AuronConf, kv: Dict[str, Any]):
        self._conf = conf
        self._kv = {k.replace("__", "."): v for k, v in kv.items()}
        self._saved: Dict[str, Any] = {}

    def __enter__(self):
        for k, v in self._kv.items():
            self._saved[k] = self._conf._overrides.get(k, _MISSING)
            self._conf.set(k, v)
        return self._conf

    def __exit__(self, *exc):
        for k, old in self._saved.items():
            if old is _MISSING:
                self._conf._overrides.pop(k, None)
            else:
                self._conf._overrides[k] = old
        return False


_MISSING = object()


# ---------------------------------------------------------------------------
# Option catalog (grows as features land; mirrors the *capability* coverage of
# SparkAuronConfiguration.java without copying its keys verbatim).
# ---------------------------------------------------------------------------

BATCH_SIZE = ConfigOption(
    "auron.batch.size", 1 << 20, int,
    "Default row capacity of a column block (padded, static shape).")

TARGET_BLOCK_BYTES = ConfigOption(
    "auron.block.target.bytes", 64 << 20, int,
    "Target in-HBM bytes per table block; drives dynamic capacity bucketing.")

CAPACITY_ALIGN = ConfigOption(
    "auron.block.capacity.align", 256, int,
    "Block capacities are rounded up to a multiple of this (TPU lane-friendly).")

JOIN_OUT_FACTOR = ConfigOption(
    "auron.join.output.capacity.factor", 1.0, float,
    "Default join output capacity = factor * (probe capacity) when the exact "
    "size cannot be computed (under tracing). Overflow records a traced "
    "counter that the execution boundary checks (auron.overflow.check); "
    "regrow mode re-runs with this factor grown to fit.")

SHRINK_FACTOR = ConfigOption(
    "auron.shrink.capacity.factor", 1.0, float,
    "Scales the calibrated shrink_to capacities (plan/nodes.py Filter/Join "
    "shrink_to): the executor compacts a selective node's output into a "
    "block of shrink_to*factor rows so downstream ops run at the data's "
    "true size. Grown by overflow regrow if a live count ever exceeds its "
    "calibrated capacity.")

SHRINK_MIN_RATIO = ConfigOption(
    "auron.shrink.min.ratio", 4, int,
    "Only compact when the block capacity exceeds the calibrated live "
    "count by at least this ratio — below it the compaction gather costs "
    "more than the downstream savings.")

OVERFLOW_CHECK = ConfigOption(
    "auron.overflow.check", "regrow", str,
    "What the host does when a traced overflow counter exceeds its static "
    "capacity (join expansion, exchange pair lanes, skew heavy block, "
    "collect planes, generate expansion): 'regrow' (default) re-runs with "
    "the responsible capacity grown to fit — results are always exact; "
    "'raise' errors; 'warn' warns and keeps the truncated result; 'off' "
    "disables the check (results may silently truncate).",
    validator=lambda v: v in ("regrow", "raise", "warn", "off"))

SKEW_HEAVY_FACTOR = ConfigOption(
    "auron.skew.heavy.capacity.factor", 0.25, float,
    "Skew handler heavy-row side-block capacity = factor * build capacity.")

COLLECT_LEN_FACTOR = ConfigOption(
    "auron.agg.collect.len.factor", 1.0, float,
    "Multiplier on collect_list/collect_set max_len bounds (regrow knob).")

GENERATE_OUT_FACTOR = ConfigOption(
    "auron.generate.output.capacity.factor", 1.0, float,
    "Multiplier on the default Generate (explode) output capacity.")

AGG_PARTIAL_SKIP_ENABLE = ConfigOption(
    "auron.agg.partial.skip.enable", True, bool,
    "Skip partial aggregation when observed group cardinality ratio is high "
    "(capability parity with Auron's PARTIAL_AGG_SKIPPING_*).")

AGG_PARTIAL_SKIP_RATIO = ConfigOption(
    "auron.agg.partial.skip.ratio", 0.8, float,
    "Cardinality/rows ratio above which partial agg passes rows through.")

AGG_PARTIAL_SKIP_MIN_ROWS = ConfigOption(
    "auron.agg.partial.skip.min.rows", 1 << 16, int,
    "Only consider partial-agg skipping after this many rows.")

SORT_TOPK_SWITCH = ConfigOption(
    "auron.sort.topk.limit.max", 1 << 16, int,
    "Use top-k selection instead of full sort when fetch limit <= this.")

EXCHANGE_CHUNK_ROWS = ConfigOption(
    "auron.exchange.chunk.rows", 1 << 18, int,
    "Rows per all_to_all chunk; chunks are double-buffered against compute.")

EXCHANGE_CHUNKS = ConfigOption(
    "auron.exchange.chunks", 1, int,
    "Split each all_to_all into this many independent chunk collectives so "
    "XLA's async scheduler can pipeline transfers against staging/compute. "
    "1 = single collective (default).")

EXCHANGE_PAIR_SLACK = ConfigOption(
    "auron.exchange.pair.slack", 2.0, float,
    "all_to_all staging capacity per (src,dst) pair = slack * capacity/n. "
    "Covers moderate skew; heavy keys are pre-split by the skew handler.")

STAGING_ZSTD_LEVEL = ConfigOption(
    "auron.staging.zstd.level", 1, int,
    "zstd level for host-RAM staging payloads (io/staging.py); higher "
    "trades CPU for host memory. The wire format is always zstd-framed "
    "(io/serde.py), matching the reference's IPC compression framing.")

SHUFFLE_PARTITION_SEED = ConfigOption(
    "auron.shuffle.hash.seed", 42, int,
    "Murmur3 seed for hash partitioning (Spark-compatible seed 42).")

SKEW_DETECT_ENABLE = ConfigOption(
    "auron.skew.detect.enable", True, bool,
    "Detect heavy-hitter keys at exchange time and split/replicate them.")

SKEW_HEAVY_HITTER_FRACTION = ConfigOption(
    "auron.skew.heavy.fraction", 0.2, float,
    "A key owning more than this fraction of rows in a shard is a heavy hitter.")

MEMORY_BUDGET_BYTES = ConfigOption(
    "auron.memory.budget.bytes", 12 << 30, int,
    "Per-chip HBM working budget; operators size chunks to stay under it "
    "(replaces Auron's spill-first MemManager with multi-pass chunking).")

MEMORY_BUDGET_FRACTION = ConfigOption(
    "auron.memory.budget.fraction", 0.0, float,
    "If > 0, the HBM working budget is this fraction of the live "
    "device's memory (overrides auron.memory.budget.bytes) — the "
    "reference's process.vmrss.memoryFraction / onHeapSpill."
    "memoryFraction analog for a device whose memory is queryable "
    "(SparkAuronConfiguration.java PROCESS_MEMORY_FRACTION).")

STAGING_CODEC = ConfigOption(
    "auron.staging.codec", "zstd", str,
    "Compression codec for host-RAM staging / exchange payloads: "
    "'zstd' (native kernel), 'zlib' (stdlib), or 'none' (raw bytes — "
    "fastest when host RAM is plentiful). The reference's spill/IPC "
    "codec choice (auron.spill.compression.codec, ipc_compression.rs).",
    validator=lambda v: v in ("zstd", "zlib", "none"))

JOIN_BROADCAST_MAX_ROWS = ConfigOption(
    "auron.join.broadcast.max.rows", 1 << 20, int,
    "Build sides at or below this estimated row count broadcast; larger "
    "builds use a partitioned exchange join. 0 forces partitioned "
    "everywhere (the reference's forceShuffledHashJoin) — the size-"
    "triggered strategy switch is its smjfallback.*.threshold analog.")

FILES_IGNORE_CORRUPT = ConfigOption(
    "auron.files.ignore.corrupt", False, bool,
    "Skip unreadable parquet/ORC fragments with a warning instead of "
    "failing the scan (reference auron.files.ignoreCorruptFiles / "
    "IGNORE_CORRUPTED_FILES, conf.rs:38).")

UDAF_FALLBACK_ENABLE = ConfigOption(
    "auron.udaf.fallback.enable", True, bool,
    "Allow host-Python UDAF execution for aggregate functions without a "
    "native kernel (the reference's serialized-Spark-UDAF fallback, "
    "auron.udafFallback.enable). Off -> such plans raise instead.")

CAST_STRING_TRIM = ConfigOption(
    "auron.cast.string.trim.enable", True, bool,
    "Trim whitespace when casting string->numeric (Spark parity).")

METRICS_ENABLE = ConfigOption(
    "auron.metrics.enable", True, bool,
    "Collect per-operator metrics (rows, bytes, wall time in eager mode).")

METRICS_SYNC_EAGER = ConfigOption(
    "auron.metrics.sync.eager", False, bool,
    "Per-op roofline mode: in eager execution on async backends (TPU "
    "tunnel), force device completion after every plan node so recorded "
    "per-node times are true device times (each also pays one tunnel "
    "round-trip — reports subtract/annotate it). The measured analog of "
    "the reference's per-operator elapsed_compute metrics "
    "(auron/src/metrics.rs:9-45).")

EXTERNAL_EXEC_ENABLE = ConfigOption(
    "auron.exec.external.enable", True, bool,
    "Planner-integrated out-of-core execution: when a session has a "
    "MemoryBudget and a plan's estimated working set exceeds it (or an "
    "input table is host-staged), the output boundary streams the plan "
    "through the staged executor (plan/staged.py: external sort/agg, "
    "radix join over host-RAM chunks) instead of materializing in HBM. "
    "The reference's MemManager grow->spill analog "
    "(auron-memmgr/src/lib.rs:308-428).")

ROOFLINE_MEASURE_PEAK = ConfigOption(
    "auron.roofline.measure.peak", True, bool,
    "Calibrate the roofline denominator with a STREAM triad measured on "
    "the live device at first use (runtime/roofline.py) instead of the "
    "spec-sheet constant. Off -> PEAK_HBM_BPS table.")

JIT_CALIBRATE = ConfigOption(
    "auron.jit.calibrate.capacities", True, bool,
    "Before compiling a whole-plan jit program, run the plan once eagerly "
    "and record each join-expansion/explode output size, then compile "
    "with those MEASURED capacities (runtime/calibrate.py) — the AQE "
    "analog for static-shape tracing. Without it a join chain's default "
    "probe*factor sizing compounds per join (HBM-fatal at scale). The "
    "overflow-regrow loop remains the correctness net either way.")

JIT_CALIBRATE_ON_HOST = ConfigOption(
    "auron.jit.calibrate.on.host", True, bool,
    "Run the calibration prepass on the host CPU backend when the main "
    "backend is an accelerator: the measured counts are identical (same "
    "data, same plan), but eager per-node dispatch on the TPU tunnel "
    "costs a 40s+ compile per node and pins every intermediate in HBM at "
    "once (OOM at sf=500 before any count exists). The table set is "
    "copied to host RAM once per session and reused.")

JIT_CALIBRATE_SAMPLE = ConfigOption(
    "auron.jit.calibrate.sample.rows", 0, int,
    "When > 0, tables larger than this row count enter the host "
    "calibration prepass as a deterministic row SAMPLE of this size, and "
    "the measured join/explode capacities scale back up by the largest "
    "table-shrink ratio. Bounds the prepass's host-RAM footprint for "
    "fan-out-heavy plans (q67-class: 9 grouping-set aggs over 50M-row "
    "joins pin every eager intermediate at once). Fact-vs-dimension "
    "match counts scale ~linearly so the scaled hints are near-exact; "
    "super-linear shapes (fact-fact joins) undershoot and are corrected "
    "by the overflow-regrow loop. 0 = full-table prepass.")

JIT_CACHE_MAX_ENTRIES = ConfigOption(
    "auron.jit.cache.max.entries", 64, int,
    "LRU capacity of the whole-plan jit cache (plan/builder.py). Each "
    "entry pins a compiled XLA executable + its plan; eviction frees "
    "both. Long-lived sessions stay bounded; raise for workloads that "
    "cycle through more than 64 distinct plans.")

CATALOG_REST_TOKEN = ConfigOption(
    "auron.catalog.rest.token", "", str,
    "Bearer token for Iceberg REST catalog requests "
    "(connectors/catalog.py); empty sends no Authorization header.")

CATALOG_REST_SCHEME = ConfigOption(
    "auron.catalog.rest.scheme", "http", str,
    "URL scheme for rest:// catalog requests: http or https. Use https "
    "whenever a bearer token is configured so credentials never travel "
    "cleartext (a rest+https:// table URI also forces https).")

CATALOG_GLUE_ENDPOINT = ConfigOption(
    "auron.catalog.glue.endpoint", "", str,
    "AWS Glue catalog endpoint for glue:// table URIs "
    "(connectors/glue.py). Empty derives https://glue.<region>."
    "amazonaws.com from the region; an http://host:port value targets a "
    "local fake for tests.")

CATALOG_GLUE_REGION = ConfigOption(
    "auron.catalog.glue.region", "", str,
    "AWS region for Glue SigV4 signing; falls back to $AWS_REGION, then "
    "to the region embedded in the endpoint hostname, then us-east-1.")

CATALOG_GLUE_ACCESS_KEY = ConfigOption(
    "auron.catalog.glue.access.key", "", str,
    "AWS access key id for Glue requests; empty falls back to "
    "$AWS_ACCESS_KEY_ID.")

CATALOG_GLUE_SECRET_KEY = ConfigOption(
    "auron.catalog.glue.secret.key", "", str,
    "AWS secret access key for Glue requests; empty falls back to "
    "$AWS_SECRET_ACCESS_KEY.")

CATALOG_GLUE_SESSION_TOKEN = ConfigOption(
    "auron.catalog.glue.session.token", "", str,
    "Optional AWS session token (STS temporary credentials); empty falls "
    "back to $AWS_SESSION_TOKEN.")

CATALOG_REST_PREFIX = ConfigOption(
    "auron.catalog.rest.prefix", "", str,
    "Explicit REST catalog prefix. When set, NO path segment of a rest:// "
    "URI is treated as a prefix — all segments before the table name are "
    "the (possibly nested) namespace. When unset, a URI with >=3 path "
    "segments treats its first segment as the prefix (ambiguous for "
    "nested namespaces without a prefix; set this option instead).")

RAW_STRING_ENABLE = ConfigOption(
    "auron.string.raw.enable", True, bool,
    "Promote high-cardinality string columns to the raw byte-plane "
    "representation at scan time (expr/strings_raw.py): no host dictionary, "
    "device-native compare/hash/sort/join over word planes.")

RAW_STRING_MIN_DISTINCT = ConfigOption(
    "auron.string.raw.min.distinct", 1 << 16, int,
    "Minimum distinct count before a string column is promoted to raw "
    "byte planes (small dictionaries beat planes on memory and speed).")

RAW_STRING_MIN_FRACTION = ConfigOption(
    "auron.string.raw.min.distinct.fraction", 0.5, float,
    "Minimum distinct/total fraction for raw byte-plane promotion.")

RAW_STRING_MAX_BYTES = ConfigOption(
    "auron.string.raw.max.bytes", 32, int,
    "Longest UTF-8 value (bytes) eligible for byte-plane promotion; longer "
    "columns stay dictionary-encoded (values are never truncated). Must be "
    "a multiple of 4.", validator=lambda v: v % 4 == 0 and v > 0)

UDF_STRING_BYTES = ConfigOption(
    "auron.udf.string.width.bytes", 64, int,
    "Byte-plane width for string-valued python UDF outputs under jit "
    "(outputs ride string_raw planes — fixed shape, no host dictionary). "
    "A UDF producing a longer value errors; raise this option. "
    "Must be a multiple of 4.", validator=lambda v: v % 4 == 0 and v > 0)

DEBUG_CHECKS = ConfigOption(
    "auron.debug.checks.enable", False, bool,
    "Emit runtime warnings from inside jitted programs (join output "
    "overflow, exchange lane overflow). Small overhead; off by default.")

PALLAS_ENABLE = ConfigOption(
    "auron.pallas.enable", True, bool,
    "Use Pallas kernels for hot ops on TPU backends (falls back to XLA on CPU).")

PALLAS_FUSED_ENABLE = ConfigOption(
    "auron.pallas.fused.agg.enable", False, bool,
    "Use the fused Mosaic segment-sum kernel (one one-hot pass feeds every "
    "aggregate column of a GROUP BY; VMEM-resident double-f32 TwoSum "
    "accumulator). Default OFF: measured on v5e, XLA's scan+dot_general "
    "path runs the same one-hot contraction at parity or faster (43 vs "
    "50 ms at 8M rows/d=16; 131 vs 184 ms at d=2048) with ~100x faster "
    "compiles — XLA already fuses the one-hot into the MXU pass. Kept for "
    "shapes where a hand-scheduled pipeline may win and as the Mosaic "
    "reference kernel (BENCH_NOTES.md).")

TAKE_CHUNK_ROWS = ConfigOption(
    "auron.take.chunk.rows", 8_388_608, int,
    "Stacked multi-plane gathers with more indices than this run as a "
    "lax.scan over index chunks with per-plane outputs. The TPU gather "
    "emitter materializes 2-D gather outputs offsets-minor — s32[n,k] "
    "padded to 128 lanes, 512 B/index — so one 50M-index stacked take "
    "wants a 25.7 GB temp and cannot compile; chunking bounds the temp "
    "to chunk*512B (4.3 GB at the default) while keeping the per-index "
    "amortization (measured v5e @ 50M x 5 planes: 1.15 s chunked vs "
    "3.0 s separate 1-D takes vs OOM direct).")

MXU_GATHER_MAX_TABLE = ConfigOption(
    "auron.gather.mxu.max.table", 0, int,
    "Route random gathers from tables up to this many rows through the "
    "blocked one-hot MXU matmul (ops/mxu_gather.py). Default 0 (off): "
    "measured on v5e, it wins only for tiny single-plane tables (36 vs "
    "65ms at 8M indices x 16k rows) and loses heavily for multi-plane "
    "stacks, where XLA's stacked 2-D gather amortizes per-index cost "
    "(BENCH_NOTES). Kept as the measured reference implementation.")

PALLAS_INTERPRET = ConfigOption(
    "auron.pallas.interpret", False, bool,
    "Run Pallas kernels in interpreter mode on non-TPU backends (testing).")

INT_NARROW_ENABLE = ConfigOption(
    "auron.int64.narrow.enable", True, bool,
    "register_pandas narrows int64 columns whose concrete values fit in "
    "+-2^30 to INT32 storage. On TPU, int64 is software-emulated and the "
    "x64 rewriter splits i64[N] into tiled s32[N,2] (minor dim pads to "
    "128 lanes: 64x HBM traffic) — surrogate keys and small measures pay "
    "that on every join probe, sort and exchange. Sums still widen to "
    "int64; mixed-width comparisons promote. Caveat: a column Spark "
    "types as LONG hashes its long layout for partition placement — "
    "narrowing changes the engine's logical type, so Spark placement "
    "bit-parity does not hold for narrowed pandas-registered columns "
    "(parquet/orc scans are not narrowed). Disable for strict parity.")

MXU_SEGMENTS_FORCE = ConfigOption(
    "auron.mxu.segments.force", False, bool,
    "Route segment aggregation through the one-hot MXU path (incl. the "
    "batched OneHotBatcher) on non-TPU backends — slower there; exists so "
    "the TPU aggregation path can be differentially tested on the CPU "
    "mesh.")

OPT_REORDER_JOINS = ConfigOption(
    "auron.optimizer.reorder.joins", True, bool,
    "Reorder chains of inner equi-joins so measured-selective build sides "
    "(filtered dimensions) apply before expanding fact-fact joins "
    "(plan/rewrite.py reorder_inner_joins). The reference inherits this "
    "from Spark's cost-based join reordering; this engine plans from its "
    "own front-ends, so the rewrite lives in the plan layer. Ordering "
    "respects column dependencies between build sides and never crosses "
    "outer/semi/anti joins.")

OPT_REORDER_PROBE_ROWS = ConfigOption(
    "auron.optimizer.reorder.probe.rows", 4_194_304, int,
    "Build sides whose scan capacity is at most this many rows are "
    "filter-evaluated once on the host to measure their true selectivity "
    "for join ordering; larger builds are treated as non-selective and "
    "keep their original relative order.")

OPT_ROLLUP_REAGG = ConfigOption(
    "auron.optimizer.rollup.reaggregate", True, bool,
    "Rewrite UNIONs of grouping-set aggregations over one shared input "
    "(the ROLLUP/CUBE decomposition) to aggregate the input ONCE at the "
    "finest key set and derive every coarser level by re-aggregating that "
    "result (plan/rewrite.py reaggregate_rollups): one shared PARTIAL at "
    "the finest keys, every level a FINAL over it. Turns q67-class plans "
    "from N full-fact aggregations into one plus N tiny merges; applies "
    "when every aggregate has an exact partial/final protocol "
    "(sum/min/max/count/avg/stddev).")

OPT_DIM_INTERVAL = ConfigOption(
    "auron.optimizer.dim.interval.prune", True, bool,
    "Dynamic-partition-pruning analog (Spark DPP): an inner broadcast "
    "join against a small FILTERED dimension is host-evaluated at plan "
    "time; when the surviving unique integer join keys form a few "
    "contiguous runs and every other surviving dimension column is "
    "constant, the join rewrites to range predicates on the fact key "
    "plus literal injection (plan/rewrite.py prune_interval_dims). A "
    "one-month date_dim filter then costs two compares per fact row "
    "instead of a 50M-index gather probe.")

# Global default session configuration.
conf = AuronConf()


if __name__ == "__main__":
    # config doc generator (SparkAuronConfigurationDocGenerator.java parity)
    for line in AuronConf.describe_all():
        print(line)
