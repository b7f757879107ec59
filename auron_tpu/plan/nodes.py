"""Physical plan nodes.

Coverage checklist mirrors auron.proto's plan vocabulary (reference
/root/reference/native-engine/auron-planner/proto/auron.proto): Parquet/
memory scan, Filter, Project, Agg (HASH/SORT x PARTIAL/PARTIAL_MERGE/FINAL,
proto:741-750), Sort (+fetch limit, proto:671-681), Limit (+offset,
proto:752-756), BroadcastJoin/SortMergeJoin (proto:495-550), ShuffleWriter/
IpcReader pairs -> a single Exchange node here (the data plane is XLA
collectives, not shuffle files), Union (proto:552-562), Expand, Window
(proto:571-602), Generate (proto:618-628), RenameColumns, Empty, Debug,
Coalesce.

Nodes are frozen dataclasses keyed by identity for caching; expressions are
`auron_tpu.expr.nodes` trees; partitionings come from
`auron_tpu.parallel.partition`.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional, Tuple

from auron_tpu.expr.nodes import Expr
from auron_tpu.ops.sort import SortKey


class PlanNode:
    """Base: frozen dataclass subclasses, children in ``children``."""

    @property
    def children(self) -> Tuple["PlanNode", ...]:
        out = []
        for name in getattr(self, "__dataclass_fields__", {}):
            v = getattr(self, name)
            if isinstance(v, PlanNode):
                out.append(v)
            elif isinstance(v, tuple) and v and isinstance(v[0], PlanNode):
                out.extend(v)
        return tuple(out)

    def pretty(self, indent: int = 0) -> str:
        pad = "  " * indent
        desc = f"{pad}{type(self).__name__}"
        lines = [desc]
        for c in self.children:
            lines.append(c.pretty(indent + 1))
        return "\n".join(lines)


def _ident(cls):
    cls.__hash__ = lambda self: id(self)
    cls.__eq__ = lambda self, o: self is o
    return cls


@_ident
@dataclass(frozen=True, eq=False)
class MemoryScan(PlanNode):
    """Scan a session-registered table (FFIReaderExec analog)."""

    table: str
    projection: Optional[Tuple[str, ...]] = None


@_ident
@dataclass(frozen=True, eq=False)
class ParquetScan(PlanNode):
    """Native parquet scan (reference parquet_exec.rs:480). Files are read
    host-side via pyarrow into column blocks; predicate/projection pushdown
    happens at read time."""

    paths: Tuple[str, ...]
    projection: Optional[Tuple[str, ...]] = None
    predicate: Optional[Expr] = None
    num_partitions: int = 1


@_ident
@dataclass(frozen=True, eq=False)
class LakehouseScan(PlanNode):
    """Lakehouse table-format scan (reference thirdparty/auron-{iceberg,
    paimon,hudi} convert providers). The connector layer resolves the
    table's snapshot metadata to concrete data files with partition
    constants + manifest bounds, prunes at file granularity, and reads
    through the shared arrow->blocks machinery (auron_tpu/connectors/)."""

    fmt: str  # iceberg | hudi | paimon
    path: str
    projection: Optional[Tuple[str, ...]] = None
    predicate: Optional[Expr] = None
    num_partitions: int = 1
    # format-specific: (("snapshot_id", 123),) / (("as_of_ms", ...),) ...
    options: Tuple[Tuple[str, object], ...] = ()


@_ident
@dataclass(frozen=True, eq=False)
class Filter(PlanNode):
    child: PlanNode
    predicate: Expr
    # measured live-row count from the jit calibration prepass
    # (runtime/calibrate.py): when far below the input capacity, the
    # executor compacts the output into a block of this (rounded)
    # capacity so every downstream op runs at the data's true size
    # instead of the scan capacity (static-shape selectivity AQE)
    shrink_to: Optional[int] = None


@_ident
@dataclass(frozen=True, eq=False)
class Project(PlanNode):
    child: PlanNode
    exprs: Tuple[Tuple[str, Expr], ...]  # (output name, expression)


@dataclass(frozen=True)
class AggCall:
    """One aggregate: kind in {sum, count, count_star, min, max, avg, first,
    first_ignores_null, collect_list, collect_set}; optional per-agg FILTER
    clause (NativeConverters.scala:1371-1373)."""

    name: str
    kind: str
    expr: Optional[Expr] = None
    filter: Optional[Expr] = None
    max_len: int = 64  # collect_list/collect_set array bound
    # py_udaf escape hatch (spark_udaf_wrapper.rs:451 analog): host python
    # fn(np.ndarray of one group's non-null values) -> scalar
    fn: Any = None
    udaf_dtype: Any = None


@_ident
@dataclass(frozen=True, eq=False)
class Agg(PlanNode):
    """Grouped aggregation. mode: 'single' | 'partial' | 'final'.

    partial emits internal state columns (avg -> name#s/name#c); final
    consumes them after an Exchange on the group keys — the reference's
    PARTIAL/PARTIAL_MERGE/FINAL split (auron.proto:741-750, agg_exec.rs).
    """

    child: PlanNode
    keys: Tuple[Tuple[str, Expr], ...]
    calls: Tuple[AggCall, ...]
    mode: str = "single"
    # planner domain hints: key name -> (lo, hi) half-open int range. Keys
    # covered by hints use the dense direct-aggregation path (segment_sum
    # over a mixed-radix group id) instead of sort-based grouping — the TPU
    # speed path for surrogate-key GROUP BYs. Ranges are validated eagerly
    # when data is concrete; trusted under jit (catalog contract).
    domains: Tuple[Tuple[str, Tuple[int, int]], ...] = ()


@_ident
@dataclass(frozen=True, eq=False)
class Sort(PlanNode):
    child: PlanNode
    keys: Tuple[SortKey, ...]
    fetch: Optional[int] = None  # top-K (TakeOrdered)


@_ident
@dataclass(frozen=True, eq=False)
class Limit(PlanNode):
    child: PlanNode
    limit: int
    offset: int = 0


@_ident
@dataclass(frozen=True, eq=False)
class Join(PlanNode):
    """Equi-join. strategy: 'broadcast' (build side replicated & joined
    against every probe partition — BroadcastHashJoin), 'partitioned'
    (partition-wise zip of both sides — ShuffledHashJoin / SortMergeJoin;
    both compile to the same sorted-probe kernel, see ops/join.py).
    build='right'|'left' picks which input is collected for broadcast."""

    left: PlanNode
    right: PlanNode
    left_keys: Tuple[str, ...]
    right_keys: Tuple[str, ...]
    join_type: str = "inner"
    strategy: str = "broadcast"
    build: str = "right"
    null_aware: bool = False
    condition: Optional[Expr] = None  # extra non-equi join filter
    existence_col: str = "exists#"
    out_capacity: Optional[int] = None
    # (lo, hi) int range of the single build key — filled by plan/stats.py
    # from table statistics; enables the dense probe under whole-plan jit
    build_domain: Optional[Tuple[int, int]] = None
    # build key verified unique (dimension surrogate key) — enables the
    # no-expansion mask-only join fast path (ops/join._unique_dense_join)
    build_unique: bool = False
    # build key verified to be EXACTLY lo + row_position (surrogate keys in
    # storage order): the dense position table is the identity, so the probe
    # skips both its scatter and its per-probe-row table gather
    build_sequential: bool = False
    # measured live-row count (calibration prepass) — see Filter.shrink_to:
    # selective probe-side joins (dimension filters) leave most of the
    # probe-capacity block dead; compacting here collapses the rest of the
    # query to the surviving-row scale
    shrink_to: Optional[int] = None


@_ident
@dataclass(frozen=True, eq=False)
class Exchange(PlanNode):
    """Repartition boundary. ``partitioning`` is a
    parallel.partition.{Hash,RoundRobin,Range,Single}Partitioning."""

    child: PlanNode
    partitioning: Any


@_ident
@dataclass(frozen=True, eq=False)
class Union(PlanNode):
    children_nodes: Tuple[PlanNode, ...]

    @property
    def children(self):
        return self.children_nodes


@_ident
@dataclass(frozen=True, eq=False)
class Expand(PlanNode):
    """Multi-projection row expansion (ROLLUP/CUBE; expand_exec.rs:506)."""

    child: PlanNode
    projections: Tuple[Tuple[Tuple[str, Expr], ...], ...]


@_ident
@dataclass(frozen=True, eq=False)
class BlockTransform(PlanNode):
    """Named block-level transform producing plane columns (array/map
    constructors: split, str_to_map, map_concat, map_from_arrays —
    spark_map.rs:1516 family). Registry: expr/collections.BLOCK_TRANSFORMS."""

    child: PlanNode
    fn: str
    params: Tuple[Any, ...] = ()


@_ident
@dataclass(frozen=True, eq=False)
class Window(PlanNode):
    child: PlanNode
    partition_by: Tuple[str, ...]
    order_by: Tuple[SortKey, ...]
    funcs: Tuple[Any, ...]  # ops.window.WindowFunc
    group_limit: Optional[int] = None
    output_window_cols: bool = True


@_ident
@dataclass(frozen=True, eq=False)
class Generate(PlanNode):
    """explode/posexplode over array-typed columns (generate_exec.rs:550).

    Array columns are represented as fixed-width [capacity, max_len] value
    planes + per-row length; explode expands rows via the join-expansion
    prefix-sum trick."""

    child: PlanNode
    column: str
    kind: str = "explode"  # explode | posexplode | json_tuple | py_udtf
    outer: bool = False
    pos_name: str = "pos"
    out_name: str = "col"
    out_capacity: Optional[int] = None
    # json_tuple (generate/json_tuple.rs:102): extracted field names; output
    # columns are "<out_name>0".."<out_name>N", row-aligned (no expansion)
    fields: tuple = ()
    # py_udtf (auron.proto:618-628 serialized-UDTF analog): arbitrary host
    # table function fn(*row_values) -> iterable of row tuples; ``args``
    # names the input columns, ``out_fields`` is ((name, DataType), ...)
    fn: Any = None
    args: tuple = ()
    out_fields: tuple = ()


@_ident
@dataclass(frozen=True, eq=False)
class Rename(PlanNode):
    child: PlanNode
    mapping: Tuple[Tuple[str, str], ...]


@_ident
@dataclass(frozen=True, eq=False)
class Empty(PlanNode):
    """EmptyPartitionsExec: produce n empty partitions with a schema."""

    schema_like: Any
    num_partitions: int = 1


@_ident
@dataclass(frozen=True, eq=False)
class Debug(PlanNode):
    child: PlanNode
    tag: str = ""


@_ident
@dataclass(frozen=True, eq=False)
class Coalesce(PlanNode):
    """Merge all partitions of the child into fewer partitions."""

    child: PlanNode
    num_partitions: int = 1


@_ident
@dataclass(frozen=True, eq=False)
class OrcScan(PlanNode):
    """Native ORC scan (reference orc_exec.rs:1647), host-decoded through
    the shared dataset machinery (hive pruning + partition-value injection,
    projection/filter pushdown, io/parquet.py read_orc_blocks)."""

    paths: Tuple[str, ...]
    projection: Optional[Tuple[str, ...]] = None
    predicate: Optional[Expr] = None
    num_partitions: int = 1


@_ident
@dataclass(frozen=True, eq=False)
class BuildBloom(PlanNode):
    """Build a bloom runtime filter from a column and register it under
    ``resource_key`` (reference: bloom_filter agg + UUID-keyed resource,
    bloom_filter_might_contain.rs). Passes its input through unchanged, so a
    planner can tee the build side of a join into a filter for the scan."""

    child: PlanNode
    column: str
    resource_key: str
    expected_items: int = 100_000
    fpp: float = 0.03
