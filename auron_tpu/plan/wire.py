"""Plan wire format — the engine's front-end-neutral plan contract.

The reference's single source of truth is a protobuf IR
(/root/reference/native-engine/auron-planner/proto/auron.proto: 27 plan
nodes + ~40 expr nodes) shipped from any JVM front-end (Spark, Flink) into
the native engine. This module is that contract for auron-tpu: every plan
node / expression / partitioning serializes to plain JSON-able dicts, so a
remote planner (or another language) can drive the engine without importing
its Python classes. PyUDF closures are the one exception (like the
reference's serialized-JVM-object escape hatch, they need a side channel:
register the callable under a name first).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Callable, Dict

from auron_tpu.dtypes import DataType, type_from_name
from auron_tpu.expr import nodes as E
from auron_tpu.ops.sort import SortKey
from auron_tpu.ops.window import WindowFunc
from auron_tpu.parallel import partition as PT
from auron_tpu.plan import nodes as PN

_UDF_REGISTRY: Dict[str, Callable] = {}


def register_udf(name: str, fn: Callable) -> str:
    _UDF_REGISTRY[name] = fn
    return name


_EXPR_TYPES = {c.__name__: c for c in (
    E.Column, E.Literal, E.BinaryOp, E.Not, E.IsNull, E.Cast, E.CaseWhen,
    E.InList, E.ScalarFunc, E.Alias, E.PyUDF,
    E.ScalarSubquery)}
_PLAN_TYPES = {c.__name__: c for c in (
    PN.MemoryScan, PN.ParquetScan, PN.OrcScan, PN.LakehouseScan, PN.Filter, PN.Project, PN.Agg,
    PN.Sort, PN.Limit, PN.Join, PN.Exchange, PN.Union, PN.Expand, PN.Window,
    PN.Generate, PN.Rename, PN.Debug, PN.Coalesce)}
_PART_TYPES = {c.__name__: c for c in (
    PT.HashPartitioning, PT.RoundRobinPartitioning, PT.RangePartitioning,
    PT.SinglePartitioning)}


def _enc(v: Any) -> Any:
    if isinstance(v, PN.PlanNode):
        d = {"_t": type(v).__name__}
        for f in dataclasses.fields(v):
            d[f.name] = _enc(getattr(v, f.name))
        return d
    if isinstance(v, E.PyUDF):
        key = None
        for k, fn in _UDF_REGISTRY.items():
            if fn is v.fn:
                key = k
                break
        if key is None:
            raise ValueError(
                "PyUDF must be register_udf()-ed before serialization")
        return {"_t": "PyUDF", "name": v.name, "fn": key,
                "args": _enc(v.args), "dtype": _enc(v.dtype)}
    if isinstance(v, E.Expr):
        d = {"_t": type(v).__name__}
        for f in dataclasses.fields(v):
            d[f.name] = _enc(getattr(v, f.name))
        return d
    if isinstance(v, DataType):
        return {"_t": "DataType", "name": v.name,
                "params": list(v.params) if v.params else None}
    if isinstance(v, SortKey):
        return {"_t": "SortKey", "column": v.column, "ascending": v.ascending,
                "nulls_first": v.nulls_first}
    if isinstance(v, WindowFunc):
        return {"_t": "WindowFunc", **dataclasses.asdict(v)}
    if isinstance(v, PN.AggCall):
        return {"_t": "AggCall", "name": v.name, "kind": v.kind,
                "expr": _enc(v.expr), "filter": _enc(v.filter),
                "max_len": v.max_len}
    if type(v).__name__ in _PART_TYPES:
        d = {"_t": type(v).__name__}
        for f in dataclasses.fields(v):
            d[f.name] = _enc(getattr(v, f.name))
        return d
    if isinstance(v, tuple):
        return {"_tuple": [_enc(x) for x in v]}
    if isinstance(v, list):
        return [_enc(x) for x in v]
    if v is None or isinstance(v, (bool, int, float, str)):
        return v
    raise TypeError(f"cannot serialize {type(v).__name__}: {v!r}")


def _dec(v: Any, memo: Dict[str, Any] = None) -> Any:
    if isinstance(v, dict):
        if "_tuple" in v:
            return tuple(_dec(x, memo) for x in v["_tuple"])
        t = v.get("_t")
        # Hash-cons plan nodes: JSON is a tree, so a CTE consumed by N
        # branches arrives as N identical subtrees. Interning them back
        # into ONE node restores the DAG the executor's shared-node memo
        # (plan/execute.py) needs to run the CTE once, not N times.
        key = None
        if memo is not None and t in _PLAN_TYPES:
            key = json.dumps(v, sort_keys=True)
            hit = memo.get(key)
            if hit is not None:
                return hit
        body = {k: _dec(x, memo) for k, x in v.items() if k not in ("_t",)}
        if t == "DataType":
            return type_from_name(body["name"],
                                  tuple(body["params"]) if body["params"]
                                  else None)
        if t == "SortKey":
            return SortKey(**body)
        if t == "WindowFunc":
            return WindowFunc(**body)
        if t == "AggCall":
            return PN.AggCall(**body)
        if t == "PyUDF":
            fn = _UDF_REGISTRY[body.pop("fn")]
            return E.PyUDF(body["name"], fn, body["args"], body["dtype"])
        if t in _EXPR_TYPES:
            return _EXPR_TYPES[t](**body)
        if t in _PLAN_TYPES:
            node = _PLAN_TYPES[t](**body)
            if key is not None:
                memo[key] = node
            return node
        if t in _PART_TYPES:
            return _PART_TYPES[t](**body)
        raise TypeError(f"unknown wire type {t}")
    if isinstance(v, list):
        return [_dec(x, memo) for x in v]
    return v


def plan_to_json(plan: PN.PlanNode) -> str:
    return json.dumps(_enc(plan))


def plan_from_json(data: str) -> PN.PlanNode:
    return _dec(json.loads(data), memo={})
