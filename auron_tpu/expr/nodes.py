"""Expression IR.

A small physical-expression algebra mirroring the coverage of the reference's
proto expression vocabulary (/root/reference/native-engine/auron-planner/proto/
auron.proto:60-128: column, literal, binary ops, cast, case, in-list, is-null,
not, scalar functions, short-circuit and/or). Nodes are immutable, hashable
(so plans can be cached), and build with operator overloading for ergonomics:

    (col("a") + lit(1)) * col("b") > lit(10)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional, Sequence, Tuple

from auron_tpu.dtypes import DataType


class Expr:
    """Base class; subclasses are frozen dataclasses."""

    # -- operator sugar -----------------------------------------------------
    def _bin(self, op: str, other: "Expr | Any") -> "BinaryOp":
        return BinaryOp(op, self, _wrap(other))

    def __add__(self, o):
        return self._bin("Plus", o)

    def __sub__(self, o):
        return self._bin("Minus", o)

    def __mul__(self, o):
        return self._bin("Multiply", o)

    def __truediv__(self, o):
        return self._bin("Divide", o)

    def __mod__(self, o):
        return self._bin("Remainder", o)

    def __eq__(self, o):  # type: ignore[override]
        return self._bin("Eq", o)

    def __ne__(self, o):  # type: ignore[override]
        return self._bin("NotEq", o)

    def __lt__(self, o):
        return self._bin("Lt", o)

    def __le__(self, o):
        return self._bin("LtEq", o)

    def __gt__(self, o):
        return self._bin("Gt", o)

    def __ge__(self, o):
        return self._bin("GtEq", o)

    def __and__(self, o):
        return BinaryOp("And", self, _wrap(o))

    def __or__(self, o):
        return BinaryOp("Or", self, _wrap(o))

    def __invert__(self):
        return Not(self)

    def __hash__(self):
        return object.__hash__(self)

    # -- convenience --------------------------------------------------------
    def is_null(self) -> "IsNull":
        return IsNull(self)

    def is_not_null(self) -> "Not":
        return Not(IsNull(self))

    def cast(self, to: DataType) -> "Cast":
        return Cast(self, to)

    def alias(self, name: str) -> "Alias":
        return Alias(self, name)

    def isin(self, values: Sequence[Any]) -> "InList":
        return InList(self, tuple(values))

    def children(self) -> Tuple["Expr", ...]:
        return ()


def _ident_eq(cls):
    """Give a frozen dataclass identity hashing with structural __repr__."""
    cls.__hash__ = object.__hash__
    return cls


@_ident_eq
@dataclass(frozen=True, eq=False, repr=True)
class Column(Expr):
    name: str

    def children(self):
        return ()


@_ident_eq
@dataclass(frozen=True, eq=False)
class Literal(Expr):
    value: Any
    dtype: Optional[DataType] = None  # inferred at eval when None

    def children(self):
        return ()


@_ident_eq
@dataclass(frozen=True, eq=False)
class BinaryOp(Expr):
    """Op codes follow the reference's string op-codes
    (NativeConverters.scala:576-781): Eq NotEq Lt LtEq Gt GtEq Plus Minus
    Multiply Divide Remainder And Or BitAnd BitOr BitXor."""

    op: str
    left: Expr
    right: Expr

    def children(self):
        return (self.left, self.right)


@_ident_eq
@dataclass(frozen=True, eq=False)
class Not(Expr):
    child: Expr

    def children(self):
        return (self.child,)


@_ident_eq
@dataclass(frozen=True, eq=False)
class IsNull(Expr):
    child: Expr

    def children(self):
        return (self.child,)


@_ident_eq
@dataclass(frozen=True, eq=False)
class Cast(Expr):
    """Spark TryCast semantics: failures/overflow produce NULL, never raise
    (SURVEY.md A.1: 'all casts are emitted as TryCast').

    ``domain``: optional (lo, hi) half-open int range of the child values —
    filled by plan/stats.py for int/date casts to STRING so the output
    dictionary can be built statically under whole-plan jit."""

    child: Expr
    to: DataType
    domain: object = None

    def children(self):
        return (self.child,)


@_ident_eq
@dataclass(frozen=True, eq=False)
class CaseWhen(Expr):
    """CASE WHEN c1 THEN v1 ... ELSE e END; If(c,a,b) is a 1-branch case."""

    branches: Tuple[Tuple[Expr, Expr], ...]
    otherwise: Optional[Expr] = None

    def children(self):
        ch = [e for b in self.branches for e in b]
        if self.otherwise is not None:
            ch.append(self.otherwise)
        return tuple(ch)


@_ident_eq
@dataclass(frozen=True, eq=False)
class ScalarSubquery(Expr):
    """A 1x1 subplan embedded as an expression — evaluated INSIDE the same
    traced program, so whole-plan jit still compiles one XLA program (the
    eager alternative, Frame.scalar(), bakes a literal). Reference analog:
    spark_scalar_subquery_wrapper.rs:141."""

    plan: object  # plan.nodes.PlanNode (1 row x 1 column result)

    def children(self):
        return ()


@_ident_eq
@dataclass(frozen=True, eq=False)
class InList(Expr):
    child: Expr
    values: Tuple[Any, ...]
    negated: bool = False

    def children(self):
        return (self.child,)


@_ident_eq
@dataclass(frozen=True, eq=False)
class ScalarFunc(Expr):
    """Named scalar function from the registry (expr/functions.py)."""

    name: str
    args: Tuple[Expr, ...]
    # static (non-expression) parameters, e.g. substring offsets
    params: Tuple[Any, ...] = ()

    def children(self):
        return self.args


@_ident_eq
@dataclass(frozen=True, eq=False)
class Alias(Expr):
    child: Expr
    name: str

    def children(self):
        return (self.child,)


# -- builders ---------------------------------------------------------------

def col(name: str) -> Column:
    return Column(name)


def lit(value: Any, dtype: Optional[DataType] = None) -> Literal:
    return Literal(value, dtype)


def _wrap(v) -> Expr:
    return v if isinstance(v, Expr) else Literal(v)


class _WhenChain:
    def __init__(self, branches):
        self._branches = branches

    def when(self, cond: Expr, value) -> "_WhenChain":
        return _WhenChain(self._branches + ((cond, _wrap(value)),))

    def otherwise(self, value) -> CaseWhen:
        return CaseWhen(self._branches, _wrap(value))

    def end(self) -> CaseWhen:
        return CaseWhen(self._branches, None)


def when(cond: Expr, value) -> _WhenChain:
    return _WhenChain(((cond, _wrap(value)),))


def case(*branches, otherwise=None) -> CaseWhen:
    return CaseWhen(tuple((c, _wrap(v)) for c, v in branches),
                    _wrap(otherwise) if otherwise is not None else None)


def func(name: str, *args, params: Tuple[Any, ...] = ()) -> ScalarFunc:
    return ScalarFunc(name, tuple(_wrap(a) for a in args), tuple(params))


@_ident_eq
@dataclass(frozen=True, eq=False)
class PyUDF(Expr):
    """Host-python UDF escape hatch.

    The reference guarantees conversion never fails at expression
    granularity: anything unsupported becomes a serialized Spark UDF
    evaluated in the JVM over an FFI round-trip
    (NativeConverters.scala:1213-1247, spark_udf_wrapper.rs). The TPU analog
    is a `jax.pure_callback`: the traced program ships argument columns to
    the host, runs the python function on numpy arrays, and streams the
    result column back — usable inside jit, at host-roundtrip cost.

    ``fn(*np_arrays) -> np_array`` of length capacity; string arguments
    (dictionary or raw byte-plane) arrive decoded as object arrays; string
    outputs return as raw byte planes (``string_raw``, width from
    ``auron.udf.string.width.bytes``) — fixed shape, so usable under jit.
    """

    name: str
    fn: Any
    args: Tuple[Expr, ...]
    dtype: "DataType"

    def children(self):
        return self.args


def py_udf(name: str, fn, dtype, *args) -> PyUDF:
    return PyUDF(name, fn, tuple(_wrap(a) for a in args), dtype)
