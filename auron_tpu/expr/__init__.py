"""Expression engine: IR + Spark-semantics vectorized evaluator.

Covers the capability surface of the reference's expression stack
(/root/reference/native-engine/datafusion-ext-exprs/ and
datafusion-ext-functions/, conversion contract in SURVEY.md Appendix A.1):
column refs, literals, arithmetic/comparison/logical ops with three-valued
NULL logic, Spark TryCast semantics, CASE WHEN, IN lists, and a scalar
function registry. String functions run over the host-side dictionary once
per (dictionary, function) pair and become device gathers — the TPU-native
answer to varlen string kernels.
"""

from auron_tpu.expr.nodes import (  # noqa: F401
    BinaryOp, CaseWhen, Cast, Column as ColumnRef, Expr, InList, IsNull,
    Literal, Not, ScalarFunc, case, col, lit, when)
from auron_tpu.expr.eval import evaluate  # noqa: F401
from auron_tpu.expr import collections as _collections  # noqa: F401,E402 (registers fns)
