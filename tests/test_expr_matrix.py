"""Systematic expression parity matrix vs pandas/numpy oracles.

The reference re-runs whole upstream Spark function suites
(auron-spark-tests/, 14.8k LoC; SURVEY.md §4 tier 3). This is the
equivalent axis for us: every binary op x dtype combination x null pattern,
plus the function registry, checked against numpy semantics with Spark's
null rules (NULL propagates; divide-by-zero -> NULL; three-valued logic).
"""

import numpy as np
import pandas as pd
import pytest

from auron_tpu.block import TableBlock
from auron_tpu.expr.eval import evaluate, materialize
from auron_tpu.expr.nodes import col, func, lit

INT_DTYPES = [np.int8, np.int16, np.int32, np.int64]
FLOAT_DTYPES = [np.float32, np.float64]


def _block(rng, adt, bdt, n=200):
    a = rng.integers(-50, 50, n).astype(adt)
    b = rng.integers(-50, 50, n).astype(bdt)
    if np.issubdtype(adt, np.floating):
        a = (rng.normal(size=n) * 10).astype(adt)
    if np.issubdtype(bdt, np.floating):
        b = (rng.normal(size=n) * 10).astype(bdt)
    b[b == 0] = 3  # avoid div-by-zero except where tested explicitly
    na = rng.random(n) < 0.2
    nb = rng.random(n) < 0.2
    blk = TableBlock.from_numpy({"a": a, "b": b},
                                validity={"a": ~na, "b": ~nb})
    return blk, a, b, na, nb


def _result(blk, expr):
    c = materialize(evaluate(expr, blk), blk.capacity)
    mask = np.asarray(blk.row_mask)
    vals = np.asarray(c.values)[mask]
    valid = np.ones(mask.sum(), bool) if c.validity is None \
        else np.asarray(c.validity)[mask]
    return vals, valid


@pytest.mark.parametrize("adt", INT_DTYPES + FLOAT_DTYPES)
@pytest.mark.parametrize("op,npop", [
    ("Plus", np.add), ("Minus", np.subtract), ("Multiply", np.multiply)])
def test_arith_matrix(rng, adt, op, npop):
    blk, a, b, na, nb = _block(rng, adt, np.int32)
    e = col("a")._bin(op, col("b"))
    vals, valid = _result(blk, e)
    np.testing.assert_array_equal(valid, ~(na | nb))
    want = npop(a.astype(np.float64), b.astype(np.float64))
    got = vals.astype(np.float64)
    sel = valid
    np.testing.assert_allclose(got[sel], want[sel], rtol=1e-6)


@pytest.mark.parametrize("adt", INT_DTYPES + FLOAT_DTYPES)
def test_divide_returns_null_on_zero(rng, adt):
    n = 64
    a = np.arange(n).astype(adt)
    b = np.where(np.arange(n) % 4 == 0, 0, 2).astype(adt)
    blk = TableBlock.from_numpy({"a": a, "b": b})
    vals, valid = _result(blk, col("a") / col("b"))
    assert (~valid[::4]).all()  # x/0 -> NULL (Spark non-ANSI)
    sel = valid
    np.testing.assert_allclose(
        vals[sel], (a.astype(np.float64) / b.astype(np.float64))[sel],
        rtol=1e-6)


@pytest.mark.parametrize("op,npop", [
    ("Eq", np.equal), ("NotEq", np.not_equal), ("Lt", np.less),
    ("LtEq", np.less_equal), ("Gt", np.greater), ("GtEq", np.greater_equal)])
def test_compare_matrix(rng, op, npop):
    blk, a, b, na, nb = _block(rng, np.int64, np.float64)
    vals, valid = _result(blk, col("a")._bin(op, col("b")))
    np.testing.assert_array_equal(valid, ~(na | nb))
    sel = valid
    np.testing.assert_array_equal(
        vals.astype(bool)[sel], npop(a.astype(np.float64), b)[sel])


def test_three_valued_logic(rng):
    # Spark: TRUE OR NULL = TRUE; FALSE AND NULL = FALSE;
    # TRUE AND NULL = NULL; FALSE OR NULL = NULL
    t = np.array([True, True, False, False])
    u = np.array([True, False, True, False])  # validity of other operand
    blk = TableBlock.from_numpy(
        {"p": t, "q": np.array([True, True, True, True])},
        validity={"q": u})
    vals, valid = _result(blk, col("p") & col("q"))
    # p & q: rows: (T,T)=T; (T,NULL)=NULL; (F,T)=F; (F,NULL)=F
    assert list(valid) == [True, False, True, True]
    assert list(vals.astype(bool)[valid]) == [True, False, False]
    vals, valid = _result(blk, col("p") | col("q"))
    # p | q: (T,*)=T; (F,T)=T; (F,NULL)=NULL
    assert list(valid) == [True, True, True, False]
    assert list(vals.astype(bool)[valid]) == [True, True, True]


def test_remainder_java_semantics(rng):
    # Java %: sign follows the dividend (unlike python)
    a = np.array([7, -7, 7, -7], dtype=np.int64)
    b = np.array([3, 3, -3, -3], dtype=np.int64)
    blk = TableBlock.from_numpy({"a": a, "b": b})
    vals, valid = _result(blk, col("a") % col("b"))
    assert list(vals) == [1, -1, 1, -1]


@pytest.mark.parametrize("name,pyfn", [
    ("abs", abs), ("floor", np.floor), ("ceil", np.ceil),
    ("sqrt", np.sqrt), ("exp", np.exp),
    ("sin", np.sin), ("cos", np.cos), ("tanh", np.tanh),
    ("log10", np.log10), ("cbrt", np.cbrt),
])
def test_math_function_matrix(rng, name, pyfn):
    n = 100
    a = np.abs(rng.normal(size=n)) + 0.1  # positive domain for log/sqrt
    blk = TableBlock.from_numpy({"a": a})
    vals, valid = _result(blk, func(name, col("a")))
    np.testing.assert_allclose(vals, pyfn(a), rtol=1e-6)


def test_case_when_null_branches(rng):
    from auron_tpu.expr.nodes import case, when
    a = np.array([1, 2, 3, 4, 5], dtype=np.int64)
    blk = TableBlock.from_numpy({"a": a})
    e = case((col("a") < lit(3), lit(10)), (col("a") < lit(5), lit(20)))
    vals, valid = _result(blk, e)  # no otherwise -> NULL
    assert list(valid) == [True, True, True, True, False]
    assert list(vals[valid]) == [10, 10, 20, 20]


def test_in_list_with_nulls(rng):
    a = np.array([1.0, 2.0, 3.0, 4.0])
    na = np.array([False, False, True, False])
    blk = TableBlock.from_numpy({"a": a}, validity={"a": ~na})
    from auron_tpu.expr.nodes import InList
    e = InList(col("a"), (1.0, 4.0), negated=False)
    vals, valid = _result(blk, e)
    assert list(valid) == [True, True, False, True]
    assert list(vals.astype(bool)[valid]) == [True, False, True]


def test_string_function_matrix(rng):
    words = ["Hello World", "  pad  ", "", "MixedCase", "abc"]
    df = pd.DataFrame({"s": words})
    blk = TableBlock.from_pandas(df)
    checks = {
        "upper": [w.upper() for w in words],
        "lower": [w.lower() for w in words],
        "trim": [w.strip() for w in words],
        "reverse": [w[::-1] for w in words],
        "initcap": ["Hello World", "  Pad  ", "", "Mixedcase", "Abc"],
    }
    for name, want in checks.items():
        c = materialize(evaluate(func(name, col("s")), blk), blk.capacity)
        mask = np.asarray(blk.row_mask)
        got = [c.dict_values[i] for i in np.asarray(c.values)[mask]]
        assert got == want, name
    c = materialize(evaluate(func("length", col("s")), blk), blk.capacity)
    got = list(np.asarray(c.values)[np.asarray(blk.row_mask)])
    assert got == [len(w) for w in words]


def test_timestamp_roundtrip_and_parts():
    ts = pd.to_datetime(["2000-03-01 12:34:56", "1999-12-31 23:59:59",
                         "2001-07-04 00:00:01"])
    df = pd.DataFrame({"t": ts})
    blk = TableBlock.from_pandas(df)
    assert blk["t"].dtype.name == "timestamp64"
    back = blk.to_pandas()
    assert list(back["t"]) == list(ts)
    for name, want in [("hour", [12, 23, 0]), ("minute", [34, 59, 0]),
                       ("second", [56, 59, 1]),
                       ("year", [2000, 1999, 2001])]:
        if name == "year":
            e = func("year", func("to_date", col("t")))
        else:
            e = func(name, col("t"))
        c = materialize(evaluate(e, blk), blk.capacity)
        got = list(np.asarray(c.values)[np.asarray(blk.row_mask)])
        assert got == want, name
