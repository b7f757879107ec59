"""Expression engine vs pandas oracle: arithmetic, 3VL, casts, strings, dates."""

import datetime

import jax
import numpy as np
import pandas as pd
import pytest

from auron_tpu import TableBlock, DECIMAL64, FLOAT64, INT32, INT64
from auron_tpu.expr import col, lit, when, evaluate
from auron_tpu.expr.eval import filter_block, project_block
from auron_tpu.expr.nodes import func


def mkblock(**data):
    return TableBlock.from_pandas(pd.DataFrame(data))


def out(block, expr, name="_col0"):
    """Evaluate one expression and return the live-row pandas column."""
    res = project_block(block, [expr.alias(name)])
    res = TableBlock(res.columns, block.row_mask)
    return res.to_pandas()[name]


def test_arith_and_promotion():
    b = mkblock(x=np.array([1, 2, 3], np.int32),
                y=np.array([10, 20, 30], np.int64))
    r = out(b, col("x") + col("y") * 2)
    np.testing.assert_array_equal(r.to_numpy(), [21, 42, 63])
    # int / int -> float64 (Spark SQL division)
    r = out(b, col("y") / col("x"))
    np.testing.assert_allclose(r.to_numpy(), [10.0, 10.0, 10.0])


def test_divide_and_mod_by_zero_is_null():
    b = mkblock(x=np.array([10, 7, -7], np.int64),
                d=np.array([2, 0, 4], np.int64))
    r = out(b, col("x") / col("d"))
    assert r.isna().tolist() == [False, True, False]
    r = out(b, col("x") % col("d"))
    assert r.isna().tolist() == [False, True, False]
    # Java % sign follows dividend: -7 % 4 == -3 (not +1 as in Python)
    assert r.iloc[2] == -3


def test_three_valued_logic():
    b = mkblock(a=[True, True, None, False, None],
                p=[True, None, None, True, False])
    r = out(b, col("a") & col("p"))
    assert r.tolist()[0] is np.True_ or r.tolist()[0] == True  # noqa: E712
    assert r.isna().tolist() == [False, True, True, False, False]
    assert r.iloc[3] == False and r.iloc[4] == False  # noqa: E712
    r = out(b, col("a") | col("p"))
    assert r.isna().tolist() == [False, False, True, False, True]
    assert r.iloc[0] == True and r.iloc[1] == True  # noqa: E712


def test_null_propagation_in_arith():
    b = mkblock(x=[1.0, None, 3.0], y=[None, 2.0, 4.0])
    r = out(b, col("x") + col("y"))
    assert r.isna().tolist() == [True, True, False]
    assert r.iloc[2] == 7.0


def test_comparisons_and_filter():
    b = mkblock(x=np.arange(10, dtype=np.int64))
    f = filter_block(b, (col("x") > 2) & (col("x") <= 6))
    np.testing.assert_array_equal(f.to_pandas()["x"].to_numpy(), [3, 4, 5, 6])


def test_case_when():
    b = mkblock(x=np.array([1, 5, 10], np.int64))
    e = when(col("x") < 3, lit(100)).when(col("x") < 7, lit(200)).otherwise(lit(300))
    r = out(b, e)
    np.testing.assert_array_equal(r.to_numpy(), [100, 200, 300])
    e2 = when(col("x") < 3, lit(1)).end()
    r2 = out(b, e2)
    assert r2.isna().tolist() == [False, True, True]


def test_in_list():
    b = mkblock(x=np.array([1, 2, 3, 4], np.int64))
    r = out(b, col("x").isin([2, 4]))
    np.testing.assert_array_equal(r.to_numpy(), [False, True, False, True])


def test_cast_float_to_int_java_semantics():
    # from_numpy keeps NaN as a *value* (pandas ingestion would read it as NULL)
    b = TableBlock.from_numpy({"x": np.array([1.7, -2.7, np.nan, 1e30])})
    r = out(b, col("x").cast(INT32))
    np.testing.assert_array_equal(r.to_numpy(),
                                  [1, -2, 0, np.iinfo(np.int32).max])


def test_cast_string_to_number():
    b = mkblock(s=["12", " 34 ", "x", "3.5"])
    r = out(b, col("s").cast(INT64))
    assert r.isna().tolist() == [False, False, True, True]
    assert r.iloc[0] == 12 and r.iloc[1] == 34
    r = out(b, col("s").cast(FLOAT64))
    assert r.isna().tolist() == [False, False, True, False]
    assert r.iloc[3] == 3.5


def test_string_functions_and_predicates():
    b = mkblock(s=["Apple", "banana", "Cherry pie", ""])
    assert out(b, func("upper", col("s"))).tolist() == \
        ["APPLE", "BANANA", "CHERRY PIE", ""]
    np.testing.assert_array_equal(
        out(b, func("length", col("s"))).to_numpy(), [5, 6, 10, 0])
    np.testing.assert_array_equal(
        out(b, func("like", col("s"), params=("%an%",))).to_numpy(),
        [False, True, False, False])
    assert out(b, func("substring", col("s"), params=(1, 3))).tolist() == \
        ["App", "ban", "Che", ""]


def test_string_equality_and_ordering():
    b = mkblock(s=["b", "a", "c", "b"])
    r = out(b, col("s") == lit("b"))
    np.testing.assert_array_equal(r.to_numpy(), [True, False, False, True])
    r = out(b, col("s") < lit("b"))
    np.testing.assert_array_equal(r.to_numpy(), [False, True, False, False])
    # equality against a literal absent from the dictionary
    r = out(b, col("s") == lit("zebra"))
    np.testing.assert_array_equal(r.to_numpy(), [False] * 4)


def test_date_functions():
    dates = [datetime.date(2000, 2, 29), datetime.date(1999, 12, 31),
             datetime.date(2026, 8, 16), datetime.date(1970, 1, 1)]
    days = np.array([(d - datetime.date(1970, 1, 1)).days for d in dates],
                    np.int32)
    from auron_tpu.dtypes import DATE32
    b = TableBlock.from_numpy({"d": days}, dtypes={"d": DATE32})
    np.testing.assert_array_equal(
        out(b, func("year", col("d"))).to_numpy(), [2000, 1999, 2026, 1970])
    np.testing.assert_array_equal(
        out(b, func("month", col("d"))).to_numpy(), [2, 12, 8, 1])
    np.testing.assert_array_equal(
        out(b, func("day", col("d"))).to_numpy(), [29, 31, 16, 1])
    # 1970-01-01 was a Thursday -> Spark dayofweek = 5
    np.testing.assert_array_equal(
        out(b, func("dayofweek", col("d"))).to_numpy(), [3, 6, 1, 5])
    # to_pandas now decodes date32 into datetimes (result-boundary decode)
    np.testing.assert_array_equal(
        out(b, func("last_day", col("d"))).to_numpy(),
        np.array(["2000-02-29", "1999-12-31", "2026-08-31", "1970-01-31"],
                 dtype="datetime64[s]"))


def test_date_comparison_with_string_literal():
    import datetime as dt
    days = np.array([10957, 10958], np.int32)  # 2000-01-01, 2000-01-02
    from auron_tpu.dtypes import DATE32
    b = TableBlock.from_numpy({"d": days}, dtypes={"d": DATE32})
    r = out(b, col("d") >= lit(dt.date(2000, 1, 2)))
    np.testing.assert_array_equal(r.to_numpy(), [False, True])


def test_decimal_arith():
    b = mkblock(q=np.array([2, 3], np.int64))
    price = col("p")
    blk = TableBlock.from_numpy(
        {"p": np.array([150, 299], np.int64), "q": np.array([2, 3], np.int64)},
        dtypes={"p": DECIMAL64(18, 2)})
    r = out(blk, price * col("q"))
    np.testing.assert_allclose(r.to_numpy(), [3.0, 8.97])
    r = out(blk, price + price)
    np.testing.assert_allclose(r.to_numpy(), [3.0, 5.98])
    del b


def test_coalesce_and_nullif():
    b = mkblock(x=[None, 2.0, 3.0], y=[9.0, None, 1.0])
    r = out(b, func("coalesce", col("x"), col("y")))
    np.testing.assert_allclose(r.to_numpy(), [9.0, 2.0, 3.0])
    r = out(b, func("nullif", col("y"), lit(1.0)))
    assert r.isna().tolist() == [False, True, True]


def test_round_half_up():
    b = mkblock(x=[2.5, -2.5, 2.4, 1.15])
    r = out(b, func("round", col("x")))
    np.testing.assert_array_equal(r.to_numpy()[:3], [3.0, -3.0, 2.0])


def test_whole_projection_is_jittable():
    b = mkblock(x=np.arange(100, dtype=np.int64),
                y=np.arange(100, dtype=np.float64))

    @jax.jit
    def run(blk):
        f = filter_block(blk, col("x") % 3 == 0)
        return project_block(f, [
            (col("x") * 2).alias("x2"),
            when(col("y") > 50, lit(1)).otherwise(lit(0)).alias("flag"),
        ]).with_mask(f.row_mask)

    res = run(b)
    df = res.to_pandas()
    assert len(df) == 34
    np.testing.assert_array_equal(df["x2"].to_numpy()[:4], [0, 6, 12, 18])


def test_case_when_string_branches_merge_dictionaries():
    b = mkblock(x=np.array([1.0, 5.0], np.float64))
    e = when(col("x") > 2.0, lit("pricey")).otherwise(lit("cheap"))
    assert out(b, e).tolist() == ["cheap", "pricey"]


def test_coalesce_strings_across_dictionaries():
    b = mkblock(s=["a", None, "c"])
    r = out(b, func("coalesce", col("s"), lit("missing")))
    assert r.tolist() == ["a", "missing", "c"]


def test_py_udf_host_callback():
    """UDF fallback: python fn over columns, usable inside jit."""
    import jax
    import pandas as pd
    from auron_tpu.block import TableBlock
    from auron_tpu.dtypes import FLOAT64, INT32
    from auron_tpu.expr.eval import evaluate, materialize
    from auron_tpu.expr.nodes import col, py_udf

    df = pd.DataFrame({"a": [1.0, 2.0, 3.0, None],
                       "s": ["x", "yy", "zzz", "w"]})
    b = TableBlock.from_pandas(df)
    u = py_udf("plus_len", lambda a, s: a + [len(x) for x in s],
               FLOAT64, col("a"), col("s"))

    @jax.jit
    def run(b):
        return materialize(evaluate(u, b), b.capacity)

    out = run(b)
    got = np.asarray(out.values)[np.asarray(b.row_mask)]
    np.testing.assert_allclose(got[:3], [2.0, 4.0, 6.0])
    assert not bool(np.asarray(out.validity)[3])  # NULL arg -> NULL out


def test_json_and_id_functions():
    import pandas as pd
    from auron_tpu.block import TableBlock
    from auron_tpu.expr.eval import evaluate, materialize
    from auron_tpu.expr.nodes import col, func
    df = pd.DataFrame({"j": ['{"a": 1, "b": {"c": "x"}}',
                             '{"a": 2}', 'not json']})
    b = TableBlock.from_pandas(df)
    out = materialize(evaluate(func("get_json_object", col("j"),
                                    params=("$.a",)), b), b.capacity)
    mask = np.asarray(b.row_mask)
    vals = out.dict_values[np.asarray(out.values)[mask]]
    valid = np.asarray(out.validity)[mask]
    assert list(vals[valid]) == ["1", "2"]
    assert not valid[2]
    nested = materialize(evaluate(func("get_json_object", col("j"),
                                       params=("$.b.c",)), b), b.capacity)
    nv = np.asarray(nested.validity)[mask]
    assert list(nested.dict_values[np.asarray(nested.values)[mask]][nv]) == ["x"]

    mid = materialize(evaluate(func("monotonically_increasing_id",
                                    params=(3,)), b), b.capacity)
    got = np.asarray(mid.values)[mask]
    assert list(got) == [(3 << 33) | i for i in range(3)]
