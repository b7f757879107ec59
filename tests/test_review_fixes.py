"""Regressions for the second review batch (pre-session round-2 code):
decimal/float comparisons, concat dictionary duplicates, union decimal128
widening, overflow-safe decimal rescale, SQL concat_ws, scalar decimal128
literals, map_concat LAST_WIN size, join regrow with explicit capacity,
multi-row scalar subqueries."""

import numpy as np
import pandas as pd
import pytest

import auron_tpu.sql  # noqa: F401  installs Session.sql
from auron_tpu.block import TableBlock
from auron_tpu.dtypes import DECIMAL64, DECIMAL128, INT64
from auron_tpu.expr.eval import filter_block, project_block
from auron_tpu.expr.nodes import col, lit
from auron_tpu.plan import Session


def test_decimal_vs_float_compare():
    blk = TableBlock.from_numpy(
        {"d": np.array([120, 180, 7 * 10 ** 30], dtype=object)},
        {"d": DECIMAL128(38, 2)})
    got = filter_block(blk, col("d") > lit(1.5)).to_pandas()
    assert len(got) == 2  # 1.20 excluded, 1.80 and the huge value kept
    blk64 = TableBlock.from_numpy({"d": np.array([120, 180], np.int64)},
                                  {"d": DECIMAL64(10, 2)})
    got = filter_block(blk64, col("d") > lit(1.5)).to_pandas()
    assert len(got) == 1


def test_concat_duplicate_strings_share_codes():
    s = Session()
    s.register_pandas("t", pd.DataFrame({
        "a": ["x", "xy"], "b": ["yz", "z"]}))
    got = s.sql("SELECT concat(a, b) AS c, COUNT(*) AS n FROM t "
                "GROUP BY concat(a, b)")
    assert got["c"].tolist() == ["xyz"]
    assert got["n"].tolist() == [2]


def test_union_decimal128_keeps_width():
    from auron_tpu.ops.join import union_common_dtype
    d128 = DECIMAL128(38, 2)
    d64 = DECIMAL64(10, 2)
    out = union_common_dtype([d128, d64])
    assert out.name == "decimal128" and out.params == (38, 2)
    out = union_common_dtype([INT64, d128])
    assert out.is_decimal and out.params[1] == 2
    out = union_common_dtype([d128, INT64])
    assert out.is_decimal and out.params[1] == 2


def test_decimal128_compare_extreme_scales_no_wrap():
    a = TableBlock.from_numpy({"x": np.array([2 * 10 ** 37], dtype=object),
                               "y": np.array([10 ** 37], dtype=object)},
                              {"x": DECIMAL128(38, 0),
                               "y": DECIMAL128(38, 37)})
    got = filter_block(a, col("x") > col("y")).to_pandas()
    assert len(got) == 1  # 2e37 > 1.0 (rescale must not wrap negative)
    got = filter_block(a, col("x") < col("y")).to_pandas()
    assert len(got) == 0


def test_sql_concat_ws_separator_first():
    s = Session()
    s.register_pandas("t", pd.DataFrame({"a": ["x", "p"], "b": ["y", "q"]}))
    got = s.sql("SELECT concat_ws('-', a, b) AS c FROM t")
    assert got["c"].tolist() == ["x-y", "p-q"]


def test_scalar_decimal128_literal_select():
    s = Session()
    s.register_pandas("t", pd.DataFrame({"v": np.arange(3, dtype=np.int64)}))
    got = s.sql("SELECT v, cast(12345678901234567890.12 AS decimal(38, 2)) "
                "AS x FROM t")
    assert len(got) == 3
    np.testing.assert_allclose(got["x"].to_numpy(),
                               [1.234567890123456789012e19] * 3, rtol=1e-9)


def test_map_concat_last_win_size():
    from auron_tpu.plan.builder import table
    s = Session()
    s.register_pandas("t", pd.DataFrame({
        "k1": ["a"], "v1": ["1"], "k2": ["a"], "v2": ["2"]}))
    from auron_tpu.expr.nodes import func
    f = (table(s, "t")
         .block_transform("str_to_map", "m1", "kv1", ",", ":")
         if False else None)
    # build maps directly from single-entry arrays
    f = (table(s, "t")
         .block_transform("make_array", "ka", "k1")
         .block_transform("make_array", "va", "v1")
         .block_transform("make_array", "kb", "k2")
         .block_transform("make_array", "vb", "v2")
         .block_transform("map_from_arrays", "m1", "ka", "va")
         .block_transform("map_from_arrays", "m2", "kb", "vb")
         .block_transform("map_concat", "m", "m1", "m2")
         .select(n=func("size", params=("m",)),
                 got=func("map_get", params=("m", "a"))))
    out = f.collect()
    assert out["n"].tolist() == [1]     # LAST_WIN dedupes the shadowed key
    assert out["got"].tolist() == ["2"]  # later map wins


def test_join_regrow_with_explicit_capacity():
    """Explicit out_capacity too small for the fan-out: the regrow loop
    must converge to exact results, not loop 5 times and raise."""
    from auron_tpu.plan.builder import table
    s = Session()
    left = pd.DataFrame({"k": np.zeros(32, np.int64), "v": np.arange(32)})
    right = pd.DataFrame({"j": np.zeros(8, np.int64), "w": np.arange(8)})
    s.register_pandas("l", left)
    s.register_pandas("r", right)
    f = table(s, "l").join(table(s, "r"), ("k",), ("j",), out_capacity=64)
    got = f.collect()  # true output = 256 rows > 64
    assert len(got) == 256


def test_scalar_subquery_multi_row_raises():
    s = Session()
    s.register_pandas("t", pd.DataFrame({"v": np.arange(3, dtype=np.int64)}))
    s.register_pandas("u", pd.DataFrame({"w": np.arange(2, dtype=np.int64)}))
    with pytest.raises(ValueError, match="scalar subquery"):
        s.sql("SELECT v + (SELECT w FROM u) AS x FROM t")


def test_derived_dictionary_dedup_grouping():
    """upper()/substring() are non-injective: equal outputs must form ONE
    group and count once in count_distinct."""
    s = Session()
    s.register_pandas("t", pd.DataFrame({
        "a": ["abc", "ABC", "Abc", "xyz"],
        "v": np.arange(4, dtype=np.int64)}))
    got = s.sql("SELECT upper(a) AS u, COUNT(*) AS n FROM t "
                "GROUP BY upper(a) ORDER BY u")
    assert got["u"].tolist() == ["ABC", "XYZ"]
    assert got["n"].tolist() == [3, 1]
    got = s.sql("SELECT count_distinct(substr(a, 2, 2)) AS d FROM t")
    # suffixes: bc, BC, bc, yz -> 3 distinct
    assert got["d"].tolist() == [3]
