"""Python UDAF + json_tuple escape hatches vs pandas oracles.

Reference contracts: agg/spark_udaf_wrapper.rs:451 (arbitrary aggregate via
host round-trip) and generate/json_tuple.rs:102 (multi-field json
extraction as a generator)."""

import numpy as np
import pandas as pd
import pytest

from auron_tpu.expr.nodes import col, lit
from auron_tpu.plan import Session
from auron_tpu.plan.builder import table, udaf


def test_py_udaf_median_single_partition():
    rng = np.random.default_rng(61)
    df = pd.DataFrame({"k": rng.integers(0, 12, 2000).astype(np.int64),
                       "v": rng.normal(size=2000).round(4)})
    df.loc[rng.random(2000) < 0.1, "v"] = np.nan
    s = Session()
    s.register_pandas("t", df)
    f = table(s, "t").groupby("k").agg(med=udaf(np.median, col("v")),
                                       s90=udaf(lambda a:
                                                np.quantile(a, 0.9),
                                                col("v")))
    got = f.collect().sort_values("k").reset_index(drop=True)
    want = df.groupby("k")["v"].agg(
        med="median", s90=lambda a: a.quantile(0.9)).reset_index()
    np.testing.assert_array_equal(got["k"], want["k"])
    np.testing.assert_allclose(got["med"], want["med"], rtol=1e-9)
    np.testing.assert_allclose(got["s90"], want["s90"], rtol=1e-9)


def test_py_udaf_multi_partition_colocates():
    """Keys land on one partition via the co-location exchange, so a host
    UDAF over 4 partitions equals the single-partition result."""
    rng = np.random.default_rng(62)
    df = pd.DataFrame({"k": rng.integers(0, 9, 3000).astype(np.int64),
                       "v": rng.normal(size=3000).round(4)})
    s = Session()
    s.register_pandas("t", df, num_partitions=4)
    f = table(s, "t").groupby("k").agg(med=udaf(np.median, col("v")))
    got = f.collect().sort_values("k").reset_index(drop=True)
    want = df.groupby("k")["v"].median().reset_index(name="med")
    np.testing.assert_array_equal(got["k"], want["k"])
    np.testing.assert_allclose(got["med"], want["med"], rtol=1e-9)


def test_py_udaf_under_jit():
    rng = np.random.default_rng(63)
    df = pd.DataFrame({"k": rng.integers(0, 6, 1000).astype(np.int64),
                       "v": rng.normal(size=1000).round(4)})
    s = Session()
    s.register_pandas("t", df)
    f = table(s, "t").groupby("k").agg(med=udaf(np.median, col("v")))
    got = f.collect(jit=True).sort_values("k").reset_index(drop=True)
    want = df.groupby("k")["v"].median().reset_index(name="med")
    np.testing.assert_allclose(got["med"], want["med"], rtol=1e-9)


def test_json_tuple_extraction():
    docs = ['{"a": 1, "b": "x"}',
            '{"a": 2.5, "b": "y", "c": [1, 2]}',
            'not json',
            '{"b": null}',
            '{"a": -3, "b": ""}']
    df = pd.DataFrame({"id": np.arange(5, dtype=np.int64), "j": docs})
    s = Session()
    s.register_pandas("t", df)
    f = table(s, "t").json_tuple("j", "a", "b", "c")
    got = f.collect()
    assert got["c0"].fillna("?").tolist() == ["1", "2.5", "?", "?", "-3"]
    assert got["c1"].fillna("?").tolist() == ["x", "y", "?", "?", ""]
    assert got["c2"].fillna("?").tolist() == ["?", "[1, 2]", "?", "?", "?"]
    assert got["id"].tolist() == [0, 1, 2, 3, 4]


def test_json_tuple_then_filter_and_cast():
    """The extracted fields are ordinary string columns: castable,
    filterable, usable as join/group keys."""
    docs = ['{"qty": 3, "item": "ham"}', '{"qty": 7, "item": "eggs"}',
            '{"qty": 5, "item": "ham"}']
    df = pd.DataFrame({"j": docs * 10})
    s = Session()
    s.register_pandas("t", df)
    from auron_tpu.dtypes import INT64
    f = (table(s, "t").json_tuple("j", "qty", "item")
         .with_columns(qty=col("c0").cast(INT64))
         .filter(col("c1") == lit("ham"))
         .groupby("c1").agg(total=("sum", col("qty"))))
    got = f.collect()
    assert len(got) == 1
    assert got["total"].iloc[0] == (3 + 5) * 10
