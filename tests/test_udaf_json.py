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


# ---------------------------------------------------------------------------
# Arbitrary python UDTF (auron.proto:618-628 serialized-UDTF analog)
# ---------------------------------------------------------------------------

def _split_words(s, k):
    if s is None:
        return
    for w in str(s).split(","):
        yield (int(w) + int(k),)


def test_py_udtf_explodes_rows_eager():
    df = pd.DataFrame({"k": np.array([10, 20, 30, 40], np.int64),
                       "csv": ["1,2,3", "4", None, "5,6"]})
    s = Session()
    s.register_pandas("t", df)
    from auron_tpu.dtypes import INT64
    f = table(s, "t").udtf(_split_words, [("n", INT64)], "csv", "k")
    got = f.collect().sort_values("n").reset_index(drop=True)
    want = sorted([11, 12, 13, 24, 45, 46])
    assert got["n"].tolist() == want
    # child columns replicate per emitted row
    assert got[got["n"] == 12]["k"].iloc[0] == 10


def test_py_udtf_outer_emits_null_row():
    df = pd.DataFrame({"k": np.array([1, 2], np.int64),
                       "csv": ["7", None]})
    s = Session()
    s.register_pandas("t", df)
    from auron_tpu.dtypes import INT64
    f = table(s, "t").udtf(_split_words, [("n", INT64)], "csv", "k",
                           outer=True)
    got = f.collect().sort_values("k").reset_index(drop=True)
    assert len(got) == 2
    assert got["n"].iloc[0] == 8 and pd.isna(got["n"].iloc[1])


def test_py_udtf_under_jit():
    """Non-string outputs run inside whole-plan jit via pure_callback."""
    import jax
    df = pd.DataFrame({"x": np.array([2.0, 3.0, 5.0])})
    s = Session()
    s.register_pandas("t", df)
    from auron_tpu.dtypes import FLOAT64, INT64
    from auron_tpu.plan import execute_plan
    from auron_tpu.plan.nodes import Generate, MemoryScan

    def powers(x):
        for p in range(1, 4):
            yield (p, float(x) ** p)

    plan = Generate(MemoryScan("t"), "x", kind="py_udtf", fn=powers,
                    args=("x",), out_fields=(("p", INT64), ("v", FLOAT64)),
                    out_capacity=16)

    def step(block):
        s2 = Session()
        s2.register("t", block)
        return execute_plan(plan, s2, annotate=False)[0]

    out = jax.jit(step)(s.tables["t"][0]).to_pandas()
    got = out.sort_values(["v"]).reset_index(drop=True)
    want = sorted(float(x) ** p for x in [2, 3, 5] for p in range(1, 4))
    np.testing.assert_allclose(got["v"].to_numpy(), want)


def test_py_udtf_string_output_eager_only():
    df = pd.DataFrame({"tag": ["a-b", "c"]})
    s = Session()
    s.register_pandas("t", df)
    from auron_tpu.dtypes import STRING

    def pieces(t):
        for part in t.split("-"):
            yield (part.upper(),)

    f = table(s, "t").udtf(pieces, [("piece", STRING)], "tag")
    got = f.collect()
    assert sorted(got["piece"]) == ["A", "B", "C"]
