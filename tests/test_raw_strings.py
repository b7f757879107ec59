"""Raw byte-plane string columns (expr/strings_raw.py) — the
high-cardinality representation with no host dictionary — differentially
tested against pandas and against the dictionary representation of the
SAME data (which is itself golden-tested against the reference).

Reference analog: Arrow StringArray bytes consumed directly by
datafusion-ext-commons eq_comparator / spark_hash / rdx sort."""

import numpy as np
import pandas as pd
import pytest

from auron_tpu import TableBlock, config
from auron_tpu.dtypes import STRING, STRING_RAW
from auron_tpu.expr import strings_raw as SR
from auron_tpu.expr.eval import filter_block, project_block
from auron_tpu.expr.nodes import col, func, lit


def _strings(n, rng, dups=1.0):
    base = [f"key-{i:06d}-{rng.integers(0, 10 ** 6):06d}"
            for i in range(int(n * dups))]
    return np.array([base[i % len(base)] for i in range(n)], dtype=object)


def raw_block(values, name="s", extra=None, validity=None):
    data = {name: np.asarray(values, dtype=object)}
    W = max((SR.max_bytes(np.asarray(values, object)) + 3) // 4, 1)
    dts = {name: STRING_RAW(W)}
    if extra:
        data.update(extra)
    v = {name: validity} if validity is not None else None
    return TableBlock.from_numpy(data, dts, validity=v)


def test_encode_decode_roundtrip():
    vals = np.array(["", "a", "abcd", "abcde", "héllo wörld", "zz" * 10],
                    dtype=object)
    planes = SR.encode_object_array(vals, 8)
    assert planes.shape == (6, 8) and planes.dtype == np.int32
    back = SR.decode_planes(planes)
    assert list(back) == list(vals)
    # orderable contract: int32 tuple order == python string order
    order_planes = sorted(range(6), key=lambda i: tuple(planes[i]))
    order_str = sorted(range(6), key=lambda i: vals[i])
    assert order_planes == order_str


def test_promotion_heuristic():
    rng = np.random.default_rng(0)
    with config.conf.scoped(**{"auron.string.raw.min.distinct": 64,
                               "auron.string.raw.min.distinct.fraction": 0.5}):
        hi = TableBlock.from_pandas(
            pd.DataFrame({"s": _strings(500, rng)}))
        assert hi.columns["s"].dtype.is_raw_string
        lo = TableBlock.from_pandas(
            pd.DataFrame({"s": np.array(["a", "b"] * 250, dtype=object)}))
        assert lo.columns["s"].dtype.is_string  # low cardinality: dictionary
        # explicit STRING pins the dictionary even at high cardinality
        pin = TableBlock.from_pandas(
            pd.DataFrame({"s": _strings(500, rng)}), dtypes={"s": STRING})
        assert pin.columns["s"].dtype.is_string


def test_to_pandas_with_nulls():
    vals = np.array(["x", "longer-string", "", "y"], dtype=object)
    b = raw_block(vals, validity=np.array([True, True, False, True]))
    got = b.to_pandas()["s"]
    assert got[0] == "x" and got[1] == "longer-string" and got[3] == "y"
    assert pd.isna(got[2])


def test_filter_compare_vs_pandas():
    rng = np.random.default_rng(1)
    vals = _strings(300, rng, dups=0.5)
    df = pd.DataFrame({"s": vals, "v": np.arange(300)})
    b = raw_block(vals, extra={"v": np.arange(300, dtype=np.int64)})
    pivot = str(sorted(vals)[150])
    for op, pdop in ((col("s") == lit(pivot), df.s == pivot),
                     (col("s") < lit(pivot), df.s < pivot),
                     (col("s") >= lit(pivot), df.s >= pivot)):
        got = filter_block(b, op).to_pandas()
        want = df[pdop]
        assert sorted(got["v"].tolist()) == sorted(want["v"].tolist())


def test_literal_wider_than_planes():
    b = raw_block(np.array(["abc", "abd", "zz"], dtype=object))  # W = 1
    wide = "abc-much-longer-than-four-bytes"
    got = filter_block(b, col("s") == lit(wide)).to_pandas()
    assert len(got) == 0
    got = filter_block(b, col("s") < lit(wide)).to_pandas()
    # "abc" < wide (prefix), "abd" > wide, "zz" > wide
    assert got["s"].tolist() == ["abc"]
    got = filter_block(b, lit(wide) < col("s")).to_pandas()
    assert sorted(got["s"].tolist()) == ["abd", "zz"]


def test_sort_vs_pandas():
    from auron_tpu.ops.sort import SortKey, sort_block
    rng = np.random.default_rng(2)
    vals = _strings(257, rng, dups=0.7)
    b = raw_block(vals, extra={"v": np.arange(257, dtype=np.int64)})
    got = sort_block(b, (SortKey("s", ascending=False),)).to_pandas()
    want = pd.DataFrame({"s": vals, "v": np.arange(257)}).sort_values(
        "s", ascending=False, kind="stable")
    assert got["s"].tolist() == want["s"].tolist()


def test_join_raw_raw_and_raw_dict():
    from auron_tpu.ops import join as J
    rng = np.random.default_rng(3)
    keys = _strings(64, rng)
    probe = np.array([keys[i % 80] if i % 80 < 64 else f"miss-{i}"
                      for i in range(400)], dtype=object)
    pv = np.arange(400, dtype=np.int64)
    bv = np.arange(64, dtype=np.int64)
    want = pd.DataFrame({"k": probe, "pv": pv}).merge(
        pd.DataFrame({"k2": keys, "bv": bv}), left_on="k", right_on="k2")

    lb = raw_block(probe, name="k", extra={"pv": pv})
    rb = raw_block(keys, name="k2", extra={"bv": bv})
    out = J.join_blocks(lb, rb,
                        J.JoinSpec(("k",), ("k2",), J.INNER)).to_pandas()
    assert len(out) == len(want)
    assert sorted(out["pv"].tolist()) == sorted(want["pv"].tolist())
    assert out.sort_values("pv")["bv"].tolist() == \
        want.sort_values("pv")["bv"].tolist()

    # mixed: dictionary build side against raw probe side
    rb_dict = TableBlock.from_pandas(
        pd.DataFrame({"k2": keys, "bv": bv}), dtypes={"k2": STRING})
    out = J.join_blocks(lb, rb_dict,
                        J.JoinSpec(("k",), ("k2",), J.INNER)).to_pandas()
    assert len(out) == len(want)
    assert out.sort_values("pv")["bv"].tolist() == \
        want.sort_values("pv")["bv"].tolist()


def test_groupby_raw_key_and_minmax():
    from auron_tpu.ops.aggregate import AggSpec, groupby_sorted
    rng = np.random.default_rng(4)
    keys = _strings(40, rng)
    s = np.array([keys[i % 40] for i in range(500)], dtype=object)
    urls = np.array([f"https://ex.com/{rng.integers(0, 10 ** 9):09d}"
                     for _ in range(500)], dtype=object)
    v = rng.integers(0, 100, 500).astype(np.int64)
    W = max((SR.max_bytes(urls) + 3) // 4, 1)
    b = TableBlock.from_numpy(
        {"g": s, "u": urls, "v": v},
        {"g": STRING_RAW(max((SR.max_bytes(s) + 3) // 4, 1)),
         "u": STRING_RAW(W)})
    out = groupby_sorted(b, ["g"], [
        (AggSpec("c", "count_star"), None),
        (AggSpec("sv", "sum"), b.columns["v"]),
        (AggSpec("mn", "min"), b.columns["u"]),
        (AggSpec("mx", "max"), b.columns["u"])]).to_pandas()
    want = pd.DataFrame({"g": s, "u": urls, "v": v}).groupby("g").agg(
        c=("v", "size"), sv=("v", "sum"), mn=("u", "min"),
        mx=("u", "max")).reset_index().sort_values("g")
    out = out.sort_values("g")
    assert out["g"].tolist() == want["g"].tolist()
    assert out["c"].tolist() == want["c"].tolist()
    assert out["sv"].tolist() == want["sv"].tolist()
    assert out["mn"].tolist() == want["mn"].tolist()
    assert out["mx"].tolist() == want["mx"].tolist()


def test_hash_placement_matches_dictionary():
    """Raw planes must hash to the SAME murmur3 values as the dictionary
    representation (which is golden-tested against the reference)."""
    from auron_tpu.ops.hashing import column_hash_inputs, hash_columns_murmur3
    rng = np.random.default_rng(5)
    vals = _strings(200, rng)
    braw = raw_block(vals)
    bdict = TableBlock.from_pandas(pd.DataFrame({"s": vals}),
                                   dtypes={"s": STRING})
    h_raw = np.asarray(hash_columns_murmur3(
        [column_hash_inputs(braw.columns["s"])], braw.capacity))
    h_dict = np.asarray(hash_columns_murmur3(
        [column_hash_inputs(bdict.columns["s"])], bdict.capacity))
    n = len(vals)
    np.testing.assert_array_equal(h_raw[:n], h_dict[:n])


def test_case_when_mixed_raw_dict():
    vals = np.array(["alpha", "beta", "gamma", "delta"], dtype=object)
    b = raw_block(vals, extra={"v": np.arange(4, dtype=np.int64)})
    from auron_tpu.expr.nodes import when
    e = when(col("v") < lit(2), col("s")).otherwise(lit("other"))
    got = project_block(b, [e.alias("o")])
    got = TableBlock(got.columns, b.row_mask).to_pandas()["o"]
    assert got.tolist() == ["alpha", "beta", "other", "other"]


def test_text_function_fallback():
    vals = np.array(["Hello", "WORLD", "MiXeD"], dtype=object)
    b = raw_block(vals)
    got = project_block(b, [func("upper", col("s")).alias("u")])
    got = TableBlock(got.columns, b.row_mask).to_pandas()["u"]
    assert got.tolist() == ["HELLO", "WORLD", "MIXED"]


def test_ascii_case_device_native_stays_raw():
    """upper/lower on an ASCII raw column run on the byte planes and KEEP
    the raw representation (no host dictionary materializes)."""
    vals = np.array(["Hello!", "a-Z/09", "", "zzzz"], dtype=object)
    for name, pyfn in (("upper", str.upper), ("lower", str.lower)):
        b = raw_block(vals)
        out = project_block(b, [func(name, col("s")).alias("o")])
        c = out.columns["o"]
        assert c.dtype.is_raw_string  # stayed on device
        got = TableBlock(out.columns, b.row_mask).to_pandas()["o"]
        assert got.tolist() == [pyfn(s) for s in vals]


def test_ascii_case_non_ascii_falls_back_exact():
    vals = np.array(["héLLo", "STRAßE", "ok"], dtype=object)
    b = raw_block(vals)
    out = project_block(b, [func("upper", col("s")).alias("o")])
    assert not out.columns["o"].dtype.is_raw_string  # Unicode host path
    got = TableBlock(out.columns, b.row_mask).to_pandas()["o"]
    assert got.tolist() == [s.upper() for s in vals]


def test_substring_prefix_device_native():
    vals = np.array(["abcdefgh", "ab", "", "abcde"], dtype=object)
    b = raw_block(vals)
    out = project_block(b, [func("substring", col("s"),
                                 params=(1, 3)).alias("o")])
    assert out.columns["o"].dtype.is_raw_string
    got = TableBlock(out.columns, b.row_mask).to_pandas()["o"]
    assert got.tolist() == [s[:3] for s in vals]
    # general (non-prefix) substring still exact via the dictionary path
    out2 = project_block(b, [func("substring", col("s"),
                                  params=(-2, 2)).alias("o")])
    got2 = TableBlock(out2.columns, b.row_mask).to_pandas()["o"]
    assert got2.tolist() == [s[max(len(s) - 2, 0):] for s in vals]


def test_groupby_on_device_upper_raw():
    """upper(raw) output feeds group-by directly (equal outputs must share
    identity on the planes themselves)."""
    from auron_tpu.ops.aggregate import AggSpec, groupby_sorted
    vals = np.array(["aa", "AA", "aA", "bb", "Bb"], dtype=object)
    b = raw_block(vals)
    p = project_block(b, [func("upper", col("s")).alias("u")])
    p = TableBlock(p.columns, b.row_mask)
    res = groupby_sorted(p, ["u"],
                         [(AggSpec("n", "count"), p.columns["u"])])
    got = res.to_pandas().sort_values("u").reset_index(drop=True)
    assert got["u"].tolist() == ["AA", "BB"]
    assert got["n"].tolist() == [3, 2]


def test_length_device_native():
    vals = np.array(["", "a", "abcd", "héllo"], dtype=object)
    b = raw_block(vals)
    lens = np.asarray(SR.raw_lengths(b.columns["s"].values))[:4]
    assert lens.tolist() == [0, 1, 4, 6]  # é is 2 UTF-8 bytes


def test_spmd_exchange_groupby_raw_keys():
    """Hash exchange + distributed group-by on raw string keys over the
    8-device mesh must equal the single-device result."""
    import auron_tpu.sql  # noqa: F401
    from auron_tpu.plan import Session
    rng = np.random.default_rng(6)
    keys = _strings(64, rng)
    df = pd.DataFrame({
        "s": np.array([keys[rng.integers(0, 64)] for _ in range(2000)],
                      dtype=object),
        "v": rng.integers(0, 50, 2000).astype(np.int64)})
    want = df.groupby("s").agg(c=("v", "size"),
                               sv=("v", "sum")).reset_index()
    with config.conf.scoped(**{"auron.string.raw.min.distinct": 16,
                               "auron.string.raw.min.distinct.fraction": 0.0}):
        for nparts in (1, 4):
            sess = Session()
            sess.register_pandas("t", df, num_partitions=nparts)
            blk = sess.tables["t"][0]
            assert blk.columns["s"].dtype.is_raw_string
            got = sess.sql("SELECT s, COUNT(*) AS c, SUM(v) AS sv FROM t "
                           "GROUP BY s ORDER BY s")
            assert got["s"].tolist() == sorted(want["s"].tolist())
            w = want.sort_values("s")
            assert got["c"].tolist() == w["c"].tolist()
            assert got["sv"].tolist() == w["sv"].tolist()


def test_pyudf_string_output_under_jit():
    """String-valued python UDFs return raw byte planes — fixed shape,
    usable inside a jitted program (reference spark_udf_wrapper.rs parity;
    round 1 this raised NotImplementedError)."""
    import jax
    from auron_tpu.dtypes import STRING as _S
    from auron_tpu.expr.nodes import py_udf

    def fmt(v, s):
        return np.array([f"{x}:{t}" for x, t in zip(v, s)], dtype=object)

    vals = np.array(["a", "bb", "ccc"], dtype=object)
    b = raw_block(vals, extra={"v": np.arange(3, dtype=np.int64)})
    e = py_udf("fmt", fmt, _S, col("v"), col("s"))

    def step(blk):
        return project_block(blk, [e.alias("o")])

    out = jax.jit(step)(b)
    got = TableBlock(out.columns, b.row_mask).to_pandas()["o"]
    assert got.tolist() == ["0:a", "1:bb", "2:ccc"]
    assert out.columns["o"].dtype.is_raw_string


def test_prefix_like_device_native():
    import jax
    vals = np.array(["alpha-1", "alpha-2", "beta-1", "alp", "álpha"],
                    dtype=object)
    b = raw_block(vals)
    e = func("like", col("s"), params=("alpha%",))

    def step(blk):  # device-native: runs under jit (no host dictionary)
        return project_block(blk, [e.alias("m")])

    out = jax.jit(step)(b)
    got = np.asarray(out.columns["m"].values)[:5]
    assert got.tolist() == [True, True, False, False, False]
    out2 = project_block(b, [func("startswith", col("s"),
                                  params=("alp",)).alias("m")])
    assert np.asarray(out2.columns["m"].values)[:5].tolist() == \
        [True, True, False, True, False]
    # general pattern falls back to the dictionary path (eager)
    out3 = project_block(b, [func("like", col("s"),
                                  params=("%a-1",)).alias("m")])
    assert np.asarray(out3.columns["m"].values)[:5].tolist() == \
        [True, False, True, False, False]


def test_char_length_raw():
    import jax
    vals = np.array(["", "a", "abcd", "héllo", "日本語"], dtype=object)
    b = raw_block(vals)
    out = jax.jit(lambda blk: project_block(
        blk, [func("length", col("s")).alias("n")]))(b)
    assert np.asarray(out.columns["n"].values)[:5].tolist() == \
        [0, 1, 4, 5, 3]


def test_explode_passthrough_raw_column():
    """A raw string column riding through explode must gather planes by
    owner row (axis=0) without corruption."""
    from auron_tpu.plan import Generate, MemoryScan, Session, execute_plan
    from auron_tpu.plan.nodes import BlockTransform
    df = pd.DataFrame({
        "tags": ["a,b", "c", "d,e,f"],
        "url": [f"https://x.io/{i:05d}" for i in range(3)]})
    s = Session()
    with config.conf.scoped(**{"auron.string.raw.min.distinct": 2,
                               "auron.string.raw.min.distinct.fraction": 0.0}):
        s.register_pandas("t", df)
    blk = s.tables["t"][0]
    assert blk.columns["url"].dtype.is_raw_string
    plan = Generate(BlockTransform(MemoryScan("t"), "split",
                                   ("arr", "tags", ",")),
                    "arr", kind="explode", out_name="tag")
    out = pd.concat([b.to_pandas() for b in execute_plan(plan, s)],
                    ignore_index=True)
    want = df.assign(tags=df.tags.str.split(",")).explode("tags")
    assert out["tag"].tolist() == want["tags"].tolist()
    assert out["url"].tolist() == want["url"].tolist()


def test_parquet_scan_promotes_high_cardinality(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from auron_tpu.plan import ParquetScan, Session, execute_plan
    n = 400
    urls = [f"https://host/p/{i:06d}" for i in range(n)]
    df = pd.DataFrame({"u": urls, "v": np.arange(n, dtype=np.int64)})
    path = str(tmp_path / "t.parquet")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)
    with config.conf.scoped(**{"auron.string.raw.min.distinct": 64,
                               "auron.string.raw.min.distinct.fraction": 0.5}):
        blocks = execute_plan(ParquetScan((path,)), Session())
    assert blocks[0].columns["u"].dtype.is_raw_string
    got = blocks[0].to_pandas()
    assert got["u"].tolist() == urls


def test_window_over_raw_partition_keys():
    from auron_tpu.ops.sort import SortKey
    from auron_tpu.ops.window import WindowFunc, window_block
    rng = np.random.default_rng(9)
    parts = np.array([f"sess-{rng.integers(0, 20):04d}-xyz"
                      for _ in range(300)], dtype=object)
    v = rng.integers(0, 1000, 300).astype(np.int64)
    W = max((SR.max_bytes(parts) + 3) // 4, 1)
    b = TableBlock.from_numpy({"p": parts, "v": v},
                              {"p": STRING_RAW(W)})
    out = window_block(b, ("p",), (SortKey("v"),),
                       [WindowFunc("rn", "row_number")]).to_pandas()
    want = pd.DataFrame({"p": parts, "v": v})
    want["rn"] = want.sort_values("v").groupby("p").cumcount() + 1
    got = out.sort_values(["p", "v"]).reset_index(drop=True)
    want = want.sort_values(["p", "v"]).reset_index(drop=True)
    assert got["rn"].tolist() == want["rn"].tolist()


def test_skewed_join_raw_string_keys():
    """Hot raw-string key through the skew handler (count-sketch hashes the
    byte planes; heavy build rows replicate)."""
    import jax
    from jax.sharding import Mesh
    from auron_tpu.plan import Join, MemoryScan
    from auron_tpu.parallel.spmd import run_plan_spmd, unstack_result
    rng = np.random.default_rng(10)
    n = 2048
    hot = rng.random(n) < 0.6
    pool = np.array([f"key-{i:05d}" for i in range(64)], dtype=object)
    keys = np.where(hot, "key-00003", pool[rng.integers(0, 64, n)])
    fact = pd.DataFrame({"k": keys, "v": rng.normal(size=n).round(3)})
    dim = pd.DataFrame({"j": pool, "w": np.arange(64, dtype=np.int64)})
    W = max((SR.max_bytes(pool) + 3) // 4, 1)
    parts = np.array_split(np.arange(n), 8)
    tables = {"fact": [TableBlock.from_numpy(
                  {"k": keys[i], "v": fact["v"].to_numpy()[i]},
                  {"k": STRING_RAW(W)}, capacity=256) for i in parts],
              "dim": [TableBlock.from_numpy(
                  {"j": pool, "w": dim["w"].to_numpy()},
                  {"j": STRING_RAW(W)})]}
    mesh = Mesh(np.array(__import__("jax").devices()[:8]), ("p",))
    plan = Join(MemoryScan("fact"), MemoryScan("dim"), ("k",), ("j",),
                join_type="inner", strategy="skewed", out_capacity=1024)
    stacked = run_plan_spmd(plan, mesh, tables)
    got = pd.concat([b.to_pandas() for b in unstack_result(stacked)],
                    ignore_index=True)
    want = fact.merge(dim, left_on="k", right_on="j")
    assert len(got) == len(want)
    assert sorted(got["w"].tolist()) == sorted(want["w"].tolist())


@pytest.mark.parametrize("q", ["q3", "q42", "q55", "q19", "q52", "q98"])
def test_tpcds_differential_all_strings_raw(q):
    """TPC-DS queries with EVERY string column forced onto raw byte planes
    — the no-dictionary representation end-to-end (joins on string keys,
    CASE pivots, text predicates via the eager fallback)."""
    from auron_tpu.tpcds.runner import run_all
    (res,) = run_all(0.2, 2, raw_strings=True, queries=[q])
    assert res["match"], res


# -- review-found regressions -------------------------------------------------

def test_case_raw_with_null_branch():
    import jax
    from auron_tpu.expr.nodes import when
    vals = np.array(["alpha", "beta", "gamma"], dtype=object)
    b = raw_block(vals, extra={"v": np.arange(3, dtype=np.int64)})
    e = when(col("v") < lit(2), col("s")).otherwise(lit(None))
    out = jax.jit(lambda blk: project_block(blk, [e.alias("o")]))(b)
    got = TableBlock(out.columns, b.row_mask).to_pandas()["o"]
    assert got.tolist()[:2] == ["alpha", "beta"]
    assert pd.isna(got[2])


def test_union_raw_with_longer_dict_strings():
    from auron_tpu.ops.join import concat_blocks
    raw = raw_block(np.array(["ab", "cd"], dtype=object))  # W = 1
    d = TableBlock.from_pandas(
        pd.DataFrame({"s": ["a-much-longer-string-here", "zz"]}),
        dtypes={"s": STRING})
    out = concat_blocks([raw, d]).to_pandas()
    assert sorted(out["s"].tolist()) == \
        ["a-much-longer-string-here", "ab", "cd", "zz"]


def test_scan_promotion_consistent_across_partitions(tmp_path):
    """One high-cardinality file + one low-cardinality file in one scan
    must yield ONE representation for the column across partitions."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from auron_tpu.plan import ParquetScan, Session, execute_plan
    hi = pd.DataFrame({"u": [f"u-{i:05d}" for i in range(300)]})
    lo = pd.DataFrame({"u": ["a"] * 300})
    d = tmp_path / "mix"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(hi, preserve_index=False),
                   str(d / "a.parquet"))
    pq.write_table(pa.Table.from_pandas(lo, preserve_index=False),
                   str(d / "b.parquet"))
    with config.conf.scoped(**{"auron.string.raw.min.distinct": 64,
                               "auron.string.raw.min.distinct.fraction": 0.4}):
        blocks = execute_plan(ParquetScan((str(d),), num_partitions=2),
                              Session())
    kinds = {b.columns["u"].dtype.name for b in blocks}
    assert len(kinds) == 1, kinds
    allv = pd.concat([b.to_pandas() for b in blocks])["u"]
    assert sorted(allv.tolist()) == sorted(hi["u"].tolist() + lo["u"].tolist())
