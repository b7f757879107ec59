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


# ---- round-3 advisor fixes --------------------------------------------------


def test_sql_locate_left_right():
    """Spark locate(substr, str[, pos]) has a LEADING literal; left/right
    must parse despite being join keywords (ADVICE r2)."""
    s = Session()
    s.register_pandas("t", pd.DataFrame({"s": ["north", "oregon", "x"]}))
    assert s.sql("SELECT locate('or', s) AS r FROM t")["r"].tolist() == \
        [2, 1, 0]
    assert s.sql("SELECT locate('or', s, 3) AS r FROM t")["r"].tolist() == \
        [0, 0, 0]
    assert s.sql("SELECT left(s, 3) AS r FROM t")["r"].tolist() == \
        ["nor", "ore", "x"]
    assert s.sql("SELECT right(s, 2) AS r FROM t")["r"].tolist() == \
        ["th", "on", "x"]
    # LEFT JOIN still parses as a join
    s.register_pandas("u", pd.DataFrame({"s": ["north"], "v": [1]}))
    assert len(s.sql("SELECT t.s FROM t LEFT JOIN u ON t.s = u.s")) == 3


def test_rest_catalog_scheme_and_prefix():
    from auron_tpu import config
    from auron_tpu.connectors import catalog

    # default: http, first of >=3 segments is the prefix
    sch, hp, pre, ns, tbl = catalog._split("rest://h:1/p/ns/t")
    assert (sch, hp, pre, ns, tbl) == ("http", "h:1", "p", "ns", "t")
    # rest+https:// forces TLS
    sch, *_ = catalog._split("rest+https://h:1/ns/t")
    assert sch == "https"
    # config scheme applies to plain rest://
    with config.conf.scoped_overrides({"auron.catalog.rest.scheme":
                                       "https"}):
        sch, *_ = catalog._split("rest://h:1/ns/t")
        assert sch == "https"
    # explicit empty prefix => nested namespace, no prefix consumed
    with config.conf.scoped_overrides({"auron.catalog.rest.prefix": ""}):
        sch, hp, pre, ns, tbl = catalog._split("rest://h/ns1/ns2/t")
        assert (pre, ns, tbl) == ("", "ns1\x1fns2", "t")


def test_iceberg_append_spec_metadata(tmp_path):
    """metadata.json carries spec-required bookkeeping; manifest list has
    file/row counts; timestamp bounds encode as microseconds (ADVICE r2)."""
    import json as _json
    import os
    import struct

    from auron_tpu.connectors import iceberg as I
    from auron_tpu.connectors.write import iceberg_append
    from auron_tpu.io import avro

    root = str(tmp_path / "ice")
    ts = pd.to_datetime(["2001-01-01 00:00:01", "2002-06-01"],
                        format="mixed")
    iceberg_append(root, pd.DataFrame({"a": [1, 2], "ts": ts}))
    meta_path = I._latest_metadata(root)
    with open(meta_path) as f:
        meta = _json.load(f)
    for key in ("last-column-id", "last-updated-ms", "snapshot-log",
                "last-partition-id", "sort-orders", "default-sort-order-id"):
        assert key in meta, key
    assert meta["last-column-id"] == 2
    snap = meta["snapshots"][-1]
    rows = list(avro.read_container(I._local(snap["manifest-list"], root)))
    assert rows[-1]["added_files_count"] == 1
    assert rows[-1]["added_rows_count"] == 2
    # timestamp lower bound = microseconds since epoch
    mrows = list(avro.read_container(rows[-1]["manifest_path"]))
    lo = {kv["key"]: kv["value"]
          for kv in mrows[0]["data_file"]["lower_bounds"]}
    micros = struct.unpack("<q", lo[2])[0]
    assert micros == int(ts[0].value) // 1000
    # parquet file stores timestamp[us] (Iceberg spec), not ns
    import pyarrow.parquet as pq
    pfile = mrows[0]["data_file"]["file_path"]
    assert str(pq.read_schema(pfile).field("ts").type) == "timestamp[us]"
    # second append round-trips (reads back the richer metadata)
    iceberg_append(root, pd.DataFrame(
        {"a": [3], "ts": pd.to_datetime(["2003-01-01"])}))
    info = I.resolve(root)
    assert sum(f["record_count"] for f in info["files"]) == 3


def test_paimon_pk_level_order_tiebreak(tmp_path):
    """On a _SEQUENCE_NUMBER tie the lower-LEVEL (newer) file's row must
    win regardless of path sort order (ADVICE r2)."""
    import json as _json
    import os

    from auron_tpu.connectors.write import _write_parquet
    from auron_tpu.io import avro
    from auron_tpu.plan.nodes import LakehouseScan

    root = str(tmp_path / "pai")
    os.makedirs(f"{root}/schema")
    os.makedirs(f"{root}/snapshot")
    with open(f"{root}/schema/schema-0", "w") as f:
        _json.dump({"version": 3, "id": 0, "primaryKeys": ["id"],
                    "fields": [{"id": 0, "name": "id", "type": "BIGINT"},
                               {"id": 1, "name": "v", "type": "BIGINT"}]}, f)

    def rows(v):
        return pd.DataFrame({
            "_KEY_id": np.array([1], np.int64),
            "_SEQUENCE_NUMBER": np.array([7], np.int64),
            "_VALUE_KIND": np.array([0], np.int8),
            "id": np.array([1], np.int64),
            "v": np.array([v], np.int64)})

    # the NEWER row lives at level 0 but its path sorts FIRST — the old
    # positional tiebreak (path order) would resurrect the level-5 row
    _write_parquet(f"{root}/bucket-0/data-aaa.parquet", rows(200))  # level 0
    _write_parquet(f"{root}/bucket-0/data-zzz.parquet", rows(100))  # level 5
    entry_schema = {
        "type": "record", "name": "manifest_entry", "fields": [
            {"name": "_KIND", "type": "int"},
            {"name": "_PARTITION", "type": "bytes"},
            {"name": "_BUCKET", "type": "int"},
            {"name": "_FILE", "type": {
                "type": "record", "name": "f", "fields": [
                    {"name": "_FILE_NAME", "type": "string"},
                    {"name": "_FILE_SIZE", "type": "long"},
                    {"name": "_ROW_COUNT", "type": "long"},
                    {"name": "_LEVEL", "type": "int"}]}}]}
    mlist_schema = {"type": "record", "name": "manifest_list", "fields": [
        {"name": "_FILE_NAME", "type": "string"},
        {"name": "_FILE_SIZE", "type": "long"},
        {"name": "_NUM_ADDED_FILES", "type": "long"}]}

    def entry(name, level):
        return {"_KIND": 0, "_PARTITION": b"", "_BUCKET": 0,
                "_FILE": {"_FILE_NAME": name, "_FILE_SIZE": 1,
                          "_ROW_COUNT": 1, "_LEVEL": level}}

    avro.write_container(f"{root}/manifest/m1.avro", entry_schema,
                         [entry("data-aaa.parquet", 0),
                          entry("data-zzz.parquet", 5)])
    avro.write_container(f"{root}/manifest/ml1.avro", mlist_schema,
                         [{"_FILE_NAME": "m1.avro", "_FILE_SIZE": 1,
                           "_NUM_ADDED_FILES": 2}])
    with open(f"{root}/snapshot/snapshot-1", "w") as f:
        _json.dump({"version": 3, "id": 1, "schemaId": 0,
                    "baseManifestList": "ml1.avro",
                    "deltaManifestList": None, "commitKind": "APPEND"}, f)
    with open(f"{root}/snapshot/LATEST", "w") as f:
        f.write("1")

    from auron_tpu.connectors import read_lakehouse_blocks
    blocks = read_lakehouse_blocks(LakehouseScan("paimon", root))
    got = pd.concat(b.to_pandas() for b in blocks)
    assert got["v"].tolist() == [200]  # the level-0 (newer) row wins
