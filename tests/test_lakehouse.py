"""Lakehouse connector tests: Iceberg / Hudi / Paimon fixtures built from
the on-disk specs (metadata JSON + Avro manifests via io/avro.py), scanned
through the LakehouseScan plan node, verified against pandas.

Reference surface: thirdparty/auron-iceberg, auron-hudi, auron-paimon
convert providers (SURVEY.md §2.4)."""

import json
import os
import struct

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from auron_tpu.expr.nodes import col, lit
from auron_tpu.io import avro
from auron_tpu.plan import LakehouseScan, Session, execute_plan


def _collect(node):
    s = Session()
    blocks = execute_plan(node, s)
    return pd.concat([b.to_pandas() for b in blocks], ignore_index=True)


# -- Iceberg ------------------------------------------------------------------

MANIFEST_FILE_SCHEMA = {
    "type": "record", "name": "manifest_file", "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "content", "type": "int"},
        {"name": "added_snapshot_id", "type": "long"},
    ]}

KV = {"type": "array", "items": {
    "type": "record", "name": "kv", "fields": [
        {"name": "key", "type": "int"}, {"name": "value", "type": "bytes"}]}}

MANIFEST_ENTRY_SCHEMA = {
    "type": "record", "name": "manifest_entry", "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"]},
        {"name": "sequence_number", "type": ["null", "long"]},
        {"name": "data_file", "type": {
            "type": "record", "name": "r2", "fields": [
                {"name": "content", "type": "int"},
                {"name": "file_path", "type": "string"},
                {"name": "file_format", "type": "string"},
                {"name": "partition", "type": {
                    "type": "record", "name": "r102", "fields": [
                        {"name": "dt", "type": ["null", "string"]}]}},
                {"name": "record_count", "type": "long"},
                {"name": "file_size_in_bytes", "type": "long"},
                {"name": "lower_bounds", "type": ["null", KV]},
                {"name": "upper_bounds", "type": ["null", KV]},
                {"name": "equality_ids",
                 "type": ["null", {"type": "array", "items": "int"}]},
            ]}},
    ]}


def _write_parquet(path, df):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)
    return os.path.getsize(path)


def _ice_entry(path, dt, n, vmin, vmax, status=1):
    i32 = lambda v: struct.pack("<i", v)  # noqa: E731
    return {"status": status, "snapshot_id": 1, "data_file": {
        "content": 0, "file_path": path, "file_format": "PARQUET",
        "partition": {"dt": dt}, "record_count": n,
        "file_size_in_bytes": 1,
        "lower_bounds": [{"key": 2, "value": i32(vmin)}],
        "upper_bounds": [{"key": 2, "value": i32(vmax)}]}}


@pytest.fixture
def iceberg_table(tmp_path):
    """Two snapshots: snap 1 has files A(dt=a) + B(dt=b); snap 2 deletes B
    and adds C(dt=b). Field ids: 1=k(string via dt? no: k int? ) —
    schema: id 1 = dt string, 2 = v int, 3 = name string."""
    root = str(tmp_path / "ice")
    dfa = pd.DataFrame({"v": np.array([1, 2, 3], np.int32),
                        "name": ["x", "y", "z"]})
    dfb = pd.DataFrame({"v": np.array([10, 11], np.int32),
                        "name": ["p", "q"]})
    dfc = pd.DataFrame({"v": np.array([100, 101], np.int32),
                        "name": ["r", "s"]})
    pa_ = f"{root}/data/dt=a/A.parquet"
    pb = f"{root}/data/dt=b/B.parquet"
    pc = f"{root}/data/dt=b/C.parquet"
    _write_parquet(pa_, dfa)
    _write_parquet(pb, dfb)
    _write_parquet(pc, dfc)

    mdir = f"{root}/metadata"
    os.makedirs(mdir, exist_ok=True)
    # snapshot 1 manifest: A + B
    avro.write_container(f"{mdir}/m1.avro", MANIFEST_ENTRY_SCHEMA, [
        _ice_entry(pa_, "a", 3, 1, 3), _ice_entry(pb, "b", 2, 10, 11)])
    avro.write_container(f"{mdir}/sl1.avro", MANIFEST_FILE_SCHEMA, [
        {"manifest_path": f"{mdir}/m1.avro", "manifest_length": 1,
         "partition_spec_id": 0, "content": 0, "added_snapshot_id": 1}])
    # snapshot 2 manifest: A existing, B deleted, C added
    avro.write_container(f"{mdir}/m2.avro", MANIFEST_ENTRY_SCHEMA, [
        _ice_entry(pa_, "a", 3, 1, 3, status=0),
        _ice_entry(pb, "b", 2, 10, 11, status=2),
        _ice_entry(pc, "b", 2, 100, 101, status=1)])
    avro.write_container(f"{mdir}/sl2.avro", MANIFEST_FILE_SCHEMA, [
        {"manifest_path": f"{mdir}/m2.avro", "manifest_length": 1,
         "partition_spec_id": 0, "content": 0, "added_snapshot_id": 2}])

    meta = {
        "format-version": 2, "table-uuid": "0" * 32, "location": root,
        "current-schema-id": 0,
        "schemas": [{"schema-id": 0, "type": "struct", "fields": [
            {"id": 1, "name": "dt", "required": False, "type": "string"},
            {"id": 2, "name": "v", "required": False, "type": "int"},
            {"id": 3, "name": "name", "required": False, "type": "string"},
        ]}],
        "partition-specs": [{"spec-id": 0, "fields": [
            {"name": "dt", "transform": "identity", "source-id": 1,
             "field-id": 1000}]}],
        "current-snapshot-id": 2,
        "snapshots": [
            {"snapshot-id": 1, "timestamp-ms": 1000,
             "manifest-list": f"{mdir}/sl1.avro"},
            {"snapshot-id": 2, "timestamp-ms": 2000,
             "manifest-list": f"{mdir}/sl2.avro"}],
    }
    with open(f"{mdir}/v2.metadata.json", "w") as f:
        json.dump(meta, f)
    with open(f"{mdir}/version-hint.text", "w") as f:
        f.write("2")
    return root


def test_iceberg_current_snapshot(iceberg_table):
    got = _collect(LakehouseScan("iceberg", iceberg_table))
    # current snapshot = A + C (B deleted), dt injected from partition
    assert sorted(got["v"].tolist()) == [1, 2, 3, 100, 101]
    assert sorted(got["dt"].tolist()) == ["a", "a", "a", "b", "b"]
    assert set(got.columns) == {"dt", "v", "name"}


def test_iceberg_time_travel(iceberg_table):
    got = _collect(LakehouseScan("iceberg", iceberg_table,
                                 options=(("snapshot_id", 1),)))
    assert sorted(got["v"].tolist()) == [1, 2, 3, 10, 11]
    got = _collect(LakehouseScan("iceberg", iceberg_table,
                                 options=(("as_of_ms", 1500),)))
    assert sorted(got["v"].tolist()) == [1, 2, 3, 10, 11]


def test_iceberg_bounds_and_partition_pruning(iceberg_table):
    from auron_tpu import connectors
    # v > 50: manifest bounds keep only C
    got = _collect(LakehouseScan("iceberg", iceberg_table,
                                 predicate=col("v") > lit(50)))
    assert sorted(got["v"].tolist()) == [100, 101]
    assert connectors.LAST_SCAN_STATS == {"files_total": 2, "files_read": 1}
    # dt = 'a': partition constant keeps only A
    got = _collect(LakehouseScan("iceberg", iceberg_table,
                                 predicate=col("dt") == lit("a")))
    assert sorted(got["v"].tolist()) == [1, 2, 3]
    assert connectors.LAST_SCAN_STATS["files_read"] == 1


def test_iceberg_projection(iceberg_table):
    got = _collect(LakehouseScan("iceberg", iceberg_table,
                                 projection=("v",), num_partitions=3))
    assert sorted(got["v"].tolist()) == [1, 2, 3, 100, 101]
    assert list(got.columns) == ["v"]


# -- Hudi ---------------------------------------------------------------------

@pytest.fixture
def hudi_table(tmp_path):
    root = str(tmp_path / "hudi")
    os.makedirs(f"{root}/.hoodie", exist_ok=True)
    for ts in ("20240101000000", "20240102000000"):
        with open(f"{root}/.hoodie/{ts}.commit", "w") as f:
            json.dump({"ok": True}, f)
    # file group f1 written at t1 then UPDATED at t2 (t2 wins)
    _write_parquet(f"{root}/dt=a/f1-0_0-1-0_20240101000000.parquet",
                   pd.DataFrame({"v": np.array([1, 2], np.int64)}))
    _write_parquet(f"{root}/dt=a/f1-0_0-2-0_20240102000000.parquet",
                   pd.DataFrame({"v": np.array([5, 6], np.int64)}))
    # file group f2 in another partition, committed at t1
    _write_parquet(f"{root}/dt=b/f2-0_0-1-0_20240101000000.parquet",
                   pd.DataFrame({"v": np.array([7], np.int64)}))
    # uncommitted write (no .commit for its instant) must be invisible
    _write_parquet(f"{root}/dt=b/f3-0_0-1-0_20240103000000.parquet",
                   pd.DataFrame({"v": np.array([99], np.int64)}))
    return root


def test_hudi_latest_file_slices(hudi_table):
    got = _collect(LakehouseScan("hudi", hudi_table))
    assert sorted(got["v"].tolist()) == [5, 6, 7]
    assert sorted(got["dt"].tolist()) == ["a", "a", "b"]


HUDI_LOG_SCHEMA = {
    "type": "record", "name": "rec", "fields": [
        {"name": "_hoodie_record_key", "type": "string"},
        {"name": "k", "type": ["null", "string"]},
        {"name": "v", "type": ["null", "long"]},
        {"name": "_hoodie_is_deleted", "type": "boolean"}]}


def _hudi_log_rec(key, v, deleted=False):
    return {"_hoodie_record_key": key, "k": key, "v": v,
            "_hoodie_is_deleted": deleted}


@pytest.fixture
def hudi_mor_table(tmp_path):
    """MOR table: base file at t1 + two log files (t2 update/delete/insert,
    t3 re-update), an uncommitted log block, and a rolled-back instant."""
    from auron_tpu.connectors import hudi as H
    root = str(tmp_path / "hudi_mor")
    os.makedirs(f"{root}/.hoodie", exist_ok=True)
    t1, t2, t3 = "20240101000000", "20240102000000", "20240103000000"
    t_uncommitted, t_rolled = "20240104000000", "20240105000000"
    with open(f"{root}/.hoodie/{t1}.commit", "w") as f:
        json.dump({}, f)
    for ts in (t2, t3, t_rolled):
        with open(f"{root}/.hoodie/{ts}.deltacommit", "w") as f:
            json.dump({}, f)
    _write_parquet(
        f"{root}/f1-0_0-1-0_{t1}.parquet",
        pd.DataFrame({"_hoodie_record_key": ["a", "b", "c"],
                      "k": ["a", "b", "c"],
                      "v": np.array([1, 2, 3], np.int64)}))
    # log 1 (t2): update b, delete c, insert d
    H.write_log_file(f"{root}/.f1-0_{t1}.log.1_0-1-0", [
        {"type": H.BLK_AVRO, "schema": HUDI_LOG_SCHEMA,
         "headers": {H.HDR_INSTANT: t2},
         "records": [_hudi_log_rec("b", 20), _hudi_log_rec("c", 0, True),
                     _hudi_log_rec("d", 40)]}])
    # log 2 (t3): re-update b; plus an UNCOMMITTED block and a ROLLED-BACK
    # block, both invisible
    H.write_log_file(f"{root}/.f1-0_{t1}.log.2_0-1-0", [
        {"type": H.BLK_AVRO, "schema": HUDI_LOG_SCHEMA,
         "headers": {H.HDR_INSTANT: t3},
         "records": [_hudi_log_rec("b", 200)]},
        {"type": H.BLK_AVRO, "schema": HUDI_LOG_SCHEMA,
         "headers": {H.HDR_INSTANT: t_uncommitted},
         "records": [_hudi_log_rec("a", 999)]},
        {"type": H.BLK_AVRO, "schema": HUDI_LOG_SCHEMA,
         "headers": {H.HDR_INSTANT: t_rolled},
         "records": [_hudi_log_rec("a", 888)]},
        {"type": H.BLK_COMMAND,
         "headers": {H.HDR_TARGET_INSTANT: t_rolled,
                     H.HDR_COMMAND_TYPE: "0"}}])
    return root


def test_hudi_mor_merge(hudi_mor_table):
    """Log records override base rows by record key, latest block wins,
    deletes drop, inserts append; uncommitted + rolled-back blocks are
    invisible. (Beyond the reference: HudiScanSupport.scala:132 bails on
    mor table types.)"""
    got = _collect(LakehouseScan("hudi", hudi_mor_table))
    out = dict(zip(got["k"].tolist(), got["v"].tolist()))
    assert out == {"a": 1, "b": 200, "d": 40}


def test_hudi_mor_log_only_file_group(tmp_path):
    """A file group whose first write went straight to a log file."""
    from auron_tpu.connectors import hudi as H
    root = str(tmp_path / "hudi_logonly")
    os.makedirs(f"{root}/.hoodie", exist_ok=True)
    t1 = "20240101000000"
    with open(f"{root}/.hoodie/{t1}.deltacommit", "w") as f:
        json.dump({}, f)
    H.write_log_file(f"{root}/.f9-0_{t1}.log.1_0-1-0", [
        {"type": H.BLK_AVRO, "schema": HUDI_LOG_SCHEMA,
         "headers": {H.HDR_INSTANT: t1},
         "records": [_hudi_log_rec("x", 7), _hudi_log_rec("y", 8)]}])
    got = _collect(LakehouseScan("hudi", root))
    assert sorted(got["v"].tolist()) == [7, 8]


def test_hudi_log_format_roundtrip(tmp_path):
    from auron_tpu.connectors import hudi as H
    p = str(tmp_path / "t.log.1")
    recs = [_hudi_log_rec("k1", 5), _hudi_log_rec("k2", None, True)]
    H.write_log_file(p, [{"type": H.BLK_AVRO, "schema": HUDI_LOG_SCHEMA,
                          "headers": {H.HDR_INSTANT: "t"},
                          "records": recs}])
    # torn tail must not break the readable prefix
    with open(p, "ab") as f:
        f.write(H.LOG_MAGIC + b"\x00\x00\x00\x00\x00\x00\x01\x00trunc")
    blocks = H.read_log_file(p)
    assert len(blocks) == 1 and blocks[0]["records"] == recs


# -- Paimon -------------------------------------------------------------------

PAIMON_MLIST_SCHEMA = {
    "type": "record", "name": "manifest_list", "fields": [
        {"name": "_FILE_NAME", "type": "string"},
        {"name": "_FILE_SIZE", "type": "long"},
        {"name": "_NUM_ADDED_FILES", "type": "long"}]}

PAIMON_ENTRY_SCHEMA = {
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


def _paimon_file(root, dt, name, df):
    _write_parquet(f"{root}/dt={dt}/bucket-0/{name}", df)


@pytest.fixture
def paimon_table(tmp_path):
    root = str(tmp_path / "paimon")
    os.makedirs(f"{root}/schema", exist_ok=True)
    os.makedirs(f"{root}/snapshot", exist_ok=True)
    mdir = f"{root}/manifest"
    with open(f"{root}/schema/schema-0", "w") as f:
        json.dump({"version": 3, "id": 0, "primaryKeys": [],
                   "fields": [{"id": 0, "name": "v", "type": "BIGINT"}]}, f)
    _paimon_file(root, "x", "data-f1.parquet",
                 pd.DataFrame({"v": np.array([1, 2], np.int64)}))
    _paimon_file(root, "x", "data-f2.parquet",
                 pd.DataFrame({"v": np.array([3], np.int64)}))
    _paimon_file(root, "y", "data-f3.parquet",
                 pd.DataFrame({"v": np.array([9], np.int64)}))

    def entry(kind, name, rows):
        return {"_KIND": kind, "_PARTITION": b"", "_BUCKET": 0,
                "_FILE": {"_FILE_NAME": name, "_FILE_SIZE": 1,
                          "_ROW_COUNT": rows, "_LEVEL": 0}}

    # snapshot 1: base = {f1, f2}
    avro.write_container(f"{mdir}/m1.avro", PAIMON_ENTRY_SCHEMA,
                         [entry(0, "data-f1.parquet", 2),
                          entry(0, "data-f2.parquet", 1)])
    avro.write_container(f"{mdir}/ml1.avro", PAIMON_MLIST_SCHEMA,
                         [{"_FILE_NAME": "m1.avro", "_FILE_SIZE": 1,
                           "_NUM_ADDED_FILES": 2}])
    with open(f"{root}/snapshot/snapshot-1", "w") as f:
        json.dump({"version": 3, "id": 1, "schemaId": 0,
                   "baseManifestList": "ml1.avro",
                   "deltaManifestList": None, "commitKind": "APPEND"}, f)
    # snapshot 2: delta deletes f2, adds f3
    avro.write_container(f"{mdir}/m2.avro", PAIMON_ENTRY_SCHEMA,
                         [entry(1, "data-f2.parquet", 1),
                          entry(0, "data-f3.parquet", 1)])
    avro.write_container(f"{mdir}/ml2.avro", PAIMON_MLIST_SCHEMA,
                         [{"_FILE_NAME": "m2.avro", "_FILE_SIZE": 1,
                           "_NUM_ADDED_FILES": 1}])
    with open(f"{root}/snapshot/snapshot-2", "w") as f:
        json.dump({"version": 3, "id": 2, "schemaId": 0,
                   "baseManifestList": "ml1.avro",
                   "deltaManifestList": "ml2.avro",
                   "commitKind": "APPEND"}, f)
    with open(f"{root}/snapshot/LATEST", "w") as f:
        f.write("2")
    return root


def test_paimon_latest_snapshot(paimon_table):
    got = _collect(LakehouseScan("paimon", paimon_table))
    assert sorted(got["v"].tolist()) == [1, 2, 9]
    assert sorted(got["dt"].tolist()) == ["x", "x", "y"]


def test_paimon_snapshot_pin(paimon_table):
    got = _collect(LakehouseScan("paimon", paimon_table,
                                 options=(("snapshot", 1),)))
    assert sorted(got["v"].tolist()) == [1, 2, 3]


def _paimon_pk_rows(ids, seqs, kinds, vals):
    return pd.DataFrame({
        "_KEY_id": np.asarray(ids, np.int64),
        "_SEQUENCE_NUMBER": np.asarray(seqs, np.int64),
        "_VALUE_KIND": np.asarray(kinds, np.int8),
        "id": np.asarray(ids, np.int64),
        "v": np.asarray(vals, np.int64)})


@pytest.fixture
def paimon_pk_table(tmp_path):
    """Primary-key (LSM) table: base level-1 run + level-0 delta with an
    update, an update_before/after pair, a delete, and a fresh insert,
    spread over two buckets."""
    root = str(tmp_path / "paimon_pk")
    os.makedirs(f"{root}/schema", exist_ok=True)
    os.makedirs(f"{root}/snapshot", exist_ok=True)
    mdir = f"{root}/manifest"
    with open(f"{root}/schema/schema-0", "w") as f:
        json.dump({"version": 3, "id": 0, "primaryKeys": ["id"],
                   "fields": [{"id": 0, "name": "id", "type": "BIGINT"},
                              {"id": 1, "name": "v", "type": "BIGINT"}]}, f)
    # bucket 0: base inserts id 1,2,3 (compacted level 1)
    _write_parquet(f"{root}/bucket-0/data-a.parquet",
                   _paimon_pk_rows([1, 2, 3], [1, 2, 3], [0, 0, 0],
                                   [10, 20, 30]))
    # bucket 0 delta (level 0): -U/+U pair rewrites id=2, -D deletes id=3,
    # +I adds id=4
    _write_parquet(f"{root}/bucket-0/data-b.parquet",
                   _paimon_pk_rows([2, 2, 3, 4], [9, 10, 11, 12],
                                   [1, 2, 3, 0], [20, 200, 30, 40]))
    # bucket 1: independent key space
    _write_parquet(f"{root}/bucket-1/data-c.parquet",
                   _paimon_pk_rows([7], [5], [0], [70]))

    def entry(name, bucket, level, rows):
        return {"_KIND": 0, "_PARTITION": b"", "_BUCKET": bucket,
                "_FILE": {"_FILE_NAME": name, "_FILE_SIZE": 1,
                          "_ROW_COUNT": rows, "_LEVEL": level}}

    avro.write_container(f"{mdir}/m1.avro", PAIMON_ENTRY_SCHEMA,
                         [entry("data-a.parquet", 0, 1, 3),
                          entry("data-b.parquet", 0, 0, 4),
                          entry("data-c.parquet", 1, 0, 1)])
    avro.write_container(f"{mdir}/ml1.avro", PAIMON_MLIST_SCHEMA,
                         [{"_FILE_NAME": "m1.avro", "_FILE_SIZE": 1,
                           "_NUM_ADDED_FILES": 3}])
    with open(f"{root}/snapshot/snapshot-1", "w") as f:
        json.dump({"version": 3, "id": 1, "schemaId": 0,
                   "baseManifestList": "ml1.avro",
                   "deltaManifestList": None, "commitKind": "APPEND"}, f)
    with open(f"{root}/snapshot/LATEST", "w") as f:
        f.write("1")
    return root


def test_paimon_pk_merge_on_read(paimon_pk_table):
    """Deduplicate merge engine: max-sequence row wins per key, DELETE and
    UPDATE_BEFORE winners drop the key, system columns are stripped.
    (Beyond the reference: PaimonScanSupport.scala:162-171 rejects
    non-raw-convertible splits and falls back to Spark.)"""
    got = _collect(LakehouseScan("paimon", paimon_pk_table))
    assert sorted(got.columns.tolist()) == ["id", "v"]
    out = dict(zip(got["id"].tolist(), got["v"].tolist()))
    assert out == {1: 10, 2: 200, 4: 40, 7: 70}


def test_paimon_pk_merge_with_predicate(paimon_pk_table):
    """Predicates never prune PK files pre-merge (a pruned delta could
    resurrect stale rows); they re-apply after the merge."""
    got = _collect(LakehouseScan("paimon", paimon_pk_table,
                                 predicate=col("v") > lit(50)))
    # v=200 (the post-update value of id=2) and v=70 survive; the stale
    # v=20/v=30 rows must NOT reappear
    assert sorted(got["v"].tolist()) == [70, 200]


def test_paimon_pk_projection(paimon_pk_table):
    got = _collect(LakehouseScan("paimon", paimon_pk_table,
                                 projection=("v",)))
    assert sorted(got["v"].tolist()) == [10, 40, 70, 200]


# -- wire + plan integration --------------------------------------------------

def test_lakehouse_wire_roundtrip(iceberg_table):
    from auron_tpu.plan import wire
    node = LakehouseScan("iceberg", iceberg_table, projection=("v",),
                         predicate=col("v") > lit(1),
                         options=(("snapshot_id", 2),))
    back = wire.plan_from_json(wire.plan_to_json(node))
    got = _collect(back)
    assert sorted(got["v"].tolist()) == [2, 3, 100, 101]


def test_lakehouse_under_full_plan(iceberg_table):
    from auron_tpu.plan import Agg, AggCall, Filter
    plan = Agg(Filter(LakehouseScan("iceberg", iceberg_table),
                      col("v") < lit(100)),
               keys=(("dt", col("dt")),),
               calls=(AggCall("s", "sum", col("v")),), mode="single")
    s = Session()
    out = pd.concat([b.to_pandas() for b in execute_plan(plan, s)],
                    ignore_index=True).sort_values("dt")
    assert out["dt"].tolist() == ["a"]
    assert out["s"].tolist() == [6]


def test_sql_over_lakehouse_table(iceberg_table):
    import auron_tpu.sql  # noqa: F401  installs Session.sql
    s = Session()
    s.register_lakehouse("ice", iceberg_table, format="iceberg")
    got = s.sql("SELECT dt, SUM(v) AS sv, COUNT(*) AS c FROM ice "
                "GROUP BY dt ORDER BY dt")
    assert got["dt"].tolist() == ["a", "b"]
    assert got["sv"].tolist() == [6, 201]
    assert got["c"].tolist() == [3, 2]


def test_sql_over_registered_parquet(tmp_path):
    import auron_tpu.sql  # noqa: F401
    import pyarrow as pa
    import pyarrow.parquet as pq
    df = pd.DataFrame({"g": ["x", "y", "x"], "v": [1, 2, 3]})
    p = str(tmp_path / "f.parquet")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), p)
    s = Session()
    s.register_files("t", p, num_partitions=2)
    got = s.sql("SELECT g, SUM(v) AS sv FROM t GROUP BY g ORDER BY g")
    assert got["g"].tolist() == ["x", "y"]
    assert got["sv"].tolist() == [4, 2]


def test_iceberg_field_id_schema_evolution(iceberg_table, tmp_path):
    """A file written before a column rename maps by PARQUET field id:
    old name `v` in the file surfaces under the current schema name
    `quantity` (reference field-id mapping, auron.proto:836-837)."""
    root = str(tmp_path / "evo")
    # data file with explicit field-id metadata under the OLD name "v"
    fields = [pa.field("v", pa.int32(),
                       metadata={b"PARQUET:field_id": b"2"}),
              pa.field("name", pa.string(),
                       metadata={b"PARQUET:field_id": b"3"})]
    t = pa.table({"v": pa.array([7, 8], pa.int32()),
                  "name": ["a", "b"]}, schema=pa.schema(fields))
    os.makedirs(f"{root}/data", exist_ok=True)
    pq.write_table(t, f"{root}/data/A.parquet")
    mdir = f"{root}/metadata"
    os.makedirs(mdir)
    avro.write_container(f"{mdir}/m1.avro", MANIFEST_ENTRY_SCHEMA, [
        _ice_entry(f"{root}/data/A.parquet", None, 2, 7, 8)])
    avro.write_container(f"{mdir}/sl1.avro", MANIFEST_FILE_SCHEMA, [
        {"manifest_path": f"{mdir}/m1.avro", "manifest_length": 1,
         "partition_spec_id": 0, "content": 0, "added_snapshot_id": 1}])
    meta = {"format-version": 2, "table-uuid": "1" * 32, "location": root,
            "current-schema-id": 1,
            "schemas": [{"schema-id": 1, "type": "struct", "fields": [
                # field id 2 was renamed v -> quantity
                {"id": 2, "name": "quantity", "required": False,
                 "type": "int"},
                {"id": 3, "name": "name", "required": False,
                 "type": "string"}]}],
            "partition-specs": [{"spec-id": 0, "fields": []}],
            "current-snapshot-id": 1,
            "snapshots": [{"snapshot-id": 1, "timestamp-ms": 1,
                           "manifest-list": f"{mdir}/sl1.avro"}]}
    with open(f"{mdir}/v1.metadata.json", "w") as f:
        json.dump(meta, f)
    with open(f"{mdir}/version-hint.text", "w") as f:
        f.write("1")
    got = _collect(LakehouseScan("iceberg", root))
    assert sorted(got["quantity"].tolist()) == [7, 8]
    got = _collect(LakehouseScan("iceberg", root,
                                 projection=("quantity",)))
    assert list(got.columns) == ["quantity"]


def test_iceberg_position_deletes(iceberg_table, tmp_path):
    """Merge-on-read position deletes: a delete manifest masks row
    ordinals of matching data files (iceberg spec content=1 manifests,
    positional delete file = (file_path, pos) rows)."""
    root = iceberg_table
    mdir = f"{root}/metadata"
    # delete rows 0 and 2 of file A (values 1 and 3)
    del_path = f"{root}/data/del1.parquet"
    pq.write_table(pa.table({
        "file_path": [f"{root}/data/dt=a/A.parquet"] * 2,
        "pos": pa.array([0, 2], pa.int64())}), del_path)
    avro.write_container(f"{mdir}/dm1.avro", MANIFEST_ENTRY_SCHEMA, [
        {"status": 1, "snapshot_id": 3, "data_file": {
            "content": 1, "file_path": del_path,
            "file_format": "PARQUET", "partition": {"dt": None},
            "record_count": 2, "file_size_in_bytes": 1,
            "lower_bounds": None, "upper_bounds": None}}])
    avro.write_container(f"{mdir}/sl3.avro", MANIFEST_FILE_SCHEMA, [
        {"manifest_path": f"{mdir}/m2.avro", "manifest_length": 1,
         "partition_spec_id": 0, "content": 0, "added_snapshot_id": 2},
        {"manifest_path": f"{mdir}/dm1.avro", "manifest_length": 1,
         "partition_spec_id": 0, "content": 1, "added_snapshot_id": 3}])
    with open(f"{mdir}/v2.metadata.json") as f:
        meta = json.load(f)
    meta["snapshots"].append({"snapshot-id": 3, "timestamp-ms": 3000,
                              "manifest-list": f"{mdir}/sl3.avro"})
    meta["current-snapshot-id"] = 3
    with open(f"{mdir}/v3.metadata.json", "w") as f:
        json.dump(meta, f)
    with open(f"{mdir}/version-hint.text", "w") as f:
        f.write("3")
    got = _collect(LakehouseScan("iceberg", root))
    # A had [1,2,3]: rows 0,2 deleted -> [2]; C untouched [100,101]
    assert sorted(got["v"].tolist()) == [2, 100, 101]


def test_iceberg_equality_deletes(iceberg_table, tmp_path):
    """Equality deletes anti-join on the equality-id columns, scoped by
    sequence number: rows matching (name='y') vanish from data files with
    a LOWER sequence; a same-or-higher-sequence data file is untouched."""
    root = iceberg_table
    mdir = f"{root}/metadata"
    eq_path = f"{root}/data/eqdel.parquet"
    pq.write_table(pa.table({"name": ["y", "r"]}), eq_path)
    avro.write_container(f"{mdir}/dm2.avro", MANIFEST_ENTRY_SCHEMA, [
        {"status": 1, "snapshot_id": 4, "sequence_number": 5,
         "data_file": {
            "content": 2, "file_path": eq_path,
            "file_format": "PARQUET", "partition": {"dt": None},
            "record_count": 2, "file_size_in_bytes": 1,
            "lower_bounds": None, "upper_bounds": None,
            "equality_ids": [3]}}])
    # a NEW data file written at sequence 6 (after the delete): kept even
    # though it contains name='y'
    dfn = pd.DataFrame({"v": np.array([500], np.int32), "name": ["y"]})
    pn = f"{root}/data/dt=a/N.parquet"
    _write_parquet(pn, dfn)
    new_entry = _ice_entry(pn, "a", 1, 500, 500)
    new_entry["sequence_number"] = 6
    avro.write_container(f"{mdir}/m3.avro", MANIFEST_ENTRY_SCHEMA,
                         [new_entry])
    avro.write_container(f"{mdir}/sl4.avro", MANIFEST_FILE_SCHEMA, [
        {"manifest_path": f"{mdir}/m2.avro", "manifest_length": 1,
         "partition_spec_id": 0, "content": 0, "added_snapshot_id": 2},
        {"manifest_path": f"{mdir}/m3.avro", "manifest_length": 1,
         "partition_spec_id": 0, "content": 0, "added_snapshot_id": 4},
        {"manifest_path": f"{mdir}/dm2.avro", "manifest_length": 1,
         "partition_spec_id": 0, "content": 1, "added_snapshot_id": 4}])
    with open(f"{mdir}/v2.metadata.json") as f:
        meta = json.load(f)
    meta["snapshots"].append({"snapshot-id": 4, "timestamp-ms": 4000,
                              "manifest-list": f"{mdir}/sl4.avro"})
    meta["current-snapshot-id"] = 4
    with open(f"{mdir}/v4.metadata.json", "w") as f:
        json.dump(meta, f)
    with open(f"{mdir}/version-hint.text", "w") as f:
        f.write("4")
    got = _collect(LakehouseScan("iceberg", root))
    # A: [1(x) 2(y) 3(z)] loses y -> [1, 3]; C: [100(r) 101(s)] loses r;
    # N (seq 6 > delete seq 5): keeps its y row
    assert sorted(got["v"].tolist()) == [1, 3, 101, 500]
    # projection that drops the equality column still applies the delete
    got = _collect(LakehouseScan("iceberg", root, projection=("v",)))
    assert sorted(got["v"].tolist()) == [1, 3, 101, 500]
    assert list(got.columns) == ["v"]


def test_hudi_replacecommit_evicts_file_groups(tmp_path):
    """Clustering/INSERT OVERWRITE (.replacecommit): replaced file groups
    must vanish even though their base files still exist on disk."""
    root = str(tmp_path / "hudi_rc")
    os.makedirs(f"{root}/.hoodie", exist_ok=True)
    with open(f"{root}/.hoodie/20240101000000.commit", "w") as f:
        json.dump({}, f)
    _write_parquet(f"{root}/dt=a/f1-0_0-1-0_20240101000000.parquet",
                   pd.DataFrame({"v": np.array([1, 2], np.int64)}))
    # clustering rewrites group f1 into f9 at t2
    _write_parquet(f"{root}/dt=a/f9-0_0-1-0_20240102000000.parquet",
                   pd.DataFrame({"v": np.array([1, 2], np.int64)}))
    with open(f"{root}/.hoodie/20240102000000.replacecommit", "w") as f:
        json.dump({"partitionToReplaceFileIds": {"dt=a": ["f1-0"]}}, f)
    got = _collect(LakehouseScan("hudi", root))
    assert sorted(got["v"].tolist()) == [1, 2]  # not duplicated


def test_iceberg_metadata_numeric_version_sort(tmp_path, iceberg_table):
    from auron_tpu.connectors.iceberg import _latest_metadata
    mdir = f"{iceberg_table}/metadata"
    os.remove(f"{mdir}/version-hint.text")
    # create v3..v10 pointing at the same content as v2
    with open(f"{mdir}/v2.metadata.json") as f:
        body = f.read()
    for v in range(3, 11):
        with open(f"{mdir}/v{v}.metadata.json", "w") as f:
            f.write(body)
    assert _latest_metadata(iceberg_table).endswith("v10.metadata.json")


def test_lakehouse_predicate_authoritative_with_deletes(iceberg_table):
    """The node predicate must hold on OUTPUT rows even when a delete file
    forces an unfiltered read."""
    root = iceberg_table
    mdir = f"{root}/metadata"
    del_path = f"{root}/data/del2.parquet"
    pq.write_table(pa.table({
        "file_path": [f"{root}/data/dt=b/C.parquet"],
        "pos": pa.array([0], pa.int64())}), del_path)
    avro.write_container(f"{mdir}/dm3.avro", MANIFEST_ENTRY_SCHEMA, [
        {"status": 1, "snapshot_id": 5, "sequence_number": 9, "data_file": {
            "content": 1, "file_path": del_path,
            "file_format": "PARQUET", "partition": {"dt": None},
            "record_count": 1, "file_size_in_bytes": 1,
            "lower_bounds": None, "upper_bounds": None,
            "equality_ids": None}}])
    avro.write_container(f"{mdir}/sl5.avro", MANIFEST_FILE_SCHEMA, [
        {"manifest_path": f"{mdir}/m2.avro", "manifest_length": 1,
         "partition_spec_id": 0, "content": 0, "added_snapshot_id": 2},
        {"manifest_path": f"{mdir}/dm3.avro", "manifest_length": 1,
         "partition_spec_id": 0, "content": 1, "added_snapshot_id": 5}])
    with open(f"{mdir}/v2.metadata.json") as f:
        meta = json.load(f)
    meta["snapshots"].append({"snapshot-id": 5, "timestamp-ms": 5000,
                              "manifest-list": f"{mdir}/sl5.avro"})
    meta["current-snapshot-id"] = 5
    with open(f"{mdir}/v5.metadata.json", "w") as f:
        json.dump(meta, f)
    with open(f"{mdir}/version-hint.text", "w") as f:
        f.write("5")
    # C=[100,101] loses pos 0 -> [101]; predicate v > 2 must ALSO hold on
    # the file that was read unfiltered (A stays [3])
    got = _collect(LakehouseScan("iceberg", root,
                                 predicate=col("v") > lit(2)))
    assert sorted(got["v"].tolist()) == [3, 101]


def test_iceberg_equality_delete_partition_scoped(iceberg_table):
    """A delete file written under partition dt=b must not touch rows in
    dt=a even when values match (spec partition scoping)."""
    root = iceberg_table
    mdir = f"{root}/metadata"
    eq_path = f"{root}/data/eqdel_b.parquet"
    # 'x' exists in dt=a (v=1) — the dt=b-scoped delete must not remove it
    pq.write_table(pa.table({"name": ["x", "r"]}), eq_path)
    avro.write_container(f"{mdir}/dm4.avro", MANIFEST_ENTRY_SCHEMA, [
        {"status": 1, "snapshot_id": 6, "sequence_number": 7,
         "data_file": {
            "content": 2, "file_path": eq_path,
            "file_format": "PARQUET", "partition": {"dt": "b"},
            "record_count": 2, "file_size_in_bytes": 1,
            "lower_bounds": None, "upper_bounds": None,
            "equality_ids": [3]}}])
    avro.write_container(f"{mdir}/sl6.avro", MANIFEST_FILE_SCHEMA, [
        {"manifest_path": f"{mdir}/m2.avro", "manifest_length": 1,
         "partition_spec_id": 0, "content": 0, "added_snapshot_id": 2},
        {"manifest_path": f"{mdir}/dm4.avro", "manifest_length": 1,
         "partition_spec_id": 0, "content": 1, "added_snapshot_id": 6}])
    with open(f"{mdir}/v2.metadata.json") as f:
        meta = json.load(f)
    meta["snapshots"].append({"snapshot-id": 6, "timestamp-ms": 6000,
                              "manifest-list": f"{mdir}/sl6.avro"})
    meta["current-snapshot-id"] = 6
    with open(f"{mdir}/v6.metadata.json", "w") as f:
        json.dump(meta, f)
    with open(f"{mdir}/version-hint.text", "w") as f:
        f.write("6")
    got = _collect(LakehouseScan("iceberg", root))
    # dt=a keeps [1(x),2(y),3(z)]; dt=b loses r: [101(s)]
    assert sorted(got["v"].tolist()) == [1, 2, 3, 101]


# -- write paths (connectors/write.py — beyond the reference's scan-only
# providers) -------------------------------------------------------------------

def _wdf(lo, hi, dts):
    n = hi - lo
    return pd.DataFrame({"dt": dts[:n],
                         "v": np.arange(lo, hi, dtype=np.int64),
                         "name": [f"n{i}" for i in range(lo, hi)]})


@pytest.mark.parametrize("fmt", ["iceberg", "paimon", "hudi"])
def test_lakehouse_write_read_roundtrip(fmt, tmp_path):
    """Two appends -> scan sees both; Iceberg/Paimon time travel still
    resolves the first snapshot alone."""
    from auron_tpu.plan import Session
    root = str(tmp_path / fmt)
    s = Session()
    df1 = _wdf(0, 3, ["a", "a", "b"])
    df2 = _wdf(3, 5, ["b", "c"])
    snap1 = s.write_lakehouse(df1, root, format=fmt, partition_by=("dt",))
    s.write_lakehouse(df2, root, format=fmt, partition_by=("dt",))
    got = _collect(LakehouseScan(fmt, root)).sort_values("v")
    assert got["v"].tolist() == [0, 1, 2, 3, 4]
    assert got["dt"].tolist() == ["a", "a", "b", "b", "c"]
    assert got["name"].tolist() == [f"n{i}" for i in range(5)]
    if fmt == "iceberg":
        old = _collect(LakehouseScan(fmt, root,
                                     options=(("snapshot_id", snap1),)))
        assert sorted(old["v"].tolist()) == [0, 1, 2]
    elif fmt == "paimon":
        old = _collect(LakehouseScan(fmt, root,
                                     options=(("snapshot", snap1),)))
        assert sorted(old["v"].tolist()) == [0, 1, 2]


def test_iceberg_write_bounds_prune(tmp_path):
    """Written min/max bounds engage the scan-side file pruning."""
    from auron_tpu import connectors
    from auron_tpu.connectors.write import iceberg_append
    root = str(tmp_path / "ice_w")
    iceberg_append(root, _wdf(0, 3, ["a", "a", "a"]))
    iceberg_append(root, _wdf(100, 103, ["a", "a", "a"]))
    got = _collect(LakehouseScan("iceberg", root,
                                 predicate=col("v") > lit(50)))
    assert sorted(got["v"].tolist()) == [100, 101, 102]
    assert connectors.LAST_SCAN_STATS["files_read"] == 1
    assert connectors.LAST_SCAN_STATS["files_total"] == 2


def test_iceberg_write_then_sql(tmp_path):
    import auron_tpu.sql  # noqa: F401
    from auron_tpu.plan import Session
    root = str(tmp_path / "ice_sql")
    s = Session()
    s.write_lakehouse(_wdf(0, 5, ["a", "a", "b", "b", "c"]), root,
                      format="iceberg", partition_by=("dt",))
    s.register_lakehouse("t", root, format="iceberg")
    got = s.sql("SELECT dt, SUM(v) AS sv FROM t GROUP BY dt ORDER BY dt")
    assert got["dt"].tolist() == ["a", "b", "c"]
    assert got["sv"].tolist() == [1, 5, 4]


def test_hudi_write_then_log_upsert(tmp_path):
    """A hudi_append base plus a manual MOR log file upsert merge."""
    from auron_tpu.connectors import hudi as H
    from auron_tpu.connectors.write import hudi_append
    root = str(tmp_path / "hudi_w")
    base = pd.DataFrame({"_hoodie_record_key": ["a", "b"],
                         "k": ["a", "b"], "v": np.array([1, 2], np.int64)})
    instant = hudi_append(root, base)
    # attach a log file to the written file group
    info = H.resolve(root)
    bp = info["files"][0]["path"]
    fid = os.path.basename(bp).split("_")[0]
    t2 = str(int(instant) + 1)
    with open(f"{root}/.hoodie/{t2}.deltacommit", "w") as f:
        json.dump({}, f)
    H.write_log_file(f"{root}/.{fid}_{instant}.log.1_0-1-0", [
        {"type": H.BLK_AVRO, "schema": HUDI_LOG_SCHEMA,
         "headers": {H.HDR_INSTANT: t2},
         "records": [_hudi_log_rec("b", 20)]}])
    got = _collect(LakehouseScan("hudi", root))
    out = dict(zip(got["k"].tolist(), got["v"].tolist()))
    assert out == {"a": 1, "b": 20}


def test_iceberg_rest_catalog(tmp_path):
    """A rest:// table URI resolves through a live REST catalog server to
    the current metadata file; scans, snapshots, pruning all unchanged."""
    import http.server
    import threading

    from auron_tpu.connectors.write import iceberg_append

    root = str(tmp_path / "ice_rest")
    iceberg_append(root, pd.DataFrame(
        {"v": np.arange(4, dtype=np.int64)}))
    meta_file = sorted(
        n for n in os.listdir(f"{root}/metadata")
        if n.endswith(".metadata.json"))[-1]

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            assert self.path == "/v1/namespaces/db/tables/sales", self.path
            auth = self.headers.get("Authorization")
            assert auth == "Bearer sekrit", auth
            body = json.dumps({"metadata-location":
                               f"file://{root}/metadata/{meta_file}"})
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body.encode())

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        from auron_tpu import config
        uri = f"rest://127.0.0.1:{srv.server_address[1]}/db/sales"
        with config.conf.scoped_overrides(
                {"auron.catalog.rest.token": "sekrit"}):
            got = _collect(LakehouseScan("iceberg", uri))
        assert sorted(got["v"].tolist()) == [0, 1, 2, 3]
    finally:
        srv.shutdown()


# -- row-level upsert / delete writers (write_table mode=) ---------------------

def test_iceberg_upsert_row_delta(tmp_path):
    """One snapshot = equality delete + new data: replaced keys vanish,
    fresh rows land, time travel still sees the old rows."""
    from auron_tpu.connectors.write import (iceberg_append, iceberg_delete,
                                            iceberg_upsert)
    root = str(tmp_path / "ice_up")
    base = pd.DataFrame({"k": ["a", "b", "c"],
                         "v": np.array([1, 2, 3], np.int64)})
    s1 = iceberg_append(root, base)
    up = pd.DataFrame({"k": ["b", "d"], "v": np.array([20, 40], np.int64)})
    s2 = iceberg_upsert(root, up, key_cols=["k"])
    got = _collect(LakehouseScan("iceberg", root))
    assert dict(zip(got["k"], got["v"])) == \
        {"a": 1, "b": 20, "c": 3, "d": 40}
    # time travel to the pre-upsert snapshot
    old = _collect(LakehouseScan("iceberg", root,
                                 options=(("snapshot_id", s1),)))
    assert dict(zip(old["k"], old["v"])) == {"a": 1, "b": 2, "c": 3}
    # row-level delete
    iceberg_delete(root, pd.DataFrame({"k": ["a", "d"]}))
    got = _collect(LakehouseScan("iceberg", root))
    assert dict(zip(got["k"], got["v"])) == {"b": 20, "c": 3}
    # the upsert snapshot remains intact behind the delete
    mid = _collect(LakehouseScan("iceberg", root,
                                 options=(("snapshot_id", s2),)))
    assert dict(zip(mid["k"], mid["v"])) == \
        {"a": 1, "b": 20, "c": 3, "d": 40}


def test_iceberg_upsert_repeated_same_key(tmp_path):
    """Back-to-back upserts of one key: only the newest value survives
    (each delete scopes every prior sequence number)."""
    from auron_tpu.connectors.write import iceberg_append, iceberg_upsert
    root = str(tmp_path / "ice_up2")
    iceberg_append(root, pd.DataFrame(
        {"k": ["x"], "v": np.array([0], np.int64)}))
    for i in (1, 2, 3):
        iceberg_upsert(root, pd.DataFrame(
            {"k": ["x"], "v": np.array([i], np.int64)}), key_cols=["k"])
    got = _collect(LakehouseScan("iceberg", root))
    assert got["k"].tolist() == ["x"] and got["v"].tolist() == [3]


def test_paimon_pk_upsert_and_delete(tmp_path):
    from auron_tpu.connectors.write import paimon_delete, paimon_upsert
    root = str(tmp_path / "pm_up")
    df1 = pd.DataFrame({"k": ["a", "b"], "v": np.array([1, 2], np.int64)})
    paimon_upsert(root, df1, primary_keys=["k"])
    paimon_upsert(root, pd.DataFrame(
        {"k": ["b", "c"], "v": np.array([20, 30], np.int64)}))
    got = _collect(LakehouseScan("paimon", root))
    assert dict(zip(got["k"], got["v"])) == {"a": 1, "b": 20, "c": 30}
    paimon_delete(root, pd.DataFrame({"k": ["a"]}))
    got = _collect(LakehouseScan("paimon", root))
    assert dict(zip(got["k"], got["v"])) == {"b": 20, "c": 30}
    # time travel: snapshot 2 (before the delete) still sees "a"
    old = _collect(LakehouseScan("paimon", root,
                                 options=(("snapshot", 2),)))
    assert dict(zip(old["k"], old["v"])) == {"a": 1, "b": 20, "c": 30}


def test_paimon_pk_upsert_partitioned(tmp_path):
    """PKs contain the partition key (Paimon invariant); routing by the
    partition group keeps the LSM merge per (partition, bucket)."""
    from auron_tpu.connectors.write import paimon_upsert
    root = str(tmp_path / "pm_up_part")
    df = pd.DataFrame({"ds": ["d1", "d1", "d2"], "k": ["a", "b", "a"],
                       "v": np.array([1, 2, 3], np.int64)})
    paimon_upsert(root, df, primary_keys=["ds", "k"],
                  partition_by=["ds"])
    paimon_upsert(root, pd.DataFrame(
        {"ds": ["d1"], "k": ["a"], "v": np.array([10], np.int64)}))
    got = _collect(LakehouseScan("paimon", root))
    key = list(zip(got["ds"].astype(str), got["k"]))
    assert dict(zip(key, got["v"])) == \
        {("d1", "a"): 10, ("d1", "b"): 2, ("d2", "a"): 3}


def test_hudi_upsert_routes_to_owning_slice(tmp_path):
    """Updates land on the file slice that holds the key (base OR earlier
    log writes); new keys open log-only groups; deletes drop keys."""
    from auron_tpu.connectors.write import (hudi_append, hudi_delete,
                                            hudi_upsert)
    root = str(tmp_path / "hudi_up")
    base = pd.DataFrame({"_hoodie_record_key": ["a", "b"],
                         "k": ["a", "b"], "v": np.array([1, 2], np.int64)})
    hudi_append(root, base)
    # update b, insert d (new key -> log-only group)
    hudi_upsert(root, pd.DataFrame(
        {"_hoodie_record_key": ["b", "d"], "k": ["b", "d"],
         "v": np.array([20, 40], np.int64)}))
    got = _collect(LakehouseScan("hudi", root))
    assert dict(zip(got["k"], got["v"])) == \
        {"a": 1, "b": 20, "d": 40}
    # second upsert of d must route to the SAME log-only group (routing
    # sees committed log keys, not just base keys)
    hudi_upsert(root, pd.DataFrame(
        {"_hoodie_record_key": ["d"], "k": ["d"],
         "v": np.array([400], np.int64)}))
    got = _collect(LakehouseScan("hudi", root))
    assert dict(zip(got["k"], got["v"])) == \
        {"a": 1, "b": 20, "d": 400}
    assert len(got) == 3  # no duplicate d from a stray second group
    hudi_delete(root, pd.DataFrame({"_hoodie_record_key": ["a", "d"]}))
    got = _collect(LakehouseScan("hudi", root))
    assert dict(zip(got["k"], got["v"])) == {"b": 20}


def test_session_write_lakehouse_modes(tmp_path):
    """The Session-level mode dispatch drives all three writers."""
    from auron_tpu.plan import builder as _b  # Session.table
    s = Session()
    root = str(tmp_path / "sess_ice")
    s.write_lakehouse(pd.DataFrame(
        {"k": ["a", "b"], "v": np.array([1, 2], np.int64)}), root)
    s.write_lakehouse(pd.DataFrame(
        {"k": ["b"], "v": np.array([9], np.int64)}), root,
        mode="upsert", keys=["k"])
    s.write_lakehouse(pd.DataFrame({"k": ["a"]}), root, mode="delete")
    s.register_lakehouse("t", root, format="iceberg")
    got = s.table("t").collect()
    assert dict(zip(got["k"], got["v"])) == {"b": 9}
