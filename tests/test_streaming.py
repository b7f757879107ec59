"""Streaming front-end differential tests: micro-batch ingestion must give
EXACTLY the answer the batch engine (and pandas) gives over the union of
all records, regardless of batch boundaries, replay, or restarts —
the kafka_mock_scan_exec.rs:466 test posture applied to the TPU design."""

import json

import numpy as np
import pandas as pd
import pytest

from auron_tpu.dtypes import FLOAT64, INT64, STRING
from auron_tpu.block import TableBlock
from auron_tpu.expr.nodes import col, lit
from auron_tpu.plan import AggCall, Filter, Join
from auron_tpu.streaming import (FieldSpec, JsonDeserializer, MockSource,
                                 StreamingQuery)


def _mk_source(n=500, seed=3, partitions=2):
    rng = np.random.default_rng(seed)
    src = MockSource(num_partitions=partitions)
    rows = []
    for i in range(n):
        row = {"k": int(rng.integers(0, 12)),
               "v": float(np.round(rng.normal(), 4)),
               "tag": ["a", "b", "c"][int(rng.integers(0, 3))]}
        if i % 17 == 0:
            row.pop("v")  # missing field -> NULL
        rows.append(row)
        src.append("t", json.dumps(row).encode(), partition=i % partitions)
    df = pd.DataFrame([{**r, "v": r.get("v", np.nan)} for r in rows])
    return src, df


_FIELDS = [FieldSpec("k", INT64), FieldSpec("v", FLOAT64),
           FieldSpec("tag", STRING)]


def _oracle(df):
    f = df[df["v"].fillna(-10.0) > -0.5]
    out = f.groupby("k").agg(s=("v", "sum"), c=("v", "count"),
                             m=("v", "max"), a=("v", "mean")).reset_index()
    return out.sort_values("k").reset_index(drop=True)


def _query(src, batch_rows):
    return StreamingQuery(
        src, JsonDeserializer(_FIELDS),
        transform=lambda scan: Filter(scan, col("v") > lit(-0.5)),
        group_keys=("k",),
        calls=(AggCall("s", "sum", col("v")),
               AggCall("c", "count", col("v")),
               AggCall("m", "max", col("v")),
               AggCall("a", "avg", col("v"))),
        batch_rows=batch_rows)


def _check(got, want):
    got = got.sort_values("k").reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["k"].to_numpy() == want["k"].to_numpy()).all()
    for c_ in ("s", "c", "m", "a"):
        np.testing.assert_allclose(got[c_].to_numpy(dtype=float),
                                   want[c_].to_numpy(dtype=float),
                                   rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("batch_rows", [64, 512])
def test_stateful_agg_matches_batch_oracle(batch_rows):
    src, df = _mk_source()
    q = _query(src, batch_rows)
    n = q.process_available()
    assert n == len(df) and q.lag() == 0
    _check(q.result(), _oracle(df))
    # late arrivals: results incorporate post-drain appends exactly
    late = [{"k": 3, "v": 2.5, "tag": "a"}, {"k": 99, "v": 1.0, "tag": "b"}]
    for r in late:
        src.append("t", json.dumps(r).encode())
    assert q.process_available() == 2
    df2 = pd.concat([df, pd.DataFrame(late)], ignore_index=True)
    _check(q.result(), _oracle(df2))


def test_checkpoint_restore_exactly_once(tmp_path):
    src, df = _mk_source(n=300)
    q = _query(src, 64)
    for _ in range(3):
        q.process_batch()
    ck = str(tmp_path / "state.ckpt")
    q.checkpoint(ck)
    seen = q.records_processed
    # crash: a NEW query restored from the checkpoint must not double-count
    # the replayed records nor lose the unreached ones
    q2 = _query(src, 64).restore(ck)
    assert q2.records_processed == seen
    q2.process_available()
    _check(q2.result(), _oracle(df))


def test_stateless_pipe_and_metadata():
    src = MockSource()
    for i in range(10):
        src.append("t", json.dumps({"k": i, "v": float(i)}).encode())
    q = StreamingQuery(
        src, JsonDeserializer([FieldSpec("k", INT64),
                               FieldSpec("v", FLOAT64)],
                              metadata=["__offset"]),
        transform=lambda scan: Filter(scan, col("k") >= lit(5)),
        batch_rows=4)
    q.process_available()
    out = q.result()
    assert sorted(out["k"]) == [5, 6, 7, 8, 9]
    assert (out["__offset"].to_numpy() == out["k"].to_numpy()).all()


def test_stream_static_dimension_join():
    src, df = _mk_source(n=200)
    dim = pd.DataFrame({"k2": np.arange(12, dtype=np.int64),
                        "grp": (np.arange(12) % 4).astype(np.int64)})
    from auron_tpu.plan import MemoryScan
    q = StreamingQuery(
        src, JsonDeserializer(_FIELDS),
        transform=lambda scan: Join(scan, MemoryScan("dim"),
                                    ("k",), ("k2",)),
        group_keys=("grp",),
        calls=(AggCall("c", "count_star"),),
        static_tables={"dim": TableBlock.from_pandas(dim)},
        batch_rows=64)
    q.process_available()
    got = q.result().sort_values("grp").reset_index(drop=True)
    want = (df.merge(dim, left_on="k", right_on="k2").groupby("grp")
            .size().rename("c").reset_index())
    assert (got["grp"].to_numpy() == want["grp"].to_numpy()).all()
    assert (got["c"].to_numpy() == want["c"].to_numpy()).all()


def test_json_lenient_nulls_and_bad_records():
    src = MockSource()
    src.append("t", b"not json at all")
    src.append("t", json.dumps({"k": "xyz", "v": "1.5"}).encode())
    src.append("t", json.dumps({"k": 7, "v": None}).encode())
    q = StreamingQuery(src, JsonDeserializer(
        [FieldSpec("k", INT64), FieldSpec("v", FLOAT64)]), batch_rows=8)
    q.process_available()
    out = q.result()
    assert len(out) == 3
    ks = out["k"].tolist()
    assert pd.isna(ks[0]) and pd.isna(ks[1]) and ks[2] == 7
    assert out["v"].tolist()[1] == 1.5 and pd.isna(out["v"].tolist()[2])


def test_string_group_keys_across_batch_dictionaries():
    # per-batch dictionaries differ; the state merge must unify them
    src = MockSource()
    rows = [{"tag": t, "v": 1.0} for t in
            ["pear", "apple", "fig", "apple", "pear", "kiwi", "fig"]]
    for r in rows:
        src.append("t", json.dumps(r).encode())
    q = StreamingQuery(
        src, JsonDeserializer([FieldSpec("tag", STRING),
                               FieldSpec("v", FLOAT64)]),
        group_keys=("tag",), calls=(AggCall("c", "count_star"),),
        batch_rows=2)  # force many tiny batches with disjoint dicts
    q.process_available()
    got = q.result().sort_values("tag").reset_index(drop=True)
    want = (pd.DataFrame(rows).groupby("tag").size().rename("c")
            .reset_index().sort_values("tag").reset_index(drop=True))
    assert got["tag"].tolist() == want["tag"].tolist()
    assert got["c"].tolist() == want["c"].tolist()


def test_protobuf_deserializer():
    pytest.importorskip("google.protobuf")
    from google.protobuf import descriptor_pb2, descriptor_pool, message_factory

    pool = descriptor_pool.DescriptorPool()
    fproto = descriptor_pb2.FileDescriptorProto()
    fproto.name = "evt.proto"
    fproto.package = "evt"
    m = fproto.message_type.add()
    m.name = "Event"
    f1 = m.field.add()
    f1.name, f1.number, f1.type = "k", 1, f1.TYPE_INT64
    f2 = m.field.add()
    f2.name, f2.number, f2.type = "v", 2, f2.TYPE_DOUBLE
    pool.Add(fproto)
    cls = message_factory.GetMessageClass(pool.FindMessageTypeByName(
        "evt.Event"))

    src = MockSource()
    for i in range(6):
        msg = cls(k=i % 3, v=float(i))
        src.append("t", msg.SerializeToString())
    from auron_tpu.streaming import PbDeserializer
    q = StreamingQuery(
        src, PbDeserializer(cls, [FieldSpec("k", INT64),
                                  FieldSpec("v", FLOAT64)]),
        group_keys=("k",), calls=(AggCall("s", "sum", col("v")),),
        batch_rows=4)
    q.process_available()
    got = q.result().sort_values("k").reset_index(drop=True)
    assert got["s"].tolist() == [0.0 + 3.0, 1.0 + 4.0, 2.0 + 5.0]
