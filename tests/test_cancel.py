"""Cooperative cancellation / deadlines (ExecutionContext task-kill parity:
reference rt.rs polls task liveness between batch polls; here the executor
checks a token between plan-node dispatches)."""

import numpy as np
import pandas as pd
import pytest

from auron_tpu.plan import Session
from auron_tpu.plan.builder import table
from auron_tpu.expr.nodes import col
from auron_tpu.runtime.cancel import QueryCancelled


def _session():
    s = Session()
    s.register_pandas("t", pd.DataFrame(
        {"k": np.arange(100) % 5, "v": np.arange(100.0)}))
    return s


def test_cancel_before_run_raises():
    s = _session()
    f = table(s, "t").filter(col("v") > 10).groupby(("k", col("k"))).agg(
        total=("sum", col("v")))
    s.cancel("test kill")
    with pytest.raises(QueryCancelled, match="test kill"):
        f.collect()


def test_cancel_mid_plan_via_udf():
    """A UDF planted mid-pipeline cancels the session; downstream plan
    nodes must never execute."""
    from auron_tpu.expr.nodes import py_udf
    s = _session()
    hit = []

    def bomb(v):
        s.cancel("mid-flight")
        hit.append(1)
        return v

    from auron_tpu.dtypes import FLOAT64
    f = (table(s, "t")
         .with_columns(u=py_udf("bomb", bomb, FLOAT64, col("v")))
         .groupby(("k", col("k"))).agg(total=("sum", col("u"))))
    with pytest.raises(QueryCancelled):
        f.collect()
    assert hit  # the UDF really ran before the kill took effect


def test_deadline_exceeded():
    s = _session()
    s.set_deadline(0.0)
    import time
    time.sleep(0.01)
    with pytest.raises(QueryCancelled, match="deadline"):
        table(s, "t").filter(col("v") > 1).collect()


def test_clear_allows_reuse():
    s = _session()
    s.cancel()
    s.cancel_token.clear()
    got = table(s, "t").filter(col("v") < 3).collect()
    assert len(got) == 3


def test_streaming_cancel():
    import json as _json
    from auron_tpu.streaming import (FieldSpec, JsonDeserializer, MockSource,
                                     StreamingQuery)
    from auron_tpu.dtypes import INT64, FLOAT64

    src = MockSource(num_partitions=2)
    for i in range(50):
        src.append("topic", _json.dumps({"k": i % 3, "v": float(i)}).encode(),
                   partition=i % 2)
    fields = [FieldSpec("k", INT64), FieldSpec("v", FLOAT64)]
    q = StreamingQuery(src, JsonDeserializer(fields), batch_rows=8)
    assert q.process_batch() > 0
    q.cancel()
    with pytest.raises(QueryCancelled):
        q.process_batch()


def test_http_cancel_endpoint():
    import json
    import urllib.request
    from auron_tpu.runtime.http import start_observability
    s = _session()
    srv = start_observability(s)
    try:
        with urllib.request.urlopen(f"{srv.url}/cancel") as r:
            assert json.loads(r.read())["cancelled"]
        with pytest.raises(QueryCancelled):
            table(s, "t").collect()
    finally:
        srv.shutdown()
