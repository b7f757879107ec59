"""Observability HTTP service (reference auron/src/http/: random-port
in-process server with profiling + metrics endpoints)."""

import json
import urllib.request

import numpy as np
import pandas as pd

from auron_tpu.plan import Session
from auron_tpu.plan.builder import table
from auron_tpu.runtime.http import start_observability


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read().decode())


def test_endpoints():
    s = Session()
    s.register_pandas("t", pd.DataFrame(
        {"a": np.arange(100, dtype=np.int64)}))
    from auron_tpu.expr.nodes import col, lit
    table(s, "t").filter(col("a") > lit(10)).collect()
    srv = start_observability(s)
    try:
        st = _get(srv.url + "/status")
        assert st["ok"] and st["devices"]
        cfg = _get(srv.url + "/config")
        assert "auron.overflow.check" in cfg
        m = _get(srv.url + "/metrics")
        assert isinstance(m, dict)
        prof = _get(srv.url + "/profile?seconds=0.2")
        assert prof["trace_dir"]
        err = urllib.request.urlopen(srv.url + "/nope", timeout=10)
    except urllib.error.HTTPError as e:
        assert e.code == 404
    finally:
        srv.shutdown()


def test_memory_dump_endpoint():
    s = Session()
    s.register_pandas("big", pd.DataFrame(
        {"a": np.arange(1000, dtype=np.int64)}), num_partitions=None)
    srv = start_observability(s)
    try:
        rep = _get(srv.url + "/memory")["report"]
        assert "memory budget" in rep and "big" in rep
    finally:
        srv.shutdown()
