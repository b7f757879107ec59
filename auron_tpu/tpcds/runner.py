"""Differential TPC-DS runner (QueryRunner + QueryResultComparator analog).

Executes every query twice — engine vs pandas oracle — and compares row
multisets with double tolerance, the reference's exact methodology
(/root/reference/dev/auron-it/.../QueryResultComparator.scala:39-106).
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional

import numpy as np
import pandas as pd

import auron_tpu.plan.builder  # noqa: F401 (installs Session.table)
from auron_tpu.plan import Session
from auron_tpu.tpcds.datagen import generate
from auron_tpu.tpcds.queries import QUERIES


def rows_key(df: pd.DataFrame, ndigits: int = 4) -> List[tuple]:
    df = df.reindex(sorted(df.columns), axis=1)
    out = []
    for t in df.itertuples(index=False):
        row = []
        for v in t:
            if v is None or (isinstance(v, float) and np.isnan(v)):
                row.append(None)
            elif isinstance(v, (float, np.floating)):
                row.append(round(float(v), ndigits) + 0.0)
            elif isinstance(v, np.integer):
                row.append(int(v))
            else:
                row.append(v)
        out.append(tuple(row))
    return sorted(out, key=lambda r: tuple((x is None, str(x)) for x in r))


def make_session(tables: Dict[str, pd.DataFrame],
                 num_partitions: int = 1) -> Session:
    s = Session()
    for name, df in tables.items():
        parts = num_partitions if name in ("store_sales", "store_returns") \
            else 1
        s.register_pandas(name, df, num_partitions=parts)
    return s


def run_query(name: str, session: Session,
              tables: Dict[str, pd.DataFrame]) -> Dict:
    build, oracle = QUERIES[name]
    t0 = time.perf_counter()
    frame = build(session)
    got = frame.collect()
    t_engine = time.perf_counter() - t0
    t0 = time.perf_counter()
    want = oracle(tables)
    t_oracle = time.perf_counter() - t0
    match = rows_key(got) == rows_key(want)
    return {"query": name, "match": match, "rows": len(got),
            "engine_s": round(t_engine, 4), "oracle_s": round(t_oracle, 4),
            "speedup": round(t_oracle / t_engine, 3) if t_engine > 0 else 0}


def run_all(sf: float = 1.0, num_partitions: int = 1, seed: int = 0,
            skew: float = 0.0, queries: Optional[List[str]] = None
            ) -> List[Dict]:
    tables = generate(sf=sf, seed=seed, skew=skew)
    session = make_session(tables, num_partitions)
    names = queries or list(QUERIES)
    return [run_query(q, session, tables) for q in names]


if __name__ == "__main__":
    import argparse
    import json
    p = argparse.ArgumentParser()
    p.add_argument("--sf", type=float, default=1.0)
    p.add_argument("--partitions", type=int, default=1)
    p.add_argument("--skew", type=float, default=0.0)
    p.add_argument("--queries", nargs="*", default=None)
    a = p.parse_args()
    for r in run_all(a.sf, a.partitions, skew=a.skew, queries=a.queries):
        print(json.dumps(r))
