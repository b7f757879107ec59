"""Adaptive partial-agg skipping: both branches must be correct.

Reference behavior: PARTIAL_AGG_SKIPPING_* (conf.rs:39-42, agg_table.rs:448)
— high-cardinality partials pass rows through; the final agg still produces
exact results.
"""

import numpy as np
import pandas as pd
import pytest

from auron_tpu import config
from auron_tpu.expr.nodes import col
from auron_tpu.parallel.partition import HashPartitioning
from auron_tpu.plan import (Agg, AggCall, Exchange, MemoryScan, Session,
                            execute_plan)

from conftest import sorted_rows


def _run(df, npart=2):
    s = Session().register_pandas("t", df, num_partitions=npart)
    partial = Agg(MemoryScan("t"), keys=(("k", col("k")),),
                  calls=(AggCall("s", "sum", col("v")),
                         AggCall("c", "count_star"),
                         AggCall("mn", "min", col("v"))),
                  mode="partial")
    final = Agg(Exchange(partial, HashPartitioning(("k",), npart)),
                keys=(("k", col("k")),),
                calls=(AggCall("s", "sum", col("v")),
                       AggCall("c", "count_star"),
                       AggCall("mn", "min", col("v"))),
                mode="final")
    blocks = execute_plan(final, s)
    return pd.concat([b.to_pandas() for b in blocks], ignore_index=True)


@pytest.mark.parametrize("cardinality", [10, 100_000])
def test_partial_skip_both_branches(rng, cardinality):
    n = 3000
    df = pd.DataFrame({"k": rng.integers(0, cardinality, n),
                       "v": rng.normal(size=n).round(3)})
    want = df.groupby("k").agg(s=("v", "sum"), c=("v", "size"),
                               mn=("v", "min")).reset_index()
    with config.conf.scoped(**{
            "auron.agg.partial.skip.enable": True,
            "auron.agg.partial.skip.min.rows": 256}):
        got = _run(df)
    assert sorted_rows(got) == sorted_rows(want)
    # and with skipping disabled results are identical
    with config.conf.scoped(**{"auron.agg.partial.skip.enable": False}):
        got2 = _run(df)
    assert sorted_rows(got2) == sorted_rows(want)


def test_domain_hints_direct_path(rng):
    """Int-key direct aggregation with domain hints == sorted-path result;
    violated hints fall back to the sorted path (eager validation)."""
    import auron_tpu.plan.builder  # noqa: F401
    n = 2000
    df = pd.DataFrame({"y": rng.integers(1998, 2004, n),
                       "v": rng.normal(size=n).round(3)})
    s = Session().register_pandas("t", df, num_partitions=2)
    want = df.groupby("y").agg(sm=("v", "sum"), c=("v", "size")).reset_index()

    got = (s.table("t").groupby("y")
           .agg(domains={"y": (1998, 2005)},
                sm=("sum", col("v")), c=("count_star", None)).collect())
    assert sorted_rows(got) == sorted_rows(want)

    # hint too narrow -> eager validation rejects it, sorted path used,
    # result still exact
    got = (s.table("t").groupby("y")
           .agg(domains={"y": (1998, 2000)},
                sm=("sum", col("v")), c=("count_star", None)).collect())
    assert sorted_rows(got) == sorted_rows(want)
