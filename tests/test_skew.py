"""Skew handler: heavy-hitter keys must survive a skewed exchange intact.

This capability has no reference implementation to diff against (Auron
delegates skew to Spark AQE; SURVEY.md §2.5) — the oracle is pandas and the
invariant is: with a key owning ~50% of all rows and a per-pair exchange
capacity that plain hash routing would overflow, the skewed join still
returns exactly the right rows.
"""

import jax
import numpy as np
import pandas as pd
import pytest
from jax.sharding import Mesh

from auron_tpu.block import TableBlock
from auron_tpu.parallel.partition import HashPartitioning
from auron_tpu.parallel.spmd import run_plan_spmd, unstack_result
from auron_tpu.plan import Exchange, Join, MemoryScan

from conftest import sorted_rows


def _mesh():
    return Mesh(np.array(jax.devices()[:8]), ("p",))


@pytest.fixture
def skewed_data(rng):
    n = 4000
    # key 7 owns half of all rows — plain pmod routing would put ~2000 rows
    # on one device (pair capacity 2*512/8=128 per src => 8*128=1024 max)
    keys = np.where(rng.random(n) < 0.5, 7, rng.integers(0, 100, n))
    fact = pd.DataFrame({"k": keys.astype(np.int64),
                         "v": rng.normal(size=n).round(3)})
    dim = pd.DataFrame({"k2": np.arange(100, dtype=np.int64),
                        "name": np.arange(100, dtype=np.int64) * 10})
    return fact, dim


def _tables(fact, dim):
    parts = np.array_split(np.arange(len(fact)), 8)
    return {"fact": [TableBlock.from_pandas(fact.iloc[i], capacity=512)
                     for i in parts],
            "dim": [TableBlock.from_pandas(dim, capacity=128)]}


def test_plain_hash_exchange_overflows(skewed_data):
    """Sanity: plain hash routing DOES overflow the pair lanes here — with
    the overflow check disabled rows are lost, and with the default regrow
    mode the exchange recovers every row (at the cost of a re-run). The skew
    handler exists to avoid both the imbalance and the regrow."""
    from auron_tpu import config
    fact, dim = skewed_data
    tables = _tables(fact, dim)
    plan = Exchange(MemoryScan("fact"), HashPartitioning(("k",), 8))
    with config.conf.scoped(auron__overflow__check="off"):
        stacked = run_plan_spmd(plan, _mesh(), tables)
    total = sum(int(np.asarray(b.row_mask).sum())
                for b in unstack_result(stacked))
    assert total < len(fact)  # unchecked routing drops the hot key's rows
    stacked = run_plan_spmd(plan, _mesh(), tables)  # default: regrow
    total = sum(int(np.asarray(b.row_mask).sum())
                for b in unstack_result(stacked))
    assert total == len(fact)  # never-lose-a-row


@pytest.mark.parametrize("jt", ["inner", "left", "left_semi", "left_anti"])
def test_skewed_join_exact(skewed_data, jt):
    fact, dim = skewed_data
    tables = _tables(fact, dim)
    plan = Join(MemoryScan("fact"), MemoryScan("dim"), ("k",), ("k2",),
                join_type=jt, strategy="skewed", out_capacity=2048)
    stacked = run_plan_spmd(plan, _mesh(), tables)
    out = pd.concat([b.to_pandas() for b in unstack_result(stacked)],
                    ignore_index=True)
    if jt == "inner":
        want = fact.merge(dim, left_on="k", right_on="k2")
    elif jt == "left":
        want = fact.merge(dim, left_on="k", right_on="k2", how="left")
    elif jt == "left_semi":
        want = fact[fact["k"].isin(dim["k2"])]
    else:
        want = fact[~fact["k"].isin(dim["k2"])]
    assert sorted_rows(out) == sorted_rows(want)


def test_skewed_join_balances_load(skewed_data):
    fact, dim = skewed_data
    tables = _tables(fact, dim)
    plan = Join(MemoryScan("fact"), MemoryScan("dim"), ("k",), ("k2",),
                join_type="inner", strategy="skewed", out_capacity=2048)
    stacked = run_plan_spmd(plan, _mesh(), tables)
    sizes = [int(np.asarray(b.row_mask).sum())
             for b in unstack_result(stacked)]
    assert sum(sizes) == len(fact)  # all keys in dim -> inner == all rows
    # the hot key's rows must be spread, not funneled to one device
    assert max(sizes) < 0.5 * sum(sizes)


def test_auto_skew_detection(skewed_data):
    """Planner-side auto-skew (no skewed=True anywhere): the partitioned
    join over a hot key is rewritten to the skew-handled form. Proof that
    the rewrite (not capacity regrow) saves the run: overflow check is set
    to 'raise', so un-handled lane overflow would error."""
    from auron_tpu import config
    from auron_tpu.plan import Join
    fact, dim = skewed_data
    tables = _tables(fact, dim)
    plan = Join(
        Exchange(MemoryScan("fact"), HashPartitioning(("k",), 8)),
        Exchange(MemoryScan("dim"), HashPartitioning(("k2",), 8)),
        ("k",), ("k2",), join_type="inner", strategy="partitioned",
        out_capacity=2048)
    with config.conf.scoped(auron__overflow__check="raise"):
        stacked = run_plan_spmd(plan, _mesh(), tables)
    out = pd.concat([b.to_pandas() for b in unstack_result(stacked)],
                    ignore_index=True)
    want = fact.merge(dim, left_on="k", right_on="k2")
    assert sorted_rows(out) == sorted_rows(want)
    # with detection disabled the same plan must overflow-raise
    with config.conf.scoped(auron__skew__detect__enable=False,
                            auron__overflow__check="raise"):
        with pytest.raises(RuntimeError, match="overflow"):
            run_plan_spmd(plan, _mesh(), tables)
