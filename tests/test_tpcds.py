"""TPC-DS differential suite: every query must match its pandas oracle,
single- and multi-partition, plain and skewed (SURVEY.md §4 tier-4 analog)."""

import pytest

from auron_tpu.tpcds.queries import QUERIES
from auron_tpu.tpcds.runner import run_all


@pytest.mark.parametrize("q", list(QUERIES))
def test_query_single_partition(q):
    (r,) = run_all(sf=0.5, num_partitions=1, queries=[q])
    assert r["match"], r


@pytest.mark.parametrize("q", list(QUERIES))
def test_query_multi_partition(q):
    (r,) = run_all(sf=0.5, num_partitions=4, queries=[q])
    assert r["match"], r


def test_query_skewed_keys():
    for r in run_all(sf=0.5, num_partitions=4, skew=0.5,
                     queries=["q3", "q42"]):
        assert r["match"], r
