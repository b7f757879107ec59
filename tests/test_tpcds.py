"""TPC-DS differential suite: every query must match its pandas oracle,
single- and multi-partition, plain and skewed (SURVEY.md §4 tier-4 analog)."""

import pytest

from auron_tpu.tpcds.queries import QUERIES
from auron_tpu.tpcds.runner import run_all


# rollup flagships run 9 grouping sets per execution — smaller sf keeps the
# suite's wall time bounded without losing the differential coverage
_HEAVY_SF = {"q67": 0.15, "q36": 0.3, "q25": 0.3, "q29": 0.3,
             "q47": 0.25, "q57": 0.25}


@pytest.mark.parametrize("q", list(QUERIES))
def test_query_single_partition(q):
    (r,) = run_all(sf=_HEAVY_SF.get(q, 0.5), num_partitions=1, queries=[q])
    assert r["match"], r


@pytest.mark.parametrize("q", list(QUERIES))
def test_query_multi_partition(q):
    (r,) = run_all(sf=_HEAVY_SF.get(q, 0.5), num_partitions=4, queries=[q])
    assert r["match"], r


def test_query_skewed_keys():
    for r in run_all(sf=0.5, num_partitions=4, skew=0.5,
                     queries=["q3", "q42"]):
        assert r["match"], r
