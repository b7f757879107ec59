"""Plan-stability goldens — the physical plan shape of every TPC-DS query.

Reference analog: dev/auron-it PlanStabilityChecker.scala:30-115, which
diffs normalized plans against goldens to catch conversion regressions.
Here the "conversion" under test is the Frame builder + prune + stats
passes: exchange placement, join strategy choice, dense-hint assignment.
"""

import pytest

from auron_tpu.plan.prune import prune_plan
from auron_tpu.plan.stats import annotate_plan
from auron_tpu.tpcds.datagen import generate
from auron_tpu.tpcds.queries import QUERIES
from auron_tpu.tpcds.runner import make_session


def _normalized_plan(name: str, num_partitions: int) -> str:
    tables = generate(sf=0.2, seed=0)
    s = make_session(tables, num_partitions)
    build, _ = QUERIES[name]
    plan = annotate_plan(prune_plan(build(s).plan, s), s)

    lines = []

    def walk(node, depth):
        desc = type(node).__name__
        extra = []
        if hasattr(node, "strategy"):
            extra.append(node.strategy)
            if getattr(node, "build_unique", False):
                extra.append("unique-build")
        if hasattr(node, "mode"):
            extra.append(node.mode)
            if getattr(node, "domains", ()):
                extra.append("dense")
        if hasattr(node, "partitioning"):
            extra.append(type(node.partitioning).__name__)
        lines.append("  " * depth + desc +
                     (f"[{','.join(extra)}]" if extra else ""))
        for c in node.children:
            walk(c, depth + 1)

    walk(plan, 0)
    return "\n".join(lines)


GOLDENS_1P = {
    "q3": """\
Sort
  Agg[single,dense]
    Join[broadcast,unique-build]
      Join[broadcast,unique-build]
        MemoryScan
        Filter
          MemoryScan
      Filter
        MemoryScan""",
    "q42": """\
Sort
  Agg[single,dense]
    Join[broadcast,unique-build]
      Join[broadcast,unique-build]
        MemoryScan
        Filter
          MemoryScan
      Filter
        MemoryScan""",
}


@pytest.mark.parametrize("q", list(GOLDENS_1P))
def test_plan_stability_single_partition(q):
    got = _normalized_plan(q, 1)
    assert got == GOLDENS_1P[q], f"plan changed for {q}:\n{got}"


def test_multi_partition_inserts_exchanges():
    got = _normalized_plan("q3", 4)
    # partial/final agg split with a hash exchange between
    assert "Agg[partial,dense]" in got
    assert "Agg[final,dense]" in got
    assert "Exchange[HashPartitioning]" in got
    # dimension joins stay broadcast + unique-build
    assert got.count("unique-build") == 2


def test_unique_build_detected_across_queries():
    # every dim join in the q3/q42/q52/q55 family must hit the fast path
    for q in ("q3", "q42", "q52", "q55"):
        got = _normalized_plan(q, 1)
        assert "unique-build" in got, q
