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
Project
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


def test_broadcast_from_derived_dimension():
    """A filtered JOIN of two small dims is provably small (unique-build
    stats), so joining it against the fact side chooses broadcast — the
    AuronConvertStrategy.scala:126-194 sizing analog. The old scan-chain
    walk returned None for any derived build side."""
    import numpy as np
    import pandas as pd
    from auron_tpu.expr.nodes import col, lit
    from auron_tpu.plan import Session
    from auron_tpu.plan.builder import table
    rng = np.random.default_rng(51)
    fact = pd.DataFrame({"k": rng.integers(0, 50, 5000).astype(np.int64),
                         "v": rng.normal(size=5000)})
    d1 = pd.DataFrame({"a": np.arange(50, dtype=np.int64),
                       "x": rng.integers(0, 5, 50).astype(np.int64)})
    d2 = pd.DataFrame({"b": np.arange(50, dtype=np.int64),
                       "y": rng.normal(size=50)})
    s = Session()
    s.register_pandas("fact", fact, num_partitions=4)
    s.register_pandas("d1", d1)
    s.register_pandas("d2", d2)
    derived = (table(s, "d1").filter(col("x") > lit(1))
               .join(table(s, "d2"), ("a",), ("b",)))
    j = table(s, "fact").join(derived, ("k",), ("a",))
    assert j.plan.strategy == "broadcast", j.plan.strategy
    got = j.collect()
    want = (fact.merge(d1[d1["x"] > 1].merge(d2, left_on="a",
                                             right_on="b"),
                       left_on="k", right_on="a"))
    assert len(got) == len(want)
