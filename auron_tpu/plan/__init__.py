"""Physical-plan IR + executor.

The TPU analog of the reference's plan stack: auron.proto's PhysicalPlanNode
vocabulary (/root/reference/native-engine/auron-planner/proto/auron.proto:27-58)
becomes a small tree of frozen dataclasses; PhysicalPlanner::create_plan
(planner.rs:122) becomes :func:`auron_tpu.plan.execute.execute_plan`, which
walks the tree into pure JAX block pipelines that jit/shard_map whole.
"""

from auron_tpu.plan.nodes import (  # noqa: F401
    AggCall, Agg, Coalesce, Debug, Empty, Exchange, Expand, Filter, Generate,
    Join, LakehouseScan, Limit, MemoryScan, ParquetScan, PlanNode, Project,
    Rename, Sort, Union, Window,
)
from auron_tpu.plan.execute import Session, execute_plan  # noqa: F401
