"""Plan inspection helpers — the "explain and iterate" loop as an API.

``audit(df)`` extracts the scale-relevant properties of a DataFrame's
physical plan (pushdown, pruning, join strategies, top-k lowering,
exchanges) so they can be asserted in tests or printed in a review.
tests/test_plans.py locks these properties for the headline queries.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanAudit:
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    broadcast_hash_joins: int = 0
    sort_merge_joins: int = 0
    shuffled_hash_joins: int = 0
    broadcast_nested_loop_joins: int = 0
    cartesian_products: int = 0
    exchanges: int = 0
    take_ordered: bool = False
    has_python_stage: bool = False

    @property
    def joins(self) -> int:
        return (
            self.broadcast_hash_joins
            + self.sort_merge_joins
            + self.shuffled_hash_joins
            + self.broadcast_nested_loop_joins
            + self.cartesian_products
        )


def audit(df: DataFrame) -> PlanAudit:
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    formatted = df._jdf.queryExecution().explainString(mode)
    executed = df._jdf.queryExecution().executedPlan().toString()
    out = PlanAudit()
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted):
        if m.group(1).strip():
            out.pushed_filters.append(m.group(1).strip())
    for m in re.finditer(r"ReadSchema: (struct<[^\n]*)", formatted):
        out.read_schemas.append(m.group(1).strip())
    out.broadcast_hash_joins = executed.count("BroadcastHashJoin")
    out.sort_merge_joins = executed.count("SortMergeJoin")
    out.shuffled_hash_joins = executed.count("ShuffledHashJoin")
    out.broadcast_nested_loop_joins = executed.count("BroadcastNestedLoopJoin")
    out.cartesian_products = executed.count("CartesianProduct")
    out.exchanges = executed.count("Exchange")
    out.take_ordered = "TakeOrderedAndProject" in executed
    out.has_python_stage = "ArrowEvalPython" in executed or "MapInPandas" in executed or "FlatMapGroupsInPandas" in executed
    return out
