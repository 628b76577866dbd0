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


def broadcast_build_subtrees(df: DataFrame) -> list[str]:
    """Text of every BroadcastExchange build subtree in the executed plan —
    the side that must fit in executor memory (and under the 8 GB broadcast
    hard cap). With ``spark.sql.autoBroadcastJoinThreshold=-1`` any such
    subtree can only come from an explicit ``broadcast()`` hint, which makes
    this the hook for asserting the broadcast *policy*: hints are allowed
    only on fixed-cardinality frames (region/nation) or ≤1-row scalar
    aggregates, never on tables that grow with the data."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()

    def depth(ln: str) -> int:
        m = re.search(r"[+:]- ", ln)
        return m.start() if m else -1

    out: list[str] = []
    for i, ln in enumerate(lines):
        if "BroadcastExchange" not in ln:
            continue
        d = depth(ln)
        sub = [ln]
        for nxt in lines[i + 1 :]:
            nd = depth(nxt)
            if nd != -1 and nd <= d:
                break
            sub.append(nxt)
        out.append("\n".join(sub))
    return out


#: tables whose row count grows linearly with scale factor — a forced
#: broadcast of any of these is correct at sf0.1 and an OOM at 100 TB
SCALING_TABLES = (
    "customer", "orders", "lineitem", "part", "supplier",
    "documents", "embeddings", "events",
)


def forced_broadcast_violations(df: DataFrame) -> list[str]:
    """Broadcast build subtrees that scan an SF-scaling table without
    reducing it to a scalar first. Call with auto-broadcast disabled so
    every broadcast in the plan is hint-driven. A subtree is legitimate if
    it contains a global aggregate (``keys=[]`` → ≤1 row regardless of
    input size); otherwise it must not scan any SCALING_TABLES parquet."""
    bad = []
    for sub in broadcast_build_subtrees(df):
        if re.search(r"HashAggregate\(keys=\[\]", sub):
            continue  # scalar build side: ≤1 row at any scale
        if "ReusedExchange" in sub.splitlines()[0]:
            continue  # leaf reference; the original exchange is checked
        scanned = set(re.findall(r"(\w+)\.parquet", sub))
        hits = scanned & set(SCALING_TABLES)
        if hits:
            bad.append(f"broadcast subtree scans {sorted(hits)}:\n{sub}")
    return bad


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
