"""Physical-plan inspection helpers.

The engine's performance contracts are plan shapes, not vibes: probed
searches must show PartitionFilters on the codes scan, scans must show
pruned ReadSchema/PushedFilters, candidate reranks must broadcast. These
helpers extract those facts from ``explain("formatted")`` output so tests
can assert them (the Spark analogue of the reference's
``pushdown_plan.slt`` EXPLAIN assertions).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's file scans."""
    text = explain_str(df)
    out = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        if m.group(1).strip():
            out.extend(s.strip() for s in m.group(1).split(","))
    return out


def partition_filters(df: DataFrame) -> list[str]:
    """All PartitionFilters entries (partition-pruned scans)."""
    text = explain_str(df)
    out = []
    for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", text):
        if m.group(1).strip():
            out.extend(s.strip() for s in m.group(1).split(","))
    return out


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df) or "BroadcastNestedLoopJoin" in explain_str(df)


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of each scan — evidence of column pruning."""
    text = explain_str(df)
    return [m.group(1) for m in re.finditer(r"ReadSchema: (struct<[^>]*>)", text)]


def whole_stage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen regions (wider = more of the plan fused
    into generated JVM code)."""
    text = explain_str(df)
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", text)))
