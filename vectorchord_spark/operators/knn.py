"""Exact (brute-force) k-NN — the baseline every index is measured against.

One Catalyst expression + TakeOrderedAndProject: scales linearly with a full
scan but parallelizes perfectly and needs no index. This is also the
ground-truth oracle for `evaluate_query_recall`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectorchord_spark.functions import distances as D


def knn_exact(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: "list[float]",
    k: int = 10,
    metric: str = "l2",
) -> DataFrame:
    """Exact top-k by output-space distance; returns (id, dist) ordered."""
    dist = D.output_distance(metric, vec_col, D.vec_lit([float(x) for x in query]))
    return (
        df.select(F.col(id_col).alias("id"), dist.alias("dist"))
        .orderBy("dist", "id")
        .limit(int(k))
    )
