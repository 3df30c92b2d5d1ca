"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` /
``oracle_sql()`` expose the full operator catalog (see
``vectorchord_spark/queries.py``) for the DuckDB-oracle correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full IVF pipeline (sample → k-means → rotate → encode →
    partition-pruned probe → guaranteed rerank) on /root/testdata/sf0.001."""
    from vectorchord_spark.queries import catalog

    return catalog()["ann_ivf_exhaustive"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from vectorchord_spark.queries import catalog

    return {name: q.fn for name, q in catalog().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each entry in ``queries()`` (omitted for
    genuinely non-SQL-expressible operators → rows-only check)."""
    from vectorchord_spark.queries import catalog

    return {name: q.sql for name, q in catalog().items() if q.sql is not None}
