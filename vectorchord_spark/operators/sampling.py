"""Bounded distributed sampling shared by the index builds.

Single-pass per-partition bounded sample, no preliminary count scan: each
partition keeps its cap/n_parts smallest rows by a seeded random key, so
the driver merges ~cap rows instead of sorting the whole table (when cap
exceeds the rows-per-partition a global TakeOrdered/orderBy degenerates
into collect-everything). This is the Spark analogue of the bound the
reference's Feistel TSM sampling enforces (am_build.rs:1306-1311).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bounded_sample_vectors(df: DataFrame, cap: int, seed: int) -> pd.DataFrame:
    """Sample ≤``cap`` rows of ``df``'s ``vec`` column into a pandas frame.

    Deterministic for a fixed (df partitioning, seed). The result must fit
    the driver — callers size ``cap`` for their driver-side k-means step.
    """
    n_parts = max(1, df.rdd.getNumPartitions())
    per_part = -(-cap // n_parts)

    def _local_sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        best: pd.DataFrame | None = None
        for pdf in batches:
            cur = pdf if best is None else pd.concat([best, pdf], ignore_index=True)
            if len(cur) > per_part:
                keep = np.argpartition(cur["_u"].to_numpy(), per_part)[:per_part]
                cur = cur.iloc[keep].reset_index(drop=True)
            best = cur
        if best is not None and len(best):
            yield best[["vec"]]

    return (
        df.select("vec", F.rand(seed).alias("_u"))
        .mapInPandas(_local_sample, "vec array<float>")
        .limit(cap)
        .toPandas()
    )
