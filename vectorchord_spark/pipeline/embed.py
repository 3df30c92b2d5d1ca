"""Embedding transform operators.

The table-scale transforms a training-data pipeline applies to embedding
columns before indexing/dedup: L2 normalization, dimensionality reduction
(PCA fit on a bounded sample → broadcast projection), and random projection.
All follow the engine's standard shape: bounded driver-side fit, broadcast
model, Arrow-batched vectorized apply.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectorchord_spark.functions import distances as D


def normalize_embeddings(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """L2-normalize an embedding column (JVM-side expression)."""
    return df.withColumn(vec_col, D.normalize(vec_col).cast("array<float>"))


def fit_pca(
    df: DataFrame,
    vec_col: str = "embedding",
    out_dim: int = 16,
    sample_cap: int = 100_000,
    seed: int = 42,
) -> dict:
    """Fit a PCA projection on a bounded sample (driver SVD); returns the
    model dict {mean, components} to pass to :func:`project_embeddings`."""
    total = df.count()
    fraction = min(1.0, (sample_cap * 1.3) / max(total, 1))
    sample = (
        df.select(vec_col).sample(fraction=fraction, seed=seed).limit(sample_cap).toPandas()
    )
    mat = np.stack(sample[vec_col].to_numpy()).astype(np.float64)
    mean = mat.mean(axis=0)
    centered = mat - mean
    _u, _s, vt = np.linalg.svd(centered, full_matrices=False)
    return {"mean": mean, "components": vt[:out_dim]}


def project_embeddings(
    df: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    out_col: str = "projected",
) -> DataFrame:
    """Apply a fitted PCA model: one broadcast matmul per Arrow batch."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(
        (np.asarray(model["mean"], np.float64), np.asarray(model["components"], np.float64))
    )
    other = [c for c in df.columns if c != vec_col]
    out_schema = ", ".join(
        f"{c} {df.schema[c].dataType.simpleString()}" for c in df.columns
    )
    out_schema += f", {out_col} array<float>"

    def apply(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mean, comps = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack([np.asarray(v, np.float64) for v in pdf[vec_col]])
            proj = (mat - mean) @ comps.T
            out = pdf.copy()
            out[out_col] = list(proj.astype(np.float32))
            yield out

    _ = other
    return df.mapInPandas(apply, out_schema)


def random_projection(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "projected",
    out_dim: int = 16,
    dim: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Gaussian random projection (Johnson-Lindenstrauss) as a pure JVM
    expression — no Python in the hot path."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(out_dim, dim)) / np.sqrt(out_dim)
    cols = [
        D.dot(vec_col, D.vec_lit([float(x) for x in planes[j]])).cast("float")
        for j in range(out_dim)
    ]
    return df.withColumn(out_col, F.array(*cols))
