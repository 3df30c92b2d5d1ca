"""Deterministic dataset splits for training pipelines.

Every corpus pipeline ends in a train/val/test split that must be (a)
reproducible across runs and engines, (b) stable under re-partitioning and
insertion order, and (c) computable without a shuffle. Hash-based
bucketing gives all three: the split of a row depends only on its id and
the salt, never on row order or partitioning — so re-running the pipeline
on an updated corpus keeps every surviving row in its original split
(the property random() splits lack).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bucket space; 16-bit md5 prefix mod this (bias < 0.2%, irrelevant for
#: split fractions and identical in every engine that computes md5)
_BUCKETS = 10_000


def split_bucket(id_col: Column | str, salt: str = "split") -> Column:
    """Deterministic [0, 10000) bucket from the md5 of ``salt|id``."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.md5(F.concat(F.lit(f"{salt}|"), c.cast("string")))
    return (
        F.conv(F.substring(h, 1, 4), 16, 10).cast("bigint") % F.lit(_BUCKETS)
    )


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    fractions: dict[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Assign each row a named split by hash bucket.

    ``fractions`` maps split name → fraction (must sum to ≤ 1; any
    remainder falls into the LAST split). Default 90/5/5
    train/val/test. Pure JVM expression — no shuffle, no RNG state; the
    same row always lands in the same split on any cluster."""
    fractions = fractions or {"train": 0.90, "val": 0.05, "test": 0.05}
    names = list(fractions)
    bounds = []
    acc = 0.0
    for n in names[:-1]:
        acc += fractions[n]
        bounds.append(int(round(acc * _BUCKETS)))
    b = split_bucket(id_col, salt)
    # CASE bucket < bound_0 → names[0] ... ELSE last name
    expr = None
    for name, bound in zip(names[:-1], bounds):
        cond = b < F.lit(bound)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    group_col: str,
    rates: dict,
    id_col: str = "doc_id",
    salt: str = "sample",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-group downsampling (domain mixing / rebalancing).

    The standard last-mile op of a training-data pipeline: resample a
    corpus to target per-domain (or per-language, per-source) keep rates.
    ``rates`` maps a ``group_col`` value → keep fraction; groups not
    listed keep ``default_rate``. Selection is the same md5 bucketing as
    :func:`hash_split` (bucket(salt|id) < rate·10000), so it is
    reproducible across runs and engines, stable under re-partitioning
    and corpus growth (a surviving row stays selected when the corpus is
    extended), and composes with ``hash_split`` — use a DIFFERENT salt so
    sampling and splitting are independent hashes. Pure JVM expression:
    no shuffle, no RNG state, filter-pushdown-friendly."""
    b = split_bucket(id_col, salt)
    g = F.col(group_col)
    expr = None
    for gval, rate in rates.items():
        cond = g == F.lit(gval)
        keep = b < F.lit(int(round(float(rate) * _BUCKETS)))
        expr = F.when(cond, keep) if expr is None else expr.when(cond, keep)
    default_keep = b < F.lit(int(round(float(default_rate) * _BUCKETS)))
    expr = default_keep if expr is None else expr.otherwise(default_keep)
    return df.where(expr)


def mixture_weights(
    df: DataFrame,
    group_col: str,
    alpha: float = 0.5,
    target_fraction: float | None = None,
) -> DataFrame:
    """Temperature-scaled domain-mixing weights (the published multinomial
    sampling recipe: sample group g with probability p_g ∝ n_g^alpha,
    alpha < 1 upweights small domains).

    Returns one row per group: ``n_rows``, normalized ``weight`` (p_g)
    and — when ``target_fraction`` of the corpus is the sampling budget —
    the per-group keep ``rate`` realizing the mixture from the raw corpus
    (rate_g = min(1, target·total·p_g / n_g)), which feeds
    :func:`stratified_sample` directly. One count aggregation plus a
    window over the (small) group table — the group cardinality, not the
    corpus, bounds every post-agg step."""
    from pyspark.sql import Window

    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_rows"))
    w = Window.partitionBy()
    raw = F.pow(F.col("n_rows").cast("double"), F.lit(float(alpha)))
    out = counts.withColumn("weight", raw / F.sum(raw).over(w))
    if target_fraction is not None:
        total = F.sum("n_rows").over(w).cast("double")
        out = out.withColumn(
            "rate",
            F.least(
                F.lit(1.0),
                F.lit(float(target_fraction))
                * total
                * F.col("weight")
                / F.col("n_rows").cast("double"),
            ),
        )
    return out
