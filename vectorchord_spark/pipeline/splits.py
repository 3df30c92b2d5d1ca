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


def pack_sequences(
    df: DataFrame,
    n_tokens_col: Column | str,
    context_len: int,
    id_col: str = "doc_id",
    n_buckets: int = 64,
    salt: str = "pack",
) -> DataFrame:
    """Map whole documents onto fixed-size training context windows (the
    concat-and-split packing of LLM pre-training dataloaders: documents
    are concatenated into a token stream in a deterministic order and the
    stream is cut every ``context_len`` tokens), without driver state.

    Documents are hash-bucketed (md5, like :func:`split_bucket` — stable
    under repartitioning), ordered by id within their bucket, and the
    bucket's token stream is cut every ``context_len`` tokens. Each doc
    learns which windows it lands in: ``pack_first``/``pack_last`` (0-based
    window numbers within the bucket; a doc longer than the remaining
    window space spans multiple windows) and ``pack_offset`` (token
    position of the doc's first token within its first window). One window
    shuffle partitioned by bucket; buckets bound the sort, so parallelism
    is ``n_buckets``-wide regardless of corpus size. Integral arithmetic
    throughout (long ``div``/``%``), so any engine reproduces the
    assignment bit-for-bit up to the long range of a bucket's cumulative
    token count."""
    from pyspark.sql import Window

    c = F.col(n_tokens_col) if isinstance(n_tokens_col, str) else n_tokens_col
    bucket = (split_bucket(id_col, salt) % F.lit(n_buckets)).alias("pack_bucket")
    w = Window.partitionBy("pack_bucket").orderBy(id_col)
    out = df.withColumn("pack_bucket", bucket).withColumn(
        "_cum", F.sum(c).over(w)
    )
    # `div` is Spark's integral division on longs — exact for the full
    # long range, unlike `/` which routes through double (exact only to
    # 2^53 ≈ 9e15 cumulative tokens). DuckDB's `//` matches bit-for-bit.
    return (
        out.withColumn("_prev", (F.col("_cum") - c).cast("long"))
        .withColumn(
            # the -least(1, c) keeps zero-token docs point-located at their
            # stream position (pack_last == pack_first) instead of inverted
            "_lastt",
            (F.col("_cum") - F.least(F.lit(1), c)).cast("long"),
        )
        .withColumn("pack_first", F.expr(f"_prev div {int(context_len)}"))
        .withColumn("pack_last", F.expr(f"_lastt div {int(context_len)}"))
        .withColumn("pack_offset", F.col("_prev") % F.lit(context_len))
        .drop("_cum", "_prev", "_lastt")
    )


def deterministic_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: str = "shuffle",
    n_buckets: int | None = None,
) -> DataFrame:
    """Deterministic global shuffle — the pre-training export step that
    randomizes example order WITHOUT a full sort and without RNG state.

    Every row gets the md5 key ``seed|id``; rows are hash-distributed into
    ``n_buckets`` output partitions by the key and sorted by it inside
    each partition. The resulting order is a pure function of (ids, seed):
    reproducible across runs, clusters, and engines, and changing ``seed``
    produces an independent permutation. Cost is ONE bounded shuffle +
    in-partition sorts (never a global sort/range-exchange); a 100 TB
    corpus shuffles at whatever ``n_buckets`` parallelism the writer
    wants. Ties are impossible (the key embeds the unique id), so the
    permutation is total.
    """
    if n_buckets is None:
        try:
            n_buckets = int(
                df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
            )
        except ValueError:
            n_buckets = 200
    c = F.col(id_col)
    key = F.md5(F.concat(F.lit(f"{seed}|"), c.cast("string")))
    return (
        df.withColumn("_shuffle_key", key)
        .repartition(int(n_buckets), F.col("_shuffle_key"))
        .sortWithinPartitions("_shuffle_key")
        .drop("_shuffle_key")
    )
