"""Sparse-vector retrieval: hashing-trick embeddings + inverted-index top-k.

The reference ships sparse-vector kernels that never reached its SQL
surface (crates/vector/src/svect.rs; sparse dot product
crates/simd/src/floating_f32.rs:89-97). For LLM data work the useful
re-expression is retrieval-shaped: a deterministic feature-hashing text
embedding stored as sparse (id, bucket, weight) posting rows, and a
sparse dot-product / cosine top-k computed as an inverted-index join —
the SPLADE/BM25 query shape.

100 TB design:

- **Embedding** is explode + one groupBy on (id, bucket): partial-
  aggregable counts, no skew risk beyond stopword buckets (bounded by
  ``dim`` distinct keys per doc).
- **Search** joins the posting table to a BROADCAST query-term set on
  ``bucket`` (the doc side never shuffles for the join), partial-sums
  products per id, and ranks with one TakeOrdered. Norms come from one
  partially-aggregable groupBy over the same posting table.
- **Weights are signed integer counts**, so dot products and norms are
  exact int64 in any engine; the only float op is the final
  ``dot / sqrt(double(n_doc) * n_query)``, which is IEEE-identical
  everywhere given exact integer inputs — the catalog oracle compares
  cosine scores bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vectorchord_spark.pipeline.text import words


def _hash_bucket(word: Column, dim: int) -> Column:
    """Deterministic [0, dim) bucket from md5('hb|' word) — same math as
    the DuckDB oracle (('0x' || substr(md5(..), 1, 6))::BIGINT % dim)."""
    h = F.md5(F.concat(F.lit("hb|"), word))
    return (F.conv(F.substring(h, 1, 6), 16, 10).cast("bigint") % F.lit(dim)).cast(
        "int"
    )


def _hash_sign(word: Column) -> Column:
    """±1 sign from the 7th hex digit of the same md5 (decorrelated from
    the bucket, which uses digits 1-6)."""
    h = F.md5(F.concat(F.lit("hb|"), word))
    return F.when(
        F.conv(F.substring(h, 7, 1), 16, 10).cast("int") % 2 == 0, F.lit(1)
    ).otherwise(F.lit(-1))


def hash_embed_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 1024,
    extra_keys: tuple[str, ...] = (),
    signed: bool = True,
) -> DataFrame:
    """Hashing-trick sparse embedding as posting rows.

    Each word hashes to a bucket in ``[0, dim)`` with a ±1 sign; per-key
    signed counts are the weights (exact integers). Zero-sum collision
    buckets are dropped (they carry no signal and would bloat the
    posting table). ``signed=False`` skips the sign (plain term
    frequencies — the BM25 input). ``extra_keys`` carries sub-document
    keys (e.g. ``chunk_no``) through, making this the chunk-level RAG
    embedding. One shuffle: the (keys, bucket) count groupBy, map-side
    combined.
    """
    keys = [id_col, *extra_keys]
    w = df.select(*keys, F.explode(words(text_col)).alias("_w"))
    s = _hash_sign(F.col("_w")) if signed else F.lit(1)
    terms = (
        w.select(
            *keys,
            _hash_bucket(F.col("_w"), dim).alias("bucket"),
            s.alias("_s"),
        )
        .groupBy(*keys, "bucket")
        .agg(F.sum("_s").cast("bigint").alias("weight"))
        .where(F.col("weight") != 0)
    )
    return terms


def hash_embed_query(spark, text: str, dim: int = 1024) -> DataFrame:
    """Sparse query terms for a literal query string (same hash family as
    :func:`hash_embed_terms`); a one-row driver-side frame, meant to be
    broadcast by :func:`sparse_knn`."""
    q = spark.createDataFrame([(text,)], "text string")
    return hash_embed_terms(q, "text", id_col="text", dim=dim).select(
        "bucket", "weight"
    )


def sparse_knn(
    terms: DataFrame,
    query_terms: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    extra_keys: tuple[str, ...] = (),
    metric: str = "cos",
) -> DataFrame:
    """Inverted-index sparse top-k: broadcast the query's (bucket, weight)
    set against the posting table, partial-sum the products per id, rank
    by cosine (or raw dot) with a deterministic id tiebreak.

    ``terms``/``query_terms`` are posting rows as produced by
    :func:`hash_embed_terms` / :func:`hash_embed_query`. Only documents
    sharing at least one bucket with the query are scored (standard
    inverted-index semantics — a zero-overlap doc has score 0 and can't
    enter a meaningful top-k).
    """
    if metric not in ("cos", "dot"):
        raise ValueError(f"unsupported sparse metric {metric!r}")
    keys = [id_col, *extra_keys]
    q = F.broadcast(
        query_terms.select(F.col("bucket"), F.col("weight").alias("_qw"))
    )
    dots = (
        terms.join(q, "bucket")
        .groupBy(*keys)
        .agg(F.sum(F.col("weight") * F.col("_qw")).alias("dot"))
    )
    if metric == "dot":
        scored = dots.select(*keys, F.col("dot").cast("double").alias("score"))
    else:
        # exact int norms; double only at the final division (bit-stable)
        qnrm = query_terms.agg(
            F.sum(F.col("weight") * F.col("weight")).alias("n")
        ).first()["n"]
        norms = terms.groupBy(*keys).agg(
            F.sum(F.col("weight") * F.col("weight")).alias("nrm")
        )
        scored = dots.join(norms, keys).select(
            *keys,
            (
                F.col("dot")
                / F.sqrt(F.col("nrm").cast("double") * F.lit(float(qnrm)))
            ).alias("score"),
        )
    return scored.orderBy(F.col("score").desc(), *[F.col(c) for c in keys]).limit(
        k
    )


def bm25_topk(
    terms: DataFrame,
    query_terms: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 top-k over the posting layout (the other half of the
    SPLADE/BM25 retrieval shape; Robertson/Lucene formulation with the
    +1-smoothed idf, so scores are always positive).

    ``terms`` should be UNSIGNED counts (``hash_embed_terms(...,
    signed=False)``) — BM25's tf is a frequency, not a projection.

    100 TB shape: document length and per-bucket document frequency are
    both single partially-aggregable groupBys; df is computed only for
    the query's buckets (semi-join first). Driver state is two scalars
    (N, avgdl). The scoring join broadcasts query terms + the tiny df
    table; the posting side never shuffles for them.
    """
    q = query_terms.select("bucket").distinct()
    dl = terms.groupBy(id_col).agg(F.sum("weight").alias("_dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n"), F.avg("_dl").alias("avgdl")
    ).first()
    n_docs, avgdl = int(stats["n"]), float(stats["avgdl"])
    df_tbl = (
        terms.join(F.broadcast(q), "bucket")
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("_df"))
    )
    idf = F.log(
        (F.lit(float(n_docs)) - F.col("_df") + F.lit(0.5))
        / (F.col("_df") + F.lit(0.5))
        + F.lit(1.0)
    )
    tf = F.col("weight").cast("double")
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("_dl") / F.lit(avgdl)
    )
    contrib = idf * tf * F.lit(k1 + 1.0) / (tf + norm)
    scored = (
        terms.join(F.broadcast(q), "bucket")
        .join(F.broadcast(df_tbl), "bucket")
        .join(dl, id_col)
        .groupBy(id_col)
        .agg(F.sum(contrib).alias("score"))
    )
    return scored.orderBy(F.col("score").desc(), id_col).limit(k)


def rrf_fuse(
    ranked: "list[tuple[DataFrame, str, bool]]",
    k: int = 10,
    id_col: str = "doc_id",
    rrf_k: float = 60.0,
) -> DataFrame:
    """Reciprocal-rank fusion of bounded ranked result frames — the
    standard dense+sparse hybrid-retrieval combiner (Cormack et al.'s
    RRF: fused score = Σ_lists 1 / (rrf_k + rank)).

    ``ranked`` is a list of ``(df, score_col, ascending)`` triples: each
    ``df`` must carry ``id_col`` and ``score_col``, with ``ascending=True``
    when smaller is better (distances) and False when larger is better
    (similarities, BM25). Ranks are recomputed here from the score column
    with an ``id_col`` tiebreak, so inputs don't need to arrive sorted.

    Inputs are expected to be top-N frames (the output of a k-NN search /
    ``sparse_knn`` / ``bm25_topk``), so each is at most a few hundred
    rows: the unpartitioned rank window and the fusion groupBy run on
    k-sized data regardless of corpus size — the heavy lifting happened
    inside the per-list retrievals. A document absent from a list simply
    contributes no term for it (standard RRF semantics)."""
    from pyspark.sql import Window

    if not ranked:
        raise ValueError("rrf_fuse needs at least one ranked frame")
    parts = []
    for df, score_col, ascending in ranked:
        key = F.col(score_col).asc() if ascending else F.col(score_col).desc()
        w = Window.orderBy(key, F.col(id_col))
        parts.append(
            df.select(F.col(id_col), F.row_number().over(w).alias("_r"))
        )
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    fused = allp.groupBy(id_col).agg(
        F.sum(F.lit(1.0) / (F.lit(float(rrf_k)) + F.col("_r"))).alias("score")
    )
    return fused.orderBy(F.col("score").desc(), id_col).limit(k)
