"""r13 interleaved A/B for the token-scoring path (quality_learned /
dsir_resample): variants of the featurization, same session, alternating
runs, collect() equality asserted.

V0 = r12 production shape: _t = concat_ws(text, bigram-string) -> explode
     (string round-trip: the bigram array is joined to one big string,
     concatenated to the text, and re-split).
V1 = direct token array: concat(words, bigram-array) -> explode_outer
     (no giant-string build, no re-split; same tokens by construction).
V2 = V1 minus the weights join: count-only (locates the explode/hash cost).

Usage: RUNS=5 python tools/profile_r13_score.py
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
from pyspark.sql import functions as F


def v1_token_buckets(df, text_col, id_col, dim, bigrams):
    """Direct-array featurization: tokens = words ++ bigram tokens."""
    from vectorchord_spark.pipeline.sparse import _hash_bucket
    from vectorchord_spark.pipeline.text import words

    t = F.coalesce(F.col(text_col), F.lit("")) if bigrams else F.col(text_col)

    def per_words(w):
        cnt = F.size(w)
        grams = F.transform(
            F.sequence(F.lit(1), cnt - 1),
            lambda i: F.concat_ws(
                "_", F.element_at(w, i), F.element_at(w, i + 1)
            ),
        )
        return F.concat(
            w,
            F.when(cnt >= 2, grams).otherwise(F.array().cast("array<string>")),
        )

    toks = (
        F.element_at(F.transform(F.array(words(t)), per_words), 1)
        if bigrams
        else words(t)
    )
    return (
        df.select(F.col(id_col), F.explode_outer(toks).alias("_w"))
        .where(F.col("_w").isNotNull())
        .select(id_col, _hash_bucket(F.col("_w"), dim).alias("bucket"))
    )


def v3_fold_score(df, model, text_col="text", id_col="doc_id"):
    """Per-row integer fold over a dense weight-array literal: tokens
    never leave their row — no explode, no join, no groupBy, zero
    exchanges. Integer sums are order-exact, so dot/n_terms/logit are
    bit-identical to the production path."""
    from vectorchord_spark.pipeline.quality_model import (
        _SCALE,
        bigram_text,
    )
    from vectorchord_spark.pipeline.sparse import _hash_bucket
    from vectorchord_spark.pipeline.text import words

    import json

    w = np.asarray(model["w"], np.float64)
    wq = np.rint(w * _SCALE).astype(np.int64)
    # true array literal: from_json on a literal string constant-folds
    # into one Literal(ArrayData); F.lit(list) would instead build a
    # CreateArray with dim children evaluated per row
    W = F.from_json(F.lit(json.dumps(wq.tolist())), "array<bigint>")
    dim = model["dim"]

    src = df.select(F.col(id_col), F.col(text_col).alias("_t"))
    if model["bigrams"]:
        src = src.select(
            id_col,
            F.concat_ws(" ", F.col("_t"), bigram_text(F.col("_t"))).alias("_t"),
        )
    toks = words(F.col("_t"))
    dot = F.aggregate(
        toks,
        F.lit(0).cast("bigint"),
        lambda acc, tok: acc + F.element_at(W, _hash_bucket(tok, dim) + 1),
    )
    out = src.select(
        id_col,
        F.size(toks).cast("bigint").alias("n_terms"),
        dot.alias("dot"),
    ).where(F.col("n_terms") > 0)
    logit = (
        F.col("dot").cast("double")
        / (F.lit(float(_SCALE)) * F.col("n_terms").cast("double"))
        + F.lit(float(model["b"]))
    )
    return out.select(id_col, "n_terms", "dot", logit.alias("logit"))


def v4_elementat_score(df, model, text_col="text", id_col="doc_id"):
    """Explode + groupBy kept (codegen path, one exchange), but the
    broadcast weight join is replaced by element_at on the dense
    weight-array literal."""
    from vectorchord_spark.pipeline.quality_model import (
        _SCALE,
        _token_buckets,
    )

    import json

    w = np.asarray(model["w"], np.float64)
    wq = np.rint(w * _SCALE).astype(np.int64)
    W = F.from_json(F.lit(json.dumps(wq.tolist())), "array<bigint>")
    toks = _token_buckets(df, text_col, id_col, model["dim"], model["bigrams"])
    scored = toks.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_terms"),
        F.sum(F.element_at(W, F.col("bucket") + 1)).cast("bigint").alias("dot"),
    )
    logit = (
        F.col("dot").cast("double")
        / (F.lit(float(_SCALE)) * F.col("n_terms").cast("double"))
        + F.lit(float(model["b"]))
    )
    return scored.select(id_col, "n_terms", "dot", logit.alias("logit"))


def score_with(tb_fn, df, model, text_col="text", id_col="doc_id"):
    from vectorchord_spark.pipeline.quality_model import _SCALE

    w = np.asarray(model["w"], np.float64)
    nz = np.flatnonzero(w)
    spark = df.sparkSession
    import pandas as pd

    wdf = spark.createDataFrame(
        pd.DataFrame(
            {
                "bucket": nz.astype(np.int32),
                "_w": np.rint(w[nz] * _SCALE).astype(np.int64),
            }
        ),
        "bucket int, _w bigint",
    )
    toks = tb_fn(df, text_col, id_col, model["dim"], model["bigrams"])
    scored = (
        toks.join(F.broadcast(wdf), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_terms"),
            F.sum(F.coalesce(F.col("_w"), F.lit(0)))
            .cast("bigint").alias("dot"),
        )
    )
    logit = (
        F.col("dot").cast("double")
        / (F.lit(float(_SCALE)) * F.col("n_terms").cast("double"))
        + F.lit(float(model["b"]))
    )
    return scored.select(id_col, "n_terms", "dot", logit.alias("logit"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from vectorchord_spark.pipeline.quality_model import (
        _token_buckets,
        score_quality,
    )
    from vectorchord_spark.session import get_spark
    from window_probe import probe

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("RUNS", "5"))
    spark = get_spark(app_name="vc-r13-score-ab")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"window: {probe()}")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    dim = 1 << 14
    w = (
        ((np.arange(dim, dtype=np.int64) * 2654435761) % 1999).astype(np.float64)
        / 1999.0 - 0.5
    ).astype(np.float32)
    model = {"w": w, "b": 0.125, "dim": dim, "bigrams": True}

    v0 = score_quality(docs, model)
    a = sorted(map(tuple, v0.collect()))
    for name, frame in (
        ("v3", v3_fold_score(docs, model)),
        ("v4", v4_elementat_score(docs, model)),
    ):
        b = sorted(map(tuple, frame.collect()))
        assert a == b, f"{name} rows differ: {len(a)} vs {len(b)}"
        print(f"{name} equality OK ({len(a)} rows)")

    times: dict[str, list[float]] = {"v0": [], "v3": [], "v4": []}
    for i in range(runs):
        spark.sparkContext.setJobDescription(f"v0 token-join {i}")
        t = time.perf_counter()
        noop(score_quality(docs, model))
        times["v0"].append(time.perf_counter() - t)
        spark.sparkContext.setJobDescription(f"v3 dense-literal fold {i}")
        t = time.perf_counter()
        noop(v3_fold_score(docs, model))
        times["v3"].append(time.perf_counter() - t)
        spark.sparkContext.setJobDescription(f"v4 element_at groupBy {i}")
        t = time.perf_counter()
        noop(v4_elementat_score(docs, model))
        times["v4"].append(time.perf_counter() - t)
    for k, v in times.items():
        print(f"{k}: {['%.3f' % x for x in v]} median {statistics.median(v):.3f}")
    print(f"window after: {probe()}")
    spark.stop()


if __name__ == "__main__":
    main()
