"""Isolated A/B prototypes for the r12 optimization candidates.

Interleaved same-session medians (noop-sink timed) for:
  A. curate row_filters: repetition-stats self-join vs inline columns
  B. score_dsir/score_quality: posting-row double shuffle vs token-level
     single shuffle
  C. contamination: explode (duplicated shingle expr in inferred filter)
     vs explode_outer

Each candidate also asserts result equality against the current path.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from vectorchord_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_RUNS = 5


def noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def median(xs):
    xs = sorted(xs)
    return xs[len(xs) // 2]


def ab(name, variants, check=None):
    """Interleaved timing of {label: thunk -> DataFrame}."""
    if check:
        check()
    times = {k: [] for k in variants}
    for _ in range(N_RUNS):
        for k, fn in variants.items():
            times[k].append(noop(fn()))
    for k, ts in times.items():
        print(f"  {name}/{k}: median={median(ts):.3f}s runs={['%.3f' % t for t in ts]}")
    return {k: median(ts) for k, ts in times.items()}


def main():
    spark = get_spark(app_name="profile-r12-opt")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.count()

    # ---------- A: curate row_filters join vs inline ----------
    from vectorchord_spark.pipeline.text import repetition_stats

    def a_join():
        rep = repetition_stats(docs.select("doc_id", "text"), "text")
        return docs.join(
            rep.select(F.col("doc_id"), "top_2gram_frac", "dup_3gram_frac"),
            "doc_id",
        )

    def a_inline():
        return repetition_stats(docs, "text").drop(
            "n_words", "max_2gram_count", "dup_3gram_count"
        )

    def a_check():
        l = a_join().orderBy("doc_id").collect()
        r = (
            a_inline()
            .select(*[c for c in a_join().columns])
            .orderBy("doc_id")
            .collect()
        )
        assert l == r, "A: inline != join"
        print("  A: equality OK")

    ab("A_repstats", {"join": a_join, "inline": a_inline}, a_check)

    # ---------- B: score token-level vs posting rows ----------
    from vectorchord_spark.pipeline.quality_model import (
        bigram_text,
        quality_features,
        score_quality,
    )
    from vectorchord_spark.pipeline.sparse import _hash_bucket
    from vectorchord_spark.pipeline.text import words

    dim = 1 << 14
    w = (
        ((np.arange(dim, dtype=np.int64) * 2654435761) % 1999).astype(np.float64)
        / 1999.0
        - 0.5
    ).astype(np.float32)
    model = {"w": w, "b": 0.125, "dim": dim, "bigrams": True}
    _SCALE = 1_000_000
    wd = np.asarray(model["w"], np.float64)
    nz = np.flatnonzero(wd)
    import pandas as pd

    wdf = spark.createDataFrame(
        pd.DataFrame(
            {
                "bucket": nz.astype(np.int32),
                "_w": np.rint(wd[nz] * _SCALE).astype(np.int64),
            }
        ),
        "bucket int, _w bigint",
    )

    def b_current():
        return score_quality(docs, model)

    def b_token():
        src = docs.select(
            "doc_id",
            F.concat_ws(" ", F.col("text"), bigram_text(F.col("text"))).alias("_t"),
        )
        toks = src.select("doc_id", F.explode(words("_t")).alias("_w")).select(
            "doc_id", _hash_bucket(F.col("_w"), dim).alias("bucket")
        )
        scored = (
            toks.join(F.broadcast(wdf), "bucket", "left")
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_terms"),
                F.sum(F.coalesce(F.col("_w"), F.lit(0)))
                .cast("bigint")
                .alias("dot"),
            )
        )
        logit = (
            F.col("dot").cast("double")
            / (F.lit(float(_SCALE)) * F.col("n_terms").cast("double"))
            + F.lit(float(model["b"]))
        )
        return scored.select("doc_id", "n_terms", "dot", logit.alias("logit"))

    def b_check():
        l = b_current().orderBy("doc_id").collect()
        r = b_token().orderBy("doc_id").collect()
        assert l == r, f"B: token != current ({l[:2]} vs {r[:2]})"
        print("  B: equality OK")

    ab("B_score", {"posting": b_current, "token": b_token}, b_check)

    # ---------- C: contamination explode vs explode_outer ----------
    from vectorchord_spark.pipeline.dedup import shingles

    bench = docs.where(F.col("doc_id") % 20 == 0)

    def c_variant(outer: bool):
        ex = F.explode_outer if outer else F.explode

        def run():
            c = docs.select(
                F.col("doc_id"), shingles("text", 3).alias("sh")
            ).select("doc_id", ex("sh").alias("s"))
            bset = (
                bench.select(shingles("text", 3).alias("sh"))
                .select(ex("sh").alias("s"))
                .distinct()
            )
            return (
                c.join(F.broadcast(bset), "s")
                .groupBy("doc_id")
                .agg(F.count(F.lit(1)).alias("overlap"))
                .where(F.col("overlap") >= 2)
            )

        return run

    def c_check():
        l = c_variant(False)().orderBy("doc_id").collect()
        r = c_variant(True)().orderBy("doc_id").collect()
        assert l == r, "C: outer != inner"
        print("  C: equality OK")

    ab(
        "C_contamination",
        {"explode": c_variant(False), "explode_outer": c_variant(True)},
        c_check,
    )

    spark.stop()


if __name__ == "__main__":
    main()
