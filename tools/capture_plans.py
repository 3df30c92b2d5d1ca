"""Capture .explain('formatted') for every benched headline query.

Usage: python tools/capture_plans.py <suffix> [names...]

Writes plans/$VC_PLANS_ROUND (default r13)/<name>_<suffix>.txt for each headline catalog entry (the
serving-override variant when one exists — the shape bench.py times) plus
the five bench-only extras (semdedup, quality_learned, curate,
perplexity_lm, dsir_resample), reconstructed with the same configuration
bench.py uses. Plan capture runs the builder fn (index builds execute) but
does NOT execute the final query, so AQE-final plans are not included —
these files record the static physical plan the optimizer chose.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F


def extra_fns():
    """The five bench-only entries, mirroring bench.py's configs."""

    def semdedup(spark, sf_dir):
        from vectorchord_spark.pipeline.semdedup import semdedup

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        return semdedup(
            emb, n_clusters=8, eps=0.40, sample_cap=4096, seed=11
        ).where("keep")

    def quality_learned(spark, sf_dir):
        from vectorchord_spark.pipeline.quality_model import score_quality

        dim = 1 << 14
        w = (
            ((np.arange(dim, dtype=np.int64) * 2654435761) % 1999).astype(
                np.float64
            )
            / 1999.0
            - 0.5
        ).astype(np.float32)
        model = {"w": w, "b": 0.125, "dim": dim, "bigrams": True}
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return score_quality(docs, model)

    def curate(spark, sf_dir):
        from vectorchord_spark.pipeline.curate import CurateConfig, curate

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        res = curate(
            docs,
            CurateConfig(
                min_words=10,
                langs=("en", "de", "fr"),
                max_top_2gram_frac=0.2,
                max_dup_3gram_frac=0.5,
                min_quality=0.2,
            ),
        )
        return res.kept.select(F.col("doc_id")).unionAll(
            res.audit.select(F.col("id").alias("doc_id"))
        )

    def perplexity_lm(spark, sf_dir):
        from vectorchord_spark.pipeline.ngram_lm import score_lm, train_ngram_lm

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        lm = train_ngram_lm(docs.where("doc_id % 10 = 0"), order=3, min_count=2)
        return score_lm(docs, lm)

    def dsir_resample(spark, sf_dir):
        from vectorchord_spark.pipeline.dsir import fit_dsir, resample_dsir

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        model = fit_dsir(
            docs.where("doc_id % 10 = 0"),
            docs.where("doc_id % 10 <> 0"),
            dim=1 << 16,
        )
        return resample_dsir(docs, model, frac=0.25, temperature=1.0, seed=11)

    return {
        "semdedup": semdedup,
        "quality_learned": quality_learned,
        "curate": curate,
        "perplexity_lm": perplexity_lm,
        "dsir_resample": dsir_resample,
    }


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from vectorchord_spark.queries import catalog, serving_overrides
    from vectorchord_spark.session import get_spark

    spark = get_spark(app_name="capture-plans")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(here, "plans", os.environ.get("VC_PLANS_ROUND", "r13"))
    os.makedirs(outdir, exist_ok=True)

    fns = {n: q.fn for n, q in catalog().items() if q.headline}
    fns.update({n: f for n, f in serving_overrides().items() if n in fns})
    fns.update(extra_fns())
    if only:
        fns = {n: f for n, f in fns.items() if n in only}

    for name, fn in fns.items():
        spark.sparkContext.setJobDescription(f"capture_plans:{name}")
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # capture what failed rather than dying
            plan = f"ERROR capturing plan: {e!r}\n"
        # compress constant-folded dense weight-array literals (r13 token
        # scoring): runs of >24 comma-separated ints collapse to a marker
        # so the committed plan stays readable
        import re

        plan = re.sub(
            r"(-?\d+(?:,-?\d+){24,})",
            lambda m: (
                f"{','.join(m.group(1).split(',')[:4])}"
                f",…<{m.group(1).count(',') + 1} ints folded>…"
            ),
            plan,
        )
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
