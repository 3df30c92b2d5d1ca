"""curate() scale point (r07 verdict #8): 1M synthetic docs through the
default one-call pipeline with planted failures for every stage (short
docs, repetitive docs, exact + near duplicates), reporting total rows/s
and per-stage drop shares from the audit frame.

FULL=1 additionally turns EVERY optional stage on — a learned quality
model (trained on a labeled sample), a CCNet perplexity LM (trained on
the clean slice), and DSIR final selection (target = a planted
head-vocabulary slice) — the complete 8-stage composition end-to-end.

Usage: ROWS=1000000 [FULL=1] python tools/profile_curate.py
"""

from __future__ import annotations

import os
import sys
import time
from typing import Iterator

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

_VOCAB = np.array(
    [
        f"w{i:04d}" for i in range(4000)
    ]
)


def main() -> None:
    from vectorchord_spark import kernels as K
    from vectorchord_spark.pipeline.curate import CurateConfig, curate
    from vectorchord_spark.session import get_spark

    n_rows = int(os.environ.get("ROWS", "1000000"))

    prev = K.set_blas_threads(1)
    cm = np.random.default_rng(0).standard_normal((20000, 64)).astype(np.float32)
    best = min(
        (lambda t0: (K.rotate(cm), time.perf_counter() - t0)[1])(time.perf_counter())
        for _ in range(3)
    )
    if prev is not None and prev > 1:
        K.set_blas_threads(prev)
    print(f"canary: rotate 20k x 64d 1-thread best {best:.3f}s "
          f"({20000 / best:,.0f} rows/s)")

    spark = get_spark(app_name="vc-curate-profile")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy(np.int64)
            rng = np.random.default_rng(ids[0] if len(ids) else 0)
            texts = []
            for i in ids:
                mode = i % 20
                if mode == 0:  # short doc (fails length)
                    w = _VOCAB[rng.integers(0, 4000, 4)]
                elif mode == 1:  # repetitive (fails Gopher 2-gram frac)
                    w = np.tile(_VOCAB[rng.integers(0, 4000, 2)], 40)
                elif mode == 2:  # exact duplicate of a canonical doc
                    w = _VOCAB[np.random.default_rng(int(i) % 97).integers(0, 4000, 60)]
                elif mode == 3:  # near duplicate: canonical + 1 word changed
                    w = _VOCAB[np.random.default_rng(int(i) % 97).integers(0, 4000, 60)]
                    w = w.copy()
                    w[7] = _VOCAB[int(i) % 4000]
                else:  # normal doc
                    w = _VOCAB[rng.integers(0, 4000, 80)]
                texts.append(" ".join(w))
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    docs = (
        spark.range(n_rows, numPartitions=32)
        .mapInPandas(gen, "doc_id long, text string")
        .persist()
    )
    docs.count()

    cfg = CurateConfig(min_words=10, max_top_2gram_frac=0.2,
                       max_dup_3gram_frac=0.5, min_quality=None)
    if os.environ.get("FULL") == "1":
        from pyspark.sql import functions as F

        from vectorchord_spark.pipeline.dsir import fit_dsir
        from vectorchord_spark.pipeline.ngram_lm import train_ngram_lm
        from vectorchord_spark.pipeline.quality_model import (
            train_quality_classifier,
        )

        t0 = time.perf_counter()
        normal = docs.where(F.col("doc_id") % 20 > 3)
        labeled = docs.limit(40_000).withColumn(
            "label", (F.col("doc_id") % 20 > 3).cast("int")
        )
        qm = train_quality_classifier(labeled, "label", dim=1 << 16,
                                      sample_cap=20_000, epochs=3)
        lm = train_ngram_lm(normal.limit(100_000), order=2, min_count=2)
        dm = fit_dsir(normal.where(F.col("doc_id") % 40 == 5),
                      normal, dim=1 << 14)
        print(f"FULL prep (quality model + LM + DSIR fit): "
              f"{time.perf_counter() - t0:.1f}s")
        cfg = CurateConfig(
            min_words=10, max_top_2gram_frac=0.2, max_dup_3gram_frac=0.5,
            min_quality=None, quality_model=qm, min_logit=-20.0,
            ngram_lm=lm, max_bits_per_token=20.0,
            dsir_model=dm, dsir_frac=0.5,
        )
    t0 = time.perf_counter()
    res = curate(docs, cfg)
    kept = res.kept.count()
    t_kept = time.perf_counter() - t0
    t0 = time.perf_counter()
    from pyspark.sql import functions as F

    shares = {
        r["stage"]: r["n"]
        for r in res.audit.groupBy("stage").agg(F.count("*").alias("n")).collect()
    }
    t_audit = time.perf_counter() - t0
    total = t_kept + t_audit
    print(f"kept {kept}/{n_rows} in {t_kept:.1f}s; audit shares ({t_audit:.1f}s): {shares}")
    print(f"total {total:.1f}s ({n_rows / total:,.0f} rows/s)")
    spark.stop()


if __name__ == "__main__":
    main()
