"""Scale point for the learned quality filter: train on a bounded labeled
sample, score ROWS synthetic documents (default 1M x ~80 words), report
score-pass wall and rows/s. Diagnostic only.

The synthetic corpus mixes a "clean" vocabulary (Zipf over common tokens)
with "noisy" docs (hash gibberish), labels = clean?1:0, so the model has
real signal; scoring throughput is what this measures (train is bounded
by construction).
"""

from __future__ import annotations

import os
import sys
import time
from typing import Iterator

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd


def main() -> None:
    from pyspark.sql import functions as F

    from vectorchord_spark.pipeline.quality_model import (
        score_quality,
        train_quality_classifier,
    )
    from vectorchord_spark.session import get_spark

    n_rows = int(os.environ.get("ROWS", "1000000"))
    n_words = int(os.environ.get("WORDS", "80"))
    spark = get_spark(app_name="vc-quality-profile")

    vocab = np.array([f"tok{i}" for i in range(2000)])
    zipf_p = 1.0 / np.arange(1, len(vocab) + 1)
    zipf_p /= zipf_p.sum()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy(np.int64)
            rng = np.random.default_rng(ids[0] if len(ids) else 0)
            clean = ids % 2 == 0
            texts = []
            for i, c in zip(ids, clean):
                if c:
                    w = rng.choice(vocab, size=n_words, p=zipf_p)
                else:
                    w = rng.integers(0, 2**48, size=n_words).astype("U12")
                texts.append(" ".join(w))
            yield pd.DataFrame(
                {"doc_id": ids, "text": texts, "label": clean.astype(np.int32)}
            )

    df = (
        spark.range(n_rows, numPartitions=32)
        .mapInPandas(gen, "doc_id long, text string, label int")
        .persist()
    )
    df.count()

    t0 = time.perf_counter()
    model = train_quality_classifier(
        df, "label", dim=1 << 18, sample_cap=20_000, epochs=5
    )
    t_train = time.perf_counter() - t0

    t0 = time.perf_counter()
    scored = score_quality(df, model)
    acc = (
        scored.join(df.select("doc_id", "label"), "doc_id")
        .select(
            ((F.col("logit") > 0).cast("int") == F.col("label"))
            .cast("int")
            .alias("ok")
        )
        .agg(F.avg("ok"), F.count(F.lit(1)))
        .collect()[0]
    )
    t_score = time.perf_counter() - t0
    print(
        f"rows={n_rows} train={t_train:.1f}s score+join={t_score:.1f}s "
        f"({n_rows / t_score:,.0f} rows/s) acc={acc[0]:.4f} n={acc[1]}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
