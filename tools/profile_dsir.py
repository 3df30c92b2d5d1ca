"""Scale point for DSIR data selection (r09 verdict #5): fit + score +
resample end-to-end over ROWS synthetic documents (default 1M x ~80
words), both resampling paths (exact top-n and the frac quantile
threshold), with the driver-memory claim measured (the fit holds one
dim-sized log-ratio vector on the driver — nothing else grows with the
corpus). Diagnostic only.

Corpus: target docs draw from the head of a Zipf vocabulary, raw docs
from the full range plus hash gibberish — so the importance weights have
real signal and the selected set is checkable (selected docs should be
overwhelmingly the target-like half).
"""

from __future__ import annotations

import os
import sys
import time
from typing import Iterator

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import pandas as pd


def main() -> None:
    from window_probe import probe

    from pyspark.sql import functions as F

    from vectorchord_spark.pipeline.dsir import (
        fit_dsir,
        resample_dsir,
        score_dsir,
    )
    from vectorchord_spark.session import get_spark

    n_rows = int(os.environ.get("ROWS", "1000000"))
    n_words = int(os.environ.get("WORDS", "80"))
    dim = int(os.environ.get("DIM", str(1 << 16)))

    p = probe()
    print(f"window: solo={p['solo_rotate_rows_per_s']:,} "
          f"parallel_scale_24t={p['parallel_scale_24t']} (clean ~18-22)",
          flush=True)

    spark = get_spark(app_name="vc-dsir-profile")
    spark.sparkContext.setLogLevel("ERROR")

    vocab = np.array([f"tok{i}" for i in range(2000)])
    zipf_p = 1.0 / np.arange(1, len(vocab) + 1)
    zipf_p /= zipf_p.sum()
    head_p = zipf_p.copy()
    head_p[200:] = 0.0
    head_p /= head_p.sum()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy(np.int64)
            rng = np.random.default_rng(ids[0] if len(ids) else 0)
            texts = []
            for i in ids:
                if i % 20 == 0:  # 5%: the "target" slice
                    w = rng.choice(vocab, size=n_words, p=head_p)
                elif i % 2 == 0:  # target-LIKE raw docs (should be picked)
                    w = rng.choice(vocab, size=n_words, p=head_p)
                else:  # broad/noisy raw docs
                    w = rng.choice(vocab, size=n_words, p=zipf_p)
                texts.append(" ".join(w))
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    df = (
        spark.range(n_rows, numPartitions=32)
        .mapInPandas(gen, "doc_id long, text string")
        .persist()
    )
    df.count()

    target = df.where(F.col("doc_id") % 20 == 0)
    raw = df.where(F.col("doc_id") % 20 != 0)

    t0 = time.perf_counter()
    model = fit_dsir(target, raw, dim=dim, bigrams=True)
    t_fit = time.perf_counter() - t0
    lw_mb = model["lw"].nbytes / 1e6
    print(f"fit: {t_fit:.1f}s over {n_rows:,} docs (dim={dim}); driver "
          f"log-ratio vector = {lw_mb:.2f} MB (the only corpus-derived "
          f"driver state)", flush=True)

    t0 = time.perf_counter()
    n_scored = score_dsir(raw, model).count()
    t_score = time.perf_counter() - t0
    print(f"score: {t_score:.1f}s = {n_scored / t_score:,.0f} docs/s "
          f"({n_scored:,} docs)", flush=True)

    n_pick = n_rows // 20
    t0 = time.perf_counter()
    picked = resample_dsir(raw, model, n=n_pick, seed=7)
    n_like = picked.where(F.col("doc_id") % 2 == 0).count()
    t_topn = time.perf_counter() - t0
    print(f"resample top-n={n_pick:,}: {t_topn:.1f}s; target-like share "
          f"of selection = {n_like / n_pick:.3f}", flush=True)

    t0 = time.perf_counter()
    picked_f = resample_dsir(raw, model, frac=0.05, seed=7)
    n_f = picked_f.count()
    n_like_f = picked_f.where(F.col("doc_id") % 2 == 0).count()
    t_frac = time.perf_counter() - t0
    print(f"resample frac=0.05 (quantile path): {t_frac:.1f}s -> {n_f:,} "
          f"selected; target-like share = {n_like_f / max(n_f, 1):.3f}",
          flush=True)

    total = t_fit + t_score + t_topn
    print(f"end-to-end fit+score+top-n: {total:.1f}s = "
          f"{n_rows / total:,.0f} docs/s over {n_rows:,} docs", flush=True)
    pe = probe()
    print(f"end window: solo={pe['solo_rotate_rows_per_s']:,} "
          f"parallel_scale_24t={pe['parallel_scale_24t']}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
