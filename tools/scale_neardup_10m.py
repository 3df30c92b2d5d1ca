"""10M-doc capped near-dup validation (r11 verdict item #3): the r11
planted-clique A/B at 100x its size — 10M docs = 9.5M unique + one
500k-doc boilerplate clique — through `minhash_lsh_pairs` (cap default-on
64) -> persist -> `connected_components`, recording:

  - over-cap bucket telemetry (count / largest / elided) from the
    no-silent-caps warning, proving the contract fires at scale;
  - end-to-end walls (pair generation, CC) + window canaries;
  - the uncapped projection (4 bands x C(500k, 2) candidate pairs),
    which is run nowhere because it is ~5e11 rows out of one join key.

Usage: [ROWS=10000000] [CLIQUE=500000] python tools/scale_neardup_10m.py
"""

from __future__ import annotations

import logging
import os
import sys
import time
from typing import Iterator

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

_VOCAB = np.array([f"w{i:04d}" for i in range(4000)])


def canary() -> str:
    from vectorchord_spark import kernels as K

    prev = K.set_blas_threads(1)
    cm = np.random.default_rng(0).standard_normal((20000, 64)).astype(np.float32)
    best = min(
        (lambda t0: (K.rotate(cm), time.perf_counter() - t0)[1])(time.perf_counter())
        for _ in range(3)
    )
    if prev is not None and prev > 1:
        K.set_blas_threads(prev)
    return f"solo rotate {20000 / best:,.0f} rows/s"


def main() -> None:
    from vectorchord_spark.pipeline import dedup
    from vectorchord_spark.session import get_spark

    n_rows = int(os.environ.get("ROWS", "10000000"))
    clique = int(os.environ.get("CLIQUE", "500000"))
    print(f"corpus: {n_rows:,} docs, planted boilerplate clique {clique:,}")
    print(f"canary pre: {canary()}", flush=True)

    spark = get_spark(app_name="vc-neardup-10m")
    spark.sparkContext.setLogLevel("ERROR")

    boiler = " ".join(_VOCAB[np.random.default_rng(1234).integers(0, 4000, 60)])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy(np.int64)
            rng = np.random.default_rng(ids[0] if len(ids) else 0)
            texts = []
            for i in ids:
                if i < clique:  # the planted mega-clique (templated page)
                    texts.append(boiler)
                else:
                    texts.append(" ".join(_VOCAB[rng.integers(0, 4000, 80)]))
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    docs = (
        spark.range(n_rows, numPartitions=128)
        .mapInPandas(gen, "doc_id long, text string")
    )

    # capture the no-silent-caps warning text
    records: list[str] = []

    class Grab(logging.Handler):
        def emit(self, r: logging.LogRecord) -> None:
            records.append(r.getMessage())

    h = Grab(level=logging.WARNING)
    logging.getLogger("vectorchord_spark.pipeline.dedup").addHandler(h)

    t0 = time.perf_counter()
    pairs = dedup.minhash_lsh_pairs(docs, max_bucket=64).persist()
    n_pairs = pairs.count()
    t_pairs = time.perf_counter() - t0
    dedup.await_cap_telemetry(60)
    print(f"pair generation: {n_pairs:,} candidate pairs in {t_pairs:.1f}s "
          f"({n_rows / t_pairs:,.0f} docs/s)", flush=True)
    for m in records:
        print(f"TELEMETRY: {m}", flush=True)
    print(f"canary mid: {canary()}", flush=True)

    t1 = time.perf_counter()
    comp = dedup.connected_components(pairs.select("ida", "idb"))
    n_members = comp.count()
    n_comp = comp.select("component").distinct().count()
    t_cc = time.perf_counter() - t1
    print(f"connected_components: {n_members:,} members in {n_comp:,} "
          f"components, {t_cc:.1f}s", flush=True)

    # the planted clique must be ONE component with all 500k members
    from pyspark.sql import functions as F

    planted = (
        comp.where(F.col("id") < clique)
        .select("component").distinct().count()
    )
    planted_n = comp.where(F.col("id") < clique).count()
    print(f"planted clique: {planted_n:,} members in {planted} component(s)")

    per_band_clique = clique * (clique - 1) // 2
    print(
        f"uncapped projection: 4 bands x C({clique:,},2) = "
        f"{4 * per_band_clique:,} candidate pairs out of the band join "
        f"(run nowhere; the r11 100k A/B measured the quadratic trend)"
    )
    print(f"canary post: {canary()}")
    print(f"END-TO-END: pairs {t_pairs:.1f}s + CC {t_cc:.1f}s = "
          f"{t_pairs + t_cc:.1f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
