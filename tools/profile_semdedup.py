"""SemDeDup scale point at realistic k (r07 verdict #7): 1M x 768d with
k >= 10k clusters through the DISTRIBUTED fit (the paper's k=50k regime
scaled to one node), the shuffle-free broadcast-GEMM assignment, and the
LPT-launched per-cluster flag pass (join-mapping branch above 4096
groups). Prints per-phase walls + canaries; results go to docs/SCALE.md.

Usage: ROWS=1000000 DIM=768 K=10240 python tools/profile_semdedup.py
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
    from vectorchord_spark import kernels as K
    from vectorchord_spark.pipeline import semdedup as SD
    from vectorchord_spark.session import get_spark

    n_rows = int(os.environ.get("ROWS", "1000000"))
    dim = int(os.environ.get("DIM", "768"))
    k = int(os.environ.get("K", "10240"))
    precise = os.environ.get("PRECISE", "1") == "1"

    # window canaries (MIGRATION.md perf-testing discipline)
    prev = K.set_blas_threads(1)
    cm = np.random.default_rng(0).standard_normal((20000, dim)).astype(np.float32)
    best = min(
        (lambda t0: (K.rotate(cm), time.perf_counter() - t0)[1])(time.perf_counter())
        for _ in range(3)
    )
    if prev is not None and prev > 1:
        K.set_blas_threads(prev)
    print(f"canary: rotate 20k x {dim}d 1-thread best {best:.3f}s "
          f"({20000 / best:,.0f} rows/s)")

    spark = get_spark(app_name="vc-semdedup-profile")

    n_centers = 2000
    centers = np.random.default_rng(77).standard_normal((n_centers, dim)) * 2.0

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy(np.int64)
            rng = np.random.default_rng(ids[0] if len(ids) else 0)
            noise = 0.05 * rng.standard_normal((len(ids), dim))
            vecs = (centers[ids % n_centers] + noise).astype(np.float32)
            yield pd.DataFrame({"vec_id": ids, "embedding": list(vecs)})

    df = (
        spark.range(n_rows, numPartitions=32)
        .mapInPandas(gen, "vec_id long, embedding array<float>")
        .persist()
    )
    df.count()

    t0 = time.perf_counter()
    cents = SD.fit_semdedup_centroids(
        df, n_clusters=k, sample_cap=min(n_rows, 1 << 19), seed=11,
        distributed=True,
    )
    t_fit = time.perf_counter() - t0
    print(f"fit (distributed, k={k}): {t_fit:.1f}s  centroids {cents.shape}")

    t0 = time.perf_counter()
    assigned = SD.assign_clusters(df, cents, precise=precise).persist()
    n_assigned = assigned.count()
    t_assign = time.perf_counter() - t0
    print(
        f"assign (precise={precise}): {t_assign:.1f}s  "
        f"({n_assigned / t_assign:,.0f} rows/s)"
    )

    t0 = time.perf_counter()
    flags = SD.semdedup_flags(
        assigned, df, eps=0.95, max_cluster_size=500_000
    )
    kept = flags.where("keep").count()
    t_flag = time.perf_counter() - t0
    total = t_fit + t_assign + t_flag
    print(
        f"flag: {t_flag:.1f}s | total {total:.1f}s "
        f"({n_rows / total:,.0f} rows/s) | kept {kept}/{n_rows}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
