"""Decompose the IVF build's fixed driver term (bounded sample + driver
k-means) at ROWS x DIM — the next quantified lever for the 768d build
throughput (docs/SCALE.md round-7 section). Diagnostic only."""

from __future__ import annotations

import os
import sys
import time
from typing import Iterator

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd


def main() -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from vectorchord_spark.operators import kmeans as KM
    from vectorchord_spark.session import get_spark

    n_rows = int(os.environ.get("ROWS", "1000000"))
    dim = int(os.environ.get("DIM", "768"))
    spark = get_spark(app_name="vc-sample-profile")

    n_centers = 2000
    centers = np.random.default_rng(77).standard_normal((n_centers, dim)) * 2.0

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy(np.int64)
            rng = np.random.default_rng(ids[0] if len(ids) else 0)
            noise = 0.25 * rng.standard_normal((len(ids), dim))
            vecs = (centers[ids % n_centers] + noise).astype(np.float32)
            yield pd.DataFrame({"id": ids, "vec": list(vecs)})

    df = (
        spark.range(n_rows, numPartitions=32)
        .mapInPandas(gen, "id long, vec array<float>")
        .persist()
    )
    df.count()
    src = df.select("id", "vec")

    n_lists = max(16, int(n_rows**0.5))
    cap = n_lists * 64  # sampling_factor=64, as profile_build
    seed = 42

    marks: dict[str, float] = {}

    def mark(name: str, t0: float) -> float:
        t = time.perf_counter()
        marks[name] = t - t0
        return t

    # --- replicate bounded_sample_vectors with internal timers ---
    n_parts = max(1, src.rdd.getNumPartitions())
    per_part = -(-cap // n_parts)
    t0 = time.perf_counter()
    counts = {
        int(r["_p"]): int(r["cnt"])
        for r in src.groupBy(F.spark_partition_id().alias("_p"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    t0 = mark("counts_collect", t0)
    total = sum(counts.values())
    s2 = src.select("vec", F.rand(seed).alias("_u"))
    if total > 4 * cap and counts:
        max_pid = max(counts)
        frac = [
            min(1.0, 2.0 * per_part / counts[p]) if counts.get(p) else 1.0
            for p in range(max_pid + 1)
        ]
        frac_arr = F.array(*[F.lit(float(x)) for x in frac])
        thresh = F.when(
            F.spark_partition_id() <= max_pid,
            F.element_at(frac_arr, F.spark_partition_id() + 1),
        ).otherwise(F.lit(1.0))
        s2 = s2.where(F.col("_u") < thresh)
    w = Window.partitionBy(F.spark_partition_id()).orderBy("_u")
    sel = (
        s2.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= per_part)
        .select("vec")
        .limit(cap)
    )
    sample_pd = sel.toPandas()
    t0 = mark("window_toPandas", t0)
    samples = np.stack(sample_pd["vec"].to_numpy()).astype(np.float32)
    t0 = mark("np_stack", t0)

    # the REAL (current) sampler, end to end
    from vectorchord_spark.operators.sampling import bounded_sample_vectors

    new_pd = bounded_sample_vectors(src.select("vec"), cap, seed)
    t0 = mark("real_sampler_e2e", t0)
    new_samples = np.stack(new_pd["vec"].to_numpy()).astype(np.float32)
    t0 = mark("real_np_stack", t0)
    print(
        "selection identical (as sets):",
        set(map(tuple, samples[:, :2].tolist()))
        == set(map(tuple, new_samples[:, :2].tolist())),
    )

    # --- hierarchical kmeans decomposed ---
    c = n_lists
    iters = 10
    coarse_k = max(1, int(np.sqrt(c)))
    rng = np.random.default_rng(seed)
    sub_n = min(len(samples), coarse_k * 256)
    sub = samples[rng.choice(len(samples), size=sub_n, replace=False)]
    t0 = mark("km_subsample", t0)
    coarse = KM.lloyd(sub, coarse_k, iters, seed, False)
    t0 = mark("km_coarse_lloyd", t0)
    labels = KM._assign(samples, coarse)
    t0 = mark("km_assign", t0)
    cnts = np.bincount(labels, minlength=coarse_k)
    seats = KM.sainte_lague_seats(cnts, c)
    t0 = mark("km_seats", t0)
    outs = []
    for g in range(coarse_k):
        if seats[g] == 0:
            continue
        part = samples[labels == g]
        outs.append(KM.lloyd(part, int(seats[g]), iters, seed + 1 + g, False))
    leaves = np.concatenate(outs).astype(np.float32)
    t0 = mark("km_cell_lloyds_seq", t0)
    # the REAL (current) hierarchical, end to end
    leaves2 = KM.hierarchical(samples, c, iters, seed, False)
    t0 = mark("real_hierarchical", t0)
    print(f"leaves {leaves.shape} {leaves2.shape}")

    for k, v in marks.items():
        print(f"{k:18s} {v:7.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
