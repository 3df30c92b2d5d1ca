"""Profile capped_band_pairs overhead vs the uncapped self-join (r11
verdict finding #1: dedup_minhash_lsh went 2.38s -> 4.74s when the cap
landed; target is <=1.3x of the uncapped wall on skew-free data).

Runs the dedup_minhash_lsh-shaped pipeline at $SF_DIR (default sf0.1)
in three arms, interleaved rounds, medians:
  uncapped : max_bucket=None (the r10 path)
  capped   : current capped_band_pairs (whatever dedup.py does today)
Prints per-arm medians + ratio.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("RUNS", "5"))


def main() -> None:
    from pyspark.sql import SparkSession

    from vectorchord_spark import session as vsession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .appName("profile_capstats")
        .getOrCreate()
    )
    vsession.ensure_worker_imports(spark)
    spark.sparkContext.setLogLevel("ERROR")

    from vectorchord_spark.queries import _minhash_fn, _shingles_df, _read

    # warm the shingle cache once so every arm sees identical cached input
    _shingles_df(_read(spark, SF_DIR, "documents"), cache_key=SF_DIR).count()

    import vectorchord_spark.queries as Q

    def run(cap):
        old = Q.LSH_MAX_BUCKET
        Q.LSH_MAX_BUCKET = cap
        try:
            t0 = time.monotonic()
            n = _minhash_fn(spark, SF_DIR).count()
            return time.monotonic() - t0, n
        finally:
            Q.LSH_MAX_BUCKET = old

    # canary for window normalization
    import numpy as np

    def canary():
        a = np.random.default_rng(0).standard_normal((1500, 1500), dtype=np.float32)
        t0 = time.monotonic()
        for _ in range(3):
            a = a @ a * 1e-4
        return time.monotonic() - t0

    walls = {"uncapped": [], "capped": []}
    rows = {}
    # one untimed warmup each
    for arm, cap in (("uncapped", None), ("capped", 64)):
        run(cap)
    for r in range(RUNS):
        for arm, cap in (("uncapped", None), ("capped", 64)):
            w, n = run(cap)
            walls[arm].append(w)
            rows[arm] = n
            print(f"round {r} {arm:9s} {w:6.3f}s rows={n}", flush=True)
    c = canary()
    mu = statistics.median(walls["uncapped"])
    mc = statistics.median(walls["capped"])
    print(f"\ncanary 3x1500^2 matmul: {c:.3f}s")
    print(f"uncapped median {mu:.3f}s  (rows {rows['uncapped']})")
    print(f"capped   median {mc:.3f}s  (rows {rows['capped']})")
    print(f"ratio capped/uncapped = {mc / mu:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
