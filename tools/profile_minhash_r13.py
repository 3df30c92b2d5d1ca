"""dedup_minhash_lsh sub-step decomposition + a bit-identical signature
alternative: per-row array_min(transform(sh, s -> md5(j|s))) (zero
exchange, interpreted HOF eval) vs the explode + groupBy 8x string-min
aggregate (codegen'd md5, one partial-agg exchange). Same md5 count both
ways; min-over-strings skips nulls identically in both forms, so the
signatures are bit-identical. Guide §1 (measure), §2.4 (the groupBy may
already share the repartition's exchange — check before believing the
rewrite removes anything).

Usage: [ROUNDS=5] python tools/profile_minhash_r13.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from vectorchord_spark import queries as Q
    from vectorchord_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(os.environ.get("ROUNDS", "5"))
    spark = get_spark(app_name="vc-minhash-ab")
    docs = Q._read(spark, sf_dir, "documents")
    sh = Q._shingles_df(docs, cache_key=sf_dir)
    sh.count()  # warm the persisted shingle frame once

    H = Q.MINHASH_HASHES

    def sig_agg():
        ex = sh.select("doc_id", F.explode("shingles").alias("s"))
        aggs = [
            F.min(F.md5(F.concat(F.lit(f"{j}|"), F.col("s")))).alias(f"mh{j}")
            for j in range(H)
        ]
        return ex.groupBy("doc_id").agg(*aggs)

    def _mk(j):
        # single-arg lambda: a two-parameter lambda makes PySpark pass
        # (element, index) and the index shadows the closure var
        pref = F.lit(f"{j}|")
        return lambda s: F.md5(F.concat(pref, s))

    def sig_hof():
        cols = [
            F.array_min(F.transform(F.col("shingles"), _mk(j))).alias(f"mh{j}")
            for j in range(H)
        ]
        return sh.select("doc_id", *cols)

    a = sorted(tuple(r) for r in sig_agg().collect())
    b = sorted(tuple(r) for r in sig_hof().collect())
    assert a == b, "signature forms disagree"
    print(f"signature equality OK ({len(a)} docs)")

    walls = {"agg": [], "hof": []}
    for i in range(rounds):
        for name, fn in (("agg", sig_agg), ("hof", sig_hof)):
            spark.sparkContext.setJobDescription(f"minhash sig {name} r{i}")
            t0 = time.perf_counter()
            noop(fn())
            walls[name].append(time.perf_counter() - t0)
    for name, ws in walls.items():
        ws.sort()
        print(f"sig {name}: median {ws[len(ws)//2]:.3f}s  (min {ws[0]:.3f} max {ws[-1]:.3f})")

    # full-query decomposition: signatures -> +banding+capped pairs -> +verify
    spark.sparkContext.setJobDescription("minhash full query")
    t = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        noop(Q._minhash_fn(spark, sf_dir))
        t.append(time.perf_counter() - t0)
    t.sort()
    print(f"full query: median {t[len(t)//2]:.3f}s  (min {t[0]:.3f} max {t[-1]:.3f})")
    spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
