"""Decompose curate's row-filters stage at sf0.1: which per-row expression
family owns the wall? Arms (cumulative configs, interleaved, median of N):

  length   — min/max words only
  +lang    — + wordlist langid (en/de/fr detected)
  +rep     — + Gopher repetition fracs
  +qual    — + heuristic quality bound   (= the bench row-filters config)

Also times DataFrame CONSTRUCTION + analysis/optimization (executedPlan
forced, no action) separately from execution, to split driver planning
cost from run cost.

Usage: [RUNS=5] python tools/profile_rowfilters_r13.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vectorchord_spark.pipeline.curate import CurateConfig, curate
from vectorchord_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("RUNS", "5"))


def cfg_for(arm: str) -> CurateConfig:
    base = dict(
        min_words=10,
        langs=None,
        max_top_2gram_frac=None,
        max_dup_3gram_frac=None,
        min_quality=None,
        exact_dedup=False,
        near_dedup=False,
    )
    if arm in ("+lang", "+rep", "+qual"):
        base["langs"] = ("en", "de", "fr")
    if arm in ("+rep", "+qual"):
        base["max_top_2gram_frac"] = 0.2
        base["max_dup_3gram_frac"] = 0.5
    if arm == "+qual":
        base["min_quality"] = 0.2
    return CurateConfig(**base)


def main() -> None:
    spark = get_spark(app_name="profile-rowfilters-r13")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.count()  # warm footer caches

    arms = ["length", "+lang", "+rep", "+qual"]
    plan_t: dict[str, list[float]] = {a: [] for a in arms}
    exec_t: dict[str, list[float]] = {a: [] for a in arms}

    # one cold pass per arm first (codegen/JIT), not recorded
    for arm in arms:
        r = curate(docs, cfg_for(arm))
        r.kept.select("doc_id").unionAll(
            r.audit.select(F.col("id").alias("doc_id"))
        ).count()

    for _ in range(RUNS):
        for arm in arms:
            spark.sparkContext.setJobDescription(f"rowfilters {arm}")
            t0 = time.perf_counter()
            r = curate(docs, cfg_for(arm))
            out = r.kept.select("doc_id").unionAll(
                r.audit.select(F.col("id").alias("doc_id"))
            )
            # force full analysis+optimization+physical planning, no action
            out._jdf.queryExecution().executedPlan()
            t1 = time.perf_counter()
            out.count()
            t2 = time.perf_counter()
            plan_t[arm].append(t1 - t0)
            exec_t[arm].append(t2 - t1)
    spark.sparkContext.setJobDescription(None)

    def med(xs: list[float]) -> float:
        xs = sorted(xs)
        return xs[len(xs) // 2]

    print(f"{'arm':8} {'plan_s':>8} {'exec_s':>8} {'total_s':>8}  runs")
    prev = None
    for arm in arms:
        p, e = med(plan_t[arm]), med(exec_t[arm])
        d = "" if prev is None else f"  (+{p + e - prev:.3f} vs prev arm)"
        prev = p + e
        print(
            f"{arm:8} {p:8.3f} {e:8.3f} {p + e:8.3f}"
            f"  {['%.2f' % x for x in sorted(exec_t[arm])]}{d}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
