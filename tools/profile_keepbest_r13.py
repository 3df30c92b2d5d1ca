"""Interleaved A/B: keep-best keeper attribution via the rn==1 self-join
(current) vs first(id) over the SAME window that computes row_number
(candidate — no join, no extra exchange: both window expressions share
one WindowExec). Guide §2.4/§3: remove a join whose answer the existing
window already knows. Results must be identical rows.

Usage: [ROUNDS=5] python tools/profile_keepbest_r13.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from vectorchord_spark import queries as Q
    from vectorchord_spark.pipeline.dedup import connected_components
    from vectorchord_spark.pipeline.text import quality_score
    from vectorchord_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(os.environ.get("ROUNDS", "5"))
    spark = get_spark(app_name="vc-keepbest-ab")

    # the component frame both shapes consume (pairs+components held
    # constant so the A/B isolates the ranking stage)
    pairs = Q._dedup_ngram_fn(spark, sf_dir).select("ida", "idb")
    comp = connected_components(pairs).persist()
    comp.count()
    docs = Q._read(spark, sf_dir, "documents")

    w = Window.partitionBy("component").orderBy(F.desc("quality"), "id")

    def ranked():
        return (
            comp.join(docs.select(F.col("doc_id").alias("id"), "text"), "id")
            .withColumn("quality", quality_score("text"))
            .drop("text")
            .withColumn("rn", F.row_number().over(w))
        )

    def old_shape():
        r = ranked()
        keepers = r.where(F.col("rn") == 1).select(
            F.col("component").alias("kcomp"), F.col("id").alias("keeper_id")
        )
        return (
            r.join(keepers, F.col("component") == F.col("kcomp"))
            .select(
                F.col("id").alias("doc_id"), "component", "keeper_id",
                (F.col("rn") > 1).cast("int").alias("is_dup"),
            )
            .orderBy("doc_id")
        )

    def new_shape():
        r = ranked().withColumn("keeper_id", F.first("id").over(w))
        return r.select(
            F.col("id").alias("doc_id"), "component", "keeper_id",
            (F.col("rn") > 1).cast("int").alias("is_dup"),
        ).orderBy("doc_id")

    a = [tuple(r) for r in old_shape().collect()]
    b = [tuple(r) for r in new_shape().collect()]
    assert a == b, f"shapes disagree: {len(a)} vs {len(b)} rows"
    print(f"equality OK ({len(a)} rows)")

    walls: dict[str, list[float]] = {"old": [], "new": []}
    for i in range(rounds):
        for name, fn in (("old", old_shape), ("new", new_shape)):
            spark.sparkContext.setJobDescription(f"keepbest {name} r{i}")
            t0 = time.perf_counter()
            noop(fn())
            walls[name].append(time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)
    for name, ws in walls.items():
        ws.sort()
        print(f"{name}: median {ws[len(ws)//2]:.3f}s  (min {ws[0]:.3f} max {ws[-1]:.3f})")


if __name__ == "__main__":
    main()
