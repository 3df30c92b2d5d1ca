"""Decompose curate's near-dedup stage (the largest remaining bench
stage, ~3s of curate in a 0.4 window) into its sub-steps at the bench's
own configuration/survivor frame: signature build, banded candidate
pairs, connected components, keep-best ranking. Guide §1: measure where
the stage's time actually goes before touching anything.

Usage: [ROUNDS=3] python tools/profile_neardup_r13.py [sf_dir]
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
    from vectorchord_spark.pipeline.curate import CurateConfig, curate
    from vectorchord_spark.pipeline.dedup import (
        connected_components,
        minhash_lsh_pairs,
        minhash_signatures,
    )
    from vectorchord_spark.pipeline.text import quality_score
    from vectorchord_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(os.environ.get("ROUNDS", "3"))
    spark = get_spark(app_name="vc-neardup-profile")
    sc = spark.sparkContext

    cfg = CurateConfig(
        min_words=10,
        langs=("en", "de", "fr"),
        max_top_2gram_frac=0.2,
        max_dup_3gram_frac=0.5,
        min_quality=0.2,
        exact_dedup=True,
        near_dedup=True,
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # materialize the stage-6 input the way curate() itself does: run the
    # pipeline up to exact dedup (near_dedup off) and keep the survivors
    import dataclasses

    pre_cfg = dataclasses.replace(cfg, near_dedup=False)
    pre = curate(docs, pre_cfg)
    survivors = pre.kept.persist()
    n_surv = survivors.count()
    print(f"stage-6 input: {n_surv} survivors")

    def timed(label, thunk):
        walls = []
        for _ in range(rounds):
            t0 = time.perf_counter()
            thunk()
            walls.append(time.perf_counter() - t0)
        walls.sort()
        med = walls[len(walls) // 2]
        print(f"{label:28s} median {med:7.3f}s  (min {walls[0]:.3f} max {walls[-1]:.3f})")
        return med

    idc, txt = cfg.id_col, cfg.text_col

    sc.setJobDescription("neardup: signatures")
    timed("signatures (noop)", lambda: noop(
        minhash_signatures(survivors, id_col=idc, text_col=txt,
                           n=cfg.shingle_n, num_hashes=cfg.minhash_hashes)
    ))

    sc.setJobDescription("neardup: pairs")

    def pairs_df():
        return minhash_lsh_pairs(
            survivors, id_col=idc, text_col=txt, n=cfg.shingle_n,
            num_hashes=cfg.minhash_hashes, band_rows=cfg.minhash_band_rows,
            max_bucket=cfg.minhash_max_bucket,
        )

    timed("pairs (noop)", lambda: noop(pairs_df()))

    sc.setJobDescription("neardup: components")
    timed("pairs+components (count)", lambda: connected_components(pairs_df()).count())

    sc.setJobDescription("neardup: keep-best full")

    def full():
        comp = connected_components(pairs_df())
        ranked = (
            comp.join(survivors.select(F.col(idc).alias("id"), F.col(txt)), "id")
            .withColumn("_q", quality_score(txt))
            .drop(txt)
            .withColumn(
                "_rn",
                F.row_number().over(
                    Window.partitionBy("component").orderBy(F.desc("_q"), "id")
                ),
            )
        )
        keepers = ranked.where(F.col("_rn") == 1).select(
            F.col("component").alias("_kc"), F.col("id").alias("_kid")
        )
        losers = (
            ranked.where(F.col("_rn") > 1)
            .join(keepers, F.col("component") == F.col("_kc"))
            .select("id", F.col("_kid").alias("keeper"))
        )
        noop(survivors.join(losers.select(F.col("id").alias(idc)), idc, "left_anti"))

    timed("full stage-6 (noop)", full)
    sc.setJobDescription(None)


if __name__ == "__main__":
    main()
