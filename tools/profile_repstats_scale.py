"""Scale point for the r13 repetition_stats Arrow kernel: old pure-JVM
sort+fold vs production mapInArrow at ROWS (default 300k) synthetic docs
of 60 words with repeated segments (so 2-gram/3-gram duplicates exist).
Equality asserted via full-aggregate checksums (order-insensitive exact
integer sums), then interleaved noop-sink timing.

Usage: [ROWS=300000] [RUNS=3] python tools/profile_repstats_scale.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vectorchord_spark.pipeline.text import repetition_stats
from vectorchord_spark.session import get_spark

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
from profile_repstats_r13 import _old_jvm_repetition_stats


def main() -> None:
    spark = get_spark(app_name="repstats-scale-ab")
    n = int(os.environ.get("ROWS", "300000"))
    runs = int(os.environ.get("RUNS", "3"))
    # 60 words/doc; positions with i%10 < 3 emit a per-doc 3-word cycle
    # (identical adjacent trios at i=0..2, 10..12, ... -> nonzero repeated
    # 2- AND 3-gram counts per doc), the rest quasi-unique
    docs = (
        spark.range(n)
        .withColumnRenamed("id", "doc_id")
        .withColumn(
            "text",
            F.concat_ws(
                " ",
                *[
                    F.concat(
                        F.lit("r"),
                        ((F.col("doc_id") + F.lit(i % 10)) % F.lit(5)).cast(
                            "string"
                        ),
                    )
                    if i % 10 < 3
                    else F.concat(
                        F.lit("w"),
                        (
                            (F.col("doc_id") * F.lit(2654435761 + i)
                             + F.lit(i * i * 7919))
                            % F.lit(9000)
                        ).cast("string"),
                    )
                    for i in range(60)
                ],
            ),
        )
        .repartition(64)
        .persist()
    )
    print("docs:", docs.count(), flush=True)

    cols = ["doc_id", "n_words", "max_2gram_count", "dup_3gram_count"]

    def checksum(df):
        return df.select(
            F.sum("n_words").alias("s_n"),
            F.sum("max_2gram_count").alias("s_m2"),
            F.sum("dup_3gram_count").alias("s_d3"),
            F.sum(F.col("doc_id") * F.col("max_2gram_count")).alias("x_m2"),
            F.sum(F.col("doc_id") * F.col("dup_3gram_count")).alias("x_d3"),
        ).collect()[0]

    old = checksum(_old_jvm_repetition_stats(docs).select(cols))
    new = checksum(repetition_stats(docs).select(cols))
    assert tuple(old) == tuple(new), f"checksum mismatch: {old} vs {new}"
    print("equality OK (full-corpus checksums):", tuple(old), flush=True)

    def t(df):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    rs = {"old_jvm": [], "arrow": []}
    for _ in range(runs):
        spark.sparkContext.setJobDescription("repstats-scale old")
        rs["old_jvm"].append(t(_old_jvm_repetition_stats(docs).select(cols)))
        spark.sparkContext.setJobDescription("repstats-scale arrow")
        rs["arrow"].append(t(repetition_stats(docs).select(cols)))
    spark.sparkContext.setJobDescription(None)
    for k, v in rs.items():
        v.sort()
        print(f"{k:8} median {v[len(v) // 2]:.3f}s  {['%.2f' % x for x in v]}")
    spark.stop()


if __name__ == "__main__":
    main()
