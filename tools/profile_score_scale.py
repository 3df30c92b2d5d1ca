"""1M-doc interleaved A/B: posting-row vs token-level scoring (the r12
score_quality/score_dsir optimization) at a scale where the removed
(id, bucket) shuffle matters. Deterministic synthetic docs; equality
asserted on a slice; noop-sink timed."""

import sys, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from vectorchord_spark.session import get_spark
from vectorchord_spark.pipeline.quality_model import quality_features, _token_buckets


def main():
    spark = get_spark(app_name="score-scale-ab")
    N = int(os.environ.get("ROWS", "1000000"))
    docs = (spark.range(N).withColumnRenamed("id", "doc_id")
            .withColumn("text", F.concat_ws(" ", *[
                F.concat(F.lit("w"), ((F.col("doc_id") * F.lit(2654435761 + i)
                 + F.lit(i * i * 7919)) % F.lit(50000)).cast("string"))
                for i in range(30)])))
    docs = docs.repartition(64).persist()
    print("docs:", docs.count(), flush=True)
    dim = 1 << 16
    wq = (np.arange(dim, dtype=np.int64) * 2654435761) % 1999 - 999
    nz = np.flatnonzero(wq)
    wdf = spark.createDataFrame(
        pd.DataFrame({"bucket": nz.astype(np.int32), "_w": wq[nz].astype(np.int64)}),
        "bucket int, _w bigint")

    def old_path():
        feats = quality_features(docs, text_col="text", id_col="doc_id",
                                 dim=dim, bigrams=True)
        return (feats.join(F.broadcast(wdf), "bucket", "left").groupBy("doc_id")
                .agg(F.sum("weight").cast("bigint").alias("n_terms"),
                     F.sum(F.coalesce(F.col("_w"), F.lit(0)) * F.col("weight"))
                     .cast("bigint").alias("dot")))

    def new_path():
        toks = _token_buckets(docs, text_col="text", id_col="doc_id",
                              dim=dim, bigrams=True)
        return (toks.join(F.broadcast(wdf), "bucket", "left").groupBy("doc_id")
                .agg(F.count(F.lit(1)).cast("bigint").alias("n_terms"),
                     F.sum(F.coalesce(F.col("_w"), F.lit(0)))
                     .cast("bigint").alias("dot")))

    a = old_path().where("doc_id < 2000").orderBy("doc_id").collect()
    b = new_path().where("doc_id < 2000").orderBy("doc_id").collect()
    assert a == b, "scale A/B mismatch"
    print("equality OK (2000-doc slice)", flush=True)

    def t(df):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    rs = {"posting": [], "token": []}
    for i in range(3):
        rs["posting"].append(t(old_path()))
        rs["token"].append(t(new_path()))
        print(i, {k: ["%.1f" % x for x in v] for k, v in rs.items()}, flush=True)
    for k, v in rs.items():
        s = sorted(v)
        print(k, "median=%.2f" % s[len(s) // 2], flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
