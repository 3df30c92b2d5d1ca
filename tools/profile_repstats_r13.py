"""A/B the repetition_stats per-row kernel at sf0.1: the production
struct-fold aggregates vs boundary-based run counting (run starts via
filter over the sorted gram array, run lengths via zip_with on the
shifted starts — no per-element struct allocation), and the same with
struct grams (skip the concat_ws string build; equality of (w_i..w_{i+k})
structs iff equality of the space-joined gram because split-on-space
tokens are space-free).

Equality of (doc_id, n_words, max_2gram_count, dup_3gram_count) is
asserted across all arms before timing. Interleaved, noop sink,
median of RUNS.

Usage: [RUNS=5] python tools/profile_repstats_r13.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vectorchord_spark.pipeline.text import repetition_stats, words
from vectorchord_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("RUNS", "5"))


# ---------------------------------------------------------------- kernels
def _bind(arr_expr: Column, fn) -> Column:
    """Bind an array expression to a lambda variable (the shingles fix):
    transform over a one-element array evaluates arr_expr ONCE."""
    return F.element_at(F.transform(F.array(arr_expr), fn), 1)


def _run_stats(g: Column) -> Column:
    """struct(max_run bigint, dup bigint) over gram array g via run
    boundaries of the sorted array. Empty array -> (0, 0), matching the
    production fold's zero accumulator."""

    def over_sorted(s: Column) -> Column:
        n = F.size(s)

        starts_expr = F.filter(
            F.sequence(F.lit(1), n),
            lambda i: (i == F.lit(1))
            | ~F.element_at(s, i).eqNullSafe(F.element_at(s, i - F.lit(1))),
        )

        def with_starts(starts: Column) -> Column:
            ends = F.concat(
                F.slice(starts, 2, F.size(starts)), F.array(n + F.lit(1))
            )
            runlens_expr = F.zip_with(ends, starts, lambda a, b: a - b)

            def with_runlens(runlens: Column) -> Column:
                return F.struct(
                    F.array_max(runlens).cast("bigint").alias("max_run"),
                    (
                        n - F.size(F.filter(runlens, lambda x: x == F.lit(1)))
                    )
                    .cast("bigint")
                    .alias("dup"),
                )

            return _bind(runlens_expr, with_runlens)

        return _bind(starts_expr, with_starts)

    zero = F.struct(
        F.lit(0).cast("bigint").alias("max_run"),
        F.lit(0).cast("bigint").alias("dup"),
    )
    return _bind(
        F.array_sort(g),
        lambda s: F.when(F.size(s) >= 1, over_sorted(s)).otherwise(zero),
    )


def _grams_str(w: Column, n_w: Column, k: int) -> Column:
    return F.when(
        n_w >= k,
        F.transform(
            F.sequence(F.lit(1), n_w - (k - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(w, i + j) for j in range(k)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _grams_struct(w: Column, n_w: Column, k: int) -> Column:
    typ = "array<struct<" + ",".join(f"w{j}:string" for j in range(k)) + ">>"
    return F.when(
        n_w >= k,
        F.transform(
            F.sequence(F.lit(1), n_w - (k - 1)),
            lambda i: F.struct(
                *[F.element_at(w, i + j).alias(f"w{j}") for j in range(k)]
            ),
        ),
    ).otherwise(F.array().cast(typ))


def _stats_frame(df: DataFrame, grams_fn) -> DataFrame:
    def per_words(w: Column) -> Column:
        n_w = F.size(w)
        s2 = _bind(grams_fn(w, n_w, 2), _run_stats)
        s3 = _bind(grams_fn(w, n_w, 3), _run_stats)
        return F.struct(
            n_w.cast("bigint").alias("n_words"),
            s2["max_run"].alias("max2"),
            s3["dup"].alias("dup3"),
        )

    st = _bind(words("text"), per_words)
    return df.select(
        "doc_id",
        st["n_words"].alias("n_words"),
        st["max2"].alias("max_2gram_count"),
        st["dup3"].alias("dup_3gram_count"),
    )


# ------------------------------------------------- arrow/numpy kernel
def _repstats_batch(col):
    """(n_words, max2, dup3) int64 numpy arrays for one Arrow string
    column, exact counting: Arrow split_pattern (same semantics as
    Java/Python split-on-space incl. empty parts) + dictionary_encode
    (exact C++ factorize), then per-(doc, gram) counts from composed
    integer codes — no Python string objects, no hashing collisions."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    n = len(col)
    max2 = np.zeros(n, dtype=np.int64)
    dup3 = np.zeros(n, dtype=np.int64)
    lst = pc.split_pattern(col, " ")
    lens = lst.value_lengths().to_numpy(zero_copy_only=False)
    null_mask = np.isnan(lens) if lens.dtype.kind == "f" else None
    if null_mask is not None:
        lens = np.where(null_mask, 0, lens)
    lens = lens.astype(np.int64)
    n_words = lens.copy()
    if null_mask is not None:
        n_words[null_mask] = -1  # size(split(NULL)) = -1
    total = int(lens.sum())
    if total == 0:
        return n_words, max2, dup3
    flat = lst.flatten()
    enc = pc.dictionary_encode(flat)
    wcode = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    K = np.int64(len(enc.dictionary))
    dix = np.repeat(np.arange(n, dtype=np.int64), lens)

    def group_stats(keys, docs, out_max, out_dup):
        if len(keys) == 0:
            return
        kc, ku = pd.factorize(keys)
        comb = docs * np.int64(len(ku)) + kc
        gid, gu = pd.factorize(comb)
        cnt = np.bincount(gid).astype(np.int64)
        gdoc = gu // np.int64(len(ku))
        np.maximum.at(out_max, gdoc, cnt)
        m = cnt >= 2
        np.add.at(out_dup, gdoc[m], cnt[m])

    if total >= 2:
        same = dix[:-1] == dix[1:]
        g2 = (wcode[:-1] * K + wcode[1:])[same]
        d2 = dix[:-1][same]
        group_stats(g2, d2, max2, np.zeros(n, dtype=np.int64))
        if total >= 3 and len(g2):
            p2, _ = pd.factorize(g2)
            pair_full = np.full(total - 1, -1, dtype=np.int64)
            pair_full[same] = p2
            same3 = same[:-1] & same[1:]
            g3 = (pair_full[:-1] * K + wcode[2:])[same3]
            d3 = dix[:-2][same3]
            group_stats(g3, d3, np.zeros(n, dtype=np.int64), dup3)
    return n_words, max2, dup3


def arm_arrow(df: DataFrame) -> DataFrame:
    import pyarrow as pa

    def batches(it):
        import numpy as np
        import pyarrow as pa

        for b in it:
            ids = b.column(0)
            nw, m2, d3 = _repstats_batch(b.column(1))
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(nw), pa.array(m2), pa.array(d3)],
                names=["doc_id", "n_words", "max_2gram_count", "dup_3gram_count"],
            )

    return df.select("doc_id", "text").mapInArrow(
        batches,
        "doc_id bigint, n_words bigint, max_2gram_count bigint, "
        "dup_3gram_count bigint",
    )


# ----------------------------------------------------------------- arms
def _old_jvm_repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The pre-r13-session-9 pure-JVM implementation (sorted gram arrays +
    interpreted struct-fold aggregates), kept verbatim so the A/B against
    the production mapInArrow kernel stays reproducible."""

    def grams(w: Column, n_w: Column, k: int) -> Column:
        return F.when(
            n_w >= k,
            F.transform(
                F.sequence(F.lit(1), n_w - (k - 1)),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(w, i + j) for j in range(k)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    def max_run(g: Column) -> Column:
        return F.aggregate(
            F.array_sort(g),
            F.struct(
                F.lit(None).cast("string").alias("prev"),
                F.lit(0).cast("bigint").alias("run"),
                F.lit(0).cast("bigint").alias("best"),
            ),
            lambda a, x: F.struct(
                x.alias("prev"),
                F.when(x.eqNullSafe(a["prev"]), a["run"] + F.lit(1))
                .otherwise(F.lit(1))
                .cast("bigint")
                .alias("run"),
                F.greatest(
                    a["best"],
                    F.when(
                        x.eqNullSafe(a["prev"]), a["run"] + F.lit(1)
                    ).otherwise(F.lit(1).cast("bigint")),
                )
                .cast("bigint")
                .alias("best"),
            ),
            lambda a: a["best"],
        )

    def dup_total(g: Column) -> Column:
        return F.aggregate(
            F.array_sort(g),
            F.struct(
                F.lit(None).cast("string").alias("prev"),
                F.lit(0).cast("bigint").alias("run"),
                F.lit(0).cast("bigint").alias("tot"),
            ),
            lambda a, x: F.struct(
                x.alias("prev"),
                F.when(x.eqNullSafe(a["prev"]), a["run"] + F.lit(1))
                .otherwise(F.lit(1))
                .cast("bigint")
                .alias("run"),
                F.when(x.eqNullSafe(a["prev"]), a["tot"])
                .otherwise(
                    a["tot"]
                    + F.when(a["run"] >= 2, a["run"]).otherwise(F.lit(0))
                )
                .cast("bigint")
                .alias("tot"),
            ),
            lambda a: (
                a["tot"] + F.when(a["run"] >= 2, a["run"]).otherwise(F.lit(0))
            ).cast("bigint"),
        )

    def per_words(w: Column) -> Column:
        n_w = F.size(w)
        max2 = F.element_at(
            F.transform(F.array(grams(w, n_w, 2)), lambda g2: max_run(g2)), 1
        )
        dup3 = F.element_at(
            F.transform(F.array(grams(w, n_w, 3)), lambda g3: dup_total(g3)), 1
        )
        return F.struct(
            n_w.cast("bigint").alias("n_words"),
            max2.alias("max2"),
            dup3.alias("dup3"),
        )

    stats = F.element_at(F.transform(F.array(words(text_col)), per_words), 1)
    out = df.withColumn("_rs", stats)
    nwd = F.col("_rs.n_words").cast("double")
    return out.withColumns(
        {
            "n_words": F.col("_rs.n_words"),
            "max_2gram_count": F.col("_rs.max2"),
            "dup_3gram_count": F.col("_rs.dup3"),
            "top_2gram_frac": F.lit(2.0) * F.col("_rs.max2").cast("double") / nwd,
            "dup_3gram_frac": F.least(
                F.lit(3.0) * F.col("_rs.dup3").cast("double") / nwd, F.lit(1.0)
            ),
        }
    ).drop("_rs")


def arm_old(df: DataFrame) -> DataFrame:
    return _old_jvm_repetition_stats(df).select(
        "doc_id", "n_words", "max_2gram_count", "dup_3gram_count"
    )


def arm_new(df: DataFrame) -> DataFrame:
    return repetition_stats(df).select(
        "doc_id", "n_words", "max_2gram_count", "dup_3gram_count"
    )


def arm_bnd(df: DataFrame) -> DataFrame:
    return _stats_frame(df, _grams_str)


def arm_bnd_struct(df: DataFrame) -> DataFrame:
    return _stats_frame(df, _grams_struct)


def main() -> None:
    spark = get_spark(app_name="profile-repstats-r13")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    docs.count()

    arms = {"old": arm_old, "arrow": arm_arrow, "new": arm_new}

    # equality gate first
    base = None
    for name, fn in arms.items():
        rows = sorted(
            (r["doc_id"], r["n_words"], r["max_2gram_count"], r["dup_3gram_count"])
            for r in fn(docs).collect()
        )
        if base is None:
            base = rows
        else:
            assert rows == base, f"arm {name} diverges from old"
    print(f"# equality OK over {len(base)} docs")

    times: dict[str, list[float]] = {a: [] for a in arms}
    for _ in range(RUNS):
        for name, fn in arms.items():
            spark.sparkContext.setJobDescription(f"repstats {name}")
            t0 = time.perf_counter()
            fn(docs).write.format("noop").mode("overwrite").save()
            times[name].append(time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)

    for name in arms:
        xs = sorted(times[name])
        print(f"{name:12} median {xs[len(xs) // 2]:.3f}s  {['%.2f' % x for x in xs]}")
    spark.stop()


if __name__ == "__main__":
    main()
