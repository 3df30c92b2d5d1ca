"""LPT grouped-apply tests: exact partition placement by size rank,
result identity with the plain groupBy path, single-exchange plan."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from vectorchord_spark.operators.scheduling import (
    lpt_grouped_apply,
    lpt_partition_keys,
    spark_int_hash,
)


def test_lpt_keys_cover_all_indices():
    for n in (1, 2, 7, 161, 1000):
        keys = lpt_partition_keys(n)
        assert sorted(spark_int_hash(k) % n for k in keys) == list(range(n))


def test_lpt_grouped_apply_matches_plain_groupby(spark):
    df = spark.range(1000).select(
        (F.col("id") % 7).cast("int").alias("g"), F.col("id").alias("v")
    )

    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"g": [int(pdf["g"].iloc[0])], "s": [int(pdf["v"].sum())],
             "n": [len(pdf)]}
        )

    got = {
        r["g"]: (r["s"], r["n"])
        for r in lpt_grouped_apply(df, "g", agg, "g int, s long, n long").collect()
    }
    want = {
        r["g"]: (r["s"], r["n"])
        for r in df.groupBy("g")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_lpt_grouped_apply_biggest_group_in_partition_zero(spark):
    # group sizes: g=0 -> 300 rows, g=1 -> 100, g=2 -> 10
    rows = [(0, i) for i in range(300)] + [(1, i) for i in range(100)] + [
        (2, i) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "g int, v long")

    def tag(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"g": [int(pdf["g"].iloc[0])], "n": [len(pdf)]})

    out = lpt_grouped_apply(df, "g", tag, "g int, n long")
    # reconstruct placement: the golden key of rank r lands in partition r
    keys = lpt_partition_keys(3)
    assert spark_int_hash(keys[0]) % 3 == 0
    # behavioral check through the real shuffle: partition id per group
    placed = (
        df.withColumn(
            "_k",
            F.when(F.col("g") == 0, keys[0])
            .when(F.col("g") == 1, keys[1])
            .otherwise(keys[2])
            .cast("int"),
        )
        .repartition(3, "_k")
        .select("g", F.spark_partition_id().alias("pid"))
        .distinct()
        .collect()
    )
    pid = {r["g"]: r["pid"] for r in placed}
    assert pid == {0: 0, 1: 1, 2: 2}
    # and the apply still returns every group
    assert {r["g"]: r["n"] for r in out.collect()} == {0: 300, 1: 100, 2: 10}


def test_lpt_grouped_apply_explicit_sizes_and_plan(spark):
    df = spark.range(100).select(
        (F.col("id") % 3).cast("int").alias("g"), F.col("id").alias("v")
    )

    def f(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"g": [int(pdf["g"].iloc[0])]})

    out = lpt_grouped_apply(df, "g", f, "g int", sizes={0: 5.0, 1: 50.0, 2: 1.0})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert sorted(r["g"] for r in out.collect()) == [0, 1, 2]


def test_lpt_grouped_apply_join_mapping_above_literal_budget(spark, monkeypatch):
    """Above _LPT_MAP_LITERAL_MAX groups the key mapping ships as a
    broadcast join instead of a create_map literal (plan-size bound,
    10⁵-group SemDeDup regime); results must be identical to the plain
    groupBy path and the plan must not contain the literal map."""
    from vectorchord_spark.operators import scheduling as SCH

    monkeypatch.setattr(SCH, "_LPT_MAP_LITERAL_MAX", 3)
    df = spark.range(1000).select(
        (F.col("id") % 11).cast("int").alias("g"), F.col("id").alias("v")
    )

    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"g": [int(pdf["g"].iloc[0])], "s": [int(pdf["v"].sum())],
             "n": [len(pdf)]}
        )

    out = SCH.lpt_grouped_apply(df, "g", agg, "g int, s long, n long")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    got = {r["g"]: (r["s"], r["n"]) for r in out.collect()}
    want = {
        r["g"]: (r["s"], r["n"])
        for r in df.groupBy("g")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_lpt_grouped_apply_join_mapping_string_keys(spark, monkeypatch):
    """The broadcast-mapping path must honor the key column's actual
    dtype: string group keys (supported by the create_map literal path)
    previously raised on int(g) / the hardcoded long schema."""
    from vectorchord_spark.operators import scheduling as SCH

    monkeypatch.setattr(SCH, "_LPT_MAP_LITERAL_MAX", 3)
    df = spark.range(300).select(
        F.concat(F.lit("grp_"), (F.col("id") % 9).cast("string")).alias("g"),
        F.col("id").alias("v"),
    )

    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"g": [pdf["g"].iloc[0]], "s": [int(pdf["v"].sum())],
             "n": [len(pdf)]}
        )

    out = SCH.lpt_grouped_apply(df, "g", agg, "g string, s long, n long")
    got = {r["g"]: (r["s"], r["n"]) for r in out.collect()}
    want = {
        r["g"]: (r["s"], r["n"])
        for r in df.groupBy("g")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want
