"""SQL-transparent ANN: the analyzed-plan rewrite of ORDER BY distance
LIMIT k onto a registered index (the Spark-first analogue of the
reference's planner strategies, sql/install/vchord--1.1.1.sql:1138-1228)."""

import os
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from vectorchord_spark.functions.quantize import register_sql_functions
from vectorchord_spark.operators.ivf import IvfIndex, IvfOptions
from vectorchord_spark.plans import (
    ann_sql,
    register_ann_index,
    try_rewrite_range,
    try_rewrite_topk,
    unregister_ann_index,
)


@pytest.fixture(scope="module")
def setup(spark, sf_dir, tmp_path_factory):
    register_sql_functions(spark)
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    emb.createOrReplaceTempView("tp_embeddings")
    base = str(tmp_path_factory.mktemp("tp_idx"))
    idx = IvfIndex.build(
        spark, emb, "vec_id", "embedding", os.path.join(base, "l2"),
        IvfOptions(metric="l2", lists=[8]),
    )
    register_ann_index("tp_embeddings", "embedding", idx, id_col="vec_id")
    dim = len(emb.first().embedding)
    rng = np.random.default_rng(5)
    q = [round(float(x), 3) for x in rng.uniform(-1, 1, dim)]
    arr = "array(" + ",".join(repr(v) for v in q) + ")"
    yield spark, arr, q
    unregister_ann_index("tp_embeddings")


def test_aliased_rewrite_exact(setup):
    spark, arr, _ = setup
    sql = (
        f"SELECT vec_id, vc_l2(embedding, {arr}) AS d "
        f"FROM tp_embeddings ORDER BY d LIMIT 10"
    )
    assert try_rewrite_topk(spark, spark.sql(sql)) is not None
    plain = [(r.vec_id, round(r.d, 9)) for r in spark.sql(sql).collect()]
    fast = [(r.vec_id, round(r.d, 9)) for r in ann_sql(spark, sql).collect()]
    assert fast == plain


def test_inline_rewrite_and_star(setup):
    spark, arr, _ = setup
    sql = (
        f"SELECT vec_id FROM tp_embeddings "
        f"ORDER BY vc_l2(embedding, {arr}) LIMIT 5"
    )
    assert try_rewrite_topk(spark, spark.sql(sql)) is not None
    assert [r.vec_id for r in ann_sql(spark, sql).collect()] == [
        r.vec_id for r in spark.sql(sql).collect()
    ]
    star = (
        f"SELECT * FROM tp_embeddings "
        f"ORDER BY vc_l2(embedding, {arr}) LIMIT 3"
    )
    fast = ann_sql(spark, star)
    assert try_rewrite_topk(spark, spark.sql(star)) is not None
    assert fast.columns == spark.sql(star).columns
    assert [r.vec_id for r in fast.collect()] == [
        r.vec_id for r in spark.sql(star).collect()
    ]
    # the k-row result side must be broadcast into the join-back — the base
    # table is never shuffled
    from vectorchord_spark.plans import has_broadcast_join

    assert has_broadcast_join(fast)


def test_no_rewrite_shapes(setup):
    spark, arr, _ = setup
    # aggregates, descending order, unregistered metric, unregistered table
    for sql in [
        "SELECT count(*) AS n FROM tp_embeddings",
        f"SELECT vec_id FROM tp_embeddings ORDER BY vc_l2(embedding, {arr}) DESC LIMIT 3",
        f"SELECT vec_id FROM tp_embeddings ORDER BY vc_ip(embedding, {arr}) LIMIT 3",
        "SELECT vec_id FROM tp_embeddings ORDER BY vec_id LIMIT 3",
    ]:
        assert try_rewrite_topk(spark, spark.sql(sql)) is None, sql
        # and ann_sql still answers correctly via fallback
        assert ann_sql(spark, sql).count() == spark.sql(sql).count()


def test_dot_metric_rewrite(setup, spark, sf_dir, tmp_path_factory):
    _, arr, q = setup
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    base = str(tmp_path_factory.mktemp("tp_idx_dot"))
    idx = IvfIndex.build(
        spark, emb, "vec_id", "embedding", os.path.join(base, "dot"),
        IvfOptions(metric="dot", lists=[8]),
    )
    emb.createOrReplaceTempView("tp_embeddings_dot")
    register_ann_index("tp_embeddings_dot", "embedding", idx, id_col="vec_id")
    try:
        sql = (
            f"SELECT vec_id, vc_ip(embedding, {arr}) AS d "
            f"FROM tp_embeddings_dot ORDER BY d LIMIT 10"
        )
        assert try_rewrite_topk(spark, spark.sql(sql)) is not None
        plain = [(r.vec_id, round(r.d, 9)) for r in spark.sql(sql).collect()]
        fast = [(r.vec_id, round(r.d, 9)) for r in ann_sql(spark, sql).collect()]
        assert fast == plain
    finally:
        unregister_ann_index("tp_embeddings_dot")


def test_range_rewrite_exact(setup):
    spark, arr, _ = setup
    sql = (
        f"SELECT vec_id, vc_l2(embedding, {arr}) AS d "
        f"FROM tp_embeddings WHERE vc_l2(embedding, {arr}) < 4.5"
    )
    assert try_rewrite_range(spark, spark.sql(sql)) is not None
    plain = sorted((r.vec_id, round(r.d, 9)) for r in spark.sql(sql).collect())
    fast = sorted((r.vec_id, round(r.d, 9)) for r in ann_sql(spark, sql).collect())
    assert fast == plain and len(plain) > 0
    # reversed comparison matches; <= (non-strict) does not rewrite
    rev = f"SELECT vec_id FROM tp_embeddings WHERE 4.5 > vc_l2(embedding, {arr})"
    assert try_rewrite_range(spark, spark.sql(rev)) is not None
    lte = f"SELECT vec_id FROM tp_embeddings WHERE vc_l2(embedding, {arr}) <= 4.5"
    assert try_rewrite_range(spark, spark.sql(lte)) is None


def test_maxsim_rewrite_exact(setup, spark, sf_dir):
    _, _, q = setup
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    docs = (
        emb.withColumn("doc_id", F.expr("vec_id div 5"))
        .groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("vec_id").alias("t"), F.col("embedding").alias("v"))
                )
            ).alias("s")
        )
        .select("doc_id", F.transform("s", lambda x: x["v"]).alias("vecs"))
    )
    docs.createOrReplaceTempView("tp_mvdocs")
    with tempfile.TemporaryDirectory() as tmp:
        idx = IvfIndex.build_multivector(
            spark, docs, "doc_id", "vecs", os.path.join(tmp, "mv"),
            IvfOptions(metric="dot", lists=[8]),
        )
        register_ann_index("tp_mvdocs", "vecs", idx, id_col="doc_id")
        try:
            rng = np.random.default_rng(9)
            dim = len(q)
            toks = [
                [round(float(x), 3) for x in rng.uniform(-1, 1, dim)]
                for _ in range(3)
            ]
            nested = "array(" + ",".join(
                "array(" + ",".join(repr(v) for v in t) + ")" for t in toks
            ) + ")"
            sql = (
                f"SELECT doc_id, vc_maxsim(vecs, {nested}) AS s "
                f"FROM tp_mvdocs ORDER BY s LIMIT 10"
            )
            assert try_rewrite_topk(spark, spark.sql(sql)) is not None
            plain = [(r.doc_id, round(r.s, 9)) for r in spark.sql(sql).collect()]
            fast = [(r.doc_id, round(r.s, 9)) for r in ann_sql(spark, sql).collect()]
            assert fast == plain
        finally:
            unregister_ann_index("tp_mvdocs")


def test_graph_index_registration(setup, spark, sf_dir, tmp_path_factory):
    """A Vamana graph index plugs into the same transparent rewrite via
    search_kwargs; sphere queries don't rewrite (graph is top-k only)."""
    from vectorchord_spark.operators.graph import VamanaIndex, VamanaOptions

    _, arr, q = setup
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    base = str(tmp_path_factory.mktemp("tp_graph"))
    gidx = VamanaIndex.build(
        spark, emb, "vec_id", "embedding", os.path.join(base, "g"),
        VamanaOptions(metric="l2", m=16, ef_construction=32, n_shards=2),
    )
    emb.createOrReplaceTempView("tp_emb_graph")
    register_ann_index(
        "tp_emb_graph", "embedding", gidx, id_col="vec_id",
        search_kwargs={"ef_search": 64, "probe_shards": 2},
    )
    try:
        sql = (
            f"SELECT vec_id FROM tp_emb_graph "
            f"ORDER BY vc_l2(embedding, {arr}) LIMIT 10"
        )
        got = ann_sql(spark, sql)
        assert try_rewrite_topk(spark, spark.sql(sql)) is not None
        ids = [r.vec_id for r in got.collect()]
        exact = [r.vec_id for r in spark.sql(sql).collect()]
        assert len(ids) == 10
        assert len(set(ids) & set(exact)) >= 8  # graph is approximate
        rng_sql = (
            f"SELECT vec_id FROM tp_emb_graph "
            f"WHERE vc_l2(embedding, {arr}) < 4.5"
        )
        assert try_rewrite_range(spark, spark.sql(rng_sql)) is None
    finally:
        unregister_ann_index("tp_emb_graph")


def test_probed_registration_approximate(setup, spark, sf_dir):
    """A probed registration serves approximate results — still top-k
    shaped, high recall on this data."""
    _, arr, q = setup
    reg_sql = (
        f"SELECT vec_id FROM tp_embeddings "
        f"ORDER BY vc_l2(embedding, {arr}) LIMIT 10"
    )
    exact_ids = [r.vec_id for r in spark.sql(reg_sql).collect()]
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    from vectorchord_spark.plans.transparent import _REGISTRY

    reg = _REGISTRY["tp_embeddings"]
    idx = reg.index
    register_ann_index(
        "tp_embeddings", "embedding", idx, id_col="vec_id",
        probes=[6], rerank_factor=4,
    )
    try:
        got = ann_sql(spark, reg_sql)
        ids = [r.vec_id for r in got.collect()]
        assert len(ids) == 10
        assert len(set(ids) & set(exact_ids)) >= 7
    finally:
        register_ann_index("tp_embeddings", "embedding", idx, id_col="vec_id")
