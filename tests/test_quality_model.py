"""Quality-classifier tests: separation on held-out data, int-exact
scoring parity with a Python oracle, and the pure-JVM plan contract."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from vectorchord_spark.pipeline import quality_model as QM


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


@pytest.fixture(scope="module")
def labeled(spark, docs):
    """Positive = real documents; negative = the same docs with words
    replaced by deterministic gibberish tokens (md5 of doc_id + position)
    — distributionally separable, derived with no randomness."""
    pos = docs.select(
        F.col("doc_id"), F.col("text"), F.lit(1).alias("label")
    )
    neg = docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.array_join(
            F.transform(
                F.split("text", " "),
                lambda w, i: F.substring(
                    F.md5(F.concat(F.col("doc_id").cast("string"), i.cast("string"))),
                    1,
                    6,
                ),
            ),
            " ",
        ).alias("text"),
        F.lit(0).alias("label"),
    )
    return pos.unionByName(neg).cache()


def test_train_separates_held_out(spark, labeled):
    train = labeled.where(F.col("doc_id") % 5 != 0)
    test = labeled.where(F.col("doc_id") % 5 == 0)
    model = QM.train_quality_classifier(
        train, "label", dim=1 << 14, sample_cap=5000, epochs=8, seed=1
    )
    scored = QM.score_quality(test, model).join(
        test.select("doc_id", "label"), "doc_id"
    ).toPandas()
    assert len(scored) == test.count()
    acc = ((scored["logit"] > 0).astype(int) == scored["label"]).mean()
    assert acc > 0.9, f"held-out accuracy {acc}"
    # real docs score above gibberish on average, with a real margin
    mpos = scored[scored.label == 1]["logit"].mean()
    mneg = scored[scored.label == 0]["logit"].mean()
    assert mpos > mneg + 0.5


def test_score_matches_python_oracle(spark, docs):
    """The JVM scoring path (hash join + int sums + one division) must
    reproduce a per-doc Python rescore of the same model bit-for-bit."""
    model = {
        # deterministic dense fake model: weight(bucket) from a fixed LCG
        "w": (((np.arange(1 << 10, dtype=np.int64) * 2654435761) % 1999)
              .astype(np.float64) / 1999.0 - 0.5).astype(np.float32),
        "b": 0.125,
        "dim": 1 << 10,
        "bigrams": False,
    }
    got = QM.score_quality(docs, model).toPandas().set_index("doc_id")

    feats = QM.quality_features(
        docs, dim=model["dim"], bigrams=False
    ).toPandas()
    wq = np.rint(np.asarray(model["w"], np.float64) * QM._SCALE).astype(np.int64)
    for doc_id, grp in feats.groupby("doc_id"):
        tf = grp["weight"].to_numpy(np.int64)
        dot = int((wq[grp["bucket"].to_numpy()] * tf).sum())
        n = int(tf.sum())
        row = got.loc[doc_id]
        assert int(row["dot"]) == dot
        assert int(row["n_terms"]) == n
        assert row["logit"] == dot / (1e6 * n) + 0.125


def test_bigram_features_change_hash_space(spark, docs):
    uni = QM.quality_features(docs, dim=1 << 12, bigrams=False)
    bi = QM.quality_features(docs, dim=1 << 12, bigrams=True)
    # bigrams add mass: total term frequency strictly increases for any
    # multi-word doc, and the unigram contribution is preserved
    tot_uni = uni.agg(F.sum("weight")).collect()[0][0]
    tot_bi = bi.agg(F.sum("weight")).collect()[0][0]
    assert tot_bi > tot_uni


def test_single_word_and_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, "hello"), (2, ""), (3, "a b")], "doc_id long, text string"
    )
    model = {
        "w": np.ones(64, np.float32),
        "b": 0.0,
        "dim": 64,
        "bigrams": True,
    }
    out = QM.score_quality(df, model).toPandas().set_index("doc_id")
    # one-word doc: exactly one unigram term, no bigram
    assert int(out.loc[1]["n_terms"]) == 1
    # "a b": two unigrams + one bigram
    assert int(out.loc[3]["n_terms"]) == 3
    # empty text still yields a row (the empty-string token)
    assert 2 in out.index


def test_scoring_plan_is_jvm_only(spark, docs):
    model = {"w": np.ones(256, np.float32), "b": 0.0, "dim": 256,
             "bigrams": True}
    plan = (
        QM.score_quality(docs, model)
        ._jdf.queryExecution().executedPlan().toString()
    )
    for marker in ("FlatMapGroupsInPandas", "MapInPandas", "ArrowEvalPython",
                   "BatchEvalPython"):
        assert marker not in plan, marker
    # r13 session 9: scoring is ONE vectorized Arrow node — per-document
    # sums complete inside the node, so the plan has NO join, NO
    # BroadcastExchange, and ZERO exchanges (the former groupBy(id)
    # shuffle is gone)
    assert "BroadcastHashJoin" not in plan, plan
    assert "BroadcastExchange" not in plan, plan
    assert plan.count("MapInArrow") == 1, plan
    assert "Exchange hashpartitioning" not in plan, plan
