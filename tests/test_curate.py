"""End-to-end curation tests: the kept/audit partition invariant, stage
reason correctness, and config toggles."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from vectorchord_spark.pipeline.curate import CurateConfig, CurateResult, curate


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


@pytest.fixture(scope="module")
def bench_df(docs):
    # a 5-doc "benchmark" taken from the corpus itself guarantees
    # contamination hits exist
    return docs.where(F.col("doc_id") % 97 == 0).limit(5).select("text").cache()


def test_kept_and_audit_partition_input(spark, docs, bench_df):
    res = curate(docs, CurateConfig(benchmark=bench_df, min_words=5))
    all_ids = {r[0] for r in docs.select("doc_id").collect()}
    kept_ids = {r[0] for r in res.kept.select("doc_id").collect()}
    audit = res.audit.collect()
    dropped_ids = {r["id"] for r in audit}
    # disjoint and exhaustive
    assert kept_ids & dropped_ids == set()
    assert kept_ids | dropped_ids == all_ids
    # audit has no duplicate ids (one drop reason per doc)
    assert len(audit) == len(dropped_ids)
    # stats agrees with audit
    assert sum(res.stats.values()) == len(audit)
    # kept keeps the original schema
    assert res.kept.columns == docs.columns


def test_stage_reasons_are_true(spark, docs, bench_df):
    res = curate(docs, CurateConfig(benchmark=bench_df, min_words=5))
    rows = {r["id"]: r for r in res.audit.collect()}
    pdf = {r["doc_id"]: r["text"] for r in docs.collect()}
    for doc_id, r in rows.items():
        if r["stage"] == "length":
            assert len(pdf[doc_id].split(" ")) < 5
        elif r["stage"] == "exact_dup":
            keeper = int(r["detail"].split("=")[1])
            assert pdf[keeper] == pdf[doc_id]
            assert keeper < doc_id
        elif r["stage"] == "contaminated":
            assert int(r["detail"]) >= 1
    # the planted benchmark must contaminate at least its own source docs
    # (minus any that an earlier stage already removed)
    assert any(r["stage"] == "contaminated" for r in rows.values())
    assert any(r["stage"] == "exact_dup" or r["stage"] == "near_dup"
               for r in rows.values())


def test_language_filter_uses_existing_column(spark, docs):
    langs = [r[0] for r in docs.select("lang").distinct().collect()]
    assert len(langs) > 1, "testdata should be multilingual"
    keep = (langs[0],)
    res = curate(
        docs,
        CurateConfig(
            langs=keep, min_words=0, max_top_2gram_frac=None,
            max_dup_3gram_frac=None, min_quality=None,
            exact_dedup=False, near_dedup=False,
        ),
    )
    kept_langs = {r[0] for r in res.kept.select("lang").distinct().collect()}
    assert kept_langs == set(keep)
    lang_drops = res.audit.where("stage = 'language'").count()
    assert lang_drops == docs.where(~F.col("lang").isin(*keep)).count()


def test_null_text_and_lang_are_dropped_and_audited(spark):
    """NULL is failure: a NULL text (length predicate → NULL) or a NULL
    lang (isin() → NULL) must be dropped AND audited, not silently kept —
    three-valued logic would otherwise let such rows pass every stage."""
    df = spark.createDataFrame(
        [
            (1, "a good long document with plenty of words here", "en"),
            (2, None, "en"),
            (3, "another good long document with plenty of words", None),
        ],
        "doc_id long, text string, lang string",
    )
    res = curate(
        df,
        CurateConfig(
            langs=("en",), min_words=5, max_top_2gram_frac=None,
            max_dup_3gram_frac=None, min_quality=None,
            exact_dedup=False, near_dedup=False,
        ),
    )
    kept_ids = {r[0] for r in res.kept.select("doc_id").collect()}
    audit = {r["id"]: r["stage"] for r in res.audit.collect()}
    assert kept_ids == {1}
    assert set(audit) == {2, 3}
    assert audit[2] == "length"  # NULL text fails the first check
    assert audit[3] == "language"  # NULL lang fails isin()


def test_perplexity_stage(spark):
    """CCNet perplexity stage: docs far from the reference LM are dropped
    with stage='perplexity' and the bits detail; in-domain docs pass."""
    from vectorchord_spark.pipeline.ngram_lm import score_lm, train_ngram_lm

    ref = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog every day")
         for i in range(50)],
        "doc_id long, text string",
    )
    lm = train_ngram_lm(ref, order=3, min_count=2)
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog every day"),
            (2, "zzz qqq vvv kkk yyy www mmm nnn ppp rrr sss"),
        ],
        "doc_id long, text string",
    )
    # pick the ceiling between the two docs' measured bits
    bits = {r.doc_id: r.bits_per_token for r in score_lm(docs, lm).collect()}
    assert bits[1] < bits[2]
    cut = (bits[1] + bits[2]) / 2
    res = curate(
        docs,
        CurateConfig(
            min_words=5, max_top_2gram_frac=None, max_dup_3gram_frac=None,
            min_quality=None, exact_dedup=False, near_dedup=False,
            ngram_lm=lm, max_bits_per_token=cut,
        ),
    )
    assert {r.doc_id for r in res.kept.collect()} == {1}
    audit = {r.id: r.stage for r in res.audit.collect()}
    assert audit == {2: "perplexity"}


def test_all_stages_off_keeps_everything(spark, docs):
    res = curate(
        docs,
        CurateConfig(
            min_words=0, max_top_2gram_frac=None, max_dup_3gram_frac=None,
            min_quality=None, exact_dedup=False, near_dedup=False,
        ),
    )
    assert res.kept.count() == docs.count()
    assert res.audit.count() == 0
    assert res.stats == {}


def test_learned_model_stage(spark, docs):
    # a model that fails everything: huge negative bias
    model = {"w": np.zeros(64, np.float32), "b": -5.0, "dim": 64,
             "bigrams": False}
    res = curate(
        docs,
        CurateConfig(
            min_words=0, max_top_2gram_frac=None, max_dup_3gram_frac=None,
            min_quality=None, exact_dedup=False, near_dedup=False,
            quality_model=model, min_logit=0.0,
        ),
    )
    assert res.kept.count() == 0
    assert res.stats == {"quality_model": docs.count()}


def test_row_filter_stages_are_one_stats_pass(spark, docs):
    """Stages 1-4 (no dedup, no model) must be ONE vectorized stats pass:
    exactly one MapInArrow node (r13: every row-filter statistic comes out
    of text.row_filter_stats — gram counting measured 3.6-10.5x over the
    interpreted JVM sort+fold HOFs), no row-at-a-time Python evaluation,
    and NO join — the r12 stats-join (a pushdown barrier that would
    shuffle the document payload at scale just to attach stats computed
    from it) is gone; the opaque node provides the same barrier."""
    for cfg in (
        CurateConfig(min_words=5, exact_dedup=False, near_dedup=False),
        # repetition off: the node still carries n_words/quality
        CurateConfig(
            min_words=5, max_top_2gram_frac=None, max_dup_3gram_frac=None,
            exact_dedup=False, near_dedup=False,
        ),
    ):
        res = curate(docs, cfg)
        plan = res.kept._jdf.queryExecution().executedPlan().toString()
        for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas",
                       "FlatMapGroupsInPandas"):
            assert marker not in plan, marker
        assert plan.count("MapInArrow") == 1
        assert "Join" not in plan, "row filters must not join"


def test_second_curate_releases_previous_cache(spark, docs):
    """Bounded cache: a new curate() call unpersists the previous call's
    survivor frames; the registry never grows past one call's worth."""
    from vectorchord_spark.pipeline import curate as CU

    r1 = curate(docs, CurateConfig(min_words=5))
    first = list(CU._PERSISTED)
    assert first and all(f.storageLevel.useMemory for f in first)
    n1 = r1.kept.count()
    # distinct config — an identical plan would re-enter the CacheManager
    # under the same key and mask the release
    r2 = curate(docs, CurateConfig(min_words=6))
    assert all(not f.storageLevel.useMemory for f in first)
    # the registry holds only the LATEST call's frames (no accumulation)
    assert len(CU._PERSISTED) == len(first)
    # the evicted result still evaluates correctly via recompute
    assert r1.kept.count() == n1


def test_dsir_selection_stage(spark, docs):
    """Optional stage 8: DSIR keeps the n most target-like survivors,
    drops land in audit as stage='dsir', and kept ∪ audit still
    partitions the input exactly."""
    from vectorchord_spark.pipeline.dsir import fit_dsir

    model = fit_dsir(
        docs.where(F.col("doc_id") % 10 == 0),
        docs.where(F.col("doc_id") % 10 != 0),
        dim=1 << 10,
    )
    cfg = CurateConfig(min_words=5, near_dedup=False, dsir_model=model,
                       dsir_n=25, dsir_seed=3)
    res = curate(docs, cfg)
    kept_ids = {r[0] for r in res.kept.select("doc_id").collect()}
    assert len(kept_ids) == 25
    audit = res.audit.collect()
    dsir_rows = [r for r in audit if r["stage"] == "dsir"]
    assert dsir_rows and all(r["detail"] is not None for r in dsir_rows)
    all_ids = {r[0] for r in docs.select("doc_id").collect()}
    audit_ids = {r["id"] for r in audit}
    assert kept_ids | audit_ids == all_ids
    assert not (kept_ids & audit_ids)
    assert sorted(res.kept.columns) == sorted(docs.columns)


def test_dsir_frac_stage_partitions_input(spark, docs):
    """Stage 8 with the frac (quantile-threshold) path also keeps the
    kept ∪ audit partition exact — including rows the scorer never saw."""
    from vectorchord_spark.pipeline.dsir import fit_dsir

    model = fit_dsir(
        docs.where(F.col("doc_id") % 10 == 0),
        docs.where(F.col("doc_id") % 10 != 0),
        dim=1 << 10,
    )
    res = curate(docs, CurateConfig(min_words=5, near_dedup=False,
                                    dsir_model=model, dsir_frac=0.3,
                                    dsir_seed=5))
    kept_ids = {r[0] for r in res.kept.select("doc_id").collect()}
    audit_ids = {r["id"] for r in res.audit.collect()}
    all_ids = {r[0] for r in docs.select("doc_id").collect()}
    assert kept_ids | audit_ids == all_ids
    assert not (kept_ids & audit_ids)
    assert 0 < len(kept_ids) < len(all_ids)
