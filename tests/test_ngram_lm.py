"""Stupid-backoff n-gram LM (CCNet perplexity-filter stage): the JVM
scoring plan must reproduce a Python reference of the same model
bit-for-bit on the exact-integer counts, and the filter must separate
in-domain text from gibberish."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from vectorchord_spark.pipeline import ngram_lm as LM


@pytest.fixture(scope="module")
def ref_corpus(spark):
    # a tiny "reference distribution": sentences over a 12-word grammar
    rng = np.random.default_rng(7)
    subj = ["the cat", "the dog", "a bird"]
    verb = ["sat on", "looked at", "ran past"]
    obj = ["the mat", "the tree", "a house"]
    rows = [
        (i, f"{subj[rng.integers(3)]} {verb[rng.integers(3)]} {obj[rng.integers(3)]}")
        for i in range(300)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def _py_counts(texts, order, min_count):
    """Reference n-gram counts with the module's single-BOS padding."""
    tabs = [dict() for _ in range(order)]
    for t in texts:
        toks = [LM._BOS] + t.split(" ")
        n = len(toks)
        for k in range(1, order + 1):
            for i in range(k, n + 1):
                g = " ".join(toks[i - k : i])
                tabs[k - 1][g] = tabs[k - 1].get(g, 0) + 1
    for k in range(2, order + 1):
        tabs[k - 1] = {g: c for g, c in tabs[k - 1].items() if c >= min_count}
    return tabs


def _py_score(text, tabs, total, order, alpha=LM._ALPHA, floor=1e-9):
    toks = [LM._BOS] + text.split(" ")
    n = len(toks)
    ls = 0.0
    for i in range(2, n + 1):
        s = None
        for k in range(order, 1, -1):
            if i < k:
                continue
            g = " ".join(toks[i - k : i])
            ctx = " ".join(toks[i - k : i - 1])
            if g in tabs[k - 1]:
                s = (alpha ** (order - k)) * (tabs[k - 1][g] / tabs[k - 2][ctx])
                break
        if s is None:
            w = toks[i - 1]
            if w in tabs[0]:
                s = (alpha ** (order - 1)) * (tabs[0][w] / total)
            else:
                s = floor
        ls += math.log2(s)
    return n - 1, ls


def test_train_counts_match_python(spark, ref_corpus):
    lm = LM.train_ngram_lm(ref_corpus, order=3, min_count=2)
    texts = [r.text for r in ref_corpus.collect()]
    want = _py_counts(texts, 3, 2)
    for k in range(1, 4):
        got = {r.gram: r.cnt for r in lm.counts[k - 1].collect()}
        assert got == want[k - 1], f"order {k}"
    assert lm.total_unigrams == sum(
        c for g, c in want[0].items() if g != LM._BOS
    )
    assert lm.sizes == [len(t) for t in want]


def test_score_matches_python_reference(spark, ref_corpus):
    lm = LM.train_ngram_lm(ref_corpus, order=3, min_count=2)
    texts = [r.text for r in ref_corpus.collect()]
    tabs = _py_counts(texts, 3, 2)
    total = sum(c for g, c in tabs[0].items() if g != LM._BOS)
    test = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),       # pure in-domain
            (2, "a bird ran past a house"),      # in-domain, rarer path
            (3, "the cat zzz qqq the mat"),      # OOV tokens -> floor
            (4, "mat the on sat cat the"),       # in-vocab, scrambled order
            (5, "hello"),                        # single OOV token
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_tokens, r.logscore_sum, r.bits_per_token)
        for r in LM.score_lm(test, lm).collect()
    }
    for did, text in [(r.doc_id, r.text) for r in test.collect()]:
        n, ls = _py_score(text, tabs, total, 3)
        assert got[did][0] == n, f"doc {did} n_tokens"
        # same tiers, same exact-int ratios, log2+sum in double: the only
        # tolerance is the Spark sum's accumulation order across rows
        assert got[did][1] == pytest.approx(ls, rel=0, abs=1e-9), f"doc {did}"
        assert got[did][2] == pytest.approx(-ls / n, rel=0, abs=1e-9)


def test_scoring_plan_is_jvm_only(spark, ref_corpus):
    lm = LM.train_ngram_lm(ref_corpus, order=3, min_count=2)
    plan = (
        LM.score_lm(ref_corpus, lm)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                   "FlatMapGroupsInPandas", "PythonMapInArrow"):
        assert marker not in plan, f"python stage in scoring plan: {marker}"


def test_perplexity_filter_separates_gibberish(spark, ref_corpus):
    lm = LM.train_ngram_lm(ref_corpus, order=3, min_count=2)
    rng = np.random.default_rng(3)
    vocab = ["the", "cat", "dog", "sat", "on", "mat", "tree", "a",
             "bird", "looked", "at", "ran", "past", "house"]
    rows = []
    for i in range(40):  # in-domain
        rows.append((i, "the cat sat on the mat"))
    for i in range(40, 80):  # shuffled vocab = off-distribution
        rows.append((i, " ".join(rng.choice(vocab, 6))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    scored = LM.score_lm(docs, lm).toPandas().set_index("doc_id")
    in_bits = scored.loc[:39]["bits_per_token"].mean()
    out_bits = scored.loc[40:]["bits_per_token"].mean()
    assert in_bits + 1.0 < out_bits, (in_bits, out_bits)
    kept = LM.perplexity_filter(docs, lm, quantile=0.5)
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    # the kept half should be overwhelmingly the in-domain half
    assert len(kept_ids & set(range(40))) >= 35
    with pytest.raises(ValueError, match="exactly one"):
        LM.perplexity_filter(docs, lm)


def test_order_1_and_bad_order(spark, ref_corpus):
    with pytest.raises(ValueError, match="order"):
        LM.train_ngram_lm(ref_corpus, order=0)
    lm1 = LM.train_ngram_lm(ref_corpus, order=1)
    out = LM.score_lm(
        spark.createDataFrame([(1, "the cat")], "doc_id long, text string"),
        lm1,
    ).collect()[0]
    # unigram-only: S = c(w)/total per token, no backoff tiers
    texts = [r.text for r in ref_corpus.collect()]
    tabs = _py_counts(texts, 1, 1)
    total = sum(c for g, c in tabs[0].items() if g != LM._BOS)
    want = math.log2(tabs[0]["the"] / total) + math.log2(tabs[0]["cat"] / total)
    assert out.logscore_sum == pytest.approx(want, abs=1e-12)


def test_short_and_empty_docs_train_and_score(spark, ref_corpus):
    """Real crawl corpora contain docs shorter than the model order
    (including empty strings): F.sequence(k, n) DESCENDS when n < k,
    which walked element_at through index 0 / out-of-bounds and aborted
    the job under ANSI mode before the positions guard."""
    rows = [
        (1, ""),                      # empty doc -> [BOS, ''] padded
        (2, "hello"),                 # one word < order
        (3, "the cat"),               # two words < order=3's 3-gram
        (4, "the cat sat on the mat"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    lm = LM.train_ngram_lm(docs, order=3, min_count=1)
    # count parity with the Python reference on the same short corpus
    want = _py_counts([r[1] for r in rows], 3, 1)
    for k in range(1, 4):
        got = {r.gram: r.cnt for r in lm.counts[k - 1].collect()}
        assert got == want[k - 1], f"order {k}"
    # scoring the same mixed-length corpus must not abort either, and
    # must match the Python reference per doc
    total = sum(c for g, c in want[0].items() if g != LM._BOS)
    got = {
        r.doc_id: (r.n_tokens, r.logscore_sum)
        for r in LM.score_lm(docs, lm).collect()
    }
    for did, text in rows:
        n, ls = _py_score(text, want, total, 3)
        assert got[did][0] == n, f"doc {did}"
        assert got[did][1] == pytest.approx(ls, rel=0, abs=1e-9), f"doc {did}"


def test_score_shuffle_join_fallback_parity(spark, ref_corpus):
    """broadcast_max_rows=0 forces every count join onto the shuffle
    path (the web-scale-reference-corpus fallback); scores must be
    identical to the broadcast plan, and the fallback plan must really
    drop the broadcast exchanges."""
    lm = LM.train_ngram_lm(ref_corpus, order=3, min_count=2)
    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "zzz qqq"), (3, "")],
        "doc_id long, text string",
    )
    a = {r.doc_id: r.logscore_sum for r in LM.score_lm(docs, lm).collect()}
    b = {
        r.doc_id: r.logscore_sum
        for r in LM.score_lm(docs, lm, broadcast_max_rows=0).collect()
    }
    assert a == b
    # with the auto-broadcast threshold off, only the explicit hint can
    # produce a broadcast join: the fallback plan must have none (at
    # real scale Catalyst re-enables broadcast only while tables fit
    # its own threshold — exactly the desired behavior)
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            LM.score_lm(docs, lm, broadcast_max_rows=0)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" not in plan
        hinted = (
            LM.score_lm(docs, lm)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in hinted
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)


def test_train_releases_previous_lm_cache(spark, ref_corpus):
    """Bounded cache: training a second LM unpersists the first's count
    tables (long-lived sessions must not accumulate cached partitions);
    the first LM still scores correctly via recompute."""
    # distinct corpora — identical plans would re-enter the CacheManager
    # under the same key and mask the release
    lm1 = LM.train_ngram_lm(ref_corpus.where(F.col("doc_id") % 2 == 0),
                            order=2, min_count=2)
    assert all(t.storageLevel.useMemory for t in lm1.counts)
    lm2 = LM.train_ngram_lm(ref_corpus.where(F.col("doc_id") % 2 == 1),
                            order=2, min_count=2)
    assert all(not t.storageLevel.useMemory for t in lm1.counts)
    assert all(t.storageLevel.useMemory for t in lm2.counts)
    # the evicted LM still works (recompute path)
    got = LM.score_lm(ref_corpus.limit(5), lm1).collect()
    assert len(got) == 5 and all(r["bits_per_token"] > 0 for r in got)
    lm2.unpersist()
