"""DSIR importance resampling (arXiv:2302.03169): hashed-n-gram bucket
counts and log-ratio weights must match an exact Python reference, the
scoring plan must be pure JVM, and resampling must be deterministic and
biased toward target-like documents."""

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from vectorchord_spark.pipeline import dsir as DS


def _py_bucket(w: str, dim: int) -> int:
    return int(hashlib.md5(f"hb|{w}".encode()).hexdigest()[:6], 16) % dim


def _py_features(text: str, dim: int, bigrams: bool = True) -> dict:
    ws = text.split(" ")
    toks = list(ws)
    if bigrams and len(ws) >= 2:
        toks += [f"{a}_{b}" for a, b in zip(ws, ws[1:])]
    out: dict[int, int] = {}
    for t in toks:
        b = _py_bucket(t, dim)
        out[b] = out.get(b, 0) + 1
    return out


def _py_logw(text: str, model: dict) -> float:
    lw = DS._quantize_lw(model["lw"])
    feats = _py_features(text, model["dim"], model["bigrams"])
    return sum(c * int(lw[b]) for b, c in feats.items()) / DS._LW_SCALE


@pytest.fixture(scope="module")
def corpora(spark):
    # target: "science" domain; raw pool: mostly "web" junk + some
    # science-like docs the selector should prefer
    target = [(i, "atoms orbit the nucleus and electrons share bonds")
              for i in range(40)]
    raw = []
    for i in range(60):
        raw.append((i, "click here buy now free deal win prize today"))
    for i in range(60, 80):
        raw.append((i, "electrons orbit the nucleus and atoms share bonds"))
    t = spark.createDataFrame(target, "doc_id long, text string")
    r = spark.createDataFrame(raw, "doc_id long, text string")
    return t.cache(), r.cache(), dict(target), dict(raw)


def test_fit_counts_and_weights_match_python(spark, corpora):
    t_df, r_df, t_rows, r_rows = corpora
    dim = 1 << 10
    model = DS.fit_dsir(t_df, r_df, dim=dim, bigrams=True, alpha=1.0)
    # exact-int bucket counts
    tv = np.zeros(dim, np.int64)
    for text in t_rows.values():
        for b, c in _py_features(text, dim).items():
            tv[b] += c
    rv = np.zeros(dim, np.int64)
    for text in r_rows.values():
        for b, c in _py_features(text, dim).items():
            rv[b] += c
    want = (
        np.log(tv + 1.0) - math.log(tv.sum() + dim)
        - (np.log(rv + 1.0) - math.log(rv.sum() + dim))
    )
    np.testing.assert_allclose(model["lw"], want, rtol=0, atol=1e-12)
    assert model["target_total"] == int(tv.sum())
    assert model["raw_total"] == int(rv.sum())


def test_score_matches_python_and_is_jvm_only(spark, corpora):
    t_df, r_df, _t, r_rows = corpora
    model = DS.fit_dsir(t_df, r_df, dim=1 << 10)
    scored = DS.score_dsir(r_df, model)
    got = {r["doc_id"]: r["logw"] for r in scored.collect()}
    assert len(got) == len(r_rows)
    for did, text in r_rows.items():
        assert got[did] == pytest.approx(_py_logw(text, model), abs=1e-9)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                   "FlatMapGroupsInPandas"):
        assert marker not in plan, f"python stage in DSIR scoring: {marker}"
    # r13 session 9: scoring is ONE vectorized Arrow node; per-document
    # sums complete inside it, so the plan carries ZERO exchanges
    assert plan.count("MapInArrow") == 1, plan
    assert "Exchange hashpartitioning" not in plan, plan


def test_resample_prefers_target_like_docs(spark, corpora):
    t_df, r_df, _t, _r = corpora
    model = DS.fit_dsir(t_df, r_df, dim=1 << 10)
    picked = DS.resample_dsir(r_df, model, n=20, temperature=0.5, seed=3)
    ids = sorted(r["doc_id"] for r in picked.collect())
    assert len(ids) == 20
    # science-like raw docs are 60..79; with T=0.5 the selection should be
    # overwhelmingly that block
    assert sum(1 for i in ids if i >= 60) >= 18, ids
    # deterministic: same seed → identical selection; different seed may
    # differ but stays reproducible
    again = sorted(
        r["doc_id"]
        for r in DS.resample_dsir(r_df, model, n=20, temperature=0.5,
                                  seed=3).collect()
    )
    assert again == ids


def test_resample_frac_threshold_path(spark, corpora):
    t_df, r_df, _t, _r = corpora
    model = DS.fit_dsir(t_df, r_df, dim=1 << 10)
    picked = DS.resample_dsir(r_df, model, frac=0.25, temperature=0.5, seed=7)
    cnt = picked.count()
    assert 10 <= cnt <= 30  # ≈ 20 of 80, to approxQuantile precision
    # the frac path keeps at most ONE scored frame cached across calls
    assert len(DS._PERSISTED) <= 1
    with pytest.raises(ValueError, match="exactly one"):
        DS.resample_dsir(r_df, model)
    with pytest.raises(ValueError, match="exactly one"):
        DS.resample_dsir(r_df, model, n=5, frac=0.5)


def test_resample_carries_score_columns(spark, corpora):
    """The selected rows arrive with (n_terms, logw) attached, so a
    consumer never needs a second score_dsir pass over the corpus."""
    t_df, r_df, _t, r_rows = corpora
    model = DS.fit_dsir(t_df, r_df, dim=1 << 10)
    picked = DS.resample_dsir(r_df, model, n=5, seed=1)
    assert {"doc_id", "text", "n_terms", "logw", "_dsir_key"} <= set(
        picked.columns
    )
    for row in picked.collect():
        assert row["logw"] == pytest.approx(
            _py_logw(r_rows[row["doc_id"]], model), abs=1e-9
        )


def test_resample_frac_empty_input(spark, corpora):
    """approxQuantile returns [] on an empty frame; the frac path must
    yield an empty selection, not IndexError."""
    t_df, r_df, _t, _r = corpora
    model = DS.fit_dsir(t_df, r_df, dim=1 << 10)
    empty = r_df.where(F.lit(False))
    out = DS.resample_dsir(empty, model, frac=0.5, seed=2)
    assert out.count() == 0
    assert {"doc_id", "n_terms", "logw"} <= set(out.columns)
