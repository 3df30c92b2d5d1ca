"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
arXiv:2302.03169), Spark-first.

The third standard training-data selector next to the learned quality
classifier (`pipeline/quality_model.py`, discriminative) and the CCNet
perplexity filter (`pipeline/ngram_lm.py`, generative): DSIR selects raw
documents whose hashed-n-gram distribution looks like a TARGET corpus by
importance resampling. Per the paper:

1. fit two bag-of-hashed-n-grams unigram models — target p and raw q —
   over a shared hashed feature space (the paper uses 10k buckets;
   ``dim`` here, default 2^16);
2. each document's importance log-weight is ``Σ_b c_b·(log p_b − log
   q_b)`` over its bucket counts ``c_b`` (add-α smoothed);
3. sample WITHOUT replacement proportionally to the weights — the
   Gumbel-top-k trick: take the top n by ``logw/T + Gumbel noise``,
   which is exactly weighted sampling without replacement (Vieira 2014).

Spark-first decomposition — every stage is a shape this repo already
runs at scale:

- **fit** = the `quality_features` posting rows (exact-int map-side
  combined hashed counts, `pipeline/quality_model.py`) aggregated to one
  ``dim``-sized count vector per corpus — two groupBys, bounded driver
  state (``dim ≤ 2^18`` ⇒ ≤2 MB f64).
- **score** = one broadcast (bucket → milli-log-ratio) join over the
  posting rows + one partial-aggregable groupBy — pure JVM, the
  `score_quality` plan shape.
- **resample** = deterministic Gumbel keys from md5(doc_id, seed) (the
  repo's hash-split idiom — reproducible under repartitioning and
  growth), then either exact global top-n (`TakeOrdered`, fine up to
  ~10^7 n) or, for the 100 TB path, a quantile THRESHOLD on the key
  (one `approxQuantile` pass + a stateless filter — no global sort).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectorchord_spark.pipeline.quality_model import quality_features

#: fixed-point factor: log-ratio weights ship to the JVM as int64
#: milli-nats so the per-doc dot product accumulates int-exactly
#: (the quality_model scoring trick); 1e-6 nat resolution is far below
#: any meaningful weight difference
_LW_SCALE = 1_000_000

#: bounded cache registry for resample_dsir's persisted scored frames —
#: holds at most the latest so long-lived sessions (gate rounds, bench
#: loops) don't accumulate cached partitions call over call. The lock
#: guards the list mutation; concurrent calls on one driver still evict
#: each other's cache (results stay correct, caching degrades) — the
#: registry assumes an effectively single-threaded driver workflow
_PERSISTED: "list[DataFrame]" = []
_REG_LOCK = __import__("threading").Lock()


def _quantize_lw(lw: np.ndarray) -> np.ndarray:
    """int64 milli-nat weights, rounded HALF AWAY FROM ZERO — the SQL
    ``round()`` rule, so an oracle recomputing the weights from the same
    integer counts lands on identical int64s (np.rint's half-to-even
    would differ exactly at .5 boundaries)."""
    x = lw * _LW_SCALE
    return (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)


def fit_dsir(
    target_df: DataFrame,
    raw_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 1 << 16,
    bigrams: bool = True,
    alpha: float = 1.0,
) -> dict:
    """Fit the importance-weight model: per-bucket log(p_target/q_raw).

    Both corpora hash through the same md5 feature family as the quality
    classifier, so one posting-row pipeline serves all three selectors.
    Counts are exact int64; only the final ``dim``-sized log-ratio
    vector (≤2 MB) reaches the driver.
    """

    def _bucket_counts(df: DataFrame) -> "tuple[np.ndarray, int]":
        rows = (
            quality_features(df, text_col=text_col, id_col=id_col,
                             dim=dim, bigrams=bigrams)
            .groupBy("bucket")
            .agg(F.sum("weight").alias("cnt"))
            .collect()
        )
        v = np.zeros(dim, np.int64)
        for r in rows:
            v[int(r["bucket"])] = int(r["cnt"])
        return v, int(v.sum())

    t, t_tot = _bucket_counts(target_df)
    r, r_tot = _bucket_counts(raw_df)
    a = float(alpha)
    lw = (
        np.log(t + a) - np.log(t_tot + a * dim)
        - (np.log(r + a) - np.log(r_tot + a * dim))
    )
    return {
        "lw": lw.astype(np.float64),
        "dim": int(dim),
        "bigrams": bool(bigrams),
        "alpha": a,
        "target_total": t_tot,
        "raw_total": r_tot,
    }


def score_dsir(
    df: DataFrame,
    model: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document importance log-weight: (id, n_terms, logw).

    Pure JVM: per-token ``element_at`` into one dense constant-folded
    (dim-sized) int-milli-weight array literal, folded into one groupBy;
    ``logw`` = int-exact milli-nat sum rescaled to f64.
    """
    lw_q = _quantize_lw(model["lw"])
    from vectorchord_spark.pipeline.quality_model import _token_weight_sums

    # r13 session 9: one vectorized Arrow scoring node (zero exchange,
    # md5 once per distinct token per batch — see
    # quality_model._token_weight_sums); int64 milli-nat sums unchanged
    agg = _token_weight_sums(
        df, lw_q, text_col=text_col, id_col=id_col,
        dim=model["dim"], bigrams=model["bigrams"],
    )
    return agg.select(
        id_col,
        "n_terms",
        (F.col("dot").cast("double") / float(_LW_SCALE)).alias("logw"),
    )


def resample_dsir(
    df: DataFrame,
    model: dict,
    n: "int | None" = None,
    frac: "float | None" = None,
    temperature: float = 1.0,
    seed: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
    return_all: bool = False,
) -> DataFrame:
    """Importance-resample without replacement via Gumbel-top-k.

    Key = ``logw/temperature + Gumbel(0,1)`` with the Gumbel driven by a
    deterministic md5(doc_id, seed) uniform — reproducible across runs,
    partitionings, and insert order. ``n`` takes the exact global top-n
    (`TakeOrdered` — driver holds n rows; fine to ~10^7). ``frac``
    instead computes a key threshold with one ``approxQuantile`` pass
    and filters — no global sort, the 100 TB path (the returned count is
    then approximate to quantile precision, per the paper's own
    tolerance; an empty input yields an empty selection rather than an
    error). Returns the selected rows of ``df`` with ``n_terms``,
    ``logw`` and the sampling key attached.

    ``return_all=True`` instead returns EVERY row of ``df`` with a
    boolean ``_dsir_selected`` flag (plus the score columns, null for
    rows the scorer never saw, e.g. token-less docs) — the shape an
    auditing pipeline (curate stage) needs to record why each row was
    dropped without a second scoring pass.

    The ``frac`` path persists the scored frame between the quantile
    action and the filter; at most ONE such frame stays cached per
    session (a new call releases the previous call's — the prior result
    stays correct, it just recomputes if re-read).
    """
    if (n is None) == (frac is None):
        raise ValueError("pass exactly one of n / frac")
    scored = score_dsir(df, model, text_col=text_col, id_col=id_col)
    # md5 → 12 hex chars → uniform in (0,1), never exactly 0 or 1
    u = (
        F.conv(
            F.substring(F.md5(F.concat_ws("|", F.col(id_col).cast("string"),
                                          F.lit(str(int(seed))))), 1, 12),
            16, 10,
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(float(16**12 + 2))
    gumbel = -F.log(-F.log(u))
    keyed = scored.withColumn(
        "_dsir_key", F.col("logw") / F.lit(float(temperature)) + gumbel
    )
    sel_flag = None
    if n is not None:
        if return_all:
            # keyed feeds BOTH the picked top-n subtree and the left side
            # of the flag join below — without a persist one
            # materialization runs the full score_dsir pass (posting-row
            # explode + broadcast join + groupBy) twice; same reason the
            # frac path persists
            with _REG_LOCK:
                while _PERSISTED:
                    _PERSISTED.pop().unpersist()
                keyed = keyed.persist()
                _PERSISTED.append(keyed)
        picked = keyed.orderBy(F.desc("_dsir_key"), id_col).limit(int(n))
        if return_all:
            sel_flag = keyed.join(
                picked.select(id_col).withColumn("_dsir_selected",
                                                 F.lit(True)),
                id_col, "left",
            ).withColumn(
                "_dsir_selected",
                F.coalesce(F.col("_dsir_selected"), F.lit(False)),
            )
    else:
        # the quantile action and the final filter both consume the
        # scored frame — persist so the feature groupBy runs once; keep
        # at most one outstanding cached frame across calls
        with _REG_LOCK:
            while _PERSISTED:
                _PERSISTED.pop().unpersist()
            keyed = keyed.persist()
        qs = keyed.approxQuantile("_dsir_key", [1.0 - float(frac)], 1e-4)
        if not qs:  # approxQuantile returns [] on an all-null/empty frame
            keyed.unpersist()
            picked = keyed.where(F.lit(False))
            cond = F.lit(False)
        else:
            with _REG_LOCK:
                _PERSISTED.append(keyed)
            cond = F.col("_dsir_key") >= qs[0]
            picked = keyed.where(cond)
        if return_all:
            sel_flag = keyed.withColumn("_dsir_selected", cond)
    if return_all:
        # LEFT join: a row the scorer never produced (token-less doc →
        # no posting rows) still comes back, flagged unselected
        return df.join(
            sel_flag.select(id_col, "n_terms", "logw", "_dsir_key",
                            "_dsir_selected"),
            id_col, "left",
        ).withColumn(
            "_dsir_selected",
            F.coalesce(F.col("_dsir_selected"), F.lit(False)),
        )
    return df.join(
        picked.select(id_col, "n_terms", "logw", "_dsir_key"), id_col
    )
