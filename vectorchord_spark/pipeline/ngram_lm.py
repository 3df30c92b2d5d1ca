"""Distributed n-gram language model with stupid backoff — the CCNet
perplexity-filter stage, Spark-first.

CCNet (Wenzek et al. 2020) filters crawl text by the perplexity of a
5-gram KenLM trained on a reference corpus; documents far from the
reference distribution score high and are dropped or bucketed
(head/middle/tail). The smoothing that makes KenLM models small
(modified Kneser–Ney) is driver-unfriendly at corpus scale, so this
module uses **stupid backoff** (Brants et al. 2007, "Large Language
Models in Machine Translation") — the scheme *designed* for distributed
n-gram LMs: no normalization pass, score
``S(w | ctx) = count(ctx·w)/count(ctx)`` if seen, else ``α·S(w | shorter
ctx)``, bottoming out at the unigram relative frequency. Scores are not
probabilities (they don't sum to 1) but rank documents the same way,
which is all a filter needs.

Spark-first decomposition:

- **train** is n map-side-combined groupBy counts (one per order) over
  the reference corpus — exact int64, embarrassingly parallel. The
  model is PRUNED to ``min_count`` before it leaves the cluster, the
  standard count-cutoff that keeps web-scale models broadcastable (the
  1-gram table is bounded by vocabulary; higher orders by the cutoff).
- **score** is pure JVM: explode each document into (w, 2-gram ctx·w,
  3-gram ctx·w, ...) rows, LEFT-join the broadcast count tables, and
  fold the stupid-backoff cascade with ``coalesce`` — exact integer
  counts, one ``log`` per token, one partial-aggregable groupBy(doc).
  No Python anywhere in the scoring plan.

Outputs per doc: ``n_tokens``, ``logscore_sum`` (Σ log₂ S), and
``bits_per_token = −logscore_sum/n_tokens`` — the perplexity proxy
(lower = closer to the reference corpus; CCNet's head/middle/tail split
is two quantile thresholds on exactly this quantity).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vectorchord_spark.pipeline.text import words

#: Brants et al. 2007's fixed backoff multiplier
_ALPHA = 0.4

#: sentence-boundary marker prepended so the first real token has
#: context (the standard <s> padding; </s> is omitted — a filter scores
#: running text, not sentence ends)
_BOS = "\x02s\x02"

#: bounded cache registry: at most the most recently trained LM keeps
#: its count tables persisted, so long-lived sessions (gate rounds,
#: bench loops) don't accumulate cached partitions train over train. An
#: earlier LM stays usable — its tables just recompute when read.
#: lock guards the list mutation only; concurrent train calls evict each
#: other's cached count tables (correct, just slower) — single-threaded
#: driver workflow assumed
_PERSISTED_LM: "list[NgramLM]" = []
_REG_LOCK = __import__("threading").Lock()


@dataclass
class NgramLM:
    """A trained stupid-backoff model: per-order (gram -> count) tables
    plus the unigram total. Grams are space-joined token strings."""

    order: int
    counts: "list[DataFrame]"  # counts[k] = (k+1)-gram table (gram, cnt)
    total_unigrams: int
    min_count: int = 1
    alpha: float = _ALPHA
    # populated lazily: per-order broadcastable sizes (diagnostics)
    sizes: "list[int]" = field(default_factory=list)

    def unpersist(self) -> None:
        """Release the persisted count tables (train_ngram_lm caches
        them; call when done scoring)."""
        for t in self.counts:
            t.unpersist()


def _gram_col(w: Column, i: Column, k: int) -> Column:
    """The k-gram ending at 1-based position ``i`` of the padded token
    array ``w`` as one space-joined string (requires i >= k)."""
    parts = [F.element_at(w, i - (k - 1) + j) for j in range(k)]
    return F.concat_ws(" ", *parts)


def _padded_words(text_col: str) -> Column:
    """Token array with ``order-1``-independent single BOS pad (one BOS
    is enough for stupid backoff: an unseen longer context just backs
    off; KenLM-style full padding buys nothing for a filter)."""
    return F.concat(F.array(F.lit(_BOS)), words(text_col))


def train_ngram_lm(
    df: DataFrame,
    text_col: str = "text",
    order: int = 3,
    min_count: int = 2,
) -> NgramLM:
    """Count 1..order-grams over the reference corpus (exact int64,
    map-side combined), pruning orders ≥ 2 at ``min_count``.

    The returned tables are DataFrames (still distributed); ``score_lm``
    broadcasts them, so size the cutoff for your driver/broadcast budget
    — diagnostics in ``lm.sizes``. Unigrams are never pruned (the
    cascade must bottom out for every in-vocabulary token; OOV tokens
    fall through to the floor score in score_lm)."""
    if order < 1:
        raise ValueError(f"order must be >= 1, got {order}")
    with _REG_LOCK:  # bounded cache: release the previous LM's tables
        while _PERSISTED_LM:
            _PERSISTED_LM.pop().unpersist()
    w = _padded_words(text_col)
    base = df.select(w.alias("_w"), F.size(w).alias("_n"))
    counts: list[DataFrame] = []
    for k in range(1, order + 1):
        # k=1 counts from i=1 so the BOS unigram is present — it is the
        # DENOMINATOR of every sentence-initial bigram score; it is
        # excluded from total_unigrams below (real tokens can't collide
        # with the control-char marker)
        # guard: F.sequence(k, _n) DESCENDS when _n < k (short/empty
        # docs — ubiquitous in crawl corpora), walking element_at
        # through index 0 / out-of-bounds, which aborts under ANSI
        # mode. A doc shorter than k real words simply has no k-grams.
        positions = F.when(
            F.col("_n") >= k, F.sequence(F.lit(k), F.col("_n"))
        ).otherwise(F.array().cast("array<int>"))
        grams = base.select(
            F.explode(
                F.transform(positions, lambda i: _gram_col(F.col("_w"), i, k))
            ).alias("gram")
        )
        tbl = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("cnt"))
        if k >= 2 and min_count > 1:
            tbl = tbl.where(F.col("cnt") >= min_count)
        # persist: each table is read 2-3× downstream (the sizes count
        # below, then score_lm's numerator + next-order denominator
        # broadcasts) — without this every broadcast build re-runs the
        # full reference-corpus groupBy from raw text
        counts.append(tbl.persist())
    total = (
        counts[0].where(F.col("gram") != _BOS).agg(F.sum("cnt")).collect()[0][0]
        or 0
    )
    lm = NgramLM(order=order, counts=counts, total_unigrams=int(total),
                 min_count=min_count)
    lm.sizes = [int(t.count()) for t in counts]
    with _REG_LOCK:
        _PERSISTED_LM.append(lm)
    return lm


def score_lm(
    df: DataFrame,
    lm: NgramLM,
    text_col: str = "text",
    id_col: str = "doc_id",
    oov_floor: float = 1e-9,
    broadcast_max_rows: "int | None" = 50_000_000,
) -> DataFrame:
    """Per-document stupid-backoff score: (id, n_tokens, logscore_sum,
    bits_per_token). Pure JVM: explode → broadcast left joins → one
    groupBy. ``oov_floor`` is the score of a token absent even from the
    unigram table (CCNet maps OOV to a tiny constant; 0 would make the
    log blow up).

    bits_per_token = −Σ log₂ S / n_tokens — the perplexity proxy to
    threshold or quantile-bucket on (lower = more reference-like).
    """
    def _hint(k: int, tbl_df: DataFrame) -> DataFrame:
        """Broadcast a count table only while it fits the budget: a
        web-scale reference corpus can push the pruned 2-gram table
        past driver/broadcast limits, in which case the join falls back
        to a plain shuffle join (same plan otherwise, same results).
        ``lm.sizes`` (filled by train_ngram_lm) supplies the row counts;
        unknown sizes broadcast, matching the pre-knob behavior."""
        rows = lm.sizes[k - 1] if len(lm.sizes) >= k else None
        if (
            broadcast_max_rows is not None
            and rows is not None
            and rows > broadcast_max_rows
        ):
            return tbl_df
        return F.broadcast(tbl_df)

    w = _padded_words(text_col)
    base = df.select(F.col(id_col), w.alias("_w"), F.size(w).alias("_n"))
    # one row per REAL token (positions 2..n over the padded array),
    # carrying each order's gram ending at that token plus its context
    gram_cols = []
    for k in range(1, lm.order + 1):
        gram_cols.append(
            F.when(
                F.col("_i") >= k, _gram_col(F.col("_w"), F.col("_i"), k)
            ).alias(f"_g{k}")
        )
    toks = base.select(
        id_col,
        F.explode(F.sequence(F.lit(2), F.col("_n"))).alias("_i"),
        "_w",
    ).select(id_col, *gram_cols)

    # broadcast-join each order's count table twice: once for the gram
    # (numerator) and once for its context (denominator = the (k-1)-gram
    # PREFIX of the k-gram, which lives in the (k-1) table; the unigram
    # denominator is the corpus total)
    out = toks
    for k in range(1, lm.order + 1):
        tbl = _hint(
            k,
            lm.counts[k - 1].withColumnRenamed("gram", f"_g{k}")
            .withColumnRenamed("cnt", f"_c{k}"),
        )
        out = out.join(tbl, f"_g{k}", "left")
    for k in range(2, lm.order + 1):
        # context of the k-gram = drop the LAST token -> (k-1)-gram
        ctx = F.expr(
            f"substring(_g{k}, 1, length(_g{k}) - length(_g1) - 1)"
        )
        tbl = _hint(
            k - 1,
            lm.counts[k - 2].select(
                F.col("gram").alias(f"_x{k}"), F.col("cnt").alias(f"_d{k}")
            ),
        )
        out = out.withColumn(f"_x{k}", ctx).join(tbl, f"_x{k}", "left")

    # stupid-backoff cascade, highest order first:
    #   S = c_k/d_k  |  alpha * c_{k-1}/d_{k-1}  |  ...  |
    #       alpha^{k-1} * c_1/total  |  oov_floor
    alpha = float(lm.alpha)
    total = float(lm.total_unigrams) if lm.total_unigrams else 1.0
    tiers = []
    for k in range(lm.order, 1, -1):
        tiers.append(
            (alpha ** (lm.order - k))
            * (F.col(f"_c{k}").cast("double") / F.col(f"_d{k}").cast("double"))
        )
    tiers.append(
        (alpha ** (lm.order - 1))
        * (F.col("_c1").cast("double") / F.lit(total))
    )
    s = F.coalesce(*tiers, F.lit(float(oov_floor)))
    per_tok = out.select(id_col, (F.log2(s)).alias("_ls"))
    agg = per_tok.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum("_ls").alias("logscore_sum"),
    )
    return agg.select(
        id_col,
        "n_tokens",
        "logscore_sum",
        (-F.col("logscore_sum") / F.col("n_tokens").cast("double")).alias(
            "bits_per_token"
        ),
    )


def perplexity_filter(
    df: DataFrame,
    lm: NgramLM,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bits_per_token: float | None = None,
    quantile: float | None = None,
) -> DataFrame:
    """CCNet-style perplexity filtering: keep documents whose
    ``bits_per_token`` is under an absolute threshold, or under the
    given corpus QUANTILE (e.g. 0.67 keeps CCNet's head+middle). Returns
    the kept rows of ``df`` with ``bits_per_token`` attached."""
    if (max_bits_per_token is None) == (quantile is None):
        raise ValueError("pass exactly one of max_bits_per_token / quantile")
    scored = score_lm(df, lm, text_col=text_col, id_col=id_col)
    if quantile is not None:
        thr = scored.approxQuantile("bits_per_token", [float(quantile)], 1e-3)[0]
    else:
        thr = float(max_bits_per_token)
    keep = scored.where(F.col("bits_per_token") <= thr).select(
        id_col, "bits_per_token"
    )
    return df.join(keep, id_col)
