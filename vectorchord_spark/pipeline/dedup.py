"""Deduplication operators for large-scale training-data pipelines.

Five families, each designed around its 100 TB shuffle shape:

- **exact**: one hash-groupBy on a content hash (single shuffle).
- **n-gram Jaccard**: inverted-index similarity join (explode shingles,
  join on shingle hash, count co-occurrences). Hot shingles are the skew
  risk → AQE skew handling + optional doc-frequency cap.
- **MinHash + LSH**: banding turns the all-pairs problem into a groupBy on
  band keys; only same-bucket pairs are verified.
- **SimHash**: per-bit majority vote; near-pairs by Hamming distance over
  bucketed chunks.
- **embedding cosine**: brute block-matrix for bounded sides; sign-random-
  projection LSH buckets as the scale path.

Dedup *groups* come from connected components over the near-dup pair edges
(iterative DataFrame label propagation — small diameter graphs converge in
a few rounds).
"""

from __future__ import annotations

import logging
import threading

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vectorchord_spark.pipeline.text import words

_log = logging.getLogger(__name__)

#: outstanding over-cap telemetry watcher threads (see
#: :func:`_watch_cap_telemetry`); bounded by pruning finished threads on
#: every registration. Guarded by a lock against concurrent registration.
_CAP_WATCHERS: "list[threading.Thread]" = []
_WATCHERS_LOCK = threading.Lock()

#: clique emission strategy cutover: buckets up to this size build their
#: pair clique via a bounded collect_list + in-row pair explosion (zero
#: joins; at 256 the per-bucket pair array tops out at C(256,2) = 32 640
#: narrow structs ≈ 1 MB — safe for one aggregation row). Larger caps
#: fall back to the bucket-key self-join, whose output is distributed.
_CLIQUE_EXPLODE_MAX = 256


def _watch_cap_telemetry(obs, log_fn) -> None:
    """Deliver over-cap telemetry from a ``DataFrame.observe`` node without
    an extra job: ``Observation.get`` blocks until the FIRST action on the
    observed plan completes, so a daemon thread waits on it and logs then.
    Construction stays fully lazy (the r11 eager ``.first()`` stats job —
    a full blocking pass before any pair was produced — is gone). A plan
    that is built but never materialized leaves its daemon thread parked
    until session end — bounded by calls, reaped on process exit.
    Tests synchronize with :func:`await_cap_telemetry`."""

    def run() -> None:
        try:
            metrics = obs.get  # blocks until the observed plan runs
        except Exception:  # session torn down before any action
            return
        log_fn(metrics)

    t = threading.Thread(target=run, daemon=True, name="cap-telemetry")
    t.start()
    with _WATCHERS_LOCK:
        _CAP_WATCHERS[:] = [w for w in _CAP_WATCHERS if w.is_alive()]
        _CAP_WATCHERS.append(t)


def await_cap_telemetry(timeout: float = 30.0) -> None:
    """Wait (up to ``timeout`` seconds total) for over-cap warnings of
    already-materialized capped joins to be logged. Call after an action
    when log inspection must be deterministic (tests); never required for
    correctness of the pair output."""
    import time as _time

    deadline = _time.monotonic() + timeout
    with _WATCHERS_LOCK:
        pending = list(_CAP_WATCHERS)
    # newest first: the caller almost always awaits the warning of the
    # action it JUST ran; a stale watcher whose plan was never
    # materialized (parked forever) must not starve it of the deadline
    for t in reversed(pending):
        t.join(max(0.0, deadline - _time.monotonic()))


def capped_band_pairs(
    banded: DataFrame,
    key_cols: list[str],
    id_col: str = "_id",
    max_bucket: int | None = 64,
    op_name: str = "capped_band_pairs",
    skew_parallel_stats: bool = False,
) -> DataFrame:
    """Candidate pairs from an LSH-banded frame, with a per-bucket size cap.

    ``banded`` holds one row per (document, band key): ``id_col`` plus
    ``key_cols``. Buckets (distinct ``key_cols`` values) of at most
    ``max_bucket`` rows emit the full within-bucket pair clique (the exact
    LSH candidate semantics). Buckets OVER the cap emit a spanning STAR to
    the bucket's min id instead — m−1 pairs instead of m(m−1)/2.

    Why: a self-join on band keys emits O(m²) pairs for an m-row bucket
    BEFORE any dedup/verify step can help. Exactly the corpora dedup
    exists for (templated boilerplate, near-identical pages) produce
    mega-buckets; at 100 TB one 10⁶-row band key is ~5·10¹¹ pairs out of
    a single join partition — AQE skew handling bounds partition memory,
    not output cardinality. An over-cap bucket is by construction a
    near-duplicate clique, so the star preserves the connected component
    that dedup group assembly (``connected_components`` →
    ``dedup_keep_best``) consumes; what it loses is only the redundant
    within-clique edges. Callers that verify candidates afterwards
    (Jaccard / cosine) should note a star edge that fails verification can
    split a component that a clique edge would have held together — for
    such buckets the members are near-identical by construction, so in
    practice the hub verifies against its spokes.

    Per the no-silent-caps rule, when any bucket exceeds the cap a WARNING
    is logged with the over-cap bucket count, the largest bucket, and the
    number of pairs elided — derived from a ``DataFrame.observe`` node on
    the star branch (rows that only exist when a bucket is over cap), so
    the telemetry costs ZERO extra jobs and construction stays fully lazy
    (the warning lands when the first action on the returned frame
    completes; tests synchronize via :func:`await_cap_telemetry`).
    ``max_bucket=None`` is the uncapped self-join.

    Plan shape (the r12 rewrite — the r11 version persisted the banded
    frame, ran an eager stats job at plan construction, and recomputed
    the stats aggregate in the pair join, which measured 2.5x the
    uncapped wall at gate scale from pure bookkeeping): one hash exchange
    on the bucket key feeds a window aggregate for per-bucket size/min
    (no stats join — A/B'd 1.7x cheaper end-to-end than the
    groupBy+join-back shape at gate scale), cliques for small buckets
    come from a bounded ``collect_list`` + in-row pair explosion on the
    SAME partitioning (no shuffle, no self-join, arrays capped at
    ``max_bucket`` ≤ 256 members), and the star branch is a filter of the
    same windowed frame over a ReusedExchange. Two shuffles total
    (band-key + final cross-band distinct) — the same count the uncapped
    self-join pays.

    Skew bound of the window shape: a mega-bucket's rows land in ONE
    WindowExec task as a spillable external sort of narrow (id, key)
    rows — O(m log m) local work, measured fine at m = 500k (10M-doc
    validation, docs/SCALE.md r12) and ~GB-scale spill at m = 10⁸ (a
    bounded straggler, the same property the Manku sorted-neighborhood
    over-cap branch of ``hamming_near_pairs`` has by construction —
    unlike the O(m²) OUTPUT blowup the cap exists to prevent, which no
    partitioning fixes). ``skew_parallel_stats=True`` switches the stats
    computation to a partial-aggregating groupBy joined back (map-side
    combine, AQE skew-join splits the hot probe side) for corpora whose
    single hottest bucket is too large even to sort in one task — it
    costs ~1.7x at skew-free gate scale, which is why it is opt-in.
    """
    if max_bucket is None:
        a = banded.select(F.col(id_col).alias("ida"), *key_cols)
        b = banded.select(F.col(id_col).alias("idb"), *key_cols)
        return (
            a.join(b, key_cols)
            .where(F.col("ida") < F.col("idb"))
            .select("ida", "idb")
            .distinct()
        )
    from pyspark.sql import Observation, Window

    banded = banded.select(F.col(id_col).alias("_bid"), *key_cols)
    if skew_parallel_stats:
        stats = banded.groupBy(*key_cols).agg(
            F.count(F.lit(1)).alias("_bsz"), F.min("_bid").alias("_bmin")
        )
        tagged = banded.join(stats, key_cols)
    else:
        w = Window.partitionBy(*key_cols)
        tagged = banded.select(
            "*",
            F.count(F.lit(1)).over(w).alias("_bsz"),
            F.min("_bid").over(w).alias("_bmin"),
        )
    small = tagged.where(
        (F.col("_bsz") >= 2) & (F.col("_bsz") <= max_bucket)
    )
    if max_bucket <= _CLIQUE_EXPLODE_MAX:
        # bounded in-row clique: group the (≤ max_bucket)-member bucket
        # into one sorted array — the groupBy keys equal the window
        # partition keys, so this aggregates WITHOUT another exchange —
        # and explode the i<j pair positions JVM-side
        grouped = small.groupBy(*key_cols).agg(
            F.sort_array(F.collect_list("_bid")).alias("_ids")
        )
        ids = F.col("_ids")
        pair_arr = F.flatten(
            F.transform(
                F.sequence(F.lit(0), F.size(ids) - 2),
                lambda i: F.transform(
                    F.sequence(i + 1, F.size(ids) - 1),
                    lambda j: F.struct(
                        F.get(ids, i).alias("ida"), F.get(ids, j).alias("idb")
                    ),
                ),
            )
        )
        full = (
            grouped.select(F.explode(pair_arr).alias("p"))
            .select("p.ida", "p.idb")
            # duplicate ids within a bucket sort adjacent → (x, x) pairs;
            # strict < drops them (old self-join semantics)
            .where(F.col("ida") < F.col("idb"))
        )
    else:
        a = small.select(F.col("_bid").alias("ida"), *key_cols)
        b = small.select(F.col("_bid").alias("idb"), *key_cols)
        full = (
            a.join(b, key_cols)
            .where(F.col("ida") < F.col("idb"))
            .select("ida", "idb")
        )
    # star branch: _bmin is the bucket min, so _bmin < _bid always holds
    # and the (ida < idb) pair orientation is free. This branch appears
    # exactly ONCE in the final plan, so the observe metrics count each
    # over-cap bucket exactly once: each contributes (_bsz - 1) rows,
    # hence sum(1/(_bsz-1)) = #buckets and sum(_bsz/2 - 1) = pairs elided
    # (C(m,2) - (m-1) summed per bucket).
    obs = Observation()
    star_src = tagged.where(
        (F.col("_bsz") > max_bucket) & (F.col("_bid") != F.col("_bmin"))
    ).observe(
        obs,
        F.round(F.sum(F.lit(1.0) / (F.col("_bsz") - 1))).alias("n_over"),
        F.max("_bsz").alias("largest"),
        F.round(F.sum(F.col("_bsz") / 2.0 - 1)).alias("elided"),
    )
    star = star_src.select(
        F.col("_bmin").alias("ida"), F.col("_bid").alias("idb")
    )

    def _warn(m: dict) -> None:
        if m.get("n_over"):
            _log.warning(
                "%s: %d band buckets over max_bucket=%d (largest=%d); "
                "emitted spanning stars instead of cliques, eliding %d "
                "within-clique candidate pairs (connectivity preserved)",
                op_name,
                int(m["n_over"]),
                max_bucket,
                int(m["largest"]),
                int(m["elided"]),
            )

    _watch_cap_telemetry(obs, _warn)
    return full.unionAll(star).distinct()


def exact_dedup(df: DataFrame, cols: list[str], id_col: str = "doc_id") -> DataFrame:
    """Keep one row (min id) per distinct value of ``cols``; returns the
    keeper assignment (hash, keeper_id, n_copies)."""
    h = F.md5(F.concat_ws("\x1f", *cols))
    return (
        df.groupBy(h.alias("content_hash"))
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column (array<string>).
    Documents shorter than ``n`` words shingle to the whole text.

    The split array is bound to a lambda variable (``transform`` over a
    one-element array) so codegen evaluates ``split`` ONCE per row.
    Referencing the split expression directly inside the gram lambda
    inlines a fresh split into every ``element_at`` — O(words²) per doc,
    measured 12x slower on the sf0.1 documents table (6.4s -> 0.5s for
    the full shingle explode)."""
    t = F.col(text) if isinstance(text, str) else text

    def per_words(w: Column) -> Column:
        cnt = F.size(w)
        grams = F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), cnt - n),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(w, i + j + 1) for j in range(n)]
                ),
            )
        )
        return F.when(cnt >= n, grams).otherwise(F.array(t))

    return F.element_at(F.transform(F.array(words(t)), per_words), 1)


def jaccard_similarity_join(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """All near-dup pairs with n-gram Jaccard ≥ threshold.

    ``max_doc_freq`` optionally drops ultra-common shingles before the join
    (stop-shingle pruning) — the standard skew mitigation at scale; it can
    only lose pairs whose overlap is dominated by stop-shingles.
    """
    # consumed by sizes + explode: persist so shingling computes once
    sh = df.select(
        F.col(id_col).alias("_id"), shingles(text_col, n).alias("sh")
    ).persist()
    sizes = sh.select("_id", F.size("sh").alias("n_sh"))
    ex = sh.select("_id", F.explode("sh").alias("s")).select(
        "_id", F.xxhash64("s").alias("s")
    )
    if max_doc_freq is not None:
        # window count over the exploded frame instead of a separate
        # groupBy + semi-join: one hash exchange on the shingle (which the
        # downstream a⋈b self-join on the same key then reuses) instead of
        # two shuffles of the exploded rows; same rows kept (the window
        # count per shingle IS the doc frequency — shingles() emits
        # array_distinct arrays, one row per (doc, shingle))
        from pyspark.sql import Window

        ex = (
            ex.withColumn(
                "_df", F.count(F.lit(1)).over(Window.partitionBy("s"))
            )
            .where(F.col("_df") <= max_doc_freq)
            .drop("_df")
        )
    a = ex.select(F.col("_id").alias("ida"), "s")
    b = ex.select(F.col("_id").alias("idb"), "s")
    pairs = (
        a.join(b, "s")
        .where(F.col("ida") < F.col("idb"))
        .groupBy("ida", "idb")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        pairs.join(
            F.broadcast(sizes.select(F.col("_id").alias("ida"), F.col("n_sh").alias("na"))),
            "ida",
        )
        .join(
            F.broadcast(sizes.select(F.col("_id").alias("idb"), F.col("n_sh").alias("nb"))),
            "idb",
        )
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("na") + F.col("nb") - F.col("n_common")).cast("double"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("ida", "idb", "n_common", "jaccard")
    )


def contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_overlap: int = 1,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Benchmark-decontamination report: corpus docs sharing ≥
    ``min_overlap`` distinct word n-grams with ANY benchmark document.

    The test-set-leakage scrub every serious training pipeline runs
    (n-gram overlap against held-out evaluation sets). Returns
    (``id_col``, overlap) for contaminated docs only. Inverted-index
    equi-join on the shingle — never all-pairs; the benchmark's distinct
    shingle set is broadcast by default (eval sets are small next to a
    100 TB corpus; pass ``broadcast_benchmark=False`` to let the
    optimizer choose when it is not)."""
    # explode_outer, not explode: for a plain explode the optimizer infers
    # a `size(sh) > 0 AND isnotnull(sh)` filter below the generate and
    # inlines the FULL shingle expression into it — the per-row shingling
    # runs twice (measured 2.0x on the sf0.1 corpus side). shingles()
    # always returns a non-null array of >= 1 element (short docs shingle
    # to array(text)), so the outer variant emits exactly the same rows —
    # and a [null] element (null text) behaves identically under both.
    c = corpus.select(
        F.col(id_col).alias(id_col), shingles(text_col, n).alias("sh")
    ).select(id_col, F.explode_outer("sh").alias("s"))
    bset = (
        benchmark.select(shingles(text_col, n).alias("sh"))
        .select(F.explode_outer("sh").alias("s"))
        .distinct()
    )
    if broadcast_benchmark:
        bset = F.broadcast(bset)
    return (
        c.join(bset, "s")
        .groupBy(id_col)
        # shingles() emits DISTINCT grams per doc, so count == distinct
        # overlapping grams without a countDistinct shuffle
        .agg(F.count(F.lit(1)).alias("overlap"))
        .where(F.col("overlap") >= int(min_overlap))
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_overlap: int = 1,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Corpus minus contaminated docs (anti-join on :func:`contamination`)."""
    hits = contamination(
        corpus, benchmark, id_col, text_col, n, min_overlap, broadcast_benchmark
    )
    return corpus.join(hits.select(id_col), id_col, "left_anti")


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 8,
) -> DataFrame:
    """MinHash signature per document: min of the md5 hash family over the
    shingle set, one column per hash."""
    sh = df.select(F.col(id_col).alias("_id"), shingles(text_col, n).alias("sh"))
    # explode_outer: skips the optimizer's inferred not-empty filter that
    # would re-evaluate the shingle expression per row (see contamination);
    # identical rows because shingles() never yields a null/empty array
    ex = sh.select("_id", F.explode_outer("sh").alias("s"))
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{j}|"), F.col("s")))).alias(f"mh{j}")
        for j in range(num_hashes)
    ]
    return ex.groupBy("_id").agg(*aggs).withColumnRenamed("_id", id_col)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 8,
    band_rows: int = 2,
    max_bucket: int | None = 64,
) -> DataFrame:
    """LSH candidate pairs: band the signatures, pair docs sharing any band
    key. Verification (exact Jaccard) is the caller's choice — compose with
    :func:`jaccard_similarity_join` semantics via a join on the pair.

    ``max_bucket`` (default ON) caps the per-(band, key) bucket size: see
    :func:`capped_band_pairs` for the star-emission semantics and the
    over-cap logging contract. Pass ``None`` for the uncapped self-join."""
    sig = minhash_signatures(df, id_col, text_col, n, num_hashes)
    n_bands = num_hashes // band_rows
    band_cols = []
    for b in range(n_bands):
        parts = [F.col(f"mh{b * band_rows + r}") for r in range(band_rows)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat(*parts)).alias("key"))
        )
    banded = sig.select(
        F.col(id_col).alias("_id"), F.explode(F.array(*band_cols)).alias("bk")
    ).select("_id", "bk.band", "bk.key")
    return capped_band_pairs(
        banded, ["band", "key"], "_id", max_bucket, "minhash_lsh_pairs"
    )


def simhash(text: Column | str, bits: int = 16) -> Column:
    """SimHash of the word tokens: md5-derived per-word hash, per-bit
    majority vote with multiplicity, packed into a ``bits``-wide integer."""
    assert 1 <= bits <= 32
    hexchars = (bits + 3) // 4
    w = words(text)
    # hash each word ONCE into a bound array, then take the per-bit
    # majority votes over the hashes — writing h_of(x) inside each bit's
    # aggregate recomputes the md5 per word per bit (16x the hashing)
    hashes = F.transform(
        w,
        lambda x: F.conv(F.substring(F.md5(x), 1, hexchars), 16, 10).cast(
            "bigint"
        ),
    )

    def per_hashes(h: Column) -> Column:
        total = None
        for j in range(bits):
            contrib = F.aggregate(
                h,
                F.lit(0).cast("bigint"),
                lambda acc, x: acc
                + (F.shiftright(x, j).bitwiseAND(F.lit(1)) * 2 - 1),
            )
            term = F.when(contrib > 0, F.lit(1 << j)).otherwise(F.lit(0))
            total = term if total is None else total + term
        return total.cast("bigint")

    return F.element_at(F.transform(F.array(hashes), per_hashes), 1)


def _hamming_band_bits(bits: int, max_hamming: int, band_bits: int | None) -> int:
    """Resolve (and sanity-check) the chunk width for Hamming banding.

    Completeness (EVERY pair within the budget is a candidate) requires
    ``bits // band_bits > max_hamming`` chunks — pigeonhole: max_hamming
    differences cannot touch all of max_hamming+1 chunks. The default is
    derived to satisfy it (``bits // (max_hamming + 1)``); an explicit
    width that violates it is accepted (cheaper, deliberately approximate
    banding) but logged, because the old silent default (band_bits=8 with
    bits=16, max_hamming=3 → 2 chunks ≤ 3) quietly broke the all-pairs
    contract the docstring promised."""
    if band_bits is None:
        band_bits = max(1, bits // (max_hamming + 1))
    if bits // band_bits <= max_hamming:
        _log.warning(
            "hamming banding with %d chunks of %d bits cannot guarantee "
            "completeness at max_hamming=%d (needs > max_hamming chunks): "
            "pairs whose differences touch every chunk are missed",
            bits // band_bits,
            band_bits,
            max_hamming,
        )
    return band_bits


def hamming_near_pairs(
    df: DataFrame,
    id_col: str,
    hash_col: str,
    bits: int,
    max_hamming: int = 3,
    band_bits: int | None = None,
    max_bucket: int | None = 4096,
    neighbor_window: int = 16,
    skew_parallel_stats: bool = False,
) -> DataFrame:
    """Candidate-verified near-pairs whose integer ``hash_col`` values are
    within ``max_hamming`` bits (generic over ANY bit-fingerprint: SimHash
    text signatures, image average-hashes, ...). EXACT (all such pairs)
    while every (chunk, value) bucket stays within ``max_bucket``;
    over-cap mega-buckets switch to Manku sorted-neighborhood candidates,
    which can MISS pairs > ``neighbor_window`` apart in every agreeing
    chunk's sort order (never emit wrong ones — the Hamming verify is
    exact). Pass ``max_bucket=None`` for the unconditionally exact
    all-pairs contract.

    Scale path: band the hash into ``bits/band_bits`` chunks — any pair
    within the Hamming budget must agree on ≥ 1 chunk when
    ``bits/band_bits > max_hamming`` (pigeonhole), so candidate generation
    is a groupBy on chunk values, not an all-pairs scan. ``band_bits``
    defaults to the widest chunk satisfying that guarantee
    (``bits // (max_hamming+1)``); see :func:`_hamming_band_bits`.
    ``max_bucket``/``neighbor_window`` bound the per-bucket self-join
    (Manku-style sorted neighborhood over the cap; see
    :func:`_banded_hamming_pairs`)."""
    band_bits = _hamming_band_bits(bits, max_hamming, band_bits)
    sigs = df.select(F.col(id_col).alias("_id"), F.col(hash_col).alias("sh"))
    return _banded_hamming_pairs(
        sigs, bits, max_hamming, band_bits, max_bucket, neighbor_window,
        skew_parallel_stats,
    )


def simhash_near_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 16,
    max_hamming: int = 3,
    band_bits: int | None = None,
    max_bucket: int | None = 4096,
    neighbor_window: int = 16,
    skew_parallel_stats: bool = False,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ ``max_hamming`` (the
    text-signature instance of :func:`hamming_near_pairs`)."""
    band_bits = _hamming_band_bits(bits, max_hamming, band_bits)
    sigs = df.select(
        F.col(id_col).alias("_id"), simhash(text_col, bits).alias("sh")
    )
    return _banded_hamming_pairs(
        sigs, bits, max_hamming, band_bits, max_bucket, neighbor_window,
        skew_parallel_stats,
    )


def _banded_hamming_pairs(
    sigs: DataFrame,
    bits: int,
    max_hamming: int,
    band_bits: int,
    max_bucket: int | None = 4096,
    neighbor_window: int = 16,
    skew_parallel_stats: bool = False,
) -> DataFrame:
    """Candidate generation + exact-Hamming verify over chunk bands.

    Buckets (chunk, value) of at most ``max_bucket`` rows emit the exact
    within-bucket clique. Over-cap buckets CANNOT use the LSH star trick
    (a Hamming bucket's members agree on one chunk, they are not a
    near-dup clique), so they take the sorted-neighborhood path of Manku
    et al., WWW 2007 ("Detecting Near-Duplicates for Web Crawling"):
    sort the bucket by the hash's REMAINING bits (the agreed chunk
    compacted out, so near hashes sort near) and pair each member with
    its next ``neighbor_window`` neighbors — O(m·W) candidates instead of
    O(m²). Every candidate still passes the exact ``hamming ≤ budget``
    verify, so over-cap buckets can only MISS pairs (those > W apart in
    every agreeing chunk's sort order), never emit wrong ones; the
    multiple chunk tables act as Manku's multiple permutations. Identical
    hashes are always adjacent in the sort, so exact-duplicate groups
    stay chain-connected for component grouping. Over-cap buckets are
    logged (no silent caps); ``max_bucket=None`` is the fully-exact
    self-join."""
    n_chunks = bits // band_bits
    chunk_cols = [
        F.struct(
            F.lit(c).alias("chunk"),
            F.shiftright(F.col("sh"), c * band_bits)
            .bitwiseAND(F.lit((1 << band_bits) - 1))
            .alias("v"),
        )
        for c in range(n_chunks)
    ]
    banded = sigs.select(
        "_id", "sh", F.explode(F.array(*chunk_cols)).alias("ck")
    ).select("_id", "sh", "ck.chunk", "ck.v")
    if max_bucket is None:
        a = banded.select(F.col("_id").alias("ida"), F.col("sh").alias("sha"), "chunk", "v")
        b = banded.select(F.col("_id").alias("idb"), F.col("sh").alias("shb"), "chunk", "v")
        cand = (
            a.join(b, ["chunk", "v"])
            .where(F.col("ida") < F.col("idb"))
            .select("ida", "idb", "sha", "shb")
            .distinct()
        )
        ham = F.bit_count(F.col("sha").bitwiseXOR(F.col("shb")))
        return cand.select(
            "ida", "idb", ham.cast("int").alias("hamming")
        ).where(F.col("hamming") <= max_hamming)
    from pyspark.sql import Observation, Window

    # per-bucket size via a window aggregate over the hash exchange every
    # branch reuses (the r12 lazy shape — no persist, no eager telemetry
    # job); skew_parallel_stats opts into the groupBy+join-back shape for
    # corpora whose hottest bucket cannot sort in one task — the
    # tradeoffs are documented on capped_band_pairs
    if skew_parallel_stats:
        stats = banded.groupBy("chunk", "v").agg(
            F.count(F.lit(1)).alias("_bsz")
        )
        tagged = banded.join(stats, ["chunk", "v"])
    else:
        w0 = Window.partitionBy("chunk", "v")
        tagged = banded.select(
            "*", F.count(F.lit(1)).over(w0).alias("_bsz")
        )
    small = tagged.where(F.col("_bsz") <= max_bucket)
    a = small.select(F.col("_id").alias("ida"), F.col("sh").alias("sha"), "chunk", "v")
    b = small.select(F.col("_id").alias("idb"), F.col("sh").alias("shb"), "chunk", "v")
    exact_cand = (
        a.join(b, ["chunk", "v"])
        .where(F.col("ida") < F.col("idb"))
        .select("ida", "idb", "sha", "shb")
    )
    # over-cap: compact the agreed chunk out of the hash so the sort key
    # is exactly the bits that can still differ (low-order differences
    # land adjacent), then take each row's next-W neighbors in one window
    # pass — no join, O(m·W) output from an m-row bucket. This branch
    # appears exactly once in the final plan: the observe node counts
    # each over-cap bucket once (m rows → sum(1/_bsz) = 1 per bucket) and
    # logs when the first action completes (no extra telemetry job).
    obs = Observation()
    big = tagged.where(F.col("_bsz") > max_bucket).observe(
        obs,
        F.round(F.sum(F.lit(1.0) / F.col("_bsz"))).alias("n_over"),
        F.max("_bsz").alias("largest"),
    )

    def _warn(m: dict) -> None:
        if m.get("n_over"):
            _log.warning(
                "hamming banding: %d (chunk, value) buckets over "
                "max_bucket=%d (largest=%d); using sorted-neighborhood "
                "candidates (window=%d) there — pairs farther apart in "
                "every agreeing chunk's sort order are missed",
                int(m["n_over"]),
                max_bucket,
                int(m["largest"]),
                neighbor_window,
            )

    _watch_cap_telemetry(obs, _warn)
    # per-chunk CASE with literal shift amounts (shiftright needs int
    # literals; also a 64-bit shift would wrap to 0 in the JVM, so the
    # top chunk's upper part is pinned to 0 explicitly). sh is SIGNED —
    # arithmetic shifts keep a consistent per-bucket ordering; a pair
    # split by the sign boundary is one more documented miss mode that
    # the exact verify cannot turn into a false positive.
    rem = None
    for c in range(n_chunks):
        hi_shift = (c + 1) * band_bits
        lo_mask = (1 << (c * band_bits)) - 1
        if hi_shift >= bits and bits >= 64:
            rem_c = F.col("sh").bitwiseAND(F.lit(lo_mask))
        else:
            rem_c = F.shiftleft(
                F.shiftright(F.col("sh"), hi_shift), c * band_bits
            ).bitwiseOR(F.col("sh").bitwiseAND(F.lit(lo_mask)))
        rem = (
            F.when(F.col("chunk") == c, rem_c)
            if rem is None
            else rem.when(F.col("chunk") == c, rem_c)
        )
    w = Window.partitionBy("chunk", "v").orderBy("_rem", "_id")
    big = big.withColumn("_rem", rem)
    # window expressions must be top-level projections (nesting them in
    # struct/array constructors is rejected by the analyzer): materialize
    # each lead as its own column, then assemble the neighbor array
    lead_cols = {}
    for i in range(1, int(neighbor_window) + 1):
        lead_cols[f"_nid{i}"] = F.lead("_id", i).over(w)
        lead_cols[f"_nsh{i}"] = F.lead("sh", i).over(w)
    big = big.withColumns(lead_cols)
    nbrs = F.array(
        *[
            F.struct(
                F.col(f"_nid{i}").alias("nid"), F.col(f"_nsh{i}").alias("nsh")
            )
            for i in range(1, int(neighbor_window) + 1)
        ]
    )
    win_cand = (
        big.select("_id", "sh", F.explode(nbrs).alias("nb"))
        .where(F.col("nb.nid").isNotNull())
        .select(
            F.least(F.col("_id"), F.col("nb.nid")).alias("ida"),
            F.greatest(F.col("_id"), F.col("nb.nid")).alias("idb"),
            F.when(F.col("_id") < F.col("nb.nid"), F.col("sh"))
            .otherwise(F.col("nb.nsh"))
            .alias("sha"),
            F.when(F.col("_id") < F.col("nb.nid"), F.col("nb.nsh"))
            .otherwise(F.col("sh"))
            .alias("shb"),
        )
    )
    cand = exact_cand.unionAll(win_cand).distinct()
    ham = F.bit_count(F.col("sha").bitwiseXOR(F.col("shb")))
    return cand.select(
        "ida", "idb", ham.cast("int").alias("hamming")
    ).where(F.col("hamming") <= max_hamming)


def embedding_lsh_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 16,
    n_tables: int = 4,
    seed: int = 42,
    threshold: float = 0.8,
    max_bucket: int | None = 64,
) -> DataFrame:
    """Embedding near-dup pairs via sign-random-projection LSH.

    ``n_tables`` independent hash tables of ``n_planes`` hyperplane sign
    bits; same-bucket pairs are verified with exact cosine. This is the
    100 TB path for embedding dedup: candidate generation is a groupBy on
    bucket keys (no all-pairs), and verification is two shuffle joins of
    the narrow (ida, idb) candidate pairs against the vector table — no
    driver collect, no full-table broadcast anywhere.

    ``max_bucket`` (default ON) caps the per-(table, bucket) size: see
    :func:`capped_band_pairs` for the star-emission semantics and the
    over-cap logging contract. Over-cap star candidates still pass the
    exact-cosine verify below, so a false-positive bucket collision can
    never emit a wrong pair — only miss redundant within-clique edges.
    Pass ``None`` for the uncapped self-join.
    """
    from typing import Iterator  # noqa: F401 (annotation in band())

    from vectorchord_spark.functions import distances as D

    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(n_tables, n_planes, dim))
    spark = df.sparkSession
    bc_planes = spark.sparkContext.broadcast(planes)
    weights = (1 << np.arange(n_planes)).astype(np.int64)

    def band(batches) -> "Iterator":
        # mapInArrow: the list<float> column flattens to ONE contiguous
        # values buffer per batch (the assign_clusters/IVF-encode
        # pattern — the former mapInPandas per-row np.asarray loop cost
        # more than the matmul itself); one matmul per batch instead of
        # n_tables*n_planes fold expressions (whose codegen alone
        # dominates at small scale). Sign boundaries agree with the
        # oracle's fold chains except when |dot| < ~1e-13, which only
        # perturbs *candidate* membership — the verified similarity
        # below stays bit-exact. The f32→f64 widening here is exact, so
        # the signs match the former pandas path bit-for-bit.
        import pyarrow as pa

        pl = bc_planes.value.reshape(-1, dim)  # (T*P, dim)
        tcol = np.arange(n_tables, dtype=np.int32)
        for rb in batches:
            m = rb.num_rows
            if not m:
                continue
            ids_arr = rb.column(0)
            if ids_arr.type != pa.int64():
                ids_arr = ids_arr.cast(pa.int64())
            ids = np.asarray(ids_arr)
            flat = rb.column(1).flatten()
            if flat.type != pa.float64():
                flat = flat.cast(pa.float64())
            if len(flat) != m * dim:  # null or ragged vectors would make
                # ListArray.flatten() drop values and surface as an opaque
                # reshape error — name the real problem instead
                raise ValueError(
                    f"embedding_lsh_pairs: vector column must be non-null "
                    f"and exactly {dim}-dimensional (batch of {m} rows "
                    f"flattened to {len(flat)} values, expected {m * dim})"
                )
            mat = np.asarray(flat).reshape(m, dim)
            signs = (mat @ pl.T) >= 0  # (m, T*P)
            signs = signs.reshape(m, n_tables, n_planes)
            buckets = (signs * weights).sum(axis=2)  # (m, T)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.repeat(ids, n_tables), pa.int64()),
                    pa.array(np.tile(tcol, m), pa.int32()),
                    pa.array(buckets.reshape(-1), pa.int64()),
                ],
                ["_id", "t", "bucket"],
            )

    # candidate generation on narrow (id, bucket) rows; vectors re-joined
    # once per *distinct* pair — buckets are coarse, so keeping the arrays
    # out of the bucket join/distinct is the difference between shuffling
    # ids and shuffling the whole embedding table many times over
    banded = df.select(F.col(id_col).alias(id_col), F.col(vec_col).alias(vec_col)).mapInArrow(
        band, "_id long, t int, bucket long"
    )
    cand = capped_band_pairs(
        banded, ["t", "bucket"], "_id", max_bucket, "embedding_lsh_pairs"
    )
    # exact-cosine verify: two shuffle joins of the narrow candidate pairs
    # against the vector table. LSH keeps |cand| ≪ |table|², so both joins
    # move only (pair ids + the candidate rows' vectors); the JVM fold
    # expressions keep the arithmetic bit-identical to a left-assoc SQL
    # chain. Catalyst/AQE is free to broadcast the *candidate* side when it
    # is small — never the vector table. Norms are folded ONCE PER ROW in
    # this projection rather than once per pair — with coarse buckets a row
    # appears in many candidate pairs, and the norm chain is 2/3 of the
    # per-pair fold work; the value (and therefore the verified sim) is
    # bit-identical because it is the same fold over the same array.
    vecs = df.select(
        F.col(id_col).alias("_vid"),
        F.col(vec_col).alias("_v"),
        D.norm(vec_col).alias("_n"),
    )
    withv = (
        cand.join(vecs, cand["ida"] == vecs["_vid"])
        .select("ida", "idb", F.col("_v").alias("va"), F.col("_n").alias("na"))
        .join(vecs, F.col("idb") == vecs["_vid"])
        .select(
            "ida", "idb", "va", "na",
            F.col("_v").alias("vb"), F.col("_n").alias("nb"),
        )
    )
    sim = D.dot("va", "vb") / (F.col("na") * F.col("nb"))
    return withv.select("ida", "idb", sim.alias("sim")).where(
        F.col("sim") >= threshold
    )


def connected_components(
    edges: DataFrame,
    a_col: str = "ida",
    b_col: str = "idb",
    max_iter: int = 20,
    driver_threshold: int = 2_000_000,
    checkpoint_dir: str | None = None,
    checkpoint_interval: int = 5,
) -> DataFrame:
    """Connected components by iterative min-label propagation (the dedup
    *grouping* step: near-dup pairs → duplicate clusters → one keeper each).

    Returns (id, component) with component = min id reachable. Each round is
    a neighbor-min join plus a label-compression (pointer-doubling) join, so
    convergence is O(log diameter) rounds, not O(diameter) — chained dup
    clusters of any depth resolve within the default budget. DataFrames are
    persisted per round and the loop exits on a fixpoint count check; if the
    budget is exhausted before the fixpoint a RuntimeError is raised rather
    than silently splitting components.

    When the deduplicated UNDIRECTED edge set is at most
    ``driver_threshold`` rows the components are solved with driver-side
    union-find instead — the standard "contract the graph, then solve the
    small remainder locally" finishing step of distributed CC (each
    distributed round costs several shuffles; a few-million-edge graph is
    microseconds of union-find). Driver memory bound: the threshold caps
    the ``toPandas`` at ``driver_threshold`` undirected edges (~tens of MB
    for long ids at the 2M default; size the threshold down for wide
    string ids). The iterative path remains the default for anything
    larger; pass ``driver_threshold=0`` to force it (skipping the
    path-selection count job too).

    ``checkpoint_dir``: durability option for long cluster runs.
    ``localCheckpoint`` (the default lineage truncation) stores blocks on
    executors — on a multi-hour 100 TB run an executor loss forces a job
    restart. With a reliable directory set (HDFS/S3/shared FS), every
    ``checkpoint_interval``-th round writes a RELIABLE checkpoint via
    ``sparkContext.setCheckpointDir`` instead, bounding replay after an
    executor loss to at most ``checkpoint_interval`` rounds; the remaining
    rounds keep the cheap local path. Locally-tested default stays
    local-only (None).
    """
    spark = edges.sparkSession
    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)
    # canonicalize to undirected (min,max) pairs BEFORE the path decision:
    # the threshold compares against true undirected edge count (not the
    # 2x symmetrized set) and the driver pull is half the size
    und = (
        edges.select(
            F.least(F.col(a_col), F.col(b_col)).alias("src"),
            F.greatest(F.col(a_col), F.col(b_col)).alias("dst"),
        )
        .distinct()
    )
    # persist only when the driver-threshold check will materialize it (a
    # count + possible toPandas); with driver_threshold=0 nothing reads
    # und twice, so persisting it would be pure cache churn
    if driver_threshold:
        und = und.persist()
    if driver_threshold and und.count() <= driver_threshold:
        from pyspark.sql.types import StructField, StructType

        pdf = und.toPandas()
        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        # .tolist() converts numpy scalars to Python natives; non-numeric
        # id types (string hashes, etc.) pass through unchanged — the
        # driver path must accept everything the distributed path does
        for s, d in zip(pdf["src"].tolist(), pdf["dst"].tolist()):
            parent.setdefault(s, s)
            parent.setdefault(d, d)
            rs, rd = find(s), find(d)
            if rs != rd:
                # union by min id so component = min reachable id
                if rs < rd:
                    parent[rd] = rs
                else:
                    parent[rs] = rd
        rows = [(i, find(i)) for i in parent]
        id_type = und.schema["src"].dataType
        schema = StructType(
            [StructField("id", id_type), StructField("component", id_type)]
        )
        und.unpersist()
        return spark.createDataFrame(rows, schema)
    sym = (
        und.unionAll(und.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .persist()
    )
    # und (if persisted) stays cached until sym's FIRST materialization —
    # unpersisting here would force the canonicalize+distinct lineage to
    # recompute when sym first materializes in the fixpoint loop below
    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .persist()
    )
    converged = False
    for it in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("component").alias("nbr_comp"))
        )
        propagated = (
            labels.join(neighbor_min, labels["id"] == neighbor_min["src"], "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_comp"), F.col("component"))
                ).alias("component"),
            )
        )
        # pointer doubling: replace each label by its label's label, halving
        # the remaining chain depth every round (large-star/small-star style)
        comp_map = propagated.select(
            F.col("id").alias("_cid"), F.col("component").alias("_ccomp")
        )
        new_labels = (
            propagated.join(comp_map, propagated["component"] == comp_map["_cid"], "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("_ccomp"), F.col("component"))
                ).alias("component"),
            )
            # localCheckpoint, NOT persist: each round references the prior
            # round's labels 3x and propagated 2x, so the logical plan
            # grows ~4x per round — persist caches data but keeps the
            # plan, and at 10M edges round ~8 hit Catalyst's 2 GB
            # plan-string ceiling with minutes of analysis time per
            # round. Checkpointing truncates the lineage to the
            # materialized blocks (an iterative-algorithm requirement at
            # any scale, same reason GraphX checkpoints Pregel state).
            # Old rounds' blocks are reclaimed by the ContextCleaner
            # once unreferenced.
        )
        if checkpoint_dir is not None and (it + 1) % checkpoint_interval == 0:
            # periodic reliable checkpoint: survives executor loss (blocks
            # land in checkpoint_dir, not executor memory)
            new_labels = new_labels.checkpoint(eager=True)
        else:
            new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )
        if it == 0 and driver_threshold:
            # sym is materialized (and cached) by the count above — the
            # und cache has served its purpose
            und.unpersist()
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            converged = True
            import logging

            logging.getLogger(__name__).info(
                "connected_components converged in %d rounds", it + 1
            )
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge within max_iter={max_iter} rounds"
        )
    # labels is persisted and already materialized by the fixpoint count
    sym.unpersist()
    return labels


def paragraph_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    para_words: int = 32,
) -> DataFrame:
    """Paragraph-level exact dedup (the CCNet/RefinedWeb-lineage step:
    dedup at sub-document granularity, then re-assemble each document from
    its surviving paragraphs).

    Corpora without explicit paragraph breaks use non-overlapping
    ``para_words``-word windows (``chunk_documents`` with overlap 0) as the
    paragraph unit. A paragraph survives iff it is the globally FIRST
    occurrence of its content hash, ordered by (id, paragraph number) —
    every later copy anywhere in the corpus is dropped.

    Returns one row per input document: ``n_paras`` (total paragraphs),
    ``n_paras_kept`` and ``dedup_text`` (surviving paragraphs re-joined in
    document order; empty string when every paragraph was a repeat).

    100 TB shape: the first-occurrence winner per hash is computed with
    ``min(struct(id, para_no))`` — a partially-aggregable groupBy, so a
    boilerplate paragraph repeated 10^8 times combines map-side instead of
    hot-spotting one window partition (the row_number formulation would).
    Re-assembly groups by document id, bounded by single-document size.
    Three shuffles total (hash agg, winner join, doc re-assembly), all on
    high-cardinality or document keys.
    """
    from vectorchord_spark.pipeline.text import chunk_documents

    paras = chunk_documents(
        df.select(id_col, text_col),
        text_col,
        chunk_words=para_words,
        overlap_words=0,
        id_col=id_col,
    ).select(
        F.col(id_col).alias("_id"),
        F.col("chunk_no").alias("para_no"),
        F.col("chunk_text").alias("para_text"),
        F.md5("chunk_text").alias("_h"),
    )
    winners = paras.groupBy("_h").agg(
        F.min(F.struct("_id", "para_no")).alias("w")
    ).select("_h", F.col("w._id").alias("_id"), F.col("w.para_no").alias("para_no"))
    kept = paras.join(winners, ["_h", "_id", "para_no"], "left_semi")
    reassembled = kept.groupBy("_id").agg(
        F.count(F.lit(1)).alias("n_paras_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("para_no", "para_text"))),
                lambda s: s["para_text"],
            ),
            " ",
        ).alias("dedup_text"),
    )
    totals = paras.groupBy("_id").agg(F.count(F.lit(1)).alias("n_paras"))
    return (
        totals.join(reassembled, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            "n_paras",
            F.coalesce("n_paras_kept", F.lit(0)).alias("n_paras_kept"),
            F.coalesce("dedup_text", F.lit("")).alias("dedup_text"),
        )
    )


def paragraph_neardup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    para_words: int = 32,
    n: int = 3,
    num_hashes: int = 8,
    band_rows: int = 2,
    max_bucket: int | None = 64,
) -> DataFrame:
    """Paragraph-level NEAR-dup candidate pairs: :func:`paragraph_dedup`'s
    splitter composed with the banded MinHash+LSH join, at (id, para_no)
    granularity. Returns one row per candidate pair of near-duplicate
    paragraphs across (or within) documents:
    ``(ida, para_a, idb, para_b)``, ordered pairs (a < b by the composite
    key). Verification (exact Jaccard) is the caller's choice, as with
    :func:`minhash_lsh_pairs`.

    100 TB shape: identical to minhash_lsh_pairs — banding turns all-pairs
    into a groupBy on band keys; paragraph granularity only multiplies the
    row count by paragraphs-per-doc, it adds no new shuffle. Boilerplate
    paragraphs are the canonical mega-bucket case, so the per-bucket
    ``max_bucket`` cap (see :func:`capped_band_pairs`) matters here most."""
    from vectorchord_spark.pipeline.text import chunk_documents

    paras = chunk_documents(
        df.select(id_col, text_col),
        text_col,
        chunk_words=para_words,
        overlap_words=0,
        id_col=id_col,
    ).select(
        F.concat(
            F.col(id_col).cast("string"), F.lit("#"), F.col("chunk_no")
        ).alias("_pid"),
        F.col("chunk_text").alias("_ptext"),
    )
    pairs = minhash_lsh_pairs(
        paras, id_col="_pid", text_col="_ptext", n=n,
        num_hashes=num_hashes, band_rows=band_rows, max_bucket=max_bucket,
    )

    def split(col: str, out_id: str, out_no: str):
        return [
            F.split_part(F.col(col), F.lit("#"), F.lit(1)).alias(out_id),
            F.split_part(F.col(col), F.lit("#"), F.lit(2))
            .cast("int")
            .alias(out_no),
        ]

    return pairs.select(
        *split("ida", "ida", "para_a"), *split("idb", "idb", "para_b")
    )
