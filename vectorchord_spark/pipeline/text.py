"""Text-analysis operators for large-scale training-data pipelines.

All pure Spark column expressions / DataFrame transforms (JVM-side, no
Python in the hot path): language ID by wordlist profile, quality-scoring
statistics, regex token counting, canonical fingerprints. These are the
beyond-the-reference LLM-pipeline operators requested by the BASELINE north
star; each has an oracle-matched entry in the query catalog.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: whitespace + BPE-ish token pattern: word pieces, digit runs, punctuation
TOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def words(text: Column | str) -> Column:
    return F.split(text, " ")


def token_count(text: Column | str, pattern: str = TOKEN_RE) -> Column:
    """Regex token count (whitespace + BPE-ish split)."""
    return F.size(F.regexp_extract_all(text, F.lit(pattern), 0)).cast("bigint")


def normalize_text(
    text: Column | str,
    lowercase: bool = True,
    strip_punct: bool = True,
    collapse_digits: bool = True,
) -> Column:
    """CCNet-style text normalization for dedup robustness: lowercase,
    punctuation/symbols → space, digit runs → ``0``, whitespace collapsed.
    Pure JVM regexp/lower expressions — no Python, no shuffle; feed the
    result into ``shingles``/``minhash``/``simhash`` so near-dups that
    differ only in case, punctuation, or numbers collapse together (the
    CCNet/RefinedWeb preprocessing step). Accent folding is deliberately
    out of scope (Java regex has no portable transliteration; a Pandas UDF
    with unicodedata is the escape hatch if needed)."""
    c = F.col(text) if isinstance(text, str) else text
    if lowercase:
        c = F.lower(c)
    if strip_punct:
        # \p{P} = unicode punctuation, \p{S} = symbols (Java regex
        # supports unicode general categories)
        c = F.regexp_replace(c, r"[\p{P}\p{S}]+", " ")
    if collapse_digits:
        c = F.regexp_replace(c, r"\d+", "0")
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def doc_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality statistics (the usual pre-training filters)."""
    w = words(text_col)
    n_words = F.size(w)
    n_distinct = F.size(F.array_distinct(w))
    total_len = F.aggregate(
        F.transform(w, lambda x: F.length(x).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    return df.withColumns(
        {
            "n_chars": F.length(text_col).cast("bigint"),
            "n_words": n_words.cast("bigint"),
            "n_tokens": token_count(text_col),
            "n_distinct": n_distinct.cast("bigint"),
            "distinct_ratio": n_distinct.cast("double") / n_words.cast("double"),
            "avg_word_len": total_len.cast("double") / n_words.cast("double"),
        }
    )


def quality_score(text: Column | str) -> Column:
    """Scalar [0,1] quality heuristic combining length and repetition."""
    w = words(text)
    n_words = F.size(w).cast("double")
    distinct_ratio = F.size(F.array_distinct(w)).cast("double") / n_words
    length_score = F.least(n_words / F.lit(100.0), F.lit(1.0))
    return (length_score + distinct_ratio) / F.lit(2.0)


def detect_language(
    text: Column | str, profiles: dict[str, list[str]]
) -> Column:
    """Wordlist-profile language ID: occurrences of each language's profile
    words, argmax with lexicographic tie-break. ``profiles`` maps language
    code → profile word list (n-gram profiles work the same way with a
    shingle column as input)."""
    w = words(text)
    langs = sorted(profiles)
    scores = {
        lang: F.size(F.filter(w, lambda x: x.isin(profiles[lang]))).cast("bigint")
        for lang in langs
    }
    m = F.greatest(*[scores[lang] for lang in langs])
    expr = None
    for lang in langs:
        cond = scores[lang] == m
        expr = F.when(cond, lang) if expr is None else expr.when(cond, lang)
    return expr


def fingerprint(text: Column | str) -> Column:
    """Canonical content fingerprint: md5 of the sorted distinct token set
    (fingerprint-clustering normalization; near-identical reorderings of the
    same vocabulary collapse to one key)."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(words(text)))))


def rolling_fingerprints(
    text: Column | str, k: int = 5, window: int = 4
) -> Column:
    """Winnowing-style document fingerprints: k-word shingle hashes, then
    the minimum hash of every ``window`` consecutive shingles (deduplicated).
    Returns an array<bigint> of selected fingerprints.

    Both intermediate arrays are bound to lambda variables (``transform``
    over a one-element array — the same fix as ``dedup.shingles``):
    referencing the split/shingle EXPRESSIONS inside the next lambda
    inlines a fresh recomputation per element — O(words³) per doc here
    (split per element_at per shingle per window), which did not finish
    the sf0.1 documents table in 5 minutes; bound, it runs in ~1s."""

    def per_shingles(sh: Column) -> Column:
        return F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size(sh) - window, F.lit(0))),
                lambda i: F.array_min(F.slice(sh, i + 1, window)),
            )
        )

    def per_words(w: Column) -> Column:
        n = F.size(w)
        sh = F.transform(
            F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1))),
            lambda i: F.xxhash64(
                F.concat_ws(" ", *[F.element_at(w, i + j) for j in range(k)])
            ),
        )
        return F.element_at(F.transform(F.array(sh), per_shingles), 1)

    return F.element_at(F.transform(F.array(words(text)), per_words), 1)


def _split_encode(col):
    """Split one Arrow string column into exact-coded words — the shared
    preamble of every vectorized text kernel here (guide §4.2):
    ``pc.split_pattern(col, " ")`` has the same semantics as Java/Python
    split-on-space with limit -1 (empty parts kept, null text → null list
    → n_words -1 like ``size(split(NULL))``); ``pc.dictionary_encode`` is
    an exact C++ factorize (hash on full bytes, NOT a lossy hash —
    collision-free by construction). No Python string objects are ever
    materialized.

    Returns ``(n_words, lens, null_mask, enc, wcode, K, dix, total)``:
    per-row word counts (with the -1 null sentinel), null-corrected
    lengths, the dictionary-encoded flat word array (``enc``; None when
    the batch has no words), int64 word codes, vocab size, the doc index
    of every word position, and the total word count.

    Overflow margin for downstream composed keys: an Arrow string column
    caps a batch at 2 GiB of payload, so words-per-batch < ~4e8 < 2^29;
    every composition here multiplies two factors each bounded by that
    (word code · vocab, pair code · vocab, doc index · group count),
    staying far under 2^63."""
    import numpy as np
    import pyarrow.compute as pc

    n = len(col)
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
        empty = np.empty(0, dtype=np.int64)
        return n_words, lens, null_mask, None, empty, np.int64(0), empty, 0
    flat = lst.flatten()
    # null lists have zero offset extent, so flatten() stays aligned with
    # the null-corrected lens; assert the contract rather than assume it
    assert len(flat) == total, "split flatten misaligned with lengths"
    enc = pc.dictionary_encode(flat)
    wcode = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    K = np.int64(len(enc.dictionary))
    dix = np.repeat(np.arange(n, dtype=np.int64), lens)
    return n_words, lens, null_mask, enc, wcode, K, dix, total


def _gram_counts(n, wcode, K, dix, total):
    """(max_2gram_count, dup_3gram_count) int64 arrays over exact-coded
    words: word codes compose into exact integer gram keys and
    per-(doc, gram) counts come from one ``bincount`` over composed
    codes (see ``_split_encode`` for the overflow margin)."""
    import numpy as np
    import pandas as pd

    max2 = np.zeros(n, dtype=np.int64)
    dup3 = np.zeros(n, dtype=np.int64)

    def group_stats(keys, docs, out_max, out_dup):
        # exact per-(doc, key) counts: compact the keys, compose with the
        # doc index, factorize the composition, bincount the group ids
        kc, ku = pd.factorize(keys)
        comb = docs * np.int64(len(ku)) + kc
        gid, gu = pd.factorize(comb)
        cnt = np.bincount(gid).astype(np.int64)
        gdoc = gu // np.int64(len(ku))
        np.maximum.at(out_max, gdoc, cnt)
        m = cnt >= 2
        np.add.at(out_dup, gdoc[m], cnt[m])

    if total >= 2:
        same = dix[:-1] == dix[1:]  # adjacent positions in the same doc
        g2 = (wcode[:-1] * K + wcode[1:])[same]
        if len(g2):
            group_stats(g2, dix[:-1][same], max2, np.zeros(n, np.int64))
        if total >= 3 and len(g2):
            p2, _ = pd.factorize(g2)  # compact pair codes, exact
            pair_full = np.full(total - 1, -1, dtype=np.int64)
            pair_full[same] = p2
            same3 = same[:-1] & same[1:]
            g3 = (pair_full[:-1] * K + wcode[2:])[same3]
            if len(g3):
                group_stats(
                    g3, dix[:-2][same3], np.zeros(n, np.int64), dup3
                )
    return max2, dup3


def _repstats_batch(col):
    """(n_words, max_2gram_count, dup_3gram_count) int64 numpy arrays for
    one Arrow string column — EXACT Gopher gram counting, fully
    vectorized (``_split_encode`` + ``_gram_counts``)."""
    n_words, _, _, _, wcode, K, dix, total = _split_encode(col)
    max2, dup3 = _gram_counts(len(col), wcode, K, dix, total)
    return n_words, max2, dup3


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition filters (published pre-training heuristics,
    Rae et al. 2021 §A1.1: drop docs dominated by a repeated n-gram or by
    duplicated n-grams), word-level variant:

    - ``max_2gram_count``: occurrences of the most frequent word 2-gram
    - ``dup_3gram_count``: total occurrences of word 3-grams appearing
      more than once
    - ``top_2gram_frac`` / ``dup_3gram_frac``: the corresponding word
      fractions (2·max/n_words, min(1, 3·dup/n_words))

    One ``mapInArrow`` pass (zero shuffle, embarrassingly parallel): gram
    counting runs in vectorized native code per Arrow batch
    (``_repstats_batch``). The r13 A/B vs the previous pure-JVM
    sort+fold expression tree (interleaved at sf0.1, results asserted
    identical): 1.121 → 0.321s — higher-order functions evaluate
    interpreted per element in the JVM, while split/factorize/bincount
    are C loops. Output columns are appended in the same order as before;
    a pre-existing column with a stat name is replaced (old
    ``withColumns`` semantics), now at the appended position. All input
    columns pass through the Arrow node — select only what you need
    before calling (the callers here pass (id, text))."""
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    stat_names = (
        "n_words",
        "max_2gram_count",
        "dup_3gram_count",
        "top_2gram_frac",
        "dup_3gram_frac",
    )
    base = df.drop(*[c for c in stat_names if c in df.columns])
    ti = base.columns.index(text_col)
    fields = list(base.schema.fields) + [
        StructField("n_words", LongType()),
        StructField("max_2gram_count", LongType()),
        StructField("dup_3gram_count", LongType()),
        StructField("top_2gram_frac", DoubleType()),
        StructField("dup_3gram_frac", DoubleType()),
    ]
    names = [f.name for f in fields]

    def batches(it):
        import numpy as np
        import pyarrow as pa

        for b in it:
            nw, m2, d3 = _repstats_batch(b.column(ti))
            # same IEEE op order as the previous JVM expressions:
            # (2.0 * max2) / nw and min((3.0 * dup3) / nw, 1.0) — results
            # bit-identical (n_words is never 0: split of non-null text
            # yields ≥ 1 part, null text takes the -1 sentinel)
            nwd = nw.astype(np.float64)
            top2 = 2.0 * m2.astype(np.float64) / nwd
            d3f = np.minimum(3.0 * d3.astype(np.float64) / nwd, 1.0)
            yield pa.RecordBatch.from_arrays(
                list(b.columns)
                + [
                    pa.array(nw),
                    pa.array(m2),
                    pa.array(d3),
                    pa.array(top2),
                    pa.array(d3f),
                ],
                names=names,
            )

    return base.mapInArrow(batches, StructType(fields))


def row_filter_stats(
    df: DataFrame,
    text_col: str = "text",
    rep: bool = True,
    quality: bool = False,
    lang_profiles: "dict[str, list[str]] | None" = None,
) -> DataFrame:
    """Every per-row curation statistic in ONE vectorized Arrow pass,
    appended to the input columns (which all pass through — select before
    calling): ``_cr_nw`` (word count, -1 for NULL text), optionally
    ``_cr_lang`` (wordlist-profile language id, same argmax +
    lexicographic tie-break as :func:`detect_language`),
    ``top_2gram_frac``/``dup_3gram_frac`` (the Gopher repetition
    fractions of :func:`repetition_stats`), and ``_cr_q`` (the
    :func:`quality_score` heuristic).

    This exists so :func:`curate`'s stages 1–4 need NO corpus-wide
    stats join: computing the stats where the text already is (guide §8
    — move decisions to the data, not payloads to the decisions) removes
    the join that would shuffle the document payload at scale, and an
    opaque node's outputs cannot be alias-substituted into downstream
    filters, so each statistic is structurally evaluated once (the
    r12/r13 duplicated-expression problem cannot re-appear).

    Exactness: integer counting as in ``_repstats_batch``; the language
    argmax is integer logic with the profile membership evaluated once
    on the word DICTIONARY (not per token); the two float formulas keep
    the JVM expressions' IEEE op order, so results are bit-identical —
    including the NULL-text sentinels (counts -1 → quality
    (min(-1/100, 1) + (-1)/(-1))/2 = 0.495, language = first profile
    lexicographically, exactly what the JVM expressions yield)."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    langs = sorted(lang_profiles) if lang_profiles is not None else None
    profiles = (
        {lg: list(lang_profiles[lg]) for lg in langs} if langs else None
    )
    ti = df.columns.index(text_col)
    fields = list(df.schema.fields) + [StructField("_cr_nw", LongType())]
    if langs:
        fields.append(StructField("_cr_lang", StringType()))
    if rep:
        fields.append(StructField("top_2gram_frac", DoubleType()))
        fields.append(StructField("dup_3gram_frac", DoubleType()))
    if quality:
        fields.append(StructField("_cr_q", DoubleType()))
    names = [f.name for f in fields]

    def batches(it):
        import numpy as np
        import pandas as pd
        import pyarrow as pa
        import pyarrow.compute as pc

        for b in it:
            col = b.column(ti)
            n = len(col)
            n_words, lens, null_mask, enc, wcode, K, dix, total = (
                _split_encode(col)
            )
            out = list(b.columns) + [pa.array(n_words)]
            if langs:
                counts = np.zeros((len(langs), n), dtype=np.int64)
                if total:
                    for li, lg in enumerate(langs):
                        mem = pc.is_in(
                            enc.dictionary, value_set=pa.array(profiles[lg])
                        ).to_numpy(zero_copy_only=False)
                        hit = mem[wcode]
                        if hit.any():
                            counts[li] = np.bincount(
                                dix[hit], minlength=n
                            )
                if null_mask is not None:
                    counts[:, null_mask] = -1  # size(filter(NULL)) = -1
                # first (sorted) language reaching the max — argmax picks
                # the lowest index, matching the JVM when-chain tie-break
                pick = np.argmax(counts, axis=0)
                out.append(
                    pa.array(
                        np.array(langs, dtype=object)[pick],
                        type=pa.string(),
                    )
                )
            if rep:
                max2, dup3 = _gram_counts(n, wcode, K, dix, total)
                nwd = n_words.astype(np.float64)
                out.append(pa.array(2.0 * max2.astype(np.float64) / nwd))
                out.append(
                    pa.array(
                        np.minimum(
                            3.0 * dup3.astype(np.float64) / nwd, 1.0
                        )
                    )
                )
            if quality:
                distinct = np.full(n, -1, dtype=np.int64)
                if total:
                    comb = dix * K + wcode
                    gid, gu = pd.factorize(comb)
                    gdoc = gu // K
                    distinct[: gdoc.max() + 1] = np.bincount(gdoc)
                    distinct[lens == 0] = -1  # NULL rows keep the sentinel
                nwd = n_words.astype(np.float64)
                ls = np.minimum(nwd / 100.0, 1.0)
                out.append(
                    pa.array((ls + distinct.astype(np.float64) / nwd) / 2.0)
                )
            yield pa.RecordBatch.from_arrays(out, names=names)

    return df.mapInArrow(batches, StructType(fields))


#: conservative PII patterns, engine-portable subset (same semantics in
#: Java regex and RE2/DuckDB: no backrefs, no lookaround): emails, IPv4s,
#: international-ish phone numbers, 16-digit card-like numbers
PII_PATTERNS: dict[str, str] = {
    "email": r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "phone": r"\+[0-9]{1,3}[ -][0-9]{3}[ -][0-9]{3}[ -][0-9]{4}",
    "card": r"\b[0-9]{4}[ -][0-9]{4}[ -][0-9]{4}[ -][0-9]{4}\b",
}


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
    replacement: str = "[{kind}]",
) -> DataFrame:
    """Scrub PII-looking spans from a text column (the compliance pass a
    training corpus runs before anything else sees it).

    Adds ``{text_col}_redacted`` (spans replaced by the per-kind
    ``replacement`` token) and one ``n_{kind}`` count per pattern, so the
    scrub is auditable (per-doc counts aggregate into the corpus
    compliance report). Pure JVM ``regexp_replace``/``regexp_count`` —
    no Python, no shuffle; patterns are a portable regex subset (no
    backrefs/lookaround) so external audits can reproduce the scrub in
    any RE2-compatible engine."""
    patterns = patterns or PII_PATTERNS
    out = F.col(text_col) if isinstance(text_col, str) else text_col
    counts = {}
    for kind, pat in patterns.items():
        counts[f"n_{kind}"] = F.regexp_count(
            F.col(text_col), F.lit(pat)
        ).cast("bigint")
        out = F.regexp_replace(out, pat, replacement.format(kind=kind))
    return df.withColumns({f"{text_col}_redacted": out, **counts})


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    chunk_words: int = 64,
    overlap_words: int = 16,
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into overlapping word-window chunks (the
    RAG/embedding preprocessing step: long docs become ``chunk_words``-word
    windows advancing by ``chunk_words - overlap_words``).

    Emits one row per (doc, chunk): ``chunk_no`` (0-based), ``chunk_text``
    (space-joined window) and ``chunk_n_words``. The last window is the
    final partial remainder unless the doc ended exactly on a stride
    boundary; single-window docs produce exactly one chunk. Pure JVM
    (``sequence`` + ``explode`` + ``slice``): no Python, no shuffle —
    chunking is embarrassingly parallel and growth-stable at any corpus
    size."""
    if not 0 <= overlap_words < chunk_words:
        raise ValueError("need 0 <= overlap_words < chunk_words")
    stride = chunk_words - overlap_words
    w = words(text_col)
    n = F.size(w)
    # number of windows: 1 + ceil(max(0, n - chunk) / stride)
    extra = F.greatest(n - F.lit(chunk_words), F.lit(0))
    n_chunks = F.lit(1) + F.ceil(extra.cast("double") / F.lit(stride)).cast("int")
    out = df.withColumn("_w", w).withColumn(
        "chunk_no", F.explode(F.sequence(F.lit(0), n_chunks - F.lit(1)))
    )
    win = F.slice(
        F.col("_w"), F.col("chunk_no") * F.lit(stride) + F.lit(1), chunk_words
    )
    return (
        out.withColumn("chunk_text", F.array_join(win, " "))
        .withColumn("chunk_n_words", F.size(win).cast("bigint"))
        .drop("_w")
    )
