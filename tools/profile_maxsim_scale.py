"""MaxSim at scale (r11 verdict item #5): the reference's headline
late-interaction path measured end-to-end — build a 1M-doc x 16-token
multivector IVF index (16M token vectors), serve probed MaxSim queries
(with and without refine), and score recall@k against an exact
brute-force MaxSim oracle computed in one linear Spark pass.

The 100x question (verdict): does the explode -> groupBy-min-sum token
fan-out shuffle stay bounded? By construction the candidate pool is
n_tokens x per_token_candidates rows per query, INDEPENDENT of table
size — the pool row count is printed per query to document it.

Usage: [DOCS=1000000] [TOKENS=16] [DIM=64] [QUERIES=8] [PROBES=64]
       python tools/profile_maxsim_scale.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
from typing import Iterator

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd


def _cleanup_tmpdir(path: str) -> None:
    import atexit
    import shutil

    if os.environ.get("VC_KEEP_TMP") != "1":
        atexit.register(lambda: shutil.rmtree(path, ignore_errors=True))


def canary(dim: int = 64) -> str:
    from vectorchord_spark import kernels as K

    prev = K.set_blas_threads(1)
    cm = np.random.default_rng(0).standard_normal((20000, dim)).astype(np.float32)
    best = min(
        (lambda t0: (K.rotate(cm), time.perf_counter() - t0)[1])(time.perf_counter())
        for _ in range(3)
    )
    if prev is not None and prev > 1:
        K.set_blas_threads(prev)
    return f"solo rotate {20000 / best:,.0f} rows/s"


def main() -> None:
    from pyspark.sql import functions as F

    from vectorchord_spark import IvfIndex, IvfOptions
    from vectorchord_spark.operators.maxsim import maxsim_search
    from vectorchord_spark.session import get_spark

    n_docs = int(os.environ.get("DOCS", "1000000"))
    n_tok = int(os.environ.get("TOKENS", "16"))
    dim = int(os.environ.get("DIM", "64"))
    n_q = int(os.environ.get("QUERIES", "8"))
    probes = int(os.environ.get("PROBES", "64"))
    k = 10
    print(f"{n_docs:,} docs x {n_tok} tokens x {dim}d "
          f"({n_docs * n_tok:,} token vectors), {n_q} queries, "
          f"probes={probes}, k={k}")
    print(f"canary pre: {canary(dim)}", flush=True)

    spark = get_spark(app_name="vc-maxsim-scale")
    spark.sparkContext.setLogLevel("ERROR")

    # center diversity must SCALE with the corpus: at 2,000 centers a 1M-
    # doc corpus put ~31 unrelated families on every (token, center), and
    # their statistically-identical tokens crowd the per-token candidate
    # lists — recall then measures an impossible problem, not the index.
    # ~5 docs/center keeps inter-family crowding realistic at every size.
    n_centers = int(min(200_000, max(2000, n_docs // 5)))
    centers = np.random.default_rng(77).standard_normal((n_centers, dim)).astype(
        np.float32
    ) * 2.0
    bc_centers = spark.sparkContext.broadcast(centers)

    # Graded-family corpus: docs come in families of 16 (f = d // 16)
    # whose token-t center is a hash of (f, t) — so a query near family
    # f's centers has ~16 relevant docs with GRADED noise (0.05 + 0.45 *
    # rank/16): the true top-10 is the family's 10 lowest-noise members,
    # a well-separated ranking an ANN index must actually find. (A first
    # version used cid = (d*16+t) % 2000, which gives 8,000 docs per
    # query with IDENTICAL center sequences — the top-10 becomes a noise
    # lottery that no bounded-candidate method, and no real corpus,
    # exhibits.)
    fam_size = 16

    def _cid(fam: np.ndarray, tok: np.ndarray) -> np.ndarray:
        return ((fam * 2654435761 + tok * 40503 + 12345) ^ (fam >> 3)) % n_centers

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        C = bc_centers.value
        for pdf in batches:
            ids = pdf["id"].to_numpy(np.int64)  # doc ids
            rng = np.random.default_rng(ids[0] if len(ids) else 0)
            rows_id = np.repeat(ids, n_tok) * (1 << 16) + np.tile(
                np.arange(n_tok, dtype=np.int64), len(ids)
            )
            fam = np.repeat(ids // fam_size, n_tok)
            tok = np.tile(np.arange(n_tok, dtype=np.int64), len(ids))
            scale = (
                0.05 + 0.45 * (np.repeat(ids % fam_size, n_tok) / fam_size)
            )[:, None].astype(np.float32)
            vecs = C[_cid(fam, tok)] + scale * rng.standard_normal(
                (len(ids) * n_tok, dim)
            ).astype(np.float32)
            yield pd.DataFrame({"id": rows_id, "vec": list(vecs.astype(np.float32))})

    tokens_df = (
        spark.range(n_docs, numPartitions=128)
        .mapInPandas(gen, "id long, vec array<float>")
        .persist()
    )
    n_vec = tokens_df.count()
    print(f"token table materialized: {n_vec:,} rows", flush=True)

    # ---- build ----
    tmp = tempfile.mkdtemp(prefix="vc_maxsim_scale_")
    _cleanup_tmpdir(tmp)
    n_lists = max(16, int(n_vec ** 0.5))
    opts = IvfOptions(
        metric="l2", lists=[n_lists], build_hierarchical=True, sampling_factor=64
    )
    t0 = time.perf_counter()
    # tokens_df already has packed ids (doc*2^16 + tok): build directly and
    # mark multivector (build_multivector would re-explode a doc-rows frame)
    index = IvfIndex.build(spark, tokens_df, "id", "vec", tmp, opts)
    index.meta["multivector"] = True
    build_s = time.perf_counter() - t0
    print(f"build: {n_vec:,} token vectors, lists={n_lists} in {build_s:.1f}s "
          f"({n_vec / build_s:,.0f} rows/s)  [{canary(dim)}]", flush=True)

    # ---- queries: 16 tokens near the token centers of a random doc ----
    qrng = np.random.default_rng(999)
    qfams = qrng.integers(0, n_docs // fam_size, n_q)
    queries = []
    for qf in qfams:
        cid = _cid(
            np.full(n_tok, qf, np.int64), np.arange(n_tok, dtype=np.int64)
        )
        q = centers[cid] + 0.05 * qrng.standard_normal((n_tok, dim)).astype(
            np.float32
        )
        queries.append(np.asarray(q, np.float64))

    # ---- STAGES=1: per-stage serve decomposition only (no oracle) ----
    if os.environ.get("STAGES") == "1":
        from vectorchord_spark.operators.maxsim import maxsim_search

        for qi, q in enumerate(queries[: min(3, n_q)]):
            tokens_f = [list(map(float, t)) for t in q]
            t0 = time.perf_counter()
            n_cand = index.search_batch(
                tokens_f, k=100, probes=[probes], rerank_factor=None
            ).count()
            t_cand = time.perf_counter() - t0
            t0 = time.perf_counter()
            maxsim_search(
                index, query_tokens=q, k=k,
                per_token_candidates=100, probes=[probes],
            ).collect()
            t_full = time.perf_counter() - t0
            print(
                f"stage split q{qi}: candidate job (one batched codes "
                f"scan for all {n_tok} tokens -> {n_cand} rows) "
                f"{t_cand:.2f}s; full maxsim {t_full:.2f}s -> estimation "
                f"collect + groupBy-min-sum + top-k = {t_full - t_cand:.2f}s",
                flush=True,
            )
        print(f"canary post: {canary(dim)}")
        spark.stop()
        return

    # ---- exact brute-force oracle: one linear pass per query ----
    def bf_topk(q: np.ndarray) -> list[int]:
        bq = spark.sparkContext.broadcast(q.astype(np.float32))

        def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            Q = bq.value  # (n_tok, dim)
            for pdf in batches:
                if not len(pdf):
                    continue
                ids = pdf["id"].to_numpy(np.int64)
                M = np.stack([np.asarray(v, np.float32) for v in pdf["vec"]])
                # squared l2 via gram trick, then sqrt (operator metric=l2)
                d2 = (
                    (M * M).sum(1)[:, None]
                    - 2.0 * (M @ Q.T)
                    + (Q * Q).sum(1)[None, :]
                )
                d = np.sqrt(np.maximum(d2, 0.0))  # (m, n_tok)
                docs = ids >> 16
                out = pd.DataFrame(d, columns=[f"d{t}" for t in range(n_tok)])
                out.insert(0, "doc_id", docs)
                # partial min per doc within the batch (docs are contiguous)
                yield out.groupby("doc_id", as_index=False).min()

        cols = ", ".join(f"d{t} double" for t in range(n_tok))
        part = tokens_df.mapInPandas(score, f"doc_id long, {cols}")
        agg = part.groupBy("doc_id").agg(
            *[F.min(f"d{t}").alias(f"m{t}") for t in range(n_tok)]
        )
        scored = agg.select(
            "doc_id",
            sum([F.col(f"m{t}") for t in range(n_tok)], F.lit(0.0)).alias("score"),
        )
        top = scored.orderBy("score", "doc_id").limit(k).collect()
        bq.destroy()
        return [r.doc_id for r in top]

    t0 = time.perf_counter()
    truth = [bf_topk(q) for q in queries]
    bf_s = time.perf_counter() - t0
    print(f"brute-force oracle: {n_q} queries in {bf_s:.1f}s "
          f"({bf_s / n_q:.1f}s/query, one linear pass over {n_vec:,} rows each)",
          flush=True)

    # ---- served configs ----
    # refine=0 exact-reranks the whole pool; refine=N<pool keeps the tail
    # ROUGH (RaBitQ estimates) — the reference's accuracy/IO tradeoff
    # (maxsim_ivf_refine gate contract: full budget == exhaustive top-k,
    # half budget >= 0.6 overlap at gate scale)
    for label, kw in (
        ("probed exact", dict(per_token_candidates=100, probes=[probes])),
        ("wide exact", dict(per_token_candidates=300, probes=[probes])),
        ("refine full", dict(per_token_candidates=300, probes=[probes],
                             maxsim_refine=300)),
        ("refine half", dict(per_token_candidates=300, probes=[probes],
                             maxsim_refine=100)),
    ):
        lat, rec = [], []
        for qi, q in enumerate(queries):
            t0 = time.perf_counter()
            got = [
                r.doc_id
                for r in maxsim_search(index, query_tokens=q, k=k, **kw).collect()
            ]
            lat.append(time.perf_counter() - t0)
            rec.append(len(set(got) & set(truth[qi])) / k)
        pool_rows = n_tok * kw["per_token_candidates"]
        print(
            f"{label:14s}: recall@{k} {np.mean(rec):.3f}  "
            f"latency med {np.median(lat):.2f}s  "
            f"(candidate pool <= {pool_rows} rows/query — bounded by "
            f"n_tokens x per_token_candidates, independent of table size)",
            flush=True,
        )
    print(f"canary post: {canary(dim)}")
    spark.stop()


if __name__ == "__main__":
    main()
