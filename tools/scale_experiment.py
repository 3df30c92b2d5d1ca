"""1M-row scale experiment: validates that the IVF design holds at 500x the
bench scale factor on one machine (the stand-in for "would this hold on a
real cluster"). Generates 1M x 64-dim vectors, builds an IVF index with a
1000-cell hierarchical tree, and measures build throughput, search latency,
batch throughput, and recall. Results recorded in docs/SCALE.md.

Usage: python tools/scale_experiment.py [n_rows]
"""

from __future__ import annotations

import sys
import tempfile
import time
from typing import Iterator

import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")


def _cleanup_tmpdir(path: str) -> None:
    """Delete a profiling index dir at exit unless VC_KEEP_TMP=1.

    These runs write multi-GB codes dirs; a round of repeated profiling
    filled the disk to 99% (which itself degrades every write-heavy
    measurement) before this existed."""
    import atexit
    import os as _os
    import shutil

    if _os.environ.get("VC_KEEP_TMP") != "1":
        root = (
            _os.path.dirname(path)
            if _os.path.basename(path) in ("idx", "gidx")
            else path
        )
        atexit.register(shutil.rmtree, root, ignore_errors=True)


def _window() -> str:
    """One-line window-quality stamp (solo canary + 24-thread parallel
    scale — tools/window_probe.py). Printed before AND after every
    experiment so each SCALE.md number carries the canary it ran under
    (r09: a solo canary alone cannot certify a window)."""
    import os as _os

    sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
    from window_probe import probe

    p = probe()
    return (
        f"window: solo={p['solo_rotate_rows_per_s']:,} rotate-rows/s, "
        f"parallel_scale_24t={p['parallel_scale_24t']} (clean ~18-22)"
    )


def main() -> None:
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_rows = int(pos[0]) if pos else 1_000_000
    dim = 64
    n_lists = max(16, int(np.sqrt(n_rows)))
    print("start " + _window())
    import atexit

    atexit.register(lambda: print("end   " + _window()))

    from pyspark.sql import functions as F

    from vectorchord_spark import IvfIndex, IvfOptions, get_spark, knn_exact

    spark = get_spark(app_name="scale-experiment")

    if "--cc" in sys.argv:
        # pure-distributed connected-components point (r04 verdict #6):
        # >= 10M undirected edges so the ~2M-edge driver union-find
        # finisher CANNOT engage (driver_threshold=0 forces the
        # pointer-doubling path end-to-end). Graph = n_chains chains of
        # length chain_len (known truth: component = chain's min node id;
        # diameter chain_len stresses the O(log d) doubling) + one giant
        # star to exercise the skew side.
        import logging

        from vectorchord_spark.pipeline.dedup import connected_components

        logging.basicConfig(level=logging.INFO)  # surfaces the rounds count
        n_chains = 100_000
        chain_len = 100  # 100k chains x 99 edges = 9.9M + star 1M = 10.9M
        star = 1_000_000
        chain_edges = (
            spark.range(n_chains * chain_len, numPartitions=64)
            .where((F.col("id") % chain_len) != chain_len - 1)
            .select(F.col("id").alias("ida"), (F.col("id") + 1).alias("idb"))
        )
        base_star = n_chains * chain_len
        star_edges = (
            spark.range(star, numPartitions=16)
            .select(
                F.lit(base_star).alias("ida"),
                (F.lit(base_star) + 1 + F.col("id")).alias("idb"),
            )
        )
        edges = chain_edges.unionAll(star_edges).persist()
        n_edges = edges.count()
        print(f"edges: {n_edges:,} (driver finisher disabled)")
        t0 = time.perf_counter()
        # --cc-ckpt: run with the reliable-checkpoint option engaged (the
        # executor-loss durability path) to prove it at the 10.9M point
        ckpt = None
        if "--cc-ckpt" in sys.argv:
            ckpt = tempfile.mkdtemp(prefix="vc_cc_ckpt_")
            print(f"reliable checkpoint dir: {ckpt}")
        comp = connected_components(
            edges, driver_threshold=0, checkpoint_dir=ckpt
        )
        # verify against the closed-form truth: every node's component is
        # its chain's first node (id - id % chain_len), star's is its hub
        wrong = comp.where(
            F.when(
                F.col("id") >= base_star, F.col("component") != base_star
            ).otherwise(
                F.col("component") != F.col("id") - (F.col("id") % chain_len)
            )
        ).count()
        n_nodes = comp.count()
        cc_s = time.perf_counter() - t0
        n_comp = comp.select("component").distinct().count()
        print(
            f"connected_components: {cc_s:.1f}s, {n_nodes:,} nodes -> "
            f"{n_comp:,} components, wrong labels = {wrong}"
        )
        assert wrong == 0 and n_comp == n_chains + 1
        spark.stop()
        return


    clustered = "--clustered" in sys.argv
    n_centers = 2000
    centers = np.random.default_rng(77).standard_normal((n_centers, dim)) * 2.0

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy(np.int64)
            out = []
            for i in ids:
                rng = np.random.default_rng(i)
                if clustered:
                    c = centers[int(i) % n_centers]
                    out.append(
                        (c + 0.25 * rng.standard_normal(dim)).astype(np.float32)
                    )
                else:
                    out.append(rng.standard_normal(dim).astype(np.float32))
            yield pd.DataFrame({"id": ids, "vec": out})

    df = (
        spark.range(n_rows, numPartitions=64)
        .mapInPandas(gen, "id long, vec array<float>")
        .persist()
    )
    t0 = time.perf_counter()
    df.count()
    gen_s = time.perf_counter() - t0
    print(f"generate {n_rows} rows: {gen_s:.1f}s")

    if "--graph" in sys.argv:
        # graph-at-scale point (r03 verdict #4): default shard count must
        # grow with input and per-shard build memory stay bounded
        from vectorchord_spark import VamanaIndex

        gpath = tempfile.mkdtemp(prefix="vc_scale_graph_") + "/gidx"
        _cleanup_tmpdir(gpath)
        t0 = time.perf_counter()
        gidx = VamanaIndex.build(spark, df, "id", "vec", gpath)
        gbuild_s = time.perf_counter() - t0
        n_shards = int(gidx.meta["n_shards"])
        sizes = (
            spark.read.parquet(gidx.graph_path)
            .groupBy("shard")
            .count()
            .agg(F.min("count"), F.max("count"), F.avg("count"))
            .first()
        )
        print(
            f"graph build: {gbuild_s:.1f}s ({n_rows / gbuild_s:,.0f} rows/s), "
            f"n_shards={n_shards}, shard rows min/avg/max = "
            f"{sizes[0]}/{sizes[2]:.0f}/{sizes[1]}"
        )
        if "--build-only" in sys.argv:
            # window-lottery mode: the recall evals cost ~3-4 min and are
            # identical run to run — skip them when only the build wall
            # is being hunted (recall is re-verified on full runs)
            spark.stop()
            return
        # mean over 20 queries (a single query is a ±0.3 coin flip at
        # k=10), at two probe settings to show the probes-vs-shard-count
        # serving tradeoff
        rng = np.random.default_rng(123)
        queries = [
            (
                centers[rng.integers(0, n_centers)] + 0.25 * rng.standard_normal(dim)
                if clustered
                else rng.standard_normal(dim)
            ).tolist()
            for _ in range(20)
        ]
        exact = [
            set(r.id for r in knn_exact(df, "id", "vec", gq, k=10).collect())
            for gq in queries
        ]
        # ef is the knob that must grow with SHARD size (deeper in-shard
        # beams), probes with SHARD COUNT; measured at 1M rows / 84 shards:
        # ef=64 caps at 0.835 while ef=256 reaches 1.000 at the same 3
        # probes. ef=None is the AUTO default (ceil(max probed shard rows
        # / 50), floored at 64 — the 10M audit moved the divisor from 100
        # to 50) — the configuration a user gets without tuning, which
        # must land ≥ 0.95 here.
        for probes, ef in ((3, 64), (6, 64), (3, 256), (3, None)):
            hits = 0
            for gq, ex in zip(queries, exact):
                got = set(
                    r.id
                    for r in gidx.search(
                        gq, k=10, ef_search=ef, probe_shards=probes
                    ).collect()
                )
                hits += len(got & ex)
            label = "auto" if ef is None else str(ef)
            if ef is None:
                auto = gidx._auto_ef_search(gidx._route(np.asarray(queries[0]), probes), 10)
                label = f"auto={auto}"
            print(
                f"graph recall@10 (ef={label}, {probes} shards probed, 20 queries): "
                f"{hits / 200.0:.3f}"
            )
        spark.stop()
        return

    dist_km = "--distkm" in sys.argv
    if dist_km:
        # distributed-kmeans point (r03 verdict #5): lists=[10000] leaf
        # clustering as a Spark job — the driver-sample path would need a
        # 10000·64 = 640k-vector driver sample; the distributed path's
        # driver sample is only √10000·256 = 25.6k vectors
        n_lists = min(10_000, n_lists * 10)
    path = tempfile.mkdtemp(prefix="vc_scale_") + "/idx"
    _cleanup_tmpdir(path)
    t0 = time.perf_counter()
    idx = IvfIndex.build(
        spark,
        df,
        "id",
        "vec",
        path,
        IvfOptions(
            metric="l2",
            lists=[n_lists],
            build_hierarchical=not dist_km,
            distributed_kmeans=dist_km,
            sampling_factor=64,
        ),
    )
    build_s = time.perf_counter() - t0
    print(
        f"build lists=[{n_lists}] distributed_kmeans={dist_km}: "
        f"{build_s:.1f}s ({n_rows / build_s:,.0f} rows/s)"
    )

    rng = np.random.default_rng(123)
    if clustered:
        queries = [
            (centers[rng.integers(0, n_centers)] + 0.25 * rng.standard_normal(dim)).tolist()
            for _ in range(8)
        ]
    else:
        queries = [rng.standard_normal(dim).astype(np.float64).tolist() for _ in range(8)]

    # warm one search (python workers, codegen)
    idx.search(queries[0], k=10, probes=[32]).collect()

    lat = []
    recalls = []
    for q in queries[:4]:
        t0 = time.perf_counter()
        got = [r.id for r in idx.search(q, k=10, probes=[32], rerank_factor=8).collect()]
        lat.append(time.perf_counter() - t0)
        exact = [r.id for r in knn_exact(df, "id", "vec", q, k=10).collect()]
        recalls.append(len(set(got) & set(exact)) / 10.0)
    print(
        f"single-query latency probes=32/{n_lists}: "
        f"median {np.median(lat):.2f}s; recall@10 {np.mean(recalls):.2f}"
    )

    t0 = time.perf_counter()
    res = idx.search_batch(queries, k=10, probes=[32], guarantee=False)
    n = res.count()
    batch_s = time.perf_counter() - t0
    print(
        f"batch of {len(queries)} queries: {batch_s:.2f}s total "
        f"({batch_s / len(queries):.2f}s/query amortized), {n} result rows"
    )

    t0 = time.perf_counter()
    exact_n = knn_exact(df, "id", "vec", queries[0], k=10).count()
    brute_s = time.perf_counter() - t0
    print(f"brute-force scan baseline: {brute_s:.2f}s ({exact_n} rows)")
    spark.stop()


if __name__ == "__main__":
    main()
