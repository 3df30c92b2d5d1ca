"""Probe auto-tuning from sampled queries (the operational loop the
reference's recall + sampling functions exist for: evaluate_query_recall
over vchordrq_sampled_queries, /root/reference/sql/install/
vchord--1.1.1.sql:1021-1092 and :936-1013).

Replays an index's RECORDED production queries (S14) through
``evaluate_query_recall`` (S13) across a probe grid and prints the
recall/latency frontier, then recommends the cheapest probe setting whose
mean recall clears the target. This closes the serve → sample → replay →
tune loop: the tuning workload is what users actually sent, not synthetic
queries.

Usage:
  python tools/tune_probes.py [sf_dir] [--index PATH] [--grid 1,2,4,8,16]
                              [--target 0.95] [--k 10] [--graph]

With ``--index`` the tool loads an existing index (it must have sampled
queries recorded). Without it, a self-contained demo builds an index
over ``sf_dir/embeddings.parquet``, enables sampling, serves the bench
query workload to populate the log, then tunes from that log.
``--graph`` tunes a VamanaIndex instead: the grid is ``probe_shards``
values, served at the auto-scaled ``ef_search`` default (both index
families share the S13/S14 sampling + recall machinery).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _arg(flag: str, default: str) -> str:
    if flag in sys.argv:
        return sys.argv[sys.argv.index(flag) + 1]
    return default


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


def main() -> None:
    sf_dir = next(
        (a for a in sys.argv[1:] if not a.startswith("--") and os.path.isdir(a)),
        "/root/testdata/sf0.01",
    )
    grid = [int(x) for x in _arg("--grid", "1,2,4,8,12,16").split(",")]
    target = float(_arg("--target", "0.95"))
    k = int(_arg("--k", "10"))
    index_path = _arg("--index", "")

    graph_mode = "--graph" in sys.argv

    from vectorchord_spark.operators.graph import VamanaIndex, VamanaOptions
    from vectorchord_spark.operators.ivf import IvfIndex, IvfOptions
    from vectorchord_spark.session import get_spark

    spark = get_spark(app_name="tune-probes")

    cls = VamanaIndex if graph_mode else IvfIndex
    if index_path:
        idx = cls(spark, index_path)
    else:
        # demo: build + serve to populate the sampled-query log
        import tempfile

        from vectorchord_spark.queries import _BATCH_QUERIES

        emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        path = tempfile.mkdtemp(prefix="vc_tune_") + "/idx"
        _cleanup_tmpdir(path)
        if graph_mode:
            idx = VamanaIndex.build(
                spark, emb, "vec_id", "embedding", path,
                VamanaOptions(metric="l2", n_shards=8),
            )
        else:
            idx = IvfIndex.build(
                spark, emb, "vec_id", "embedding", path,
                IvfOptions(metric="l2", lists=[16]),
            )
        idx.enable_query_sampling(rate=1.0, max_records=100)
        serve_kw = {"probe_shards": 2} if graph_mode else {"probes": [4]}
        for qv in _BATCH_QUERIES:
            jitter = np.random.default_rng(len(qv)).normal(0, 0.05, len(qv))
            idx.search(qv, k=k, **serve_kw).collect()
            idx.search((np.asarray(qv) + jitter).tolist(), k=k, **serve_kw).collect()

    sampled = [list(r.query) for r in idx.sampled_queries().collect()]
    if not sampled:
        print("no sampled queries recorded — enable_query_sampling() first")
        sys.exit(1)
    print(f"replaying {len(sampled)} sampled queries, probe grid {grid}")

    def recall_at(q, p):
        if graph_mode:
            return idx.evaluate_query_recall(q, k=k, probe_shards=p)
        return idx.evaluate_query_recall(q, k=k, probes=[p])

    knob = "probe_shards" if graph_mode else "probes"
    # warm the serving path once so latencies are steady-state
    recall_at(sampled[0], grid[0])

    frontier = []
    for p in grid:
        recalls, lats = [], []
        for q in sampled:
            t0 = time.perf_counter()
            r = recall_at(q, p)
            lats.append(time.perf_counter() - t0)
            if not np.isnan(r):
                recalls.append(r)
        mean_recall = float(np.mean(recalls)) if recalls else float("nan")
        med_lat = float(np.median(lats))
        frontier.append((p, mean_recall, med_lat))
        print(
            f"{knob}={p:>4}  mean recall@{k} = {mean_recall:.3f}  "
            f"median replay latency = {med_lat:.3f}s"
        )

    ok = [f for f in frontier if f[1] >= target]
    if ok:
        best = min(ok, key=lambda f: f[0])
        print(
            f"recommendation: {knob}={best[0]} (cheapest setting with mean "
            f"recall {best[1]:.3f} >= target {target})"
        )
    else:
        print(
            f"no grid point reaches target {target}; best is {knob}="
            f"{max(frontier, key=lambda f: f[1])[0]} at recall "
            f"{max(frontier, key=lambda f: f[1])[1]:.3f} — widen the grid"
        )
    spark.stop()


if __name__ == "__main__":
    main()
