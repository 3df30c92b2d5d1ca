"""Graph-at-scale serving audit (r09 verdict #4): build a large Vamana
index and verify the IO story the way the r09 IVF audit did — per-shard
file layout, partition pruning in the executed plan, and probe-read
bytes vs probed fraction — plus routed recall/latency.

The IVF lesson at 10M was that a layout assumption (row-group ≈ cluster
run) silently broke once files outgrew one parquet block, making probed
reads O(table). The graph table uses hive `partitionBy("shard")`
(directory-level pruning, no min-max subtlety), so the things that can
rot at scale are different: per-shard file sizes (a whole shard is one
applyInPandas group → one task's memory), shard-count growth, and
whether the routed scan's `PartitionFilters` actually contains the
probed shards (if it ever shows up in `Filter` instead, every probe
reads the full table).

Usage: python tools/profile_graph_serving.py [n_rows] [--probes N]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
from typing import Iterator

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    from window_probe import probe

    from vectorchord_spark import VamanaIndex, get_spark, knn_exact

    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_rows = int(pos[0]) if pos else 10_000_000
    probes = 3
    if "--probes" in sys.argv:
        probes = int(sys.argv[sys.argv.index("--probes") + 1])
    dim = 64

    p = probe()
    print(f"start window: solo={p['solo_rotate_rows_per_s']:,} "
          f"parallel_scale_24t={p['parallel_scale_24t']} (clean ~18-22)",
          flush=True)

    spark = get_spark(app_name="graph-serving-audit")
    spark.sparkContext.setLogLevel("ERROR")

    n_centers = 2000
    centers = np.random.default_rng(77).standard_normal((n_centers, dim)) * 2.0

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy(np.int64)
            rng = np.random.default_rng(ids[0] if len(ids) else 0)
            noise = 0.25 * rng.standard_normal((len(ids), dim))
            vecs = (centers[ids % n_centers] + noise).astype(np.float32)
            yield pd.DataFrame({"id": ids, "vec": list(vecs)})

    df = (
        spark.range(n_rows, numPartitions=64)
        .mapInPandas(gen, "id long, vec array<float>")
        .persist()
    )
    df.count()

    root = tempfile.mkdtemp(prefix="vc_graph_audit_")
    gpath = root + "/gidx"
    print(f"index path: {gpath}", flush=True)
    t0 = time.perf_counter()
    gidx = VamanaIndex.build(spark, df, "id", "vec", gpath)
    build_s = time.perf_counter() - t0
    pm = probe()
    print(f"build: {n_rows:,} rows x {dim}d in {build_s:.1f}s "
          f"({n_rows / build_s:,.0f} rows/s)  "
          f"[post-build window: solo={pm['solo_rotate_rows_per_s']:,} "
          f"scale={pm['parallel_scale_24t']}]", flush=True)
    print(f"meta: n_shards={gidx.meta['n_shards']} "
          f"n_clusters={gidx.meta.get('n_clusters')}", flush=True)

    # --- layout audit: per-shard directory bytes + parquet row groups ---
    import pyarrow.parquet as pq

    shard_dirs = sorted(
        d for d in os.listdir(gidx.graph_path) if d.startswith("shard=")
    )
    sizes = {d: _dir_bytes(os.path.join(gidx.graph_path, d))
             for d in shard_dirs}
    sz = np.array(list(sizes.values()), np.float64)
    total_bytes = float(sz.sum())
    # row groups of the largest shard's files (memory-granule check)
    biggest = max(sizes, key=sizes.get)
    rg, rows = 0, 0
    for f in os.listdir(os.path.join(gidx.graph_path, biggest)):
        if f.endswith(".parquet"):
            md = pq.ParquetFile(
                os.path.join(gidx.graph_path, biggest, f)).metadata
            rg += md.num_row_groups
            rows += md.num_rows
    print(f"layout: {len(shard_dirs)} shard dirs, total "
          f"{total_bytes / 1e9:.2f} GB, per-shard MB "
          f"min/avg/max = {sz.min() / 1e6:.1f}/{sz.mean() / 1e6:.1f}/"
          f"{sz.max() / 1e6:.1f}; largest shard {biggest}: {rows:,} rows "
          f"in {rg} row groups", flush=True)

    # --- routed search: plan pruning + probed-bytes + latency/recall ---
    rng = np.random.default_rng(123)
    queries = [
        (centers[rng.integers(0, n_centers)]
         + 0.25 * rng.standard_normal(dim)).tolist()
        for _ in range(10)
    ]

    q0 = np.asarray(queries[0], np.float64)
    probed = gidx._expand_shards(gidx._route(q0, probes))
    probed_bytes = sum(
        sizes.get(f"shard={s}", 0) for s in probed
    )
    print(f"probed shards (probes={probes}): {sorted(probed)} -> "
          f"{probed_bytes / 1e6:.1f} MB = "
          f"{100 * probed_bytes / total_bytes:.2f}% of index "
          f"(shard fraction {100 * len(probed) / len(shard_dirs):.2f}%)",
          flush=True)

    res = gidx.search(queries[0], k=10, probe_shards=probes)
    res.collect()  # warm + resolve the executed plan
    plan = res._jdf.queryExecution().executedPlan().toString()
    scan_lines = [ln.strip() for ln in plan.splitlines()
                  if "PartitionFilters" in ln]
    ok = any("shard" in ln.split("PartitionFilters", 1)[1][:200]
             for ln in scan_lines)
    print(f"plan PartitionFilters on shard: {ok}", flush=True)
    for ln in scan_lines[:2]:
        print("  " + ln[:240], flush=True)

    lat = []
    for q in queries[:5]:
        t0 = time.perf_counter()
        gidx.search(q, k=10, probe_shards=probes).collect()
        lat.append(time.perf_counter() - t0)
    lat.sort()
    print(f"routed search latency (5 warm): median {lat[2]:.2f}s "
          f"min {lat[0]:.2f}s max {lat[-1]:.2f}s", flush=True)

    exacts = [
        {r.id for r in knn_exact(df, "id", "vec", q, k=10).collect()}
        for q in queries
    ]
    for pr in sorted({probes, probes * 2}):
        hits = 0
        for q, exact in zip(queries, exacts):
            got = {r.id for r in
                   gidx.search(q, k=10, probe_shards=pr).collect()}
            hits += len(got & exact)
        print(f"recall@10 over {len(queries)} queries at probes={pr}: "
              f"{hits / (10.0 * len(queries)):.3f}", flush=True)

    pe = probe()
    print(f"end window: solo={pe['solo_rotate_rows_per_s']:,} "
          f"parallel_scale_24t={pe['parallel_scale_24t']}", flush=True)
    spark.stop()
    if os.environ.get("VC_KEEP_TMP") != "1":
        import shutil

        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
