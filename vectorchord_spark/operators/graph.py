"""Vamana/DiskANN-style proximity-graph index (the vchordg access method),
re-architected for Spark as sharded partition-local graphs.

Semantics re-expressed from the reference (formulas/algorithms only):

- incremental insert = greedy beam search for ``ef_construction`` neighbors
  then RobustPrune with an ascending ``alpha`` schedule (L2 only; dot uses
  α=1.0), bidirectional edge insert with re-prune:
  /root/reference/crates/vchordg/src/insert.rs:34-395
- RobustPrune: keep nearest-first candidate u iff ∀ kept v:
  d(p,u) < α·d(u,v); leftovers retried at the next α; backfill nearest
  pruned: /root/reference/crates/vchordg/src/prune.rs:19-72
- search = best-first beam with visited set bounded by ``ef_search``:
  /root/reference/crates/vchordg/src/search.rs:34-140
- defaults m=32, alpha=[1.0, 1.2], ef_construction=64:
  /root/reference/crates/vchordg/src/types.rs:25-84

Spark architecture: pointer-chasing graph traversal is executor-local work,
so the table is hash-sharded and each shard builds an independent Vamana
graph inside one ``applyInPandas`` group (the 100 TB shape: shard size is
chosen so one graph fits an executor; build parallelism = #shards). A query
beam-searches every shard in parallel (``mapInPandas`` over the graph
table, grouped by shard) and the per-shard top-ef results merge with a
global ``ORDER BY dist LIMIT k`` — per-shard recall multiplies, it never
divides, so sharding trades compute for an embarrassingly-parallel layout
with zero cross-shard edges to shuffle.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectorchord_spark.functions import distances as D

GRAPH_SCHEMA = "shard int, id long, vec array<float>, neighbors array<int>, row_no int"


@dataclass
class VamanaOptions:
    metric: str = "l2"  # l2 | dot | cos
    m: int = 32
    ef_construction: int = 64
    alpha: list[float] = field(default_factory=lambda: [1.0, 1.2])
    n_shards: int | None = None
    seed: int = 42

    def validate(self) -> None:
        assert self.metric in ("l2", "dot", "cos")
        assert sorted(self.alpha) == list(self.alpha) and self.alpha[0] == 1.0
        assert all(1.0 <= a < 2.0 for a in self.alpha)


def _dists(metric: str, mat: np.ndarray, q: np.ndarray) -> np.ndarray:
    if metric == "l2":
        diff = mat - q
        return np.einsum("ij,ij->i", diff, diff)
    return -(mat @ q)


def _beam_search(
    metric: str,
    vecs: np.ndarray,
    adj: "list[list[int]]",
    medoid: int,
    q: np.ndarray,
    ef: int,
) -> list[tuple[float, int]]:
    """Best-first beam: pop nearest unvisited, expand neighbors, stop when
    the best frontier entry can't improve the ef-th visited distance."""
    from heapq import heappop, heappush, heappushpop

    n = len(vecs)
    visited = bytearray(n)
    d0 = float(_dists(metric, vecs[medoid : medoid + 1], q)[0])
    frontier: list[tuple[float, int]] = [(d0, medoid)]
    worst: list[tuple[float, int]] = []  # max-heap of the ef best (negated)
    bound = np.inf
    while frontier:
        d, u = heappop(frontier)
        if d > bound:
            break
        if visited[u]:
            continue
        visited[u] = 1
        if len(worst) < ef:
            heappush(worst, (-d, u))
            if len(worst) == ef:
                bound = -worst[0][0]
        else:
            heappushpop(worst, (-d, u))
            bound = -worst[0][0]
        nbrs = [v for v in adj[u] if not visited[v]]
        if nbrs:
            nd = _dists(metric, vecs[nbrs], q)
            for dv, v in zip(nd.tolist(), nbrs):
                if dv <= bound:
                    heappush(frontier, (dv, v))
    return sorted((-d, u) for d, u in worst)


def _build_vamana(
    vecs: np.ndarray, opts: VamanaOptions, rng: np.random.Generator
) -> tuple[list[list[int]], int]:
    """In-memory Vamana build over one shard; returns (adjacency, medoid).

    Single incremental pass (the reference inserts each row once); the
    ascending alpha schedule lives *inside* RobustPrune."""
    n = len(vecs)
    metric = "l2" if opts.metric == "l2" else "dot"
    alphas = opts.alpha if metric == "l2" else [1.0]
    m = opts.m
    v64 = vecs.astype(np.float64)
    medoid = int(np.argmin(_dists("l2", v64, v64.mean(axis=0))))
    adj: list[list[int]] = [[] for _ in range(n)]

    def robust_prune(p: int, cand: list[tuple[float, int]]) -> list[int]:
        seen: dict[int, float] = {}
        for d, u in cand:
            if u != p and u not in seen:
                seen[u] = d
        if not seen:
            return []
        order = sorted(seen.items(), key=lambda kv: kv[1])
        ids = np.array([u for u, _ in order], np.int64)
        d_p = np.array([d for _, d in order])
        c = len(ids)
        # pairwise candidate distances in one shot
        cm = v64[ids]
        if metric == "l2":
            sq = np.einsum("ij,ij->i", cm, cm)
            pair = sq[:, None] + sq[None, :] - 2.0 * (cm @ cm.T)
        else:
            pair = -(cm @ cm.T)
        kept: list[int] = []
        taken = np.zeros(c, bool)
        for alpha in alphas:
            if len(kept) == m:
                break
            # eligible now = untaken candidates compatible (at this alpha)
            # with everything already kept; greedy pick nearest, then
            # eliminate in one vector op everything the pick invalidates
            if kept:
                elig = ~taken & np.all(
                    d_p[:, None] < alpha * pair[:, kept], axis=1
                )
            else:
                elig = ~taken
            while len(kept) < m:
                idxs = np.nonzero(elig)[0]
                if not len(idxs):
                    break
                pick = int(idxs[0])
                kept.append(pick)
                taken[pick] = True
                elig &= d_p < alpha * pair[:, pick]
                elig[pick] = False
        for idx in range(c):
            if len(kept) >= m:
                break
            if not taken[idx]:
                kept.append(idx)
                taken[idx] = True
        return [int(ids[i]) for i in kept]

    # deferred back-edge pruning: let adjacency grow to m+slack and prune
    # once, instead of re-pruning on every single overflow (same graph
    # quality, ~slack× fewer prune calls)
    slack = max(4, m // 2)
    for i in rng.permutation(n):
        i = int(i)
        cand = _beam_search(metric, vecs, adj, medoid, vecs[i], opts.ef_construction)
        if adj[i]:
            nd = _dists(metric, vecs[adj[i]], vecs[i])
            cand = cand + list(zip(nd.tolist(), adj[i]))
        adj[i] = robust_prune(i, cand)
        for j in adj[i]:
            if i not in adj[j]:
                adj[j].append(i)
                if len(adj[j]) > m + slack:
                    nd = _dists(metric, vecs[adj[j]], vecs[j])
                    adj[j] = robust_prune(j, list(zip(nd.tolist(), adj[j])))
    for j in range(n):
        if len(adj[j]) > m:
            nd = _dists(metric, vecs[adj[j]], vecs[j])
            adj[j] = robust_prune(j, list(zip(nd.tolist(), adj[j])))
    return adj, medoid


class VamanaIndex:
    def __init__(self, spark: SparkSession, path: str):
        from vectorchord_spark.session import ensure_worker_imports

        ensure_worker_imports(spark)
        self.spark = spark
        self.path = path
        with open(os.path.join(path, "meta.json")) as f:
            self.meta = json.load(f)

    @property
    def graph_path(self) -> str:
        return os.path.join(self.path, "graph")

    @classmethod
    def build(
        cls,
        spark: SparkSession,
        df: DataFrame,
        id_col: str,
        vec_col: str,
        path: str,
        options: VamanaOptions | None = None,
    ) -> "VamanaIndex":
        from vectorchord_spark.session import ensure_worker_imports

        ensure_worker_imports(spark)
        opts = options or VamanaOptions()
        opts.validate()
        os.makedirs(path, exist_ok=True)
        src = df.select(
            F.col(id_col).cast("long").alias("id"), F.col(vec_col).alias("vec")
        )
        if opts.metric == "cos":
            src = src.select("id", D.normalize("vec").cast("array<float>").alias("vec"))
        n_shards = opts.n_shards
        if n_shards is None:
            total = src.count()
            n_shards = max(1, min(64, total // 5000 + 1))
        src = src.withColumn(
            "shard", F.pmod(F.xxhash64("id"), F.lit(n_shards)).cast("int")
        )
        opts_d = asdict(opts)
        seed = opts.seed

        def build_shard(pdf: pd.DataFrame) -> pd.DataFrame:
            o = VamanaOptions(**{**opts_d, "n_shards": n_shards})
            shard = int(pdf["shard"].iloc[0])
            vecs = np.stack([np.asarray(v, np.float32) for v in pdf["vec"]])
            rng = np.random.default_rng(seed + shard)
            adj, medoid = _build_vamana(vecs, o, rng)
            return pd.DataFrame(
                {
                    "shard": shard,
                    "id": pdf["id"].to_numpy(np.int64),
                    "vec": list(vecs),
                    "neighbors": [np.asarray(a, np.int32) for a in adj],
                    "row_no": np.arange(len(pdf), dtype=np.int32),
                }
            )

        graph = src.groupBy("shard").applyInPandas(build_shard, GRAPH_SCHEMA)
        graph.repartition(F.col("shard")).write.mode("overwrite").partitionBy(
            "shard"
        ).parquet(os.path.join(path, "graph"))

        # medoid per shard = row_no 0's... recompute cheaply: store the row
        # with row_no == medoid by convention: medoid stored in meta instead
        meta = {**opts_d, "n_shards": int(n_shards)}
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f)
        return cls(spark, path)

    def search(
        self,
        query: "np.ndarray | list[float]",
        k: int = 10,
        ef_search: int = 64,
    ) -> DataFrame:
        """Per-shard beam search (parallel) → global exact top-k merge."""
        meta = self.meta
        metric = meta["metric"]
        q_exact = np.asarray(query, np.float64)
        if metric == "cos":
            n = float(np.linalg.norm(q_exact))
            if n > 0:
                q_exact = q_exact / n
        q32 = q_exact.astype(np.float32)
        internal = "l2" if metric == "l2" else "dot"
        ef = int(max(ef_search, k))

        def shard_search(grp: pd.DataFrame) -> pd.DataFrame:
            # applyInPandas delivers the WHOLE shard (mapInPandas could see
            # a shard split across input partitions when a file exceeds
            # maxPartitionBytes, corrupting positional row_no indexing)
            grp = grp.sort_values("row_no")
            vecs = np.stack([np.asarray(v, np.float32) for v in grp["vec"]])
            adj = [list(np.asarray(a, np.int64)) for a in grp["neighbors"]]
            ids = grp["id"].to_numpy(np.int64)
            medoid = int(np.argmin(_dists("l2", vecs, vecs.mean(axis=0))))
            best = _beam_search(internal, vecs, adj, medoid, q32, ef)
            return pd.DataFrame(
                {
                    "id": ids[[u for _, u in best]],
                    "vec": [vecs[u] for _, u in best],
                }
            )

        graph = self.spark.read.parquet(self.graph_path).select(
            "shard", "id", "vec", "neighbors", "row_no"
        )
        cand = graph.groupBy("shard").applyInPandas(
            shard_search, "id long, vec array<float>"
        )
        qv = D.vec_lit([float(x) for x in q_exact])
        if metric == "l2":
            dist = D.l2("vec", qv)
        elif metric == "dot":
            dist = D.ip("vec", qv)
        else:
            dist = F.lit(1.0) + D.ip("vec", qv)
        return (
            cand.select("id", dist.alias("dist")).orderBy("dist", "id").limit(int(k))
        )

    def prewarm(self) -> int:
        df = self.spark.read.parquet(self.graph_path)
        df.cache()
        return df.count()
