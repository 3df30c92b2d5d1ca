"""Semantic deduplication (SemDeDup) over an embedding column.

Published method (Abbas et al. 2023, "SemDeDup: Data-efficient learning
at web-scale through semantic deduplication", arXiv:2303.09540): cluster
the corpus embeddings with spherical k-means, then within each cluster
drop every example whose cosine similarity to ANY earlier example (in a
fixed intra-cluster order) exceeds ``eps``. Unlike MinHash/SimHash (which
catch lexical near-dups) this removes *semantic* duplicates — paraphrases
and re-renderings that share no shingles.

Spark-first decomposition, designed for the 100 TB shape:

- **fit** is a bounded driver k-means on a sampled slice (same pattern as
  the IVF build: the model is tiny, the data is not);
- **assign** is one broadcast-matmul pass over the table (mapInPandas,
  one Arrow batch = one GEMM) — embarrassingly parallel, no shuffle;
- **flag** is one groupBy(cluster) shuffle followed by a per-cluster
  blocked pairwise pass. The quadratic term is *per cluster*, which is
  the published algorithm's own contract: choose ``n_clusters`` so the
  expected cluster size stays in the 10³–10⁴ range (the paper uses
  k=50 000 at 100M+ scale). A hard ``max_cluster_size`` guard raises
  with that guidance instead of silently running an O(m²) straggler.

The intra-cluster order (and therefore which duplicate survives) follows
the paper's released implementation: sort by similarity-to-centroid, keep
the front of the order, drop i when ``max_{j<i} sim(i, j) > eps``. The
paper keeps *low*-centroid-similarity examples ("least typical");
``keep="most_typical"`` flips the sort for pipelines that prefer
prototypes. Ties (and the pytest oracle) are pinned by ascending id.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

_KEEP_ORDERS = ("least_typical", "most_typical", "min_id")

#: bounded cache registry (the repo's latest-only pattern): the LPT path
#: of :func:`semdedup_flags` consumes the assignment frame twice — the
#: cluster-size aggregation and the flag pass itself. Without a persist
#: the whole assignment pass (at the paper's k the dominant routing GEMM)
#: runs twice per call. Only the latest call keeps its pin; the lock
#: guards list mutation only (single-threaded-driver assumption, as
#: documented on the dedup/dsir registries).
_PERSISTED: "list[DataFrame]" = []
_REG_LOCK = __import__("threading").Lock()


#: above this cluster count the fit runs as a Spark job: the paper
#: operates at k=50 000 where a quality driver sample alone (k · a few
#: hundred rows) outgrows driver memory, and the driver Lloyd becomes
#: the build's serial bottleneck
_DISTRIBUTED_FIT_MIN_K = 4096


def fit_semdedup_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    n_clusters: int = 16,
    sample_cap: int = 262_144,
    seed: int = 42,
    distributed: bool | None = None,
) -> np.ndarray:
    """Spherical k-means centroids over the L2-normalized embeddings.

    ``distributed=None`` (auto) fits on the driver from a bounded sample
    (memory O(sample_cap · dim), deterministic for a given input
    partitioning — the IVF build sampler's contract) for small k, and
    switches to the distributed two-stage fit (coarse driver k-means →
    per-cell Lloyd as one Spark task each, the IVF ``distributed_kmeans``
    machinery) when ``n_clusters ≥ 4096`` — the paper's k=50k operating
    point never pulls more than the coarse √k·256 sample to the driver.
    """
    if distributed is None:
        distributed = n_clusters >= _DISTRIBUTED_FIT_MIN_K
    sel = df.select(F.col(vec_col).alias("vec"))
    if distributed:
        from vectorchord_spark.functions import distances as D
        from vectorchord_spark.operators.ivf import (
            IvfOptions,
            _distributed_leaf_kmeans,
        )

        normed = sel.select(
            D.normalize("vec").cast("array<float>").alias("vec")
        )
        opts = IvfOptions(
            lists=[n_clusters],
            spherical_centroids=True,
            seed=seed,
            sampling_factor=max(1, sample_cap // max(1, n_clusters)),
        )
        return _distributed_leaf_kmeans(normed, n_clusters, opts)
    from vectorchord_spark.operators.kmeans import lloyd
    from vectorchord_spark.operators.sampling import bounded_sample_vectors

    sample = bounded_sample_vectors(sel, sample_cap, seed)
    mat = np.stack([np.asarray(v, np.float32) for v in sample["vec"]])
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return lloyd(mat / norms, n_clusters, seed=seed, spherical=True)


def assign_clusters(
    df: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    precise: bool = True,
) -> DataFrame:
    """Nearest-centroid (cosine) assignment: (id, cluster_id, centroid_sim).

    One broadcast of the (k, dim) centroid matrix; one GEMM per Arrow
    batch; no shuffle. centroid_sim is ALWAYS the f64 cosine similarity
    of the row to its assigned centroid (it is the dedup sort key, so
    its precision decides survivor identity within a cluster).

    ``precise=True`` also runs the routing argmax in f64; ``precise=
    False`` routes in f32 (BLAS sgemm, measured ~10-30× the f64 rate on
    AVX-512 hosts) and recomputes only the winner's similarity in f64 —
    the same precision decision the IVF encode job makes for its routing
    (operators/ivf.py: "f32 is ample for argmin routing"). The k·dim
    routing GEMM is the dominant term at the paper's k (measured: 349s
    of a 482s 1M × 768d × k=10240 end-to-end run was the f64 routing).
    """
    c64 = np.ascontiguousarray(centroids, np.float64)
    cn64 = np.linalg.norm(c64, axis=1)
    cn64[cn64 == 0] = 1.0
    dim = c64.shape[1]
    if precise:
        bc = df.sparkSession.sparkContext.broadcast((c64, cn64))
    else:
        c32 = np.ascontiguousarray(centroids, np.float32)
        cn32 = np.linalg.norm(c32.astype(np.float64), axis=1).astype(np.float32)
        cn32[cn32 == 0] = 1.0
        bc = df.sparkSession.sparkContext.broadcast((c32 / cn32[:, None], c64, cn64))

    def assign(batches) -> Iterator:
        # mapInArrow: the list<float> column flattens to ONE contiguous
        # values buffer per batch (same pattern as the IVF encode job) —
        # the previous per-row np.asarray loop cost more than the GEMM
        # itself at 100k x 128d (18s assign wall, ~2s of it matmul).
        import pyarrow as pa

        if precise:
            c, cn = bc.value
        else:
            cunit32, c, cn = bc.value
        for rb in batches:
            n = rb.num_rows
            if not n:
                continue
            ids = rb.column(0)
            if ids.type != pa.int64():
                ids = ids.cast(pa.int64())
            flat = rb.column(1).flatten()
            if flat.type != pa.float32():
                flat = flat.cast(pa.float32())
            m32 = np.asarray(flat).reshape(n, dim)
            mat = m32.astype(np.float64)
            rn = np.linalg.norm(mat, axis=1)
            rn[rn == 0] = 1.0
            if precise:
                sims = (mat @ c.T) / rn[:, None] / cn[None, :]
                lab = sims.argmax(axis=1)
            else:
                s32 = m32 @ cunit32.T  # row norm is argmax-invariant
                lab = s32.argmax(axis=1)
            # the emitted winner similarity goes through ONE shared f64
            # einsum in BOTH modes: gemm and einsum accumulate in
            # different orders, so reusing the routing matrix's element
            # would make the two modes differ in the last bits even when
            # they agree on the assignment
            win = np.einsum("ij,ij->i", mat, c[lab]) / rn / cn[lab]
            yield pa.record_batch(
                [
                    ids,
                    pa.array(lab.astype(np.int32)),
                    pa.array(win),
                ],
                names=["_id", "cluster_id", "centroid_sim"],
            )

    out = df.select(F.col(id_col), F.col(vec_col)).mapInArrow(
        assign, "_id long, cluster_id int, centroid_sim double"
    )
    return out.withColumnRenamed("_id", id_col)


def _flag_cluster(
    ids: np.ndarray,
    vecs: np.ndarray,
    order_key: np.ndarray,
    eps: float,
    block: int = 1024,
) -> np.ndarray:
    """Triangular-max duplicate flags for one cluster, memory-bounded.

    Rows are visited in ``(order_key, id)`` order; row i is a duplicate
    iff its cosine similarity to any earlier row exceeds ``eps`` (the
    SemDeDup released rule — earlier ROWS, not earlier keepers, so the
    result is order-dependent but embarrassingly blockable). Work is
    O(m²·dim/2) like the paper's torch.triu, but streamed in
    (block × block) tiles so peak memory is O(m·dim + block²).
    Returns keep flags aligned to the INPUT row order.
    """
    m = len(ids)
    order = np.lexsort((ids, order_key))
    nv = np.ascontiguousarray(vecs, np.float64)
    norms = np.linalg.norm(nv, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    nv = nv / norms
    nv = nv[order]
    keep_sorted = np.ones(m, bool)
    for s in range(0, m, block):
        e = min(s + block, m)
        blk = nv[s:e]
        b = e - s
        # max sim to rows in earlier blocks (column tiles bound memory)
        best = np.full(b, -np.inf)
        for ps in range(0, s, 4096):
            pe = min(ps + 4096, s)
            np.maximum(best, (blk @ nv[ps:pe].T).max(axis=1), out=best)
        # max sim to strictly-earlier rows inside this block: mask the
        # upper triangle (incl. diagonal) to -inf so negative sims and
        # row 0 (no earlier rows) fall out correctly
        intra = blk @ blk.T
        intra[np.triu_indices(b)] = -np.inf
        np.maximum(best, intra.max(axis=1), out=best)
        keep_sorted[s:e] = best <= eps
    out = np.ones(m, bool)
    out[order] = keep_sorted
    return out


def semdedup_flags(
    assigned: DataFrame,
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eps: float = 0.95,
    keep: str = "least_typical",
    max_cluster_size: int = 200_000,
    lpt: bool = True,
) -> DataFrame:
    """Per-row SemDeDup keep flags from a cluster assignment.

    Caching note (LPT path): each call pins its ``assigned`` frame and
    unpersists the PREVIOUS call's — the repo's latest-only registry for
    a single-threaded driver. Interleaving lazy result frames from two
    calls stays correct, but the earlier frame silently recomputes its
    assignment pass when re-read; the last call's pin is held until the
    next call (or session end).

    ``assigned`` is the (id, cluster_id, centroid_sim) frame from
    :func:`assign_clusters`; ``df`` supplies the vectors. One shuffle
    (groupBy cluster_id), then the blocked triangular pass per cluster.
    Output: (id, cluster_id, centroid_sim, keep).

    ``lpt=True`` (default) launches clusters longest-first with a
    quadratic cost estimate (the pass is O(m²·dim)): k-means cluster
    masses are skewed, so random task order can leave the biggest
    cluster in the tail wave — the same makespan waste the graph build
    measured at ~12s/95s before its LPT layout. Costs one narrow count
    aggregation (driver memory O(n_clusters), already the centroid
    bound).
    """
    if keep not in _KEEP_ORDERS:
        raise ValueError(f"keep must be one of {_KEEP_ORDERS}, got {keep!r}")

    def _join_vectors(a: DataFrame) -> DataFrame:
        return a.join(
            df.select(F.col(id_col), F.col(vec_col)), id_col
        ).select(id_col, "cluster_id", "centroid_sim", vec_col)

    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("cluster_id", IntegerType()),
            StructField("centroid_sim", DoubleType()),
            StructField("keep", BooleanType()),
        ]
    )

    def per_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        m = len(pdf)
        if m > max_cluster_size:
            raise ValueError(
                f"SemDeDup cluster {int(pdf['cluster_id'].iloc[0])} has {m} rows "
                f"(> max_cluster_size={max_cluster_size}); increase "
                "n_clusters so expected cluster size is ~1e3-1e4 (the "
                "published algorithm's operating range) or raise "
                "max_cluster_size explicitly."
            )
        ids = pdf[id_col].to_numpy(np.int64)
        sims = pdf["centroid_sim"].to_numpy(np.float64)
        if keep == "least_typical":
            order_key = sims
        elif keep == "most_typical":
            order_key = -sims
        else:  # min_id: order purely by id (lexsort tiebreak is id)
            order_key = np.zeros(m)
        vecs = np.stack([np.asarray(v, np.float64) for v in pdf[vec_col]])
        flags = _flag_cluster(ids, vecs, order_key, eps)
        return pd.DataFrame(
            {
                id_col: ids,
                "cluster_id": pdf["cluster_id"].to_numpy(np.int32),
                "centroid_sim": sims,
                "keep": flags,
            }
        )

    if not lpt:
        return _join_vectors(assigned).groupBy("cluster_id").applyInPandas(
            per_cluster, schema
        )
    from vectorchord_spark.operators.scheduling import lpt_grouped_apply

    # the sizes aggregation below and the flag pass both consume
    # ``assigned`` — pin it so the assignment pass (the dominant routing
    # GEMM when it comes from assign_clusters) computes once per call,
    # not twice; narrow (id, cluster, sim) rows, spillable at scale
    with _REG_LOCK:
        while _PERSISTED:
            _PERSISTED.pop().unpersist()
        assigned = assigned.persist()
        _PERSISTED.append(assigned)
    joined = _join_vectors(assigned)
    sizes = {
        r[0]: float(r[1]) ** 2  # quadratic cost proxy
        for r in assigned.groupBy("cluster_id")
        .agg(F.count(F.lit(1)))
        .collect()
    }
    # one-task-per-cluster is right for tens of heavy clusters; at the
    # paper's k=10k-50k the clusters are tiny and per-task overhead
    # dominates (measured ~60s of scheduling for 4096 one-group tasks),
    # so above ~4 waves of tasks the groups LPT-bin-pack instead
    par = joined.sparkSession.sparkContext.defaultParallelism
    cap = max(4 * par, 64)
    return lpt_grouped_apply(
        joined,
        "cluster_id",
        per_cluster,
        schema,
        sizes=sizes,
        max_partitions=cap if len(sizes) > cap else None,
    )


def semdedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    eps: float = 0.95,
    keep: str = "least_typical",
    sample_cap: int = 262_144,
    seed: int = 42,
    max_cluster_size: int = 200_000,
    distributed_fit: bool | None = None,
    precise_assign: bool = True,
) -> DataFrame:
    """End-to-end SemDeDup: fit → assign → flag.

    Returns (id, cluster_id, centroid_sim, keep); filter ``keep`` to get
    the deduplicated corpus. Total cost: one bounded sample pass, one
    assignment pass (no shuffle), one groupBy(cluster) shuffle of
    (id, vec) rows, and per-cluster O(m²·dim/2) flops — the published
    algorithm's own asymptotics, with every term bounded and distributed.
    """
    cents = fit_semdedup_centroids(
        df,
        vec_col,
        n_clusters=n_clusters,
        sample_cap=sample_cap,
        seed=seed,
        distributed=distributed_fit,
    )
    assigned = assign_clusters(
        df, cents, id_col=id_col, vec_col=vec_col, precise=precise_assign
    )
    return semdedup_flags(
        assigned,
        df,
        id_col=id_col,
        vec_col=vec_col,
        eps=eps,
        keep=keep,
        max_cluster_size=max_cluster_size,
    )
