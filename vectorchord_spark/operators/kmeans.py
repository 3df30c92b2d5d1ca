"""Driver-side k-means for centroid-tree construction.

The reference builds its IVF structure from a bounded sample
(``lists[-1] × sampling_factor`` rows — /root/reference/src/index/vchordrq/
am/am_build.rs:1306-1311), so the clustering input is small by construction
even when the table is 100 TB; running Lloyd on the driver over that sample
is the same design, with Spark doing the (scalable) sampling and the
(scalable) encode pass. Re-expressed semantics:

- Lloyd iterations (default 10): /root/reference/crates/k_means/src/lib.rs:56-73
- hierarchical two-stage variant with Sainte-Laguë/Webster seat allocation:
  /root/reference/crates/k_means/src/hierarchical.rs:109-221
- k-means dimensionality reduction (cluster in rotated+truncated space, then
  re-estimate full-dim centroids): /root/reference/src/index/vchordrq/am/
  am_build.rs:1280-1291,1437-1551
- spherical (cosine) renormalization of centroids after each update step.
"""

from __future__ import annotations

import numpy as np

from vectorchord_spark import kernels as K


def _assign(samples: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """argmin squared-L2 assignment, blocked to bound memory.

    Distances are computed in f32 (sgemm: 4x the f64 matmul bandwidth on the
    256k-sample default cap — this is the build's driver hot loop) — the same
    precision the reference's SIMD assignment kernels use; centroid *updates*
    stay f64 in the callers."""
    s = np.ascontiguousarray(samples, np.float32)
    c = np.ascontiguousarray(centroids, np.float32)
    n = s.shape[0]
    out = np.empty(n, np.int64)
    c2 = np.einsum("ij,ij->i", c, c)
    step = max(1, int(2e8 // max(1, c.shape[0] * 4)))
    for st in range(0, n, step):
        blk = s[st : st + step]
        d = c2[None, :] - 2.0 * (blk @ c.T)
        out[st : st + step] = np.argmin(d, axis=1)
    return out


def _segment_sums(samples: np.ndarray, labels: np.ndarray, c: int) -> np.ndarray:
    """Per-cluster component sums (f64 accumulation) via sort + reduceat —
    an order of magnitude faster than unbuffered ``np.add.at`` on the
    256k-sample default cap. Rows for empty clusters contain garbage; the
    caller masks them by ``counts == 0``."""
    n = len(labels)
    if n == 0:
        return np.zeros((c, samples.shape[1]))
    order = np.argsort(labels, kind="stable")
    starts = np.searchsorted(labels[order], np.arange(c))
    safe = np.minimum(starts, n - 1)
    return np.add.reduceat(samples[order], safe, axis=0, dtype=np.float64)


def lloyd(
    samples: np.ndarray,
    c: int,
    iterations: int = 10,
    seed: int = 42,
    spherical: bool = False,
) -> np.ndarray:
    """Classic Lloyd k-means; deterministic; empty clusters refilled with
    uniform-random samples (mirroring the reference's refill behavior).
    Works in f32 (the reference's k_means crate precision) with f64
    centroid-update accumulation."""
    samples = np.ascontiguousarray(samples, np.float32)
    n, d = samples.shape
    rng = np.random.default_rng(seed)
    if n <= c:
        # 'quick' path: each sample is its own centroid, pad with duplicates
        pad = (
            samples[rng.integers(0, max(n, 1), size=c - n)]
            if n
            else np.zeros((c, d), np.float32)
        )
        return np.concatenate([samples, pad])[:c].astype(np.float32)
    centroids = samples[rng.choice(n, size=c, replace=False)].copy()
    for _ in range(iterations):
        labels = _assign(samples, centroids)
        counts = np.bincount(labels, minlength=c)
        sums = _segment_sums(samples, labels, c)
        nonempty = counts > 0
        centroids[nonempty] = (sums[nonempty] / counts[nonempty, None]).astype(
            np.float32
        )
        n_empty = int((~nonempty).sum())
        if n_empty:
            centroids[~nonempty] = samples[rng.integers(0, n, size=n_empty)]
        if spherical:
            norms = np.linalg.norm(centroids, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            centroids = centroids / norms
    return centroids.astype(np.float32)


def sainte_lague_seats(weights: np.ndarray, total_seats: int) -> np.ndarray:
    """Webster/Sainte-Laguë highest-averages apportionment of ``total_seats``
    across partitions proportional to ``weights`` (each partition with
    weight > 0 gets ≥ 1 seat, as in the reference's hierarchical build)."""
    w = np.asarray(weights, np.float64)
    k = len(w)
    seats = np.zeros(k, np.int64)
    live = w > 0
    if not live.any():
        return seats
    seats[live] = 1
    remaining = total_seats - int(seats.sum())
    if remaining < 0:
        # more partitions than seats: give to largest weights
        seats[:] = 0
        order = np.argsort(-w, kind="stable")[:total_seats]
        seats[order[w[order] > 0]] = 1
        return seats
    for _ in range(remaining):
        quot = np.where(live, w / (2 * seats + 1), -np.inf)
        seats[int(np.argmax(quot))] += 1
    return seats


def hierarchical(
    samples: np.ndarray,
    c: int,
    iterations: int = 10,
    seed: int = 42,
    spherical: bool = False,
) -> np.ndarray:
    """Two-stage k-means: coarse √c clustering over a √c×256 sub-sample,
    partition by coarse assignment, Sainte-Laguë-allocate per-partition leaf
    counts, Lloyd per partition, concatenate."""
    samples = np.ascontiguousarray(samples, np.float32)
    n = samples.shape[0]
    coarse_k = max(1, int(np.sqrt(c)))
    rng = np.random.default_rng(seed)
    sub_n = min(n, coarse_k * 256)
    sub = samples[rng.choice(n, size=sub_n, replace=False)]
    coarse = lloyd(sub, coarse_k, iterations, seed, spherical)
    labels = _assign(samples, coarse)
    counts = np.bincount(labels, minlength=coarse_k)
    seats = sainte_lague_seats(counts, c)
    live = [g for g in range(coarse_k) if seats[g] > 0]
    # The per-cell Lloyd runs are independent and BLAS-bound (sgemm
    # releases the GIL), so a thread pool parallelizes them. BLAS is
    # pinned to 1 thread for the pooled section: the per-cell GEMMs are
    # too small to gain from BLAS threads (docs/SCALE.md round-6 BLAS
    # findings), and single-thread BLAS makes each cell's result
    # independent of pool width. Cell results keep the sequential path's
    # coarse-cell order (and per-cell seeds), so the output layout is
    # unchanged. Measured 4.0s -> ~0.6s on the 64k x 768d, c=1000 build
    # sample (31 cells, 16 threads).
    from concurrent.futures import ThreadPoolExecutor

    from vectorchord_spark import kernels as _K

    def _cell(g: int) -> np.ndarray:
        part = samples[labels == g]
        return lloyd(part, int(seats[g]), iterations, seed + 1 + g, spherical)

    if len(live) > 1:
        prev = _K.set_blas_threads(1)
        try:
            with ThreadPoolExecutor(max_workers=min(16, len(live))) as pool:
                outs = list(pool.map(_cell, live))
        finally:
            if prev is not None and prev > 1:
                _K.set_blas_threads(prev)
            elif prev == 0:
                # set_blas_threads pinned BLAS but found no *get* entry
                # point (prev unknowable, reported as 0): restore the
                # machine default rather than leaving the driver pinned
                # at 1 thread — limit_blas_threads' contract is that the
                # DRIVER keeps default threading for its large GEMMs.
                import os as _os

                _K.set_blas_threads(_os.cpu_count() or 1)
    else:
        outs = [_cell(g) for g in live]
    return np.concatenate(outs).astype(np.float32)


def reduced_dimension_kmeans(
    samples: np.ndarray,
    c: int,
    kmeans_dimension: int,
    iterations: int = 10,
    seed: int = 42,
    spherical: bool = False,
    use_hierarchical: bool = False,
) -> np.ndarray:
    """Cluster in rotated+truncated space, then re-estimate centroids in the
    full dimension by averaging the full-dim samples per assigned cluster."""
    samples = np.ascontiguousarray(samples, np.float32)
    reduced = np.ascontiguousarray(K.rotate(samples)[:, :kmeans_dimension])
    algo = hierarchical if use_hierarchical else lloyd
    red_centroids = algo(reduced, c, iterations, seed, spherical)
    labels = _assign(reduced, red_centroids)
    sums = _segment_sums(samples, labels, c)
    counts = np.bincount(labels, minlength=c)
    rng = np.random.default_rng(seed)
    centroids = np.empty((c, samples.shape[1]))
    nonempty = counts > 0
    centroids[nonempty] = sums[nonempty] / counts[nonempty, None]
    n_empty = int((~nonempty).sum())
    if n_empty:
        centroids[~nonempty] = samples[rng.integers(0, len(samples), size=n_empty)]
    if spherical:
        norms = np.linalg.norm(centroids, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        centroids = centroids / norms
    return centroids.astype(np.float32)
