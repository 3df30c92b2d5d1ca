"""SemDeDup (semantic dedup) tests against a brute-force numpy oracle.

The oracle replicates the published rule exactly (arXiv:2303.09540,
released implementation's torch.triu form): within a cluster, visit rows
in (order_key, id) order and drop row i iff max_{j<i} cos(i, j) > eps.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from vectorchord_spark.pipeline import semdedup as SD


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def _py_semdedup(ids, vecs, order_key, eps):
    """O(m^2) reference: keep[i] iff no earlier row has sim > eps."""
    order = np.lexsort((ids, order_key))
    nv = np.asarray(vecs, np.float64)
    norms = np.linalg.norm(nv, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    nv = nv / norms
    keep = np.ones(len(ids), bool)
    for pos, i in enumerate(order):
        for j in order[:pos]:
            if float(nv[i] @ nv[j]) > eps:
                keep[i] = False
                break
    return keep


def test_flag_cluster_matches_bruteforce_random():
    rng = np.random.default_rng(7)
    m, dim = 700, 16
    # low-dim random vectors with planted duplicates so both branches fire
    vecs = rng.standard_normal((m, dim))
    for k in range(0, 120, 3):
        vecs[m - 1 - k] = vecs[k] + 0.001 * rng.standard_normal(dim)
    ids = rng.permutation(m).astype(np.int64)
    order_key = rng.standard_normal(m)
    for eps in (0.5, 0.9, 0.999):
        got = SD._flag_cluster(ids, vecs, order_key, eps, block=64)
        want = _py_semdedup(ids, vecs, order_key, eps)
        assert (got == want).all(), f"eps={eps}: {int((got != want).sum())} diffs"


def test_flag_cluster_tiny_and_negative_sims():
    # 1-row cluster always kept; anti-parallel pair kept at any eps>-1
    assert SD._flag_cluster(
        np.array([5]), np.array([[1.0, 0.0]]), np.zeros(1), 0.9
    ).tolist() == [True]
    v = np.array([[1.0, 0.0], [-1.0, 0.0]])
    assert SD._flag_cluster(
        np.array([1, 2]), v, np.zeros(2), 0.5
    ).tolist() == [True, True]
    # exact duplicate: later-ordered row dropped, sim == eps boundary kept
    v = np.array([[1.0, 0.0], [1.0, 0.0]])
    assert SD._flag_cluster(
        np.array([1, 2]), v, np.zeros(2), 0.95
    ).tolist() == [True, False]
    assert SD._flag_cluster(
        np.array([1, 2]), v, np.zeros(2), 1.0
    ).tolist() == [True, True]  # rule is strict >


def test_semdedup_end_to_end_matches_oracle(spark, emb):
    out = SD.semdedup(
        emb, n_clusters=8, eps=0.40, sample_cap=4096, seed=11
    ).toPandas()
    n = emb.count()
    assert len(out) == n
    assert set(out.columns) == {"vec_id", "cluster_id", "centroid_sim", "keep"}

    # replicate: same centroids -> same assignment -> per-cluster oracle
    cents = SD.fit_semdedup_centroids(
        emb, n_clusters=8, sample_cap=4096, seed=11
    )
    pdf = emb.select("vec_id", "embedding").toPandas()
    vecs = np.stack([np.asarray(v, np.float64) for v in pdf["embedding"]])
    rn = np.linalg.norm(vecs, axis=1)
    rn[rn == 0] = 1.0
    c = np.asarray(cents, np.float64)
    cn = np.linalg.norm(c, axis=1)
    cn[cn == 0] = 1.0
    sims = (vecs @ c.T) / rn[:, None] / cn[None, :]
    lab = sims.argmax(axis=1)
    csim = sims[np.arange(len(lab)), lab]
    ids = pdf["vec_id"].to_numpy(np.int64)

    got = out.sort_values("vec_id").reset_index(drop=True)
    order = np.argsort(ids)
    assert (got["cluster_id"].to_numpy() == lab[order]).all()
    np.testing.assert_allclose(
        got["centroid_sim"].to_numpy(), csim[order], rtol=0, atol=1e-12
    )
    want_keep = np.zeros(len(ids), bool)
    for cl in np.unique(lab):
        mask = lab == cl
        want_keep[mask] = _py_semdedup(
            ids[mask], vecs[mask], csim[mask], 0.40
        )
    assert (got["keep"].to_numpy() == want_keep[order]).all()
    # eps below the table's max off-diagonal sim (0.479 at sf0.001) so the
    # drop branch demonstrably fires; the synthetic embeddings carry no
    # true near-dup pairs (max sim < 0.48), hence the sub-unity eps here
    assert 0 < int((~got["keep"]).sum()) < n


def test_semdedup_distributed_fit(spark, emb):
    """distributed_fit=True routes the fit through the IVF two-stage
    distributed k-means; the flag semantics must stay exactly the
    per-cluster oracle GIVEN whatever centroids that fit produced."""
    out = SD.semdedup(
        emb, n_clusters=6, eps=0.40, sample_cap=4096, seed=11,
        distributed_fit=True,
    ).toPandas()
    n = emb.count()
    assert len(out) == n
    cents = SD.fit_semdedup_centroids(
        emb, n_clusters=6, sample_cap=4096, seed=11, distributed=True
    )
    assert cents.shape[0] == 6 and np.isfinite(cents).all()
    pdf = emb.select("vec_id", "embedding").toPandas()
    vecs = np.stack([np.asarray(v, np.float64) for v in pdf["embedding"]])
    rn = np.linalg.norm(vecs, axis=1)
    rn[rn == 0] = 1.0
    c = np.asarray(cents, np.float64)
    cn = np.linalg.norm(c, axis=1)
    cn[cn == 0] = 1.0
    sims = (vecs @ c.T) / rn[:, None] / cn[None, :]
    lab = sims.argmax(axis=1)
    csim = sims[np.arange(len(lab)), lab]
    ids = pdf["vec_id"].to_numpy(np.int64)
    got = out.sort_values("vec_id").reset_index(drop=True)
    order = np.argsort(ids)
    assert (got["cluster_id"].to_numpy() == lab[order]).all()
    want_keep = np.zeros(len(ids), bool)
    for cl in np.unique(lab):
        mask = lab == cl
        want_keep[mask] = _py_semdedup(ids[mask], vecs[mask], csim[mask], 0.40)
    assert (got["keep"].to_numpy() == want_keep[order]).all()


def test_assign_f32_routing_matches_precise(spark, emb):
    """precise=False routes the argmax in f32 but recomputes the winner's
    similarity in f64 — on data without routing near-ties (the test
    embeddings' assignment gaps are far above f32 error) the output frame
    must be IDENTICAL to the precise path, bit-for-bit in centroid_sim."""
    cents = SD.fit_semdedup_centroids(emb, n_clusters=8, sample_cap=4096, seed=11)
    a = SD.assign_clusters(emb, cents).toPandas().sort_values("vec_id")
    b = (
        SD.assign_clusters(emb, cents, precise=False)
        .toPandas()
        .sort_values("vec_id")
    )
    assert (a["cluster_id"].to_numpy() == b["cluster_id"].to_numpy()).all()
    assert (a["centroid_sim"].to_numpy() == b["centroid_sim"].to_numpy()).all()


def test_semdedup_keep_orders(spark, emb):
    least = SD.semdedup(emb, n_clusters=4, eps=0.9, seed=3).toPandas()
    most = SD.semdedup(
        emb, n_clusters=4, eps=0.9, seed=3, keep="most_typical"
    ).toPandas()
    # same number of rows, generally different survivors
    assert len(least) == len(most)
    merged = least.merge(most, on="vec_id", suffixes=("_l", "_m"))
    assert (merged["cluster_id_l"] == merged["cluster_id_m"]).all()
    with pytest.raises(ValueError, match="keep must be one of"):
        SD.semdedup(emb, keep="typo")


def test_semdedup_max_cluster_size_guard(spark, emb):
    with pytest.raises(Exception, match="max_cluster_size"):
        SD.semdedup(emb, n_clusters=1, max_cluster_size=10).toPandas()


def test_semdedup_plan_shape(spark, emb):
    """Assignment pass must not shuffle; flag pass must shuffle exactly
    once (the groupBy(cluster))."""
    cents = SD.fit_semdedup_centroids(emb, n_clusters=4, sample_cap=1024)
    assigned = SD.assign_clusters(emb, cents)
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    flags = SD.semdedup_flags(assigned, emb, eps=0.9)
    fplan = flags._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in fplan or "FlatMapGroupsIn" in fplan
