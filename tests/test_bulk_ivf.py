"""IVF-pruned kNN sweep (models/bulk._ivf_knn_sweep) correctness.

The bulk build's phase 1 may generate candidate kNN lists through a
k-means-pruned sweep instead of the exact blockwise sweep (the analog of
trading usearch's exact per-pair metric calls for approximate candidate
generation — construction candidates tolerate slack; user-facing search
does not, /root/reference/src/include/usearch/index.hpp:3429-3496 feeds
ef_construction-wide beams, also approximate). These tests pin:
- the IVF lists overlap the exact lists heavily on clustered data;
- a forced-IVF build reaches the same recall class as a forced-exact
  build for every metric.
"""

import os

import numpy as np
import pytest

from duckdb_vss_tpu import HNSWConfig, MetricKind
from duckdb_vss_tpu.models.hnsw import HNSWIndex


def _clustered(rng, n, d, n_centers=64, sigma=0.25):
    centers = rng.normal(size=(n_centers, d)).astype(np.float32)
    asg = rng.integers(0, n_centers, n)
    return (centers[asg]
            + sigma * rng.normal(size=(n, d)).astype(np.float32)), centers


def test_ivf_knn_lists_overlap_exact():
    import jax.numpy as jnp

    from duckdb_vss_tpu.models import bulk

    rng = np.random.default_rng(3)
    n, d, k = 6000, 32, 8
    vecs, _ = _clustered(rng, n, d)
    cap = 8192
    store = np.zeros((cap, d), np.float32)
    store[:n] = vecs
    vectors = jnp.asarray(store)
    vec_sq = jnp.sum(vectors * vectors, axis=1)
    slots = np.arange(n, dtype=np.int32)
    ids_j, sc_j = bulk._ivf_knn_sweep(
        vectors, vectors.astype(jnp.bfloat16), vec_sq, slots, k,
        MetricKind.L2SQ)
    got = np.asarray(ids_j)[:n]
    v2 = (vecs * vecs).sum(1)
    overlap = 0
    sample = rng.integers(0, n, 300)
    for i in sample:
        d2 = v2 - 2.0 * (vecs @ vecs[i])
        d2[i] = np.inf
        exact = set(np.argsort(d2)[:k].tolist())
        overlap += len(exact & set(got[i].tolist())) / k
    assert overlap / len(sample) > 0.85, overlap / len(sample)


@pytest.mark.parametrize("metric", ["l2sq", "cosine", "ip"])
def test_forced_ivf_build_recall_matches_exact(metric):
    rng = np.random.default_rng(11)
    n, d, k = 12000, 32, 10
    vecs, centers = _clustered(rng, n, d)
    q = (centers[rng.integers(0, len(centers), 300)]
         + 0.25 * rng.normal(size=(300, d)).astype(np.float32))
    mk = MetricKind(metric)
    if mk == MetricKind.L2SQ:
        s = ((vecs * vecs).sum(1)[None, :] - 2.0 * (q @ vecs.T))
    elif mk == MetricKind.IP:
        s = -(q @ vecs.T)
    else:
        s = -(q @ vecs.T) / (
            np.linalg.norm(q, axis=1)[:, None]
            * np.linalg.norm(vecs, axis=1)[None, :])
    gt = np.argsort(s, 1)[:, :k]

    recalls = {}
    for mode in ("exact", "ivf"):
        os.environ["DVT_BUILD_KNN"] = mode
        try:
            idx = HNSWIndex(d, HNSWConfig(metric=mk), capacity=n)
            idx.add(vecs, np.arange(n))
            _, got = idx.search(q, k, ef=48)
            hits = sum(len(set(g) & set(w))
                       for g, w in zip(got.tolist(), gt.tolist()))
            recalls[mode] = hits / gt.size
        finally:
            os.environ.pop("DVT_BUILD_KNN", None)
    assert recalls["ivf"] > 0.9, recalls
    assert recalls["ivf"] > recalls["exact"] - 0.05, recalls
