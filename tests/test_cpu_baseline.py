"""The measured CPU baseline (native/cpu_hnsw.cpp) must search the same
graph the TPU engine does and reach the same recall class — it grounds
bench.py's vs_baseline in a measurement."""

import numpy as np

from duckdb_vss_tpu import HNSWConfig
from duckdb_vss_tpu.models.hnsw import HNSWIndex
from duckdb_vss_tpu.utils.cpu_baseline import CPUBaseline, get_lib


def test_cpu_baseline_recall_and_agreement(rng):
    assert get_lib() is not None, "libcpu_hnsw.so not built"
    n, d, k = 8000, 32, 10
    centers = rng.normal(size=(64, d)).astype(np.float32)
    vecs = (centers[rng.integers(0, 64, n)]
            + 0.25 * rng.normal(size=(n, d)).astype(np.float32))
    q = (centers[rng.integers(0, 64, 200)]
         + 0.25 * rng.normal(size=(200, d)).astype(np.float32))
    v2 = (vecs * vecs).sum(1)
    gt = np.argsort(v2[None, :] - 2.0 * (q @ vecs.T), 1)[:, :k]

    idx = HNSWIndex(d, HNSWConfig(), capacity=n)
    idx.add(vecs, np.arange(n))

    cb = CPUBaseline(idx)
    ids, secs = cb.search(q, k, ef=64)
    rec = sum(len(set(a) & set(b))
              for a, b in zip(ids.tolist(), gt.tolist())) / gt.size
    assert rec > 0.9, rec
    assert secs > 0

    # tombstones filtered like the engine
    idx.remove(gt[:, 0][:50])
    cb2 = CPUBaseline(idx)
    ids2, _ = cb2.search(q[:50], k, ef=64)
    assert not np.isin(ids2, gt[:, 0][:50]).any()


def test_cpu_baseline_own_build(rng):
    """Reference-semantics insertion build (cpu_hnsw_build): the
    baseline's own graph must be single-seed navigable — high recall
    with the reference's greedy-descent + beam search loop."""
    assert get_lib() is not None, "libcpu_hnsw.so not built"
    n, d, k = 8000, 32, 10
    centers = rng.normal(size=(64, d)).astype(np.float32)
    vecs = (centers[rng.integers(0, 64, n)]
            + 0.25 * rng.normal(size=(n, d)).astype(np.float32))
    q = (centers[rng.integers(0, 64, 200)]
         + 0.25 * rng.normal(size=(200, d)).astype(np.float32))
    v2 = (vecs * vecs).sum(1)
    gt = np.argsort(v2[None, :] - 2.0 * (q @ vecs.T), 1)[:, :k]

    u = rng.random(n)
    levels = np.minimum(
        np.floor(-np.log(np.maximum(u, 1e-12)) / np.log(16.0)), 8
    ).astype(np.int32)
    cb, build_s = CPUBaseline.build(vecs, levels, m=16, m0=32,
                                    ef_construction=128)
    assert build_s > 0
    ids, _ = cb.search(q, k, ef=32)
    rec = sum(len(set(a) & set(b))
              for a, b in zip(ids.tolist(), gt.tolist())) / gt.size
    assert rec > 0.93, rec
