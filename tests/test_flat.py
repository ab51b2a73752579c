"""Tests for the flat (brute-force) index: exact top-k parity with numpy,
insert/delete tombstones, free-slot reuse, compaction, capacity growth.

Differential-testing pattern follows the reference's indexed-vs-brute-force
comparisons (test/sql/hnsw/hnsw_lateral_join.test) but here the flat index
IS the brute force, so parity is exact.
"""

import numpy as np
import pytest

from duckdb_vss_tpu.models.flat import FlatIndex
from duckdb_vss_tpu.utils.config import MetricKind
from tests.test_distance import np_scores


def brute_topk(q, v, keys, k, metric):
    s = np_scores(q, v, metric)
    order = np.argsort(s, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(s, order, 1), keys[order]


@pytest.mark.parametrize("metric", list(MetricKind))
def test_flat_search_exact(rng, metric):
    n, d, k = 500, 33, 10
    v = rng.normal(size=(n, d)).astype(np.float32)
    keys = rng.permutation(n).astype(np.int64) * 7  # non-contiguous keys
    q = rng.normal(size=(7, d)).astype(np.float32)
    idx = FlatIndex(d, metric)
    idx.add(v, keys)
    scores, got_keys = idx.search(q, k)
    want_s, want_k = brute_topk(q, v, keys, k, metric)
    np.testing.assert_allclose(scores, want_s, rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(got_keys, want_k)


def test_flat_blockwise_matches_dense(rng):
    # force multi-block path: capacity 4096 with block_n 1024
    n, d, k = 3000, 16, 25
    v = rng.normal(size=(n, d)).astype(np.float32)
    keys = np.arange(n, dtype=np.int64)
    idx = FlatIndex(d, MetricKind.L2SQ, capacity=4096)
    idx.add(v, keys)
    q = rng.normal(size=(5, d)).astype(np.float32)
    s_blk, k_blk = idx.search(q, k, block_n=1024)
    s_dense, k_dense = idx.search(q, k, block_n=1 << 20)
    np.testing.assert_allclose(s_blk, s_dense, rtol=1e-5)
    np.testing.assert_array_equal(np.sort(k_blk, 1), np.sort(k_dense, 1))


def test_delete_tombstone_and_reuse(rng):
    d = 8
    idx = FlatIndex(d, MetricKind.L2SQ)
    v = rng.normal(size=(20, d)).astype(np.float32)
    idx.add(v, np.arange(20))
    assert len(idx) == 20
    # delete 5 rows; they must vanish from results
    idx.remove(np.arange(5))
    assert len(idx) == 15
    q = v[:1]
    _, keys = idx.search(q, 20)
    live = set(keys[0][keys[0] >= 0].tolist())
    assert live == set(range(5, 20))
    # re-insert reuses tombstoned slots: capacity pointer must not advance
    before = idx._next_slot
    idx.add(rng.normal(size=(5, d)).astype(np.float32), np.arange(100, 105))
    assert idx._next_slot == before
    assert len(idx) == 20


def test_missing_results_padded(rng):
    idx = FlatIndex(4, MetricKind.L2SQ)
    idx.add(rng.normal(size=(3, 4)).astype(np.float32), np.arange(3))
    scores, keys = idx.search(np.zeros((1, 4), np.float32), 8)
    assert (keys[0, :3] >= 0).all()
    assert (keys[0, 3:] == -1).all()


def test_compact_preserves_results(rng):
    d = 12
    idx = FlatIndex(d, MetricKind.COSINE)
    v = rng.normal(size=(100, d)).astype(np.float32)
    idx.add(v, np.arange(100))
    idx.remove(np.arange(0, 100, 3))
    q = rng.normal(size=(4, d)).astype(np.float32)
    s1, k1 = idx.search(q, 10)
    idx.compact()
    s2, k2 = idx.search(q, 10)
    np.testing.assert_allclose(s1, s2, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(k1, k2)
    assert idx._next_slot == len(idx)


def test_capacity_growth(rng):
    idx = FlatIndex(8, MetricKind.L2SQ, capacity=1024)
    v = rng.normal(size=(3000, 8)).astype(np.float32)
    idx.add(v, np.arange(3000))
    assert idx.capacity >= 3000
    assert len(idx) == 3000
    _, keys = idx.search(v[:2], 1)
    np.testing.assert_array_equal(keys[:, 0], [0, 1])


def test_duplicate_key_rejected(rng):
    idx = FlatIndex(4, MetricKind.L2SQ)
    idx.add(np.ones((1, 4), np.float32), [7])
    with pytest.raises(ValueError):
        idx.add(np.ones((1, 4), np.float32), [7])


def test_prepare_queries_transfer_dtypes(rng):
    """bf16/int8 transfer modes dequantize on device to near-f32 rows."""
    from duckdb_vss_tpu.models.flat import FlatIndex
    from duckdb_vss_tpu.utils.config import MetricKind

    fi = FlatIndex(32, MetricKind.L2SQ, capacity=64)
    q = rng.normal(size=(5, 32)).astype(np.float32)
    exact = np.asarray(fi.prepare_queries(q))[:5, :32]
    np.testing.assert_allclose(exact, q, rtol=0, atol=0)
    bf = np.asarray(fi.prepare_queries(q, transfer_dtype="bf16"))[:5, :32]
    np.testing.assert_allclose(bf, q, rtol=8e-3, atol=1e-3)
    i8 = np.asarray(fi.prepare_queries(q, transfer_dtype="int8"))[:5, :32]
    np.testing.assert_allclose(i8, q, rtol=3e-2, atol=3e-2)
    # zero rows survive (scale guard)
    z = np.asarray(fi.prepare_queries(np.zeros((2, 32), np.float32),
                                      transfer_dtype="int8"))
    assert not np.isnan(z).any() and float(np.abs(z).max()) == 0.0


def test_flat_topk_stashed_parity():
    """flat_topk_stashed (default-off stashed-score scan; see its
    docstring for the measured TPU trade) must stay bitwise-identical
    to the per-block tournament, including tie order and masked rows."""
    import jax
    import jax.numpy as jnp

    from duckdb_vss_tpu.ops.distance import sq_norms
    from duckdb_vss_tpu.ops.topk import flat_topk, flat_topk_stashed

    rng = np.random.default_rng(0)
    for (b, n, d, k, bn) in [(64, 4096, 32, 10, 512), (16, 1024, 8, 32,
                                                       256)]:
        v = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
        q = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
        valid = jnp.asarray(rng.random(n) > 0.1)
        s1, i1 = flat_topk_stashed(q, v, k, MetricKind.L2SQ, sq_norms(v),
                                   valid, bn, jax.lax.Precision.HIGHEST)
        s2, i2 = flat_topk(q, v, k, MetricKind.L2SQ, valid=valid,
                           block_n=bn)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    # heavy ties: every row repeated 32x
    v = jnp.asarray(np.repeat(rng.normal(size=(64, 16)).astype(np.float32),
                              32, axis=0))
    q = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
    s1, i1 = flat_topk_stashed(q, v, 10, MetricKind.L2SQ, sq_norms(v),
                               jnp.ones(2048, bool), 512,
                               jax.lax.Precision.HIGHEST)
    s2, i2 = flat_topk(q, v, 10, MetricKind.L2SQ, block_n=512)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
