"""Sharded (multi-device) search tests on the virtual 8-device CPU mesh:
hash partitioning, SPMD local search, all-gather top-k merge parity with
single-device brute force."""

import numpy as np
import pytest

import jax

from duckdb_vss_tpu.models.flat import FlatIndex
from duckdb_vss_tpu.parallel.sharded import (
    ShardedFlatIndex,
    ShardedHNSWIndex,
    make_mesh,
)
from duckdb_vss_tpu.utils.config import HNSWConfig, MetricKind
from tests.test_hnsw import recall_at_k


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8
    return make_mesh(n_shards=4, n_q=2)


def test_sharded_flat_exact_parity(mesh8, rng):
    n, d, k = 3000, 24, 10
    v = rng.normal(size=(n, d)).astype(np.float32)
    keys = np.arange(n, dtype=np.int64)
    sf = ShardedFlatIndex(d, MetricKind.L2SQ, mesh8, capacity_per_shard=1024)
    sf.add(v, keys)
    ref = FlatIndex(d, MetricKind.L2SQ, capacity=n)
    ref.add(v, keys)
    q = rng.normal(size=(13, d)).astype(np.float32)
    s_got, k_got = sf.search(q, k)
    s_want, k_want = ref.search(q, k)
    np.testing.assert_allclose(np.sort(s_got, 1), np.sort(s_want, 1),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.sort(k_got, 1), np.sort(k_want, 1))


def test_sharded_flat_metrics(mesh8, rng):
    n, d, k = 1000, 16, 5
    v = rng.normal(size=(n, d)).astype(np.float32)
    keys = np.arange(n, dtype=np.int64)
    for metric in (MetricKind.COSINE, MetricKind.IP):
        sf = ShardedFlatIndex(d, metric, mesh8)
        sf.add(v, keys)
        ref = FlatIndex(d, metric, capacity=n)
        ref.add(v, keys)
        q = rng.normal(size=(5, d)).astype(np.float32)
        _, k_got = sf.search(q, k)
        _, k_want = ref.search(q, k)
        np.testing.assert_array_equal(np.sort(k_got, 1), np.sort(k_want, 1))


def test_sharded_hnsw_recall(mesh8):
    rng = np.random.default_rng(21)
    n, d, k = 4000, 32, 10
    v = rng.normal(size=(n, d)).astype(np.float32)
    keys = np.arange(n, dtype=np.int64)
    sh = ShardedHNSWIndex(d, HNSWConfig(), mesh8, capacity_per_shard=2048,
                          build_batch=128)
    sh.add(v, keys)
    ref = FlatIndex(d, MetricKind.L2SQ, capacity=n)
    ref.add(v, keys)
    q = rng.normal(size=(30, d)).astype(np.float32)
    _, want = ref.search(q, k)
    _, got = sh.search(q, k, ef=64)
    r = recall_at_k(got, want)
    assert r >= 0.9, f"sharded recall@10 = {r}"


def test_sharded_hnsw_incremental(mesh8):
    rng = np.random.default_rng(23)
    d = 16
    sh = ShardedHNSWIndex(d, HNSWConfig(), mesh8, capacity_per_shard=1024,
                          build_batch=64)
    v1 = rng.normal(size=(500, d)).astype(np.float32)
    sh.add(v1, np.arange(500))
    v2 = rng.normal(size=(100, d)).astype(np.float32)
    sh.add(v2, np.arange(1000, 1100))
    _, got = sh.search(v2[:10], 1, ef=64)
    assert (got[:, 0] >= 1000).mean() >= 0.9
