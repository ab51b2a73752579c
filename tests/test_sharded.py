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


def test_virtual_placement_balances_pathological_keys(mesh8):
    """`key mod S` piles keys ending in the same residue onto one shard;
    the virtual-shard hash + load-aware assignment must balance them
    (BASELINE north star: skew handling via over-partitioning)."""
    from duckdb_vss_tpu.parallel.sharded import ShardedHNSWIndex

    rng = np.random.default_rng(0)
    n, d = 1024, 16
    s = mesh8.shape["shard"]
    # pathological: every key = i * S (all congruent mod S) plus a hot
    # zipf-like block of near-sequential ids
    keys = np.concatenate([
        np.arange(n // 2, dtype=np.int64) * s,
        10_000_000 + np.arange(n // 2, dtype=np.int64)])
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    idx = ShardedHNSWIndex(d, HNSWConfig(m=4, m0=8), mesh8,
                           capacity_per_shard=1024, build_batch=64)
    idx.add(vecs, keys)
    counts = idx.counts
    assert counts.sum() == n
    # perfectly balanced would be n/s per shard; demand < 2x imbalance
    # (mod-S would put 100% of the first half on shard 0)
    assert counts.max() <= 2 * n // s, counts.tolist()
    # searches still find their keys across shards
    _, got = idx.search(vecs[:16], 1, ef=32)
    assert (got[:, 0] == keys[:16]).mean() >= 0.75


def test_sharded_delete_compact_grow(mesh8, rng):
    from duckdb_vss_tpu.parallel.sharded import ShardedHNSWIndex

    n, d = 512, 16
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    keys = np.arange(n, dtype=np.int64)
    idx = ShardedHNSWIndex(d, HNSWConfig(m=4, m0=8), mesh8,
                           capacity_per_shard=1024, build_batch=64)
    idx.add(vecs, keys)
    dead = keys[100:160]
    assert idx.remove(dead) == 60
    assert len(idx) == n - 60
    _, got = idx.search(vecs[100:110], 2, ef=32)
    assert not np.isin(got, dead).any()

    idx.compact()
    assert len(idx) == n - 60
    _, got = idx.search(vecs[:8], 1, ef=32)
    assert (got[:, 0] == keys[:8]).mean() >= 0.75
    # free slots are reusable after compact (slots repacked)
    idx.add(vecs[100:160] + 0.01, dead + 10_000)
    assert len(idx) == n

    idx.reserve(4096)
    assert idx.cap == 4096
    more = rng.normal(size=(64, d)).astype(np.float32)
    idx.add(more, 50_000 + np.arange(64, dtype=np.int64))
    _, got = idx.search(more[:4], 1, ef=32)
    assert (got[:, 0] >= 50_000).all()


def test_sharded_persist_roundtrip(mesh8, rng, tmp_path):
    from duckdb_vss_tpu.parallel.sharded import ShardedHNSWIndex

    n, d = 512, 16
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    keys = np.arange(n, dtype=np.int64) * 7
    idx = ShardedHNSWIndex(d, HNSWConfig(m=4, m0=8), mesh8,
                           capacity_per_shard=1024, build_batch=64)
    idx.add(vecs, keys)
    idx.remove(keys[:10])
    path = str(tmp_path / "sharded.vss")
    idx.save(path)

    idx2 = ShardedHNSWIndex.load(path, mesh8)
    assert len(idx2) == len(idx)
    q = vecs[20:36]
    s1, k1 = idx.search(q, 3, ef=32)
    s2, k2 = idx2.search(q, 3, ef=32)
    np.testing.assert_array_equal(k1, k2)
    np.testing.assert_allclose(s1, s2, rtol=1e-5, atol=1e-6)
    # placement survives: adding the same keys routes identically
    assert (idx2.placement.assign == idx.placement.assign).all()


def test_sharded_search_matches_singlechip_recall(mesh8):
    """The sharded path must reach the same recall class as one
    single-chip index over the union of the shards (same kernels)."""
    from duckdb_vss_tpu.models.hnsw import HNSWIndex
    from duckdb_vss_tpu.parallel.sharded import ShardedHNSWIndex

    rng = np.random.default_rng(5)
    n, d, k = 6000, 24, 5
    centers = rng.normal(size=(64, d)).astype(np.float32)
    vecs = (centers[rng.integers(0, 64, n)]
            + 0.25 * rng.normal(size=(n, d)).astype(np.float32))
    keys = np.arange(n, dtype=np.int64)
    q = (centers[rng.integers(0, 64, 128)]
         + 0.25 * rng.normal(size=(128, d)).astype(np.float32))
    v2 = (vecs * vecs).sum(1)
    gt = np.argsort(v2[None, :] - 2.0 * (q @ vecs.T), 1)[:, :k]

    sh = ShardedHNSWIndex(d, HNSWConfig(), mesh8,
                          capacity_per_shard=2048, build_batch=128)
    sh.add(vecs, keys)
    _, got = sh.search(q, k, ef=48)
    rec = sum(len(set(a) & set(b))
              for a, b in zip(got.tolist(), gt.tolist())) / gt.size
    assert rec > 0.9, rec


def test_sharded_bf16_scalar_kind(rng, mesh8):
    """scalar_kind='bf16' lean sharded store: build + merged search +
    persist roundtrip preserve the dtype and the results."""
    import jax.numpy as jnp

    from duckdb_vss_tpu.parallel.sharded import ShardedHNSWIndex

    n, d, k = 1024, 32, 5
    centers = rng.normal(size=(16, d)).astype(np.float32)
    vecs = (centers[rng.integers(0, 16, n)]
            + 0.2 * rng.normal(size=(n, d)).astype(np.float32))
    keys = np.arange(n, dtype=np.int64)
    idx = ShardedHNSWIndex(d, HNSWConfig(), mesh8,
                           capacity_per_shard=512, build_batch=64,
                           scalar_kind="bf16")
    idx.add(vecs, keys)
    assert idx._vectors.dtype == jnp.bfloat16
    q = vecs[:32]
    _, got = idx.search(q, k, ef=48)
    assert (got[:, 0] == keys[:32]).mean() >= 0.9
    import os
    import tempfile

    path = os.path.join(tempfile.mkdtemp(), "sh_bf16.vss")
    idx.save(path)
    idx2 = ShardedHNSWIndex.load(path, mesh8)
    assert idx2.scalar_kind == "bf16"
    assert idx2._vectors.dtype == jnp.bfloat16
    _, got2 = idx2.search(q, k, ef=48)
    np.testing.assert_array_equal(got, got2)


def test_sharded_neighborhood_layout(monkeypatch):
    """The per-shard int8 neighborhood layout + fused-kernel path (4-D
    nbr_vecs specs) must work under shard_map — it is CPU-gated off by
    default, so force it (regression: the round-3 3-D table change
    touched every spec on this path)."""
    import numpy as np
    from duckdb_vss_tpu.parallel.sharded import ShardedHNSWIndex, make_mesh
    from duckdb_vss_tpu.utils.config import HNSWConfig

    mesh = make_mesh(4, 2)
    rng = np.random.default_rng(0)
    n, d = 4096, 32
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    idx = ShardedHNSWIndex(d, HNSWConfig(), mesh, capacity_per_shard=2048)
    idx.layout = "neighborhood"
    idx.add(vecs, np.arange(n))
    _, keys = idx.search(vecs[:8], 5)
    assert float(np.mean(keys[:, 0] == np.arange(8))) >= 0.9


def test_sharded_flat_grow(mesh8, rng):
    """ShardedFlatIndex grows past its initial capacity via reserve()
    (round-3 raised 'grow not implemented')."""
    n1, n2, d, k = 3000, 3000, 16, 5
    sf = ShardedFlatIndex(d, MetricKind.L2SQ, mesh8,
                          capacity_per_shard=1024)
    v = rng.normal(size=(n1 + n2, d)).astype(np.float32)
    sf.add(v[:n1], np.arange(n1))
    cap_before = sf.cap
    sf.add(v[n1:], np.arange(n1, n1 + n2))  # exceeds 1024/shard
    assert sf.cap > cap_before
    ref = FlatIndex(d, MetricKind.L2SQ, capacity=n1 + n2)
    ref.add(v, np.arange(n1 + n2))
    q = rng.normal(size=(9, d)).astype(np.float32)
    _, k_got = sf.search(q, k)
    _, k_want = ref.search(q, k)
    np.testing.assert_array_equal(np.sort(k_got, 1), np.sort(k_want, 1))


def test_sharded_search_chunked_matches_unchunked(mesh8):
    """Host-side chunking of the sharded search (chunk < batch) must
    return exactly the same results as one whole-batch program."""
    rng = np.random.default_rng(29)
    n, d, k = 4000, 32, 10
    v = rng.normal(size=(n, d)).astype(np.float32)
    sh = ShardedHNSWIndex(d, HNSWConfig(), mesh8, capacity_per_shard=2048,
                          build_batch=128)
    sh.add(v, np.arange(n))
    q = rng.normal(size=(100, d)).astype(np.float32)
    s1, k1 = sh.search(q, k, ef=64, chunk=32)
    s2, k2 = sh.search(q, k, ef=64, chunk=1024)
    np.testing.assert_array_equal(k1, k2)
    np.testing.assert_allclose(s1, s2, rtol=1e-5, atol=1e-6)
