"""scalar_kind="bf16" — the lean on-device storage mode (usearch
scalar-cast analog, index_dense.hpp:363-375) used for 10M-scale
single-chip stores, plus the 1.5x capacity buckets."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from duckdb_vss_tpu import HNSWConfig, MetricKind
from duckdb_vss_tpu.models.flat import FlatIndex
from duckdb_vss_tpu.models.hnsw import HNSWIndex
from duckdb_vss_tpu.utils import persist
from duckdb_vss_tpu.utils.padding import round_up_capacity


def _clustered(rng, n, d, n_centers=64, sigma=0.15):
    centers = rng.normal(size=(n_centers, d)).astype(np.float32)
    asg = rng.integers(0, n_centers, n)
    return (centers[asg] + sigma * rng.normal(size=(n, d)).astype(np.float32),
            centers)


def test_capacity_buckets():
    assert round_up_capacity(1) == 1024
    assert round_up_capacity(40_000) == 49_152
    assert round_up_capacity(10_000_000) == 12_582_912
    # buckets are fixed points (reload never re-rounds)
    for n in (1024, 49_152, 12_582_912, 1 << 20):
        assert round_up_capacity(n) == n
    # large buckets stay block-aligned for the flat scan
    assert round_up_capacity(10_000_000) % 16384 == 0


def test_flat_bf16_store_recall(rng):
    n, d, k = 4096, 32, 10
    vecs, centers = _clustered(rng, n, d)
    fi = FlatIndex(d, MetricKind.L2SQ, capacity=n, scalar_kind="bf16")
    fi.add(vecs, np.arange(n))
    assert fi._vectors.dtype == jnp.bfloat16
    q = (centers[rng.integers(0, 64, 64)]
         + 0.15 * rng.normal(size=(64, d)).astype(np.float32))
    _, got = fi.search(q, k)
    v2 = (vecs * vecs).sum(1)
    gt = np.argsort(v2[None, :] - 2.0 * (q @ vecs.T), 1)[:, :k]
    rec = sum(len(set(a) & set(b))
              for a, b in zip(got.tolist(), gt.tolist())) / gt.size
    assert rec > 0.97, rec


def test_flat_bf16_reserve_keeps_dtype(rng):
    fi = FlatIndex(8, MetricKind.L2SQ, capacity=1024, scalar_kind="bf16")
    fi.add(rng.normal(size=(10, 8)).astype(np.float32), np.arange(10))
    fi.reserve(3000)
    assert fi._vectors.dtype == jnp.bfloat16
    assert fi.capacity == 4096
    # scatter insert after growth keeps dtype and searches fine
    fi.add(rng.normal(size=(5, 8)).astype(np.float32), 100 + np.arange(5))
    assert fi._vectors.dtype == jnp.bfloat16
    _, keys = fi.search(fi.get_vector(100), 1)
    assert keys[0, 0] == 100


def test_hnsw_bf16_store(rng):
    n, d, k = 6000, 32, 10
    vecs, centers = _clustered(rng, n, d)
    idx = HNSWIndex(d, HNSWConfig(), capacity=n, scalar_kind="bf16")
    idx.add(vecs, np.arange(n))
    # traversal copy aliases the store (no duplicate HBM)
    assert idx._traversal_vectors() is idx.store._vectors
    q = (centers[rng.integers(0, 64, 32)]
         + 0.15 * rng.normal(size=(32, d)).astype(np.float32))
    _, got = idx.search(q, k, ef=48)
    v2 = (vecs * vecs).sum(1)
    gt = np.argsort(v2[None, :] - 2.0 * (q @ vecs.T), 1)[:, :k]
    rec = sum(len(set(a) & set(b))
              for a, b in zip(got.tolist(), gt.tolist())) / gt.size
    assert rec > 0.9, rec


@pytest.mark.parametrize("force_npz", [False, True])
def test_bf16_persist_roundtrip(rng, tmp_path, force_npz, monkeypatch):
    if force_npz:
        monkeypatch.setattr(persist, "get_lib", lambda: None)
    n, d = 2048, 16
    vecs, _ = _clustered(rng, n, d)
    idx = HNSWIndex(d, HNSWConfig(), capacity=n, scalar_kind="bf16")
    idx.add(vecs, np.arange(n))
    path = os.path.join(str(tmp_path), "bf16.vss")
    persist.save_index(idx, path)
    idx2 = persist.load_index(path, lazy=False)
    assert idx2.store.scalar_kind == "bf16"
    assert idx2.store._vectors.dtype == jnp.bfloat16
    q = vecs[:8]
    _, a = idx.search(q, 5, ef=32)
    _, b = idx2.search(q, 5, ef=32)
    np.testing.assert_array_equal(a, b)
