"""Persistence round-trip tests (hnsw_basic.test CHECKPOINT+restart
pattern; usearch file format semantics incl. free-list/key-map rebuild)."""

import os

import numpy as np
import pytest

from duckdb_vss_tpu.models.hnsw import HNSWIndex
from duckdb_vss_tpu.utils.config import HNSWConfig, MetricKind
from duckdb_vss_tpu.utils import persist


@pytest.fixture()
def built_small(tmp_path):
    rng = np.random.default_rng(31)
    v = rng.normal(size=(400, 24)).astype(np.float32)
    idx = HNSWIndex(24, HNSWConfig(metric=MetricKind.COSINE, m=8, m0=16),
                    capacity=400, build_batch=128)
    idx.add(v, np.arange(400) * 3)
    return idx, v, rng, str(tmp_path / "idx.vss")


def test_native_lib_available():
    assert persist.get_lib() is not None, "native libvss_store.so not built"


def test_roundtrip_identical_results(built_small):
    idx, v, rng, path = built_small
    # delete some rows so the free-list/tombstones round-trip too
    idx.remove([0, 3, 9])
    q = rng.normal(size=(10, 24)).astype(np.float32)
    s0, k0 = idx.search(q, 5)
    assert idx.is_dirty
    persist.save_index(idx, path)
    assert not idx.is_dirty
    idx2 = persist.load_index(path)
    assert idx2.config == idx.config
    assert len(idx2) == len(idx)
    s1, k1 = idx2.search(q, 5)
    np.testing.assert_array_equal(k0, k1)
    np.testing.assert_allclose(s0, s1, rtol=1e-6)
    # free-list / key-map rebuilt: insert reuses tombstoned slots
    before = idx2.store._next_slot
    idx2.add(rng.normal(size=(3, 24)).astype(np.float32), [9000, 9001, 9002])
    assert idx2.store._next_slot == before


def test_corruption_detected(built_small):
    idx, v, rng, path = built_small
    persist.save_index(idx, path)
    size = os.path.getsize(path)
    with open(path, "r+b") as f:
        f.seek(size // 2)
        f.write(b"\xde\xad\xbe\xef" * 4)
    # eager load: per-block CRC failure raises immediately
    with pytest.raises(persist.PersistError):
        persist.load_index(path, lazy=False)
    # deferred load: the corrupt section is read on first access, so the
    # error surfaces there (same failure, later detection — the price of
    # O(ms) open)
    lz = persist.load_index(path, lazy=True)
    with pytest.raises(persist.PersistError):
        lz.search(v[:2], 3, ef=16)


def test_missing_file(tmp_path):
    with pytest.raises(persist.PersistError):
        persist.load_index(str(tmp_path / "nope.vss"))


def test_incremental_after_load(built_small):
    idx, v, rng, path = built_small
    persist.save_index(idx, path)
    idx2 = persist.load_index(path)
    nv = rng.normal(size=(32, 24)).astype(np.float32)
    idx2.add(nv, np.arange(50_000, 50_032))
    _, got = idx2.search(nv[:8], 1, ef=64)
    assert (got[:, 0] >= 50_000).mean() >= 0.8


def test_deferred_load_materializes_on_first_search(built_small):
    """lazy load (default): no device arrays exist until the first
    data-touching call (reference defers index deserialization to first
    access, hnsw_index.cpp:192-206); results then match the eager load."""
    idx, v, rng, path = built_small
    persist.save_index(idx, path)
    q = rng.normal(size=(8, 24)).astype(np.float32)
    want_s, want_k = idx.search(q, 5, ef=32)

    lz = persist.load_index(path, lazy=True)
    assert lz._pending_load is not None
    assert lz.store._vectors is None and lz.graph is None
    # host-side catalog answers work without materializing
    assert len(lz) == len(idx)
    assert lz.contains(0) and not lz.contains(1)
    assert lz._pending_load is not None  # still deferred
    got_s, got_k = lz.search(q, 5, ef=32)  # first touch materializes
    assert lz._pending_load is None and lz.store._vectors is not None
    np.testing.assert_array_equal(got_k, want_k)
    np.testing.assert_allclose(got_s, want_s, rtol=1e-5, atol=1e-6)


def test_deferred_load_from_buffer(built_small):
    """load_index_from_buffer: reader over an in-memory image (the
    open_database block-storage path — no temp-file round trip); the
    factory is consulted again at materialize time."""
    idx, v, rng, path = built_small
    persist.save_index(idx, path)
    img = open(path, "rb").read()
    calls = []

    def factory():
        calls.append(1)
        return img

    lz = persist.load_index_from_buffer(factory, lazy=True)
    assert len(calls) == 1  # header + host sections
    q = rng.normal(size=(4, 24)).astype(np.float32)
    want = idx.search(q, 3, ef=32)
    got = lz.search(q, 3, ef=32)
    assert len(calls) == 2  # re-read at materialize
    np.testing.assert_array_equal(got[1], want[1])


def test_deferred_load_mutation_materializes(built_small):
    """add/remove on a lazy index must materialize first (and then
    behave like the eager index)."""
    idx, v, rng, path = built_small
    persist.save_index(idx, path)
    lz = persist.load_index(path, lazy=True)
    nv = rng.normal(size=(3, 24)).astype(np.float32)
    lz.add(nv, np.array([9001, 9002, 9003]))
    assert lz.store._vectors is not None
    _, k = lz.search(nv, 1, ef=32)
    assert set(k[:, 0].tolist()) == {9001, 9002, 9003}
