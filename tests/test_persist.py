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
    with pytest.raises(persist.PersistError):
        persist.load_index(path)


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
