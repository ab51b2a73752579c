"""Chunked reverse-candidate pass (models/bulk._reverse_candidates_chunked)
must produce exactly the single-program result.

The 10M-row bulk build cannot afford the single-program variant's global
edge-list argsort (round-3 config-5 blocker); the chunked path processes
source-row chunks and maintains a running per-target top-rev_r table.
A target's global top-rev_r is the top-rev_r of the union of per-chunk
top-rev_r's, so with distinct distances the outputs are identical.
"""

import numpy as np
import jax.numpy as jnp

from duckdb_vss_tpu.models import bulk


def _random_knn(rng, cap, n_live, k):
    ids = np.full((cap, k), -1, np.int32)
    sc = np.full((cap, k), np.float32(3.4e38), np.float32)
    # distinct distances: a random permutation of a strictly increasing
    # grid keeps the chunked merge order identical to the global sort
    dists = rng.permutation(n_live * k).astype(np.float32) * 1e-3 + 0.5
    for i in range(n_live):
        row = rng.choice(cap, size=k, replace=False).astype(np.int32)
        # a few -1 pads
        row[rng.random(k) < 0.1] = -1
        ids[i] = row
        sc[i] = np.sort(dists[i * k:(i + 1) * k])
        sc[i, row < 0] = np.float32(3.4e38)
    return ids, sc


def test_chunked_matches_single_program(monkeypatch):
    rng = np.random.default_rng(42)
    cap, n_live, k, rev_r = 65536, 50000, 8, 4
    ids, sc = _random_knn(rng, cap, n_live, k)
    ids_j, sc_j = jnp.asarray(ids), jnp.asarray(sc)

    ref = np.asarray(bulk._reverse_candidates(ids_j, sc_j, rev_r))

    # force multiple chunks (rows_chunk floor is 16384 -> 4 chunks)
    monkeypatch.setattr(bulk, "REV_EDGE_CHUNK", 1024)
    got = np.asarray(bulk._reverse_candidates_chunked(ids_j, sc_j, rev_r, k))
    assert got.shape == ref.shape
    np.testing.assert_array_equal(got, ref)


def test_chunked_fallback_on_unaligned_capacity():
    """A capacity that is not a multiple of the 16384 block falls back to
    the single-program path (same result either way)."""
    rng = np.random.default_rng(7)
    cap, n_live, k, rev_r = 5000, 4000, 6, 3
    ids, sc = _random_knn(rng, cap, n_live, k)
    ids_j, sc_j = jnp.asarray(ids), jnp.asarray(sc)
    ref = np.asarray(bulk._reverse_candidates(ids_j, sc_j, rev_r))
    got = np.asarray(bulk._reverse_candidates_chunked(ids_j, sc_j, rev_r, k))
    np.testing.assert_array_equal(got, ref)


def test_column_subset_semantics(monkeypatch):
    """bulk_build passes n_cols < K above REV_SRC_MAX: the chunked pass
    must only read the closest n_cols forward ranks."""
    rng = np.random.default_rng(3)
    cap, n_live, k, rev_r, n_cols = 32768, 20000, 8, 4, 3
    ids, sc = _random_knn(rng, cap, n_live, k)
    ids_j, sc_j = jnp.asarray(ids), jnp.asarray(sc)
    ref = np.asarray(bulk._reverse_candidates(
        ids_j[:, :n_cols], sc_j[:, :n_cols], rev_r))
    monkeypatch.setattr(bulk, "REV_EDGE_CHUNK", 1024)
    got = np.asarray(bulk._reverse_candidates_chunked(
        ids_j, sc_j, rev_r, n_cols))
    np.testing.assert_array_equal(got, ref)
