"""HNSW index tests: recall vs brute force (the reference's approximate-
tolerance pattern, hnsw_basic.test:26-31), CRUD + tombstones
(hnsw_crud.test), compaction, graph invariants, metric variants
(hnsw_metrics.test)."""

import numpy as np
import pytest

from duckdb_vss_tpu.models.flat import FlatIndex
from duckdb_vss_tpu.models.hnsw import HNSWIndex
from duckdb_vss_tpu.utils.config import HNSWConfig, MetricKind


def build_index(rng, n=2000, d=32, metric=MetricKind.L2SQ, **opts):
    v = rng.normal(size=(n, d)).astype(np.float32)
    keys = np.arange(n, dtype=np.int64)
    idx = HNSWIndex(d, HNSWConfig(metric=metric, **opts), capacity=n,
                    build_batch=128)
    idx.add(v, keys)
    return idx, v, keys


def recall_at_k(got_keys, want_keys):
    hits = 0
    for g, w in zip(got_keys, want_keys):
        hits += len(set(g.tolist()) & set(w.tolist()))
    return hits / want_keys.size


@pytest.fixture(scope="module")
def built(rng_mod=None):
    rng = np.random.default_rng(7)
    return build_index(rng), rng


def test_recall_vs_brute_force(built):
    (idx, v, keys), rng = built
    q = rng.normal(size=(50, v.shape[1])).astype(np.float32)
    flat = FlatIndex(v.shape[1], MetricKind.L2SQ, capacity=len(v))
    flat.add(v, keys)
    _, want = flat.search(q, 10)
    _, got = idx.search(q, 10, ef=64)
    r = recall_at_k(got, want)
    assert r >= 0.90, f"recall@10 = {r}"


def test_higher_ef_higher_recall(built):
    (idx, v, keys), rng = built
    q = rng.normal(size=(30, v.shape[1])).astype(np.float32)
    flat = FlatIndex(v.shape[1], MetricKind.L2SQ, capacity=len(v))
    flat.add(v, keys)
    _, want = flat.search(q, 10)
    _, got_lo = idx.search(q, 10, ef=16)
    _, got_hi = idx.search(q, 10, ef=128)
    assert recall_at_k(got_hi, want) >= recall_at_k(got_lo, want)
    assert recall_at_k(got_hi, want) >= 0.95


def test_exact_scores_emitted(built):
    """Returned scores must be exact index-metric values (HIGHEST-precision
    rerank), not traversal approximations."""
    (idx, v, keys), rng = built
    q = rng.normal(size=(5, v.shape[1])).astype(np.float32)
    scores, got = idx.search(q, 5)
    for b in range(5):
        for j in range(5):
            kk = got[b, j]
            if kk < 0:
                continue
            want = ((q[b] - v[kk]) ** 2).sum()
            np.testing.assert_allclose(scores[b, j], want, rtol=1e-4)


def test_graph_invariants(built):
    (idx, v, keys), _ = built
    nb0 = np.asarray(idx.graph.neighbors0)
    n = len(v)
    live_rows = nb0[:n]
    # ids in range
    assert live_rows.max() < n
    # no self edges
    self_edge = (live_rows == np.arange(n)[:, None]) & (live_rows >= 0)
    assert not self_edge.any()
    # every live node has at least one neighbor (connectivity proxy)
    assert ((live_rows >= 0).sum(axis=1) > 0).all()
    # entry node is at max level
    levels = np.asarray(idx.graph.levels)
    entry = int(idx.graph.entry_node)
    assert levels[entry] == int(idx.graph.max_level)


@pytest.mark.parametrize("metric", [MetricKind.COSINE, MetricKind.IP])
def test_metric_variants(metric):
    rng = np.random.default_rng(11)
    idx, v, keys = build_index(rng, n=1000, metric=metric)
    q = rng.normal(size=(20, 32)).astype(np.float32)
    flat = FlatIndex(32, metric, capacity=1000)
    flat.add(v, keys)
    _, want = flat.search(q, 10)
    _, got = idx.search(q, 10, ef=96)
    assert recall_at_k(got, want) >= 0.9


def test_delete_then_search():
    rng = np.random.default_rng(3)
    idx, v, keys = build_index(rng, n=800)
    q = v[:8] + 1e-3
    _, got0 = idx.search(q, 1)
    np.testing.assert_array_equal(got0[:, 0], np.arange(8))
    idx.remove(np.arange(8))
    _, got1 = idx.search(q, 5)
    assert not (set(got1.ravel().tolist()) & set(range(8)))
    assert len(idx) == 792


def test_incremental_insert_after_build():
    rng = np.random.default_rng(5)
    idx, v, keys = build_index(rng, n=600)
    extra = rng.normal(size=(64, 32)).astype(np.float32)
    idx.add(extra, np.arange(10_000, 10_064))
    # new vectors must be findable
    _, got = idx.search(extra[:10], 1, ef=64)
    found = (got[:, 0] >= 10_000).mean()
    assert found >= 0.9, f"only {found} of new inserts found as own NN"


def test_slot_reuse_relinks():
    rng = np.random.default_rng(9)
    idx, v, keys = build_index(rng, n=500)
    idx.remove(np.arange(50))
    before = idx.store._next_slot
    nv = rng.normal(size=(50, 32)).astype(np.float32)
    idx.add(nv, np.arange(20_000, 20_050))
    assert idx.store._next_slot == before  # tombstoned slots reused
    _, got = idx.search(nv[:10], 1, ef=64)
    assert (got[:, 0] >= 20_000).mean() >= 0.9


def test_isolate_prunes_edges_into_tombstones():
    """usearch isolate(): edges INTO banned nodes disappear, outgoing
    edges of banned nodes remain (index.hpp:3109-3146)."""
    rng = np.random.default_rng(21)
    idx, v, keys = build_index(rng, n=600)
    dead = np.arange(0, 600, 6)
    idx.remove(dead)
    nb0 = np.asarray(idx.graph.neighbors0)
    dead_set = set(dead.tolist())
    assert any(x in dead_set for x in nb0[nb0 >= 0].tolist()), \
        "tombstoned slots should still be linked before isolate()"
    idx.isolate()
    nb0 = np.asarray(idx.graph.neighbors0)
    un = np.asarray(idx.graph.upper_neighbors)
    assert not any(x in dead_set for x in nb0[nb0 >= 0].tolist())
    assert not any(x in dead_set for x in un[un >= 0].tolist())
    # live entries packed first: no -1 before a valid id in any row
    first_hole = (nb0 < 0).argmax(axis=1)
    for row, h in zip(nb0, first_hole):
        if row[h] < 0:
            assert (row[h:] < 0).all()
    # search quality holds against brute force over the live set
    q = rng.normal(size=(20, 32)).astype(np.float32)
    live = np.setdiff1d(keys, dead)
    flat = FlatIndex(32, MetricKind.L2SQ, capacity=len(live))
    flat.add(v[live], live)
    _, want = flat.search(q, 10)
    _, got = idx.search(q, 10, ef=96)
    assert recall_at_k(got, want) >= 0.85


def test_compact_preserves_search():
    rng = np.random.default_rng(13)
    idx, v, keys = build_index(rng, n=700)
    idx.remove(np.arange(0, 700, 7))
    q = rng.normal(size=(20, 32)).astype(np.float32)
    _, before = idx.search(q, 10, ef=96)
    idx.compact()
    _, after = idx.search(q, 10, ef=96)
    # approximate indexes: compare overlap, not exact rows
    overlap = recall_at_k(after, before)
    assert overlap >= 0.9, f"post-compaction overlap {overlap}"
    assert idx.store._next_slot == len(idx)
    # stats still coherent
    s = idx.stats()
    assert s["count"] == len(idx)
    assert s["levels"][0]["nodes"] == len(idx)


def test_stats_shape(built):
    (idx, v, keys), _ = built
    s = idx.stats()
    assert s["metric"] == "l2sq"
    assert s["dimensions"] == 32
    assert s["count"] == len(v)
    assert s["max_level"] >= 0
    assert s["build_distance_count"] > 0
    assert isinstance(s["levels"], list) and s["levels"]


def test_usearch_parity_helpers():
    rng = np.random.default_rng(15)
    idx, v, keys = build_index(rng, n=300)
    assert idx.contains(5) and not idx.contains(10**9)
    assert idx.count(5) == 1 and idx.count(10**9) == 0
    np.testing.assert_allclose(idx.get_vector(7), v[7], rtol=1e-6)
    d = idx.distance_between(3, 4)
    np.testing.assert_allclose(d, ((v[3] - v[4]) ** 2).sum(), rtol=1e-4)
    assert idx.rename(3, 9000)
    assert idx.contains(9000) and not idx.contains(3)
    assert not idx.rename(4, 9000)  # collision refused
    ek = idx.export_keys()
    assert len(ek) == 300 and 9000 in ek.tolist()
    # renamed key is returned by search
    _, got = idx.search(v[3], 1)
    assert got[0, 0] == 9000


def test_cluster_routes_to_upper_nodes(built):
    (idx, v, keys), rng = built
    q = v[:64] + 0.01 * rng.normal(size=(64, v.shape[1])).astype(np.float32)
    ckeys, cscores = idx.cluster(q, level=1)
    levels = np.asarray(idx.graph.levels)
    assert ckeys.shape == (64,) and cscores.shape == (64,)
    # every cluster head must be a live node with level >= 1
    for ck in ckeys.tolist():
        assert ck >= 0
        slot = idx.store._key_to_slot[ck]
        assert levels[slot] >= 1
    assert np.all(np.isfinite(cscores)) and np.all(cscores >= 0)


def test_join_stable_marriage():
    rng = np.random.default_rng(11)
    d, n = 16, 300
    base = rng.normal(size=(n, d)).astype(np.float32)
    a = HNSWIndex(d, HNSWConfig(), capacity=n, build_batch=128)
    b = HNSWIndex(d, HNSWConfig(), capacity=n, build_batch=128)
    a.add(base, np.arange(n))
    # b holds slightly perturbed copies under shifted keys: the true
    # matching is key -> key + 1000
    b.add(base + 0.001 * rng.normal(size=(n, d)).astype(np.float32),
          np.arange(n) + 1000)
    matches = a.join(b, k=8)
    # matching must be injective (stable marriage: one partner each)
    assert len(set(matches.values())) == len(matches)
    correct = sum(1 for ka, kb in matches.items() if kb == ka + 1000)
    assert correct / n >= 0.90, f"{correct}/{n} correct pairs"


def test_join_validates_metric():
    a = HNSWIndex(8, HNSWConfig())
    b = HNSWIndex(8, HNSWConfig(metric=MetricKind.COSINE))
    with pytest.raises(ValueError):
        a.join(b)


def test_bulk_upper_levels_structure():
    """The all-MXU bulk build must produce a coherent hierarchy: every
    level>=1 node has an upper slot and a non-empty level-1 list whose
    entries are themselves nodes, and the MXU-descent table matches."""
    rng = np.random.default_rng(21)
    n, d = 5000, 24
    v = rng.normal(size=(n, d)).astype(np.float32)
    idx = HNSWIndex(d, HNSWConfig(), capacity=n)
    idx.add(v, np.arange(n))  # n >= bulk_threshold -> bulk path
    levels = np.asarray(idx.graph.levels)
    uslot = np.asarray(idx.graph.upper_slot)
    unode = np.asarray(idx.graph.upper_node)
    un = np.asarray(idx.graph.upper_neighbors)
    uppers = np.nonzero(levels >= 1)[0]
    assert len(uppers) > 0
    assert int(idx.graph.max_level) >= 1
    entry = int(idx.graph.entry_node)
    assert levels[entry] == int(idx.graph.max_level)
    for s in uppers.tolist():
        us = uslot[s]
        assert us >= 0 and unode[us] == s
        lvl1 = un[us, 0]
        assert (lvl1 >= 0).sum() > 0, f"node {s} has empty level-1 list"
        tgt = lvl1[lvl1 >= 0]
        assert np.all(levels[tgt] >= 1), "level-1 edge to a base-only node"
        assert not np.any(tgt == s), "self edge"
    # upper vector table used by the MXU descent is aligned with the map
    uv, uvsq, _unode_tbl = idx._upper_vectors()
    uv = np.asarray(uv, np.float32)
    for us in (uslot[uppers[:8]]).tolist():
        node = unode[us]
        np.testing.assert_allclose(
            uv[us, :d], v[node], rtol=2e-2, atol=2e-2)  # bf16 cast


def test_neighborhood_layout_matches_flat_layout():
    """Forced neighborhood (int8 contiguous neighbor rows) traversal must
    reach the same recall class as the flat per-candidate gather path —
    the layouts differ only in memory shape and quantization noise, and
    emitted distances come from the exact f32 rerank either way."""
    rng = np.random.default_rng(11)
    idx, v, keys = build_index(rng, n=3000, d=32)
    q = rng.normal(size=(64, 32)).astype(np.float32)
    flat = FlatIndex(32, MetricKind.L2SQ, capacity=len(v))
    flat.add(v, keys)
    _, want = flat.search(q, 10)

    idx.layout = "flat"
    s_flat, got_flat = idx.search(q, 10, ef=64)
    idx.layout = "neighborhood"
    s_nbr, got_nbr = idx.search(q, 10, ef=64)

    r_flat = recall_at_k(got_flat, want)
    r_nbr = recall_at_k(got_nbr, want)
    assert r_nbr >= r_flat - 0.03, (r_flat, r_nbr)
    # emitted distances are exact f32 for overlapping results
    both = got_flat == got_nbr
    np.testing.assert_allclose(s_nbr[both], s_flat[both], rtol=1e-5)


def test_profiler_trace_smoke(tmp_path):
    """tracing.trace captures an XLA profile around index ops
    (SURVEY §5: profiler hooks alongside the search/build counters)."""
    from duckdb_vss_tpu.utils.tracing import annotate, trace

    rng = np.random.default_rng(2)
    idx, v, keys = build_index(rng, n=512, d=16)
    q = rng.normal(size=(8, 16)).astype(np.float32)
    with trace(str(tmp_path)):
        with annotate("search"):
            idx.search(q, 5, ef=16)
    import glob
    assert glob.glob(str(tmp_path) + "/**/*.pb", recursive=True) \
        or glob.glob(str(tmp_path) + "/**/*.trace*", recursive=True) \
        or glob.glob(str(tmp_path) + "/plugins/**", recursive=True)


def test_incremental_insert_into_bulk_clustered_reachable():
    """Inserts into a bulk-built CLUSTERED index must stay findable:
    the insert-time base beam needs exact (MXU) coarse routing — the
    greedy top-down walk strands a fraction of clustered inserts in the
    wrong region, leaving them with garbage forward edges and no usable
    in-links (measured 0.66 self-recall@1 at 1M x 128 before the fix,
    1.0 after)."""
    rng = np.random.default_rng(5)
    ncl, d, n = 256, 64, 16000
    centers = rng.normal(size=(ncl, d)).astype(np.float32)
    v = (centers[rng.integers(0, ncl, n)]
         + 0.25 * rng.normal(size=(n, d))).astype(np.float32)
    idx = HNSWIndex(d, HNSWConfig(), capacity=n + 2048, build_batch=256)
    idx.add(v, np.arange(n))

    new = (centers[rng.integers(0, ncl, 1024)]
           + 0.25 * rng.normal(size=(1024, d))).astype(np.float32)
    keys = np.arange(10_000_0, 10_000_0 + 1024)
    idx.add(new, keys)
    _, got = idx.search(new[:256], 1, ef=16)
    self_rec = float(np.mean(got[:, 0] == keys[:256]))
    assert self_rec >= 0.97, self_rec


def test_incremental_insert_fused_layout_table_parity():
    """Incremental insertion through the forced neighborhood layout must
    (a) keep inserted nodes findable and (b) leave the incrementally
    row-updated int8 tables EXACTLY equal to a from-scratch rebuild over
    the final graph — the consistency contract of
    graph.update_neighborhood_rows."""
    import jax
    import numpy as np
    from duckdb_vss_tpu.models.graph import make_neighborhood_tables
    from duckdb_vss_tpu.ops.pallas_beam import pack_meta

    rng = np.random.default_rng(9)
    n, n_new, d = 5000, 800, 32
    v = rng.normal(size=(n + n_new, d)).astype(np.float32)
    idx = HNSWIndex(d, HNSWConfig(), capacity=n + 2048, build_batch=128)
    idx.layout = "neighborhood"
    idx.add(v[:n], np.arange(n))  # bulk path (>= bulk_threshold)

    keys = np.arange(100_000, 100_000 + n_new)
    idx.add(v[n:], keys)  # incremental fused path + row updates
    assert idx._nbr_cache is not None

    nv, nsc, nsq, nmeta = idx._nbr_cache
    fv, fsc, fsq = make_neighborhood_tables(
        idx.store._vectors, idx.store._vec_sq, idx.graph.neighbors0)
    fm = jax.jit(pack_meta)(idx.graph.neighbors0, fsc, fsq)
    np.testing.assert_array_equal(np.asarray(nv), np.asarray(fv))
    np.testing.assert_array_equal(np.asarray(nsc), np.asarray(fsc))
    np.testing.assert_array_equal(np.asarray(nsq), np.asarray(fsq))
    np.testing.assert_array_equal(np.asarray(nmeta), np.asarray(fm))

    _, got = idx.search(v[n : n + 128], 1, ef=32)
    self_rec = float(np.mean(got[:, 0] == keys[:128]))
    assert self_rec >= 0.95, self_rec


def test_backlink_cap_pure_incremental_quality():
    """Round-4 advisor: build_backlink_cols=8 was only validated on
    bulk-built (saturated-row) graphs, but usearch attempts a back-edge
    at EVERY forward neighbor and accepts unconditionally into non-full
    rows (index.hpp:3292-3295) — non-full rows are exactly what a
    pure-incremental (from-empty) build has. Build from empty through
    the insert path with the cap and with cap=None (all targets): the
    capped graph's self-recall must clear an absolute bar and stay
    within noise of the uncapped one."""
    rng = np.random.default_rng(11)
    n, d = 3000, 32
    v = rng.normal(size=(n, d)).astype(np.float32)
    keys = np.arange(n, dtype=np.int64)
    rec = {}
    for cols in (4, None):
        idx = HNSWIndex(d, HNSWConfig(), capacity=n, build_batch=128,
                        build_backlink_cols=cols)
        idx.add(v, keys)  # n < bulk_threshold: pure insert path
        _, got = idx.search(v[:256], 1, ef=32)
        rec[cols] = float((got[:, 0] == keys[:256]).mean())
    assert rec[4] >= 0.98, rec
    assert rec[4] >= rec[None] - 0.02, rec
