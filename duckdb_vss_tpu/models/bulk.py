"""Bulk HNSW construction from an exact kNN graph — the MXU path.

The reference has a dedicated bulk-build operator (PhysicalCreateHNSWIndex,
/root/reference/src/hnsw/hnsw_index_physical_create.cpp) that differs from
the incremental insert path. This module is its TPU-native counterpart,
and it plays to the MXU instead of to traversal:

1. exact kNN lists for ALL rows via the streaming blockwise top-k
   (ops/topk.flat_topk): a [QB, D] query block against every [block, D]
   vector block is pure Q·Vᵀ matmul — petaflops of useful work, no
   graph dependencies, embarrassingly parallel;
2. an incremental-insertion "skeleton" over the ~1/M upper-level nodes
   supplies the HNSW hierarchy and long-range highway edges;
3. base-layer neighbor selection: per node, usearch's refine_ diversity
   heuristic over (kNN ∪ reverse-kNN ∪ skeleton edges), batched over
   node chunks, with keepPruned backfill;
4. a label-propagation + bridge-tree connectivity repair guarantees
   reachability from the entry point on clustered data.

Incremental inserts (models/build.insert_batch) remain the path for
post-build mutation, exactly like the reference splits CREATE INDEX from
Append/Insert.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from duckdb_vss_tpu.models.build import _group_ranks, select_diverse
from duckdb_vss_tpu.models.graph import GraphState, L_MAX, UPPER_DIV
from duckdb_vss_tpu.ops.topk import flat_topk
from duckdb_vss_tpu.utils.config import HNSWConfig, MetricKind
from duckdb_vss_tpu.utils.padding import INF_SCORE

KNN_K = 48  # forward kNN candidates per node
REV_R = 16  # reverse-kNN candidates kept per node
RAND_S = 8  # pseudo-random small-world candidates per node


@functools.partial(jax.jit, static_argnames=("k", "metric", "block_n"))
def _knn_block(q_block, slots, vectors, vec_sq, valid, k, metric, block_n):
    """Exact top-(k+1) for one query block, self-match removed."""
    scores, ids = flat_topk(
        q_block, vectors, k + 1, metric, vec_sq=vec_sq, valid=valid,
        block_n=block_n, precision=jax.lax.Precision.DEFAULT)
    self_hit = ids == slots[:, None]
    scores = jnp.where(self_hit, INF_SCORE, scores)
    ids = jnp.where(self_hit, -1, ids)
    neg, pos = lax.top_k(-scores, k)
    return -neg, jnp.take_along_axis(ids, pos, axis=1)


@functools.partial(jax.jit, static_argnames=("m_out", "metric"))
def _prune_chunk(cand_ids, cand_scores, vectors, vec_sq, m_out, metric):
    order = jnp.argsort(cand_scores, axis=1)
    s_ids = jnp.take_along_axis(cand_ids, order, axis=1)
    s_sc = jnp.take_along_axis(cand_scores, order, axis=1)
    s_ids = jnp.where(s_sc < INF_SCORE, s_ids, -1)
    return select_diverse(vectors, vec_sq, s_ids, s_sc, m_out, metric,
                          backfill=True)


@functools.partial(jax.jit, static_argnames=("rev_r",))
def _reverse_candidates(knn_ids, knn_scores, rev_r):
    """[N, K] forward lists -> [N, rev_r] reverse candidates per node.

    For every edge (u -> v) record u as a candidate of v, keeping the
    rev_r closest per target (rank-within-group over the sorted edge
    list — the same machinery as the incremental back-link rounds)."""
    n, kk = knn_ids.shape
    src = jnp.repeat(jnp.arange(n, dtype=jnp.int32), kk)
    tgt = knn_ids.reshape(-1)
    dist = knn_scores.reshape(-1)
    act = tgt >= 0
    ranks = _group_ranks(jnp.where(act, tgt, -1), dist)
    keep = act & (ranks < rev_r)
    out = jnp.full((n, rev_r), -1, jnp.int32)
    row = jnp.where(keep, tgt, jnp.int32(2**30))
    col = jnp.where(keep, ranks, 0)
    return out.at[row, col].set(jnp.where(keep, src, -1), mode="drop")


def bulk_build(
    vectors: jax.Array,  # [cap, D] padded store (first n rows live)
    vec_sq: jax.Array,
    slots: np.ndarray,  # [n] int32 slot ids of the rows to index
    levels: np.ndarray,  # [n] int32 sampled levels
    config: HNSWConfig,
    metric: MetricKind,
    query_block: int = 4096,
    knn_k: int = KNN_K,
    rev_r: int = REV_R,
    prune_chunk: int = 8192,
    host_vectors: np.ndarray | None = None,  # original rows, for repair
) -> GraphState:
    """Build a fresh GraphState over ``slots`` (an empty-graph bulk load).

    Hybrid strategy:
    - phase 0: the ~1/M fraction of nodes with level >= 1 is inserted
      INCREMENTALLY (models/build.insert_batch), producing a proper HNSW
      hierarchy: navigable upper levels plus long-range "highway" base
      edges among the skeleton nodes — the part of graph quality a pure
      kNN construction cannot provide;
    - phase 1: exact kNN lists for all rows via the MXU blockwise sweep;
    - phase 2: per-node diversity prune over (kNN ∪ reverse-kNN ∪ the
      node's phase-0 skeleton edges), with keepPruned backfill;
    - repair: weak-connectivity label propagation + bridge tree as a
      deterministic safety net for clustered data.
    """
    from duckdb_vss_tpu.models.build import insert_batch
    from duckdb_vss_tpu.models.graph import make_graph

    cap = vectors.shape[0]
    n = len(slots)
    m, m0 = config.m, config.m0
    levels = np.minimum(np.asarray(levels, np.int32), L_MAX)
    slots = np.asarray(slots, np.int32)
    valid = jnp.zeros((cap,), jnp.bool_).at[jnp.asarray(slots)].set(True)

    # ---- 0. incremental skeleton over level>=1 nodes ----------------
    state = make_graph(cap, m, m0)
    upper_mask = levels >= 1
    up_slots = slots[upper_mask]
    up_levels = levels[upper_mask]
    bb = 256
    for off in range(0, len(up_slots), bb):
        batch_slots = np.full((bb,), -1, np.int32)
        batch_levels = np.zeros((bb,), np.int32)
        chunk = up_slots[off : off + bb]
        batch_slots[: len(chunk)] = chunk
        batch_levels[: len(chunk)] = up_levels[off : off + bb]
        state, _ = insert_batch(
            state, vectors, vec_sq, jnp.asarray(batch_slots),
            jnp.asarray(batch_levels), metric, m, m0,
            config.ef_construction, expand=4)
    skeleton_base = state.neighbors0  # highway edges among skeleton nodes

    # base-only nodes get level 0 in the final state
    lv_of_slot = np.full((cap,), -1, np.int32)
    lv_of_slot[slots] = levels
    state = state._replace(levels=jnp.asarray(lv_of_slot))
    if len(up_slots) == 0 and n:
        state = state._replace(entry_node=jnp.int32(int(slots[0])),
                               max_level=jnp.int32(0))

    # ---- 1. exact kNN sweep (MXU) -----------------------------------
    qb = query_block
    knn_ids = np.full((cap, knn_k), -1, np.int32)
    knn_sc = np.full((cap, knn_k), INF_SCORE, np.float32)
    block_n = min(16384, cap)
    slots_j = jnp.asarray(slots, jnp.int32)
    for off in range(0, n, qb):
        chunk = slots_j[off : off + qb]
        pad = qb - chunk.shape[0]
        if pad:
            chunk = jnp.concatenate([chunk, jnp.full((pad,), -1, jnp.int32)])
        q_block = jnp.take(vectors, jnp.maximum(chunk, 0), axis=0)
        sc, ids = _knn_block(q_block, chunk, vectors, vec_sq, valid,
                             knn_k, metric, block_n)
        sc_np, ids_np = jax.device_get((sc, ids))
        take = min(qb, n - off)
        knn_ids[slots[off : off + take]] = ids_np[:take]
        knn_sc[slots[off : off + take]] = sc_np[:take]
    knn_ids_j = jnp.asarray(knn_ids)
    knn_sc_j = jnp.asarray(knn_sc)

    # ---- 2. reverse candidates + diversity prune to M0 --------------
    rev = _reverse_candidates(knn_ids_j, knn_sc_j, rev_r)  # [cap, rev_r]
    neighbors0 = jnp.full((cap, m0), -1, jnp.int32)
    for off in range(0, n, prune_chunk):
        chunk = slots_j[off : off + prune_chunk]
        pad = prune_chunk - chunk.shape[0]
        if pad:
            chunk = jnp.concatenate([chunk, jnp.full((pad,), -1, jnp.int32)])
        neighbors0 = _bulk_prune_step(
            neighbors0, knn_ids_j, knn_sc_j, rev, skeleton_base,
            vectors, vec_sq, chunk, slots_j, m0, metric)

    # ---- 2.5 connectivity repair ------------------------------------
    labels = _component_labels(neighbors0, valid)
    labels_np = np.asarray(jax.device_get(labels))
    if host_vectors is not None:
        neighbors0, _n_bridges = _bridge_components(
            neighbors0, labels_np, np.asarray(host_vectors, np.float32),
            np.asarray(slots))

    return state._replace(neighbors0=neighbors0)


@functools.partial(jax.jit, static_argnames=("m0", "metric"))
def _bulk_prune_step(neighbors0, knn_ids, knn_sc, rev, skeleton_base,
                     vectors, vec_sq, chunk_slots, live_slots, m0, metric):
    safe = jnp.maximum(chunk_slots, 0)
    fwd_i = jnp.take(knn_ids, safe, axis=0)  # [CH, K]
    fwd_s = jnp.take(knn_sc, safe, axis=0)
    rev_i = jnp.take(rev, safe, axis=0)  # [CH, R]
    skel_i = jnp.take(skeleton_base, safe, axis=0)  # [CH, M0]
    # deterministic pseudo-random long-range candidates (small-world
    # links): the diversity heuristic keeps the few that survive, giving
    # every region an escape route even without skeleton coverage
    n_live = live_slots.shape[0]
    j = jnp.arange(RAND_S, dtype=jnp.uint32)[None, :]
    h = (safe.astype(jnp.uint32)[:, None] * jnp.uint32(2654435761)
         + j * jnp.uint32(40503)) % jnp.uint32(n_live)
    rand_i = jnp.take(live_slots, h.astype(jnp.int32), axis=0)
    extra_i = jnp.concatenate([rev_i, skel_i, rand_i], axis=1)
    # drop extras already in the forward list, duplicated, or self
    dup_fwd = jnp.any(extra_i[:, :, None] == fwd_i[:, None, :], axis=2)
    dup_self = jnp.triu(
        extra_i[:, :, None] == extra_i[:, None, :], k=1).any(axis=1)
    self_hit = extra_i == chunk_slots[:, None]
    extra_i = jnp.where(dup_fwd | dup_self | self_hit, -1, extra_i)
    q = jnp.take(vectors, safe, axis=0)
    q_sq = jnp.take(vec_sq, safe, axis=0)
    from duckdb_vss_tpu.models.graph import gather_scores

    extra_s = gather_scores(vectors, vec_sq, extra_i, q, q_sq, metric)
    extra_s = jnp.where(extra_i >= 0, extra_s, INF_SCORE)
    cand_i = jnp.concatenate([fwd_i, extra_i], axis=1)
    cand_s = jnp.concatenate([fwd_s, extra_s], axis=1)
    cand_i = jnp.where(chunk_slots[:, None] >= 0, cand_i, -1)
    sel = _prune_chunk(cand_i, cand_s, vectors, vec_sq, m0, metric)
    rows = jnp.where(chunk_slots >= 0, chunk_slots, jnp.int32(2**30))
    return neighbors0.at[rows].set(sel, mode="drop")


# ---------------------------------------------------------------------------
# connectivity repair: kNN graphs on clustered data form islands; HNSW
# requires reachability from the entry point. Label propagation finds the
# weakly-connected components on-device; a Prim-style tree over component
# representatives adds bidirectional bridge edges.
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("max_iters",))
def _component_labels(neighbors, node_mask, max_iters=128):
    """Weakly-connected component labels via min-label propagation.

    neighbors [N, M] (-1 pad), node_mask [N]. Returns labels [N] (min slot
    id in the component; 2^30 for masked-out rows)."""
    n = neighbors.shape[0]
    big = jnp.int32(2**30)
    init = jnp.where(node_mask, jnp.arange(n, dtype=jnp.int32), big)
    safe_nbrs = jnp.maximum(neighbors, 0)
    has = neighbors >= 0

    def step(carry):
        labels, _, it = carry
        nbr_lab = jnp.where(has, jnp.take(labels, safe_nbrs), big)
        # forward: node takes min over out-neighbor labels
        fwd = jnp.minimum(labels, jnp.min(nbr_lab, axis=1))
        # reverse: scatter node label into its out-neighbors
        row_lab = jnp.broadcast_to(fwd[:, None], neighbors.shape)
        new = fwd.at[jnp.where(has, safe_nbrs, n)].min(
            jnp.where(has, row_lab, big), mode="drop")
        changed = jnp.any(new != labels)
        return new, changed, it + 1

    labels, _, _ = lax.while_loop(
        lambda c: c[1] & (c[2] < max_iters), step,
        (init, jnp.bool_(True), jnp.int32(0)))
    return labels


def _bridge_components(neighbors0, labels_np, host_vecs, slots):
    """Add bidirectional bridge edges so all components are reachable.

    labels_np [cap], host_vecs [n, D] (caller's original rows, aligned with
    slots). Returns updated neighbors0 and the number of bridges added."""
    live = labels_np[slots]
    comps, inv, counts = np.unique(live, return_inverse=True,
                                   return_counts=True)
    n_comp = len(comps)
    if n_comp <= 1:
        return neighbors0, 0
    # representative of each component: member closest to the comp mean
    reps = np.empty(n_comp, np.int64)  # index into slots
    rep_vecs = np.empty((n_comp, host_vecs.shape[1]), np.float32)
    for c in range(n_comp):
        members = np.nonzero(inv == c)[0]
        mv = host_vecs[members]
        mean = mv.mean(axis=0)
        best = members[np.argmin(((mv - mean) ** 2).sum(1))]
        reps[c] = best
        rep_vecs[c] = host_vecs[best]
    # Prim's tree over representatives, rooted at the largest component
    d2 = ((rep_vecs[:, None, :] - rep_vecs[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    in_tree = np.zeros(n_comp, bool)
    in_tree[np.argmax(counts)] = True
    bridges = []
    for _ in range(n_comp - 1):
        sub = np.where(in_tree[:, None] & ~in_tree[None, :], d2, np.inf)
        a, b = np.unravel_index(np.argmin(sub), sub.shape)
        bridges.append((int(slots[reps[a]]), int(slots[reps[b]])))
        in_tree[b] = True
    # install bridges bidirectionally, replacing the last (least useful)
    # slot of each endpoint's list
    rows = np.array([x for ab in bridges for x in ab], np.int64)
    vals = np.array([x for a, b in bridges for x in (b, a)], np.int64)
    m0 = neighbors0.shape[1]
    neighbors0 = neighbors0.at[jnp.asarray(rows, jnp.int32), m0 - 1].set(
        jnp.asarray(vals, jnp.int32))
    return neighbors0, len(bridges)
