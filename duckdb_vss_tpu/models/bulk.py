"""Bulk HNSW construction from an exact kNN graph — the MXU path.

The reference has a dedicated bulk-build operator (PhysicalCreateHNSWIndex,
/root/reference/src/hnsw/hnsw_index_physical_create.cpp) that differs from
the incremental insert path. This module is its TPU-native counterpart,
and it plays to the MXU instead of to traversal:

1. exact kNN lists for ALL rows via the streaming blockwise top-k
   (ops/topk.flat_topk): a [QB, D] query block against every [block, D]
   vector block is pure Q·Vᵀ matmul — petaflops of useful work, no
   graph dependencies, embarrassingly parallel;
2. every upper level is itself an exact-kNN + diversity-prune graph over
   its (geometrically shrinking) node subset (_build_upper_levels) — the
   hierarchy costs a few extra matmuls, not serialized insertion;
3. base-layer neighbor selection: per node, usearch's refine_ diversity
   heuristic over (kNN ∪ reverse-kNN ∪ level-1 highway edges), batched
   over node chunks, with keepPruned backfill;
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

# IVF-pruned kNN sweep (phase 1) — kicks in above this row count. Below
# it the exact O(N^2) blockwise sweep is cheap enough.
IVF_MIN_N = 131_072
# large upper levels route through the same sweep (level 1 holds ~n/16
# nodes, so this fires at ~500k+ rows)
IVF_LEVEL_MIN_N = int(__import__("os").environ.get(
    "DVT_IVF_LEVEL_MIN", 32_768))
IVF_AVG_CLUSTER = 2048  # target mean cluster size
# candidate rows scored per query chunk: 48k ≈ 24 probed clusters.
# Measured at 250k x 128 clustered, ef=16 search recall@10 by budget:
# 32k -> 0.9746, 48k -> 0.9757 (exact sweep: 0.9795); phase-1 cost
# grows ~linearly and stays a small slice of the build.
IVF_CAND_MAX = 49_152
IVF_QB = 4096  # query rows per chunk (sorted-order, cluster-coherent)
IVF_KMEANS_ITERS = 4
IVF_ASSIGN_CHUNK = 65_536
# reverse-candidate source cap (see bulk_build phase 2): above this many
# flattened forward edges, only the closest REV_SRC_COLS ranks per node
# feed the reverse lists
REV_SRC_MAX = 128 * 1024 * 1024
REV_SRC_COLS = 12


@functools.partial(jax.jit, static_argnames=("k", "metric", "block_n"))
def _knn_block(q_block, slots, vectors, vec_sq, valid, k, metric, block_n):
    """Top-(k+1) for one query block, self-match removed. Per-block
    selection uses the TPU's approximate top-k (see flat_topk approx) —
    candidates feed graph construction, not user-facing results."""
    scores, ids = flat_topk(
        q_block, vectors, k + 1, metric, vec_sq=vec_sq, valid=valid,
        block_n=block_n, precision=jax.lax.Precision.DEFAULT, approx=True)
    self_hit = ids == slots[:, None]
    scores = jnp.where(self_hit, INF_SCORE, scores)
    ids = jnp.where(self_hit, -1, ids)
    neg, pos = lax.top_k(-scores, k)
    return -neg, jnp.take_along_axis(ids, pos, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("k_l", "m", "metric", "block_n", "qb", "n_chunks"))
def _upper_level_build(vectors, vec_sq, nodes_j, n_l, lv, upper_slot_j,
                       un, k_l, m, metric, block_n, qb, n_chunks):
    """One whole upper level inside a single jit: kNN + diversity prune
    for every qb-chunk of the level's node set, scattering forward lists
    into the level's column window of the packed ``un`` table
    (GraphState.upper_neighbors layout). A fori_loop carries the chunk
    offset so no shape or constant varies per chunk — one compile per
    cap_s tier instead of per (level, offset) eager dispatch."""
    cap_s = nodes_j.shape[0]
    row_live = jnp.arange(cap_s, dtype=jnp.int32) < n_l
    sub = jnp.where(row_live[:, None],
                    jnp.take(vectors, nodes_j, axis=0), 0.0)
    sub_sq = jnp.take(vec_sq, nodes_j) * row_live
    sub_bf = sub.astype(jnp.bfloat16)
    lvl_cols = (lv - 1) * m + jnp.arange(m, dtype=jnp.int32)

    def chunk_body(ci, un):
        pos = ci * qb + jnp.arange(qb, dtype=jnp.int32)
        posm = jnp.where(pos < n_l, pos, -1)
        q_block = jnp.take(sub, jnp.maximum(posm, 0), axis=0)
        sc, ids = _knn_block(q_block, posm, sub_bf, sub_sq, row_live,
                             k_l, metric, block_n)
        sel = _prune_chunk(ids, sc, sub, sub_sq, m, metric)
        sel_global = jnp.where(
            sel >= 0, jnp.take(nodes_j, jnp.maximum(sel, 0)), -1)
        chunk_nodes = jnp.where(
            posm >= 0, jnp.take(nodes_j, jnp.maximum(posm, 0)), -1)
        us_rows = jnp.where(
            chunk_nodes >= 0,
            jnp.take(upper_slot_j, jnp.maximum(chunk_nodes, 0)), -1)
        us_rows = jnp.where(us_rows >= 0, us_rows, jnp.int32(2**30))
        return un.at[us_rows[:, None], lvl_cols[None, :]].set(
            sel_global, mode="drop")

    return lax.fori_loop(0, n_chunks, chunk_body, un)


@functools.partial(
    jax.jit,
    static_argnames=("m", "metric", "qb", "n_chunks"))
def _upper_level_from_knn(vectors, vec_sq, nodes_j, n_l, lv, upper_slot_j,
                          knn_ids, knn_sc, un, m, metric, qb, n_chunks):
    """Scatter an upper level's forward lists from precomputed kNN
    tables ([cap_s, K] in the level's LOCAL row order, holding global
    slot ids — the IVF sweep's output compacted to the node subset):
    per chunk, diversity-prune each node's kNN list to m and write it
    into the level's column window of ``un``."""
    lvl_cols = (lv - 1) * m + jnp.arange(m, dtype=jnp.int32)

    def chunk_body(ci, un):
        pos = ci * qb + jnp.arange(qb, dtype=jnp.int32)
        posm = jnp.where(pos < n_l, pos, -1)
        chunk_nodes = jnp.where(
            posm >= 0, jnp.take(nodes_j, jnp.maximum(posm, 0)), -1)
        ids = jnp.take(knn_ids, jnp.maximum(posm, 0), axis=0)
        sc = jnp.take(knn_sc, jnp.maximum(posm, 0), axis=0)
        ids = jnp.where(chunk_nodes[:, None] >= 0, ids, -1)
        sc = jnp.where(ids >= 0, sc, INF_SCORE)
        sel = _prune_chunk(ids, sc, vectors, vec_sq, m, metric)
        us_rows = jnp.where(
            chunk_nodes >= 0,
            jnp.take(upper_slot_j, jnp.maximum(chunk_nodes, 0)), -1)
        us_rows = jnp.where(us_rows >= 0, us_rows, jnp.int32(2**30))
        return un.at[us_rows[:, None], lvl_cols[None, :]].set(
            sel, mode="drop")

    return lax.fori_loop(0, n_chunks, chunk_body, un)


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
    list — the same machinery as the incremental back-link rounds).

    This single-program variant argsorts the whole flattened edge list
    (~6 int32/f32 temporaries of N*K elements) — fine up to ~32M edges;
    the 10M-row build routes through _reverse_candidates_chunked."""
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


# chunked reverse pass (config-5 scale): edges processed per chunk of
# source rows, per-target top-rev_r maintained in a running [cap, rev_r]
# table. Per-chunk sort temporaries are bounded by REV_EDGE_CHUNK edges
# instead of the full cap*K list whose global argsort RESOURCE_EXHAUSTED
# the 10M build in round 3 (63M edges, ~3 GB of sort workspace on top of
# ~8 GB resident tables).
REV_EDGE_CHUNK = 8 * 1024 * 1024
REV_MERGE_SEG = 1 << 20  # rows per merge segment (bounds [seg, 2R] temps)


def _pow2_divisor(cap: int, target: int, base: int = 16384) -> int:
    """Largest base*2^j <= target that divides cap (0 if none).

    Store capacities are multiples of the 16384 block size (FlatIndex
    rounds up), so a power-of-two multiple of the block divides cap."""
    if cap % base != 0:
        return 0
    d = base
    while d * 2 <= min(target, cap) and cap % (d * 2) == 0:
        d *= 2
    return d if d <= cap else 0


@functools.partial(
    jax.jit, static_argnames=("rev_r", "rows_chunk", "n_cols", "seg"),
    donate_argnums=(3, 4))
def _reverse_chunk_step(knn_ids, knn_sc, off, best_ids, best_sc,
                        rev_r, rows_chunk, n_cols, seg):
    """One source-row chunk of the chunked reverse pass: rank the chunk's
    edges within their target groups, scatter the per-chunk winners into
    a [cap, rev_r] chunk table, then merge it into the running tables
    segment-by-segment (a target's global top-rev_r is a subset of the
    union of its per-chunk top-rev_r's, so the merge is exact).

    The running tables are DONATED: without donation every step holds
    input + output copies of both [cap, rev_r] tables (round 4's first
    10M attempt OOMed here with ~8 GB of build state resident). All
    steps share one executable, so the donation compile-cache penalty
    is paid once."""
    cap, kk = knn_ids.shape
    ids_c = lax.dynamic_slice(knn_ids, (off, 0), (rows_chunk, kk))[:, :n_cols]
    sc_c = lax.dynamic_slice(knn_sc, (off, 0), (rows_chunk, kk))[:, :n_cols]
    src = off + jnp.arange(rows_chunk, dtype=jnp.int32)
    tgt = ids_c.reshape(-1)
    dist = sc_c.reshape(-1)
    srcf = jnp.repeat(src, n_cols)
    act = tgt >= 0
    ranks = _group_ranks(jnp.where(act, tgt, -1), dist)
    keep = act & (ranks < rev_r)
    row = jnp.where(keep, tgt, jnp.int32(2**30))
    col = jnp.where(keep, ranks, 0)
    chunk_ids = jnp.full((cap, rev_r), -1, jnp.int32).at[row, col].set(
        jnp.where(keep, srcf, -1), mode="drop")
    chunk_sc = jnp.full((cap, rev_r), INF_SCORE, jnp.float32).at[
        row, col].set(jnp.where(keep, dist, INF_SCORE), mode="drop")

    def merge_seg(si, carry):
        b_ids, b_sc = carry
        start = si * seg
        cur_i = lax.dynamic_slice(b_ids, (start, 0), (seg, rev_r))
        cur_s = lax.dynamic_slice(b_sc, (start, 0), (seg, rev_r))
        new_i = lax.dynamic_slice(chunk_ids, (start, 0), (seg, rev_r))
        new_s = lax.dynamic_slice(chunk_sc, (start, 0), (seg, rev_r))
        cat_i = jnp.concatenate([cur_i, new_i], axis=1)
        cat_s = jnp.concatenate([cur_s, new_s], axis=1)
        order = jnp.argsort(cat_s, axis=1)
        m_i = jnp.take_along_axis(cat_i, order, axis=1)[:, :rev_r]
        m_s = jnp.take_along_axis(cat_s, order, axis=1)[:, :rev_r]
        m_i = jnp.where(m_s < INF_SCORE, m_i, -1)
        return (lax.dynamic_update_slice(b_ids, m_i, (start, 0)),
                lax.dynamic_update_slice(b_sc, m_s, (start, 0)))

    return lax.fori_loop(0, cap // seg, merge_seg, (best_ids, best_sc))


def _reverse_candidates_chunked(knn_ids, knn_sc, rev_r, n_cols):
    """Chunked-edge-list variant of _reverse_candidates (same result:
    per-target rev_r closest sources, closest first, -1 padded)."""
    cap = knn_ids.shape[0]
    rows_target = max(16384, REV_EDGE_CHUNK // max(n_cols, 1))
    rows_chunk = _pow2_divisor(cap, rows_target)
    seg = _pow2_divisor(cap, REV_MERGE_SEG)
    if rows_chunk == 0 or seg == 0:  # non-block-rounded capacity
        return _reverse_candidates(
            knn_ids[:, :n_cols], knn_sc[:, :n_cols], rev_r)
    best_ids = jnp.full((cap, rev_r), -1, jnp.int32)
    best_sc = jnp.full((cap, rev_r), INF_SCORE, jnp.float32)
    for off in range(0, cap, rows_chunk):
        best_ids, best_sc = _reverse_chunk_step(
            knn_ids, knn_sc, jnp.int32(off), best_ids, best_sc,
            rev_r, rows_chunk, n_cols, seg)
        # drain EVERY step: the tables are donated (updated in place),
        # but each enqueued step still pins its per-chunk scatter tables
        # and sort temporaries until it runs (see _refine_knn)
        jax.device_get(best_ids[0, 0])
    del best_sc  # the prune step rescores candidates itself
    return best_ids


# ---------------------------------------------------------------------------
# IVF-pruned kNN sweep. The exact phase-1 sweep scores every query chunk
# against all N rows; its wall-clock bound is the per-block top-k over
# [QB, N] scores, not the matmul. Above IVF_MIN_N rows we instead k-means
# the store (a few chunked assign/update passes — pure MXU), sort rows by
# cluster, and score each sorted query chunk only against the members of
# its clusters' nearest ~IVF_CAND_MAX/avg_cluster clusters. Total selection
# work drops ~30x at 1M rows. Candidates feed graph construction (which
# already tolerates approx_max_k slack); user-facing search is untouched.
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("normalize",))
def _kmeans_pass(vectors, vec_sq, slot_chunks, centers, normalize):
    """One Lloyd iteration over slot chunks: assign + accumulate.

    slot_chunks [n_chunks, AB] (-1 pad). Returns (new_centers, asg
    [n_chunks*AB], counts [C]). Clustering always runs in l2 space
    (cosine rows are pre-normalized) — a routing heuristic, not a result.
    """
    c, d = centers.shape
    c_bf = centers.astype(jnp.bfloat16)
    c_sq = jnp.sum(centers * centers, axis=1)

    def step(carry, sl):
        sums, counts = carry
        x = jnp.take(vectors, jnp.maximum(sl, 0), axis=0)
        if normalize:
            sq = jnp.take(vec_sq, jnp.maximum(sl, 0))
            x = x * lax.rsqrt(jnp.maximum(sq, 1e-30))[:, None]
        dots = lax.dot_general(
            x.astype(jnp.bfloat16), c_bf,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        d2 = c_sq[None, :] - 2.0 * dots
        asg = jnp.argmin(d2, axis=1).astype(jnp.int32)
        live = sl >= 0
        row = jnp.where(live, asg, c)  # drop pads
        # f32 accumulation regardless of store scalar_kind
        x32 = x.astype(jnp.float32)
        sums = sums.at[row].add(
            jnp.where(live[:, None], x32, 0.0), mode="drop")
        counts = counts.at[row].add(live.astype(jnp.int32), mode="drop")
        return (sums, counts), asg

    (sums, counts), asg = lax.scan(
        step, (jnp.zeros((c, d), jnp.float32), jnp.zeros((c,), jnp.int32)),
        slot_chunks)
    new_centers = jnp.where(
        (counts > 0)[:, None], sums / jnp.maximum(counts, 1)[:, None],
        centers)
    return new_centers, asg.reshape(-1), counts


# neighbors-of-neighbors refinement (see bulk_build phase 1.5): each
# node is rescored against the kNN lists of its REFINE_J closest current
# neighbors — J*K candidates per node, one chunked gather + matmul.
REFINE_J = 8


def _refine_seg_compute_impl(vectors_bf, vec_sq, knn_ids, knn_sc,
                             sl_seg, qb, metric):
    """Refined top-K lists for one SEGMENT of rows, position-indexed.

    Reads the full [cap, K] tables gather-only (no carry, no donation —
    a loop-carried copy of the 10M tables was 3x 3.2 GB and OOMed; the
    donated variant crashed the TPU worker outright). Output is a dense
    [seg_rows, K] pair written with contiguous dynamic_update_slice
    rows; the caller scatters it back in a separate tiny program."""
    cap, kk = knn_ids.shape
    j = min(REFINE_J, kk)
    s_rows = sl_seg.shape[0]
    n_chunks = s_rows // qb

    def chunk_body(ci, out):
        out_ids, out_sc = out
        sl = lax.dynamic_slice(sl_seg, (ci * qb,), (qb,))
        safe = jnp.maximum(sl, 0)
        # candidates: own list ∪ lists of the j closest neighbors
        own_ids = jnp.take(knn_ids, safe, axis=0)  # [qb, K]
        hop = jnp.take(knn_ids, jnp.maximum(own_ids[:, :j], 0),
                       axis=0)  # [qb, j, K]
        hop = jnp.where((own_ids[:, :j] >= 0)[..., None], hop, -1)
        cand = jnp.concatenate([own_ids, hop.reshape(qb, j * kk)], axis=1)
        # drop self and duplicates (selection below is order-free)
        cand = jnp.where(cand == sl[:, None], -1, cand)
        c_sorted = jnp.sort(cand, axis=1)
        dup = jnp.concatenate(
            [jnp.zeros((qb, 1), jnp.bool_),
             c_sorted[:, 1:] == c_sorted[:, :-1]], axis=1)
        c_sorted = jnp.where(dup, -1, c_sorted)
        # score the deduped set (pads score INF)
        q = jnp.take(vectors_bf, safe, axis=0)
        q_sq = jnp.take(vec_sq, safe)
        cvec = jnp.take(vectors_bf, jnp.maximum(c_sorted, 0),
                        axis=0)  # [qb, C, D]
        dot = lax.dot_general(
            cvec, q, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # [qb, C]
        c_sq = jnp.take(vec_sq, jnp.maximum(c_sorted, 0))
        if metric == MetricKind.IP:
            sc = 1.0 - dot
        elif metric == MetricKind.L2SQ:
            sc = jnp.maximum(q_sq[:, None] - 2.0 * dot + c_sq, 0.0)
        else:  # cosine (zero-norm rows score 1, matching score_matrix)
            denom = jnp.sqrt(jnp.maximum(q_sq[:, None] * c_sq, 1e-30))
            sc = jnp.where((q_sq[:, None] <= 0) | (c_sq <= 0), 1.0,
                           1.0 - dot / denom)
        sc = jnp.where((c_sorted >= 0) & (sl[:, None] >= 0), sc, INF_SCORE)
        # own list is INSIDE cand, so top-K over cand can only improve
        neg, pos = lax.top_k(-sc, kk)
        new_sc = -neg
        new_ids = jnp.take_along_axis(c_sorted, pos, axis=1)
        new_ids = jnp.where(new_sc < INF_SCORE, new_ids, -1)
        out_ids = lax.dynamic_update_slice(out_ids, new_ids, (ci * qb, 0))
        out_sc = lax.dynamic_update_slice(out_sc, new_sc, (ci * qb, 0))
        return out_ids, out_sc

    init = (jnp.full((s_rows, kk), -1, jnp.int32),
            jnp.full((s_rows, kk), INF_SCORE, jnp.float32))
    return lax.fori_loop(0, n_chunks, chunk_body, init)


_refine_seg_compute = functools.partial(
    jax.jit, static_argnames=("qb", "metric"))(_refine_seg_compute_impl)


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _refine_seg_scatter(knn_ids, knn_sc, sl_seg, upd_ids, upd_sc):
    """Donated scatter: the [cap, K] tables update IN PLACE. Without
    donation each segment's scatter materialized fresh 10M-scale tables
    while the old pair was still live (2x 3.2 GB transient at K=32) —
    one of the two round-3 phase-1.5 OOM causes. Donation skips the
    persistent compile cache on this backend, but this program is a
    trivial scatter (sub-second compile)."""
    rows = jnp.where(sl_seg >= 0, sl_seg, jnp.int32(2**30))
    return (knn_ids.at[rows].set(upd_ids, mode="drop"),
            knn_sc.at[rows].set(upd_sc, mode="drop"))


# rows per refinement segment: bounds the dense update buffers (and the
# scatter program's working set) independently of cap
REFINE_SEG_ROWS = 2 * 1024 * 1024


def _refine_knn(vectors_bf, vec_sq, knn_ids, knn_sc, slots_j, qb, metric):
    n = slots_j.shape[0]
    seg = min(REFINE_SEG_ROWS, -(-n // qb) * qb)
    slots_np = np.asarray(slots_j)
    for off in range(0, n, seg):
        chunk = slots_np[off : off + seg]
        sl_seg = np.full((seg,), -1, np.int32)
        sl_seg[: len(chunk)] = chunk
        sl_j = jnp.asarray(sl_seg)
        upd_ids, upd_sc = _refine_seg_compute(
            vectors_bf, vec_sq, knn_ids, knn_sc, sl_j, qb, metric)
        # scatter before the next segment (Gauss-Seidel: later segments
        # see earlier refinements, same as the reference NN-descent)
        knn_ids, knn_sc = _refine_seg_scatter(
            knn_ids, knn_sc, sl_j, upd_ids, upd_sc)
        # drain the dispatch queue: every enqueued segment pins fresh
        # [cap, K] output tables (3.2 GB each at 10M rows) until it
        # runs — without the barrier the backlog alone exhausts HBM
        jax.device_get(knn_ids[0, 0])
    return knn_ids, knn_sc


@functools.partial(jax.jit, static_argnames=("cap", "k", "metric"))
def _ivf_knn_scan(q_slot_chunks, cand_slot_chunks, vectors, vectors_bf,
                  vec_sq, cap, k, metric):
    """Score every query chunk against its candidate slots; scatter the
    per-row top-k (self removed) into [cap, k] tables on device."""
    from duckdb_vss_tpu.ops.distance import score_matrix

    def step(carry, xs):
        knn_ids, knn_sc = carry
        q_slots, cand_slots = xs
        q = jnp.take(vectors, jnp.maximum(q_slots, 0), axis=0)
        q_sq = jnp.take(vec_sq, jnp.maximum(q_slots, 0))
        cand = jnp.take(vectors_bf, jnp.maximum(cand_slots, 0), axis=0)
        cand_sq = jnp.take(vec_sq, jnp.maximum(cand_slots, 0))
        s = score_matrix(q.astype(vectors_bf.dtype), cand, metric,
                         vec_sq=cand_sq, query_sq=q_sq,
                         precision=lax.Precision.DEFAULT)
        s = jnp.where((cand_slots >= 0)[None, :], s, INF_SCORE)
        neg, pos = lax.approx_max_k(-s, k + 1, recall_target=0.99)
        ids = jnp.take(cand_slots, pos.astype(jnp.int32))
        sc = -neg
        self_hit = ids == q_slots[:, None]
        sc = jnp.where(self_hit, INF_SCORE, sc)
        ids = jnp.where(sc < INF_SCORE, ids, -1)
        neg2, p2 = lax.top_k(-sc, k)
        sc_k = -neg2
        ids_k = jnp.take_along_axis(ids, p2, axis=1)
        rows = jnp.where(q_slots >= 0, q_slots, jnp.int32(2**30))
        knn_ids = knn_ids.at[rows].set(ids_k, mode="drop")
        knn_sc = knn_sc.at[rows].set(sc_k, mode="drop")
        return (knn_ids, knn_sc), None

    init = (jnp.full((cap, k), -1, jnp.int32),
            jnp.full((cap, k), INF_SCORE, jnp.float32))
    (knn_ids, knn_sc), _ = lax.scan(
        step, init, (q_slot_chunks, cand_slot_chunks))
    return knn_ids, knn_sc


def _ivf_candidates(asg, slots, centers, qb, cand_max):
    """Host-side probe assembly. Rows sorted by cluster; each qb-chunk of
    sorted rows gets the members of the clusters nearest to its present
    clusters (full clusters, nearest-first) up to cand_max slots.

    Returns (q_slot_chunks [nc, qb], cand_slot_chunks [nc, cand_max]).
    """
    n = len(slots)
    c = len(centers)
    order = np.argsort(asg, kind="stable")
    slots_sorted = slots[order]
    asg_sorted = asg[order]
    counts = np.bincount(asg, minlength=c)
    starts = np.zeros(c + 1, np.int64)
    starts[1:] = np.cumsum(counts)
    c_sq = (centers * centers).sum(1)
    cd = c_sq[:, None] - 2.0 * (centers @ centers.T) + c_sq[None, :]
    nc = -(-n // qb)
    q_chunks = np.full((nc, qb), -1, np.int32)
    cand = np.full((nc, cand_max), -1, np.int32)
    for ci in range(nc):
        lo, hi = ci * qb, min(n, (ci + 1) * qb)
        q_chunks[ci, : hi - lo] = slots_sorted[lo:hi]
        c_lo, c_hi = int(asg_sorted[lo]), int(asg_sorted[hi - 1])
        d_min = cd[c_lo : c_hi + 1].min(axis=0)  # [C]
        near = np.argsort(d_min, kind="stable")
        fill = 0
        for cc in near:
            s, e = int(starts[cc]), int(starts[cc + 1])
            take = min(e - s, cand_max - fill)
            if take > 0:
                cand[ci, fill : fill + take] = slots_sorted[s : s + take]
                fill += take
            if fill >= cand_max:
                break
    return q_chunks, cand


def _ivf_knn_sweep(vectors, vectors_bf, vec_sq, slots, knn_k, metric):
    """IVF-pruned kNN lists for all rows: (knn_ids, knn_sc) [cap, K] on
    device. See the section comment above."""
    n = len(slots)
    cap = vectors.shape[0]
    target = max(1, n // IVF_AVG_CLUSTER)
    c = int(np.clip(1 << int(round(np.log2(target))), 64, 2048))
    # Cluster in a space where proximity predicts good candidates under
    # the *index* metric (clustering is routing only; candidate scoring
    # in _ivf_knn_scan uses the real metric). For IP, raw-L2 clusters
    # are a poor proxy on variable-norm data — a high-norm row far from
    # the origin never lands near a low-norm query's cluster even when
    # aligned — so cluster directions (spherical k-means), same as
    # cosine. Norm extremes within a direction share a cluster, so the
    # IP-best high-norm rows are probed.
    normalize = metric in (MetricKind.COSINE, MetricKind.IP)
    ab = IVF_ASSIGN_CHUNK
    n_pad = -(-n // ab) * ab
    slot_chunks = np.full((n_pad,), -1, np.int32)
    slot_chunks[:n] = slots
    slot_chunks_j = jnp.asarray(slot_chunks.reshape(-1, ab))
    init_idx = np.linspace(0, n - 1, c).astype(np.int64)
    centers = jnp.take(vectors, jnp.asarray(slots[init_idx]),
                       axis=0).astype(jnp.float32)
    if normalize:
        csq = jnp.sum(centers * centers, axis=1)
        centers = centers * jax.lax.rsqrt(
            jnp.maximum(csq, 1e-30))[:, None]
    for _ in range(IVF_KMEANS_ITERS):
        centers, _asg, _counts = _kmeans_pass(
            vectors, vec_sq, slot_chunks_j, centers, normalize)
    # one final assignment-only pass so the probe lists are built against
    # the same centers _ivf_candidates ranks with (the in-loop asg is
    # computed against the pre-update centers)
    _, asg, _counts = _kmeans_pass(
        vectors, vec_sq, slot_chunks_j, centers, normalize)
    asg_np = np.asarray(jax.device_get(asg))[:n]
    centers_np = np.asarray(jax.device_get(centers), np.float32)
    q_chunks, cand = _ivf_candidates(
        asg_np, slots, centers_np, IVF_QB, IVF_CAND_MAX)
    return _ivf_knn_scan(
        jnp.asarray(q_chunks), jnp.asarray(cand), vectors, vectors_bf,
        vec_sq, cap, knn_k, metric)


def _build_upper_levels(
    vectors: jax.Array,
    vec_sq: jax.Array,
    slots: np.ndarray,  # [n] int32
    levels: np.ndarray,  # [n] int32 (clamped to L_MAX)
    m: int,
    metric: MetricKind,
    cap: int,
    query_block: int = 4096,
    vectors_bf: jax.Array | None = None,  # bf16 store copy (large levels)
):
    """Every upper level as an exact-kNN + diversity-prune graph (MXU).

    The reference grows upper layers by incremental insertion
    (connect_node_across_levels_, usearch index.hpp:3227-3244). On TPU
    that is a long chain of serialized beam steps over a tiny node set;
    instead, the nodes at level >= L (a ~M^-L fraction) are treated as
    their own flat store and given exact kNN lists via the blockwise
    matmul sweep, pruned with the same refine_ diversity rule. Level 1
    over 1/16 of a 1M index is a ~62k x 62k block matmul — milliseconds
    of MXU time versus minutes of insertion. Lists are forward-only
    (search descends; it never needs back-edges).

    Returns (upper_neighbors [cap_u, L_MAX*m] packed 2D, upper_slot [cap],
    upper_node [cap_u], upper_count, entry_node, max_level,
    lv_clamped [n] — levels after upper-capacity clamping). The level-1
    lists double as the base layer's long-range skeleton candidates,
    read from ``un`` through upper_slot at prune time (no separate
    [cap, m] highways copy — a loop-carried array with minor dim m gets
    tile-padded 8x in-program; see GraphState.upper_neighbors).
    """
    import os as _os2
    import time as _time2
    _trace = _os2.environ.get("DVT_BUILD_TRACE", "0") == "1"
    _t = [_time2.time()]

    def _mark(label):
        if _trace:
            # drain the device queue for a real phase boundary
            # (block_until_ready returns at dispatch on the tunneled
            # backend — utils/timing.py)
            jax.device_get(jnp.zeros((), jnp.int32))
            now = _time2.time()
            print(f"#   upper {label}: {now - _t[0]:.1f}s", flush=True)
            _t[0] = now

    cap_u = max(cap // UPPER_DIV, 64)
    upper_mask = levels >= 1
    up_slots = slots[upper_mask]
    n_up = min(len(up_slots), cap_u)  # overflow clamps to level 0
    up_slots = up_slots[:n_up]
    upper_slot_np = np.full((cap,), -1, np.int32)
    upper_slot_np[up_slots] = np.arange(n_up, dtype=np.int32)
    upper_node_np = np.full((cap_u,), -1, np.int32)
    upper_node_np[:n_up] = up_slots
    un = jnp.full((cap_u, L_MAX * m), -1, jnp.int32)
    upper_slot_j = jnp.asarray(upper_slot_np)
    # overflow-clamped nodes are level 0 everywhere (levels array, entry,
    # max_level) so the graph stays self-consistent
    lv_clamped = np.where(upper_slot_np[slots] >= 0, levels, 0)
    max_level = int(lv_clamped.max()) if len(levels) else -1
    if max_level < 0:
        return (un, upper_slot_j, jnp.asarray(upper_node_np),
                jnp.int32(0), jnp.int32(-1), jnp.int32(-1), lv_clamped)
    entry = int(slots[lv_clamped == max_level][0])
    for lv in range(1, min(max_level, L_MAX) + 1):
        nodes_l = slots[lv_clamped >= lv]
        n_l = len(nodes_l)
        if n_l < 2:
            continue
        cap_s = max(256, 1 << (n_l - 1).bit_length())
        pad_nodes = np.zeros((cap_s,), np.int32)
        pad_nodes[:n_l] = nodes_l
        nodes_j = jnp.asarray(pad_nodes)
        k_l = min(2 * m, cap_s - 1)
        block_n = cap_s if cap_s < 16384 else 16384
        qb = min(query_block, cap_s)
        if n_l >= IVF_LEVEL_MIN_N:
            # large level (level 1 at >= ~500k rows): the all-pairs
            # per-block top-k dominates — reuse the IVF-pruned sweep on
            # the level's node subset, then prune from its kNN tables
            vbf = (vectors_bf if vectors_bf is not None
                   else vectors.astype(jnp.bfloat16))
            lids, lsc = _ivf_knn_sweep(
                vectors, vbf, vec_sq, nodes_l, k_l, metric)
            # compact the sweep's [cap, k] tables to the level's node
            # set ([cap_s, k]) so the full-capacity copies (3.2 GB each
            # at 10M rows for a 625k-node level) free before the prune
            lids = jnp.take(lids, nodes_j, axis=0)
            lsc = jnp.take(lsc, nodes_j, axis=0)
            # ceil division: qb need not divide cap_s (chunk bodies mask
            # pos >= n_l, so a ragged last chunk is harmless; floor would
            # silently drop the tail rows' neighbor lists)
            un = _upper_level_from_knn(
                vectors, vec_sq, nodes_j, jnp.int32(n_l), jnp.int32(lv),
                upper_slot_j, lids, lsc, un, m, metric, qb,
                -(-cap_s // qb))
        else:
            un = _upper_level_build(
                vectors, vec_sq, nodes_j, jnp.int32(n_l), jnp.int32(lv),
                upper_slot_j, un, k_l, m, metric, block_n, qb,
                -(-cap_s // qb))
        _mark(f"lv{lv}(n_l={n_l},cap_s={cap_s})")
    return (un, upper_slot_j, jnp.asarray(upper_node_np),
            jnp.int32(n_up), jnp.int32(entry), jnp.int32(max_level),
            lv_clamped)


def bulk_build(
    vectors: jax.Array,  # [cap, D] padded store (first n rows live)
    vec_sq: jax.Array,
    slots: np.ndarray,  # [n] int32 slot ids of the rows to index
    levels: np.ndarray,  # [n] int32 sampled levels
    config: HNSWConfig,
    metric: MetricKind,
    query_block: int = 8192,
    knn_k: int = KNN_K,
    rev_r: int = REV_R,
    prune_chunk: int = 8192,
    host_vectors: np.ndarray | None = None,  # original rows, for repair
    stats_out: dict | None = None,  # receives {"n_distances": int}
) -> GraphState:
    """Build a fresh GraphState over ``slots`` (an empty-graph bulk load).

    All-MXU strategy (the analog of PhysicalCreateHNSWIndex's bulk path):
    - phase 0: every upper level is an exact-kNN + diversity-prune graph
      over its (geometrically shrinking) node subset
      (_build_upper_levels) — no serialized insertion anywhere;
    - phase 1: exact kNN lists for all rows via the MXU blockwise sweep;
    - phase 2: per-node diversity prune over (kNN ∪ reverse-kNN ∪ the
      node's level-1 highway edges), with keepPruned backfill;
    - repair: weak-connectivity label propagation + bridge tree as a
      deterministic safety net for clustered data.
    """
    from duckdb_vss_tpu.models.graph import make_graph
    import os as _os
    import time as _time

    trace = _os.environ.get("DVT_BUILD_TRACE", "0") == "1"
    _t0 = _time.time()

    def _mark(phase):
        nonlocal _t0
        if trace:
            # device queue is in-order: fetching a fresh trivial op
            # drains everything enqueued by the finished phase
            # (block_until_ready returns at dispatch — utils/timing.py)
            jax.device_get(jnp.zeros((), jnp.int32))
            now = _time.time()
            print(f"# bulk_build {phase}: {now - _t0:.1f}s", flush=True)
            _t0 = now

    cap = vectors.shape[0]
    n = len(slots)
    m, m0 = config.m, config.m0
    levels = np.minimum(np.asarray(levels, np.int32), L_MAX)
    slots = np.asarray(slots, np.int32)
    valid = jnp.zeros((cap,), jnp.bool_).at[jnp.asarray(slots)].set(True)

    # ---- 0. upper levels: per-level exact kNN graphs ----------------
    state = make_graph(cap, m, m0)
    vectors_bf = vectors.astype(jnp.bfloat16)
    (un, upper_slot_j, upper_node_j, upper_count, entry, max_lv,
     lv_clamped) = _build_upper_levels(
        vectors, vec_sq, slots, levels, m, metric, cap,
        query_block=query_block, vectors_bf=vectors_bf)

    lv_of_slot = np.full((cap,), -1, np.int32)
    lv_of_slot[slots] = lv_clamped
    state = state._replace(
        upper_neighbors=un,
        upper_slot=upper_slot_j,
        upper_node=upper_node_j,
        upper_count=upper_count,
        levels=jnp.asarray(lv_of_slot),
        entry_node=entry,
        max_level=max_lv,
    )
    if int(jax.device_get(max_lv)) < 0 and n:
        state = state._replace(entry_node=jnp.int32(int(slots[0])),
                               max_level=jnp.int32(0))

    _mark("phase0_upper_levels")
    # ---- 1. kNN sweep (MXU, bf16 table) -----------------------------
    # exact blockwise at small n; IVF-pruned above IVF_MIN_N (or forced
    # either way via DVT_BUILD_KNN=exact|ivf)
    knn_mode = _os.environ.get("DVT_BUILD_KNN", "auto")
    use_ivf = (knn_mode == "ivf" or
               (knn_mode == "auto" and n >= IVF_MIN_N))
    qb = query_block
    slots_j = jnp.asarray(slots, jnp.int32)
    if use_ivf:
        knn_ids_j, knn_sc_j = _ivf_knn_sweep(
            vectors, vectors_bf, vec_sq, slots, knn_k, metric)
    else:
        knn_ids = np.full((cap, knn_k), -1, np.int32)
        knn_sc = np.full((cap, knn_k), INF_SCORE, np.float32)
        block_n = min(16384, cap)
        for off in range(0, n, qb):
            chunk = slots_j[off : off + qb]
            pad = qb - chunk.shape[0]
            if pad:
                chunk = jnp.concatenate(
                    [chunk, jnp.full((pad,), -1, jnp.int32)])
            q_block = jnp.take(vectors, jnp.maximum(chunk, 0), axis=0)
            sc, ids = _knn_block(q_block, chunk, vectors_bf, vec_sq, valid,
                                 knn_k, metric, block_n)
            sc_np, ids_np = jax.device_get((sc, ids))
            take = min(qb, n - off)
            knn_ids[slots[off : off + take]] = ids_np[:take]
            knn_sc[slots[off : off + take]] = sc_np[:take]
        knn_ids_j = jnp.asarray(knn_ids)
        knn_sc_j = jnp.asarray(knn_sc)

    _mark("phase1_knn_sweep")
    if use_ivf:
        # NN-descent refinement: the IVF sweep misses ~1% of true
        # neighbors (cluster-boundary rows outside the probed set),
        # which caps search recall no matter how wide ef goes. One
        # neighbors-of-neighbors pass recovers most of them: score each
        # node against the kNN lists of its closest REFINE_J current
        # neighbors and re-select top-K. (NN-descent, Dong et al. 2011
        # — one round suffices on a 99%-good starting graph.)
        rounds = int(_os.environ.get("DVT_BUILD_REFINE", "1"))
        for _ in range(rounds):
            knn_ids_j, knn_sc_j = _refine_knn(
                vectors_bf, vec_sq, knn_ids_j, knn_sc_j, slots_j, qb,
                metric)
        _mark(f"phase1.5_refine(x{rounds})")
    # ---- 2. reverse candidates + diversity prune to M0 --------------
    # beyond REV_SRC_MAX flattened edges: (a) only the closest
    # REV_SRC_COLS forward ranks contribute reverse candidates (far
    # forward edges almost never survive the target's diversity prune),
    # and (b) the rank pass runs CHUNKED — per-source-chunk group ranks
    # merged through a running [cap, rev_r] table — instead of one
    # global argsort over the edge list, whose ~3 GB sort workspace
    # RESOURCE_EXHAUSTED the 10M build in round 3 even at 5 columns
    rev_cols = knn_ids_j.shape[1]
    if cap * rev_cols > REV_SRC_MAX:
        rev_cols = min(rev_cols, REV_SRC_COLS)
        # [cap, rev_r] running + per-chunk scatter tables cost
        # 4 * cap * rev_r * 4 bytes while ~10 GB of build state is
        # resident; at 10M-cap scale rev_r=16 is the difference between
        # fitting and RESOURCE_EXHAUSTED. 8 reverse candidates per node
        # still feed the prune union alongside 32 forward + m highway
        # edges (quality measured at 1M: recall delta within noise).
        if cap > 8 * 1024 * 1024:
            rev_r = min(rev_r, 8)
        rev_r = int(_os.environ.get("DVT_BUILD_REV_R", rev_r))
        rev = _reverse_candidates_chunked(
            knn_ids_j, knn_sc_j, rev_r, rev_cols)
    else:
        rev = _reverse_candidates(
            knn_ids_j[:, :rev_cols], knn_sc_j[:, :rev_cols], rev_r)
    jax.device_get(rev[0, 0])  # drain before the prune loop starts
    neighbors0 = jnp.full((cap, m0), -1, jnp.int32)
    big_cap = cap > 4 * 1024 * 1024
    prune_step = (_bulk_prune_step_donated if big_cap
                  else _bulk_prune_step)
    drain_mask = 3 if big_cap else 15
    for ci, off in enumerate(range(0, n, prune_chunk)):
        chunk = slots_j[off : off + prune_chunk]
        pad = prune_chunk - chunk.shape[0]
        if pad:
            chunk = jnp.concatenate([chunk, jnp.full((pad,), -1, jnp.int32)])
        neighbors0 = prune_step(
            neighbors0, knn_ids_j, knn_sc_j, rev, un, upper_slot_j,
            vectors, vec_sq, chunk, slots_j, m0, m, metric)
        if (ci & drain_mask) == drain_mask:
            # drain the in-order queue: dispatch is async on this
            # backend and every enqueued chunk pins its temporaries
            # (and, on the undonated variant, a fresh [cap, M0] output)
            # until it runs — at 10M rows the backlog alone exhausts
            # HBM (config-5 OOM, rounds 3-4). One tiny fetch per
            # drain_mask+1 chunks bounds it (~25 ms RTT each).
            jax.device_get(neighbors0[0, 0])

    _mark("phase2_prune")
    # ---- 2.5 connectivity repair ------------------------------------
    # the kNN tables and reverse lists are dead now but still ~4 GB of
    # live locals at 10M rows — free them before the label propagation
    # (its [N]-temp program still needs headroom on a 12.58M-cap build)
    del knn_ids_j, knn_sc_j, rev
    labels = _component_labels(neighbors0, valid)
    labels_np = np.asarray(jax.device_get(labels))
    if host_vectors is not None:
        neighbors0, _n_bridges = _bridge_components(
            neighbors0, labels_np, np.asarray(host_vectors, np.float32),
            np.asarray(slots))

    _mark("phase2.5_repair")
    if stats_out is not None:
        stats_out["n_distances"] = _distance_cost(
            n, cap, lv_clamped, int(jax.device_get(max_lv)), use_ivf,
            query_block, knn_k, rev_r, config.m0)
    return state._replace(neighbors0=neighbors0)


def _ivf_distance_cost(n: int) -> int:
    """Distances the IVF-pruned sweep actually computes for n rows:
    k-means assignment passes (IVF_KMEANS_ITERS + 1 final assign) plus
    the per-chunk candidate scoring. Mirrors _ivf_knn_sweep's shapes."""
    target = max(1, n // IVF_AVG_CLUSTER)
    c = int(np.clip(1 << int(round(np.log2(target))), 64, 2048))
    n_pad = -(-n // IVF_ASSIGN_CHUNK) * IVF_ASSIGN_CHUNK
    kmeans = (IVF_KMEANS_ITERS + 1) * n_pad * c
    sweep = -(-n // IVF_QB) * IVF_QB * IVF_CAND_MAX
    return kmeans + sweep


def _distance_cost(n, cap, lv_clamped, max_level, use_ivf, query_block,
                   knn_k, rev_r, m0) -> int:
    """Analytic count of distance evaluations for one bulk_build, from
    the same branch conditions and padded shapes the phases used. The
    reference surfaces usearch's computed_distances counter
    (index.hpp:1893-1913); round-1 claimed the full exact-sweep cost
    even on the ~30x-cheaper IVF path — this replaces that estimate."""
    nd = 0
    # phase 0: upper levels
    for lv in range(1, min(max_level, L_MAX) + 1):
        n_l = int((lv_clamped >= lv).sum())
        if n_l < 2:
            continue
        cap_s = max(256, 1 << (n_l - 1).bit_length())
        qb_l = min(query_block, cap_s)
        if n_l >= IVF_LEVEL_MIN_N:
            nd += _ivf_distance_cost(n_l)
        else:
            nd += -(-cap_s // qb_l) * qb_l * cap_s
    # phase 1: base kNN sweep
    if use_ivf:
        nd += _ivf_distance_cost(n)
    else:
        nd += -(-n // query_block) * query_block * cap
    # phase 2: extra-candidate scoring + pairwise diversity prune
    n_cand = knn_k + rev_r + m0 + RAND_S
    nd += n * (n_cand - knn_k)  # gather_scores on the extras
    nd += n * n_cand * n_cand  # select_diverse pairwise matrix
    return nd


def _bulk_prune_step_impl(neighbors0, knn_ids, knn_sc, rev, un, upper_slot,
                          vectors, vec_sq, chunk_slots, live_slots, m0, m,
                          metric):
    safe = jnp.maximum(chunk_slots, 0)
    fwd_i = jnp.take(knn_ids, safe, axis=0)  # [CH, K]
    fwd_s = jnp.take(knn_sc, safe, axis=0)
    rev_i = jnp.take(rev, safe, axis=0)  # [CH, R]
    # level-1 skeleton edges, read from the packed upper table (columns
    # 0..m are level 1); nodes without an upper slot contribute none
    us = jnp.take(upper_slot, safe)
    skel_rows = jnp.take(un, jnp.maximum(us, 0), axis=0)[:, :m]
    skel_i = jnp.where((us >= 0)[:, None], skel_rows, -1)  # [CH, m]
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


# two jit variants of the prune step. Without donation every step holds
# input + output copies of the [cap, M0] table AND every enqueued step
# pins a fresh output until it runs — 1.61 GB each at 12.58M cap, the
# phase-2 OOM that stopped the third round-4 10M attempt. The donated
# variant updates in place (backlog pins only per-step temporaries) but
# skips the persistent compile cache (TPU backend limitation), so the
# 1M-class builds keep the cached undonated variant.
_bulk_prune_step = functools.partial(
    jax.jit, static_argnames=("m0", "m", "metric"))(_bulk_prune_step_impl)
_bulk_prune_step_donated = functools.partial(
    jax.jit, static_argnames=("m0", "m", "metric"),
    donate_argnums=(0,))(_bulk_prune_step_impl)


# ---------------------------------------------------------------------------
# connectivity repair: kNN graphs on clustered data form islands; HNSW
# requires reachability from the entry point. Label propagation finds the
# weakly-connected components on-device; a Prim-style tree over component
# representatives adds bidirectional bridge edges.
# ---------------------------------------------------------------------------


def _component_labels(neighbors, node_mask, max_iters=128):
    """Weakly-connected component labels via min-label propagation.

    neighbors [N, M] (-1 pad), node_mask [N]. Returns labels [N] (min slot
    id in the component; 2^30 for masked-out rows).

    The gather/scatter sweeps loop over the M columns so every
    temporary is [N]-sized: the whole-table variant materialized
    several [N, M] i32 intermediates per iteration and OOMed the
    config-5 build (10M x 96 at 12.58M capacity: ~1.6 GB each, 16.55 G
    total vs 15.75 G HBM)."""
    n, m = neighbors.shape
    big = jnp.int32(2**30)
    labels = jnp.where(node_mask, jnp.arange(n, dtype=jnp.int32), big)
    # HOST-STEPPED iteration: one device program per sweep, convergence
    # checked on the host. The single-program while_loop variant ran
    # every iteration inside ONE XLA execution — at 12.58M cap that is
    # minutes of device time in one call, which the remote TPU worker
    # kills ("worker crashed / kernel fault", the fourth round-4
    # config-5 stopper). Per-sweep programs also bound the dispatch
    # queue the same way the prune/refine drains do. Pointer-doubling
    # hops (label <- label[label], a shortcut to each member's current
    # component minimum) cut the iteration count from O(graph diameter)
    # to O(log diameter): measured 1M clustered converges in 3 sweeps,
    # and 10M in 4-5, vs ~15-30 edge-only sweeps.
    for _ in range(max_iters):
        labels, changed = _label_sweep(neighbors, node_mask, labels)
        if not bool(jax.device_get(changed)):
            break
    return labels


@jax.jit
def _label_sweep(neighbors, node_mask, labels):
    """One min-label propagation sweep (edge fwd + rev, column-looped so
    every temporary is [N]-sized) followed by 3 pointer-doubling hops.
    Returns (new_labels, changed)."""
    n, m = neighbors.shape
    big = jnp.int32(2**30)

    def col_fwd(j, acc):
        nb = lax.dynamic_slice_in_dim(neighbors, j, 1, axis=1)[:, 0]
        has = nb >= 0
        lab_nb = jnp.where(has, jnp.take(labels, jnp.maximum(nb, 0)), big)
        return jnp.minimum(acc, lab_nb)

    # forward: node takes min over out-neighbor labels
    fwd = lax.fori_loop(0, m, col_fwd, labels)

    def col_rev(j, new):
        nb = lax.dynamic_slice_in_dim(neighbors, j, 1, axis=1)[:, 0]
        has = nb >= 0
        return new.at[jnp.where(has, nb, n)].min(
            jnp.where(has, fwd, big), mode="drop")

    # reverse: scatter node label into its out-neighbors
    new = lax.fori_loop(0, m, col_rev, fwd)

    def hop(_, lab):
        # label[i] is a slot in i's own component, so label[label[i]]
        # is a valid (possibly smaller) member label — min is safe
        lab2 = jnp.take(lab, jnp.clip(lab, 0, n - 1))
        return jnp.where(node_mask, jnp.minimum(lab, lab2), big)

    new = lax.fori_loop(0, 3, hop, new)
    return new, jnp.any(new != labels)


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
