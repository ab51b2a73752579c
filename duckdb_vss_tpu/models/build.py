"""Batched HNSW construction — lock-free, deterministic, device-resident.

The reference builds the graph with one construct task per CPU thread over
a shared graph protected by per-node bit-locks
(/root/reference/src/hnsw/hnsw_index_physical_create.cpp:231-243,
usearch index.hpp:1932-1948, add() at index.hpp:2297-2378). The TPU
re-design replaces per-node locks with batch-parallel insertion and
deterministic conflict resolution:

- a batch of B new nodes runs the layered candidate search together
  (greedy-seeded beam per level, all shapes static);
- neighbor selection is usearch's `refine_` diversity heuristic
  (index.hpp:3601-3638) vectorized: pairwise candidate distances as one
  batched matmul + a masked sequential keep-scan;
- back-edges (reconnect_neighbor_nodes_, index.hpp:3269-3313) are applied
  in R conflict-free rounds: edge requests are sorted by target node,
  ranked within each target group, and each round scatters one unique
  request per target (rank r), merging + re-pruning that target's list.
  Requests beyond rank R-1 are dropped — later batches repair coverage
  (the same information loss a lock-based racer admits);
- intra-batch connectivity (nodes of one batch can't reach each other
  through the not-yet-written graph) is restored by seeding each node's
  beam with its nearest batch peers, computed as one [B, B] matmul.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from duckdb_vss_tpu.models.graph import (
    GraphState,
    L_MAX,
    beam_search,
    gather_scores,
)
from duckdb_vss_tpu.utils.config import MetricKind
from duckdb_vss_tpu.utils.padding import INF_SCORE

_EPS = 1e-30


def _pairwise_scores(
    vecs: jax.Array,  # [B, C, D]
    sq: jax.Array,  # [B, C]
    metric: MetricKind,
) -> jax.Array:
    """All-pairs index-metric scores within each candidate set: [B, C, C]."""
    dot = lax.dot_general(
        vecs,
        vecs,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    if metric == MetricKind.IP:
        return 1.0 - dot
    if metric == MetricKind.L2SQ:
        return jnp.maximum(sq[:, :, None] - 2.0 * dot + sq[:, None, :], 0.0)
    if metric == MetricKind.COSINE:
        denom = jnp.sqrt(sq[:, :, None] * sq[:, None, :])
        cos = dot / jnp.maximum(denom, _EPS)
        score = 1.0 - cos
        zero_i = sq[:, :, None] <= 0.0
        zero_j = sq[:, None, :] <= 0.0
        score = jnp.where(zero_i | zero_j, 1.0, score)
        score = jnp.where(zero_i & zero_j, 0.0, score)
        return score
    raise ValueError(f"unknown metric {metric}")


def select_diverse(
    vectors: jax.Array,
    vec_sq: jax.Array,
    cand_ids: jax.Array,  # [B, C] ascending by score, -1 padded
    cand_scores: jax.Array,  # [B, C]
    m_out: int,
    metric: MetricKind,
    backfill: bool = False,
) -> jax.Array:
    """usearch `refine_` (index.hpp:3601-3638), batched.

    Walk candidates in ascending-distance order; keep c iff for every
    already-kept r: dist(c, target) < dist(c, r). Returns [B, m_out]
    selected ids, -1 padded, in selection order.

    backfill=True fills remaining slots with the closest rejected
    candidates (the HNSW paper's keepPrunedConnections): the bulk build
    needs it because its candidates all come from one tight kNN
    neighborhood, where strict diversity leaves too few edges.
    """
    b, c = cand_ids.shape
    safe = jnp.maximum(cand_ids, 0)
    vecs = jnp.take(vectors, safe, axis=0)
    sq = jnp.take(vec_sq, safe, axis=0)
    pair = _pairwise_scores(vecs, sq, metric)  # [B, C, C]
    valid = (cand_ids >= 0) & (cand_scores < INF_SCORE)

    def body(i, carry):
        kept, n_kept = carry
        # candidate i is kept iff no kept j has pair[i, j] <= score[i]
        score_i = lax.dynamic_index_in_dim(cand_scores, i, axis=1)  # [B, 1]
        closer_to_kept = jnp.any(kept & (pair[:, i, :] <= score_i), axis=1)
        take_i = valid[:, i] & (n_kept < m_out) & ~closer_to_kept
        kept = kept.at[:, i].set(take_i)
        return kept, n_kept + take_i.astype(jnp.int32)

    kept, n_kept = lax.fori_loop(
        0, c, body,
        (jnp.zeros((b, c), jnp.bool_), jnp.zeros((b,), jnp.int32)),
        unroll=8,  # the scan is latency-bound: 8x fewer sequential hops
    )
    # compact kept ids to the front (then rejected-but-valid, then invalid)
    rank = jnp.arange(c, dtype=jnp.int32)[None, :]
    key = jnp.where(kept, rank, jnp.where(valid, c + rank, 2 * c + rank))
    order = jnp.argsort(key, axis=1)
    packed = jnp.take_along_axis(cand_ids, order, axis=1)[:, :m_out]
    pos = jnp.arange(m_out, dtype=jnp.int32)[None, :]
    limit = (jnp.sum(valid, axis=1) if backfill else n_kept)[:, None]
    return jnp.where(pos < limit, packed, -1)


def _group_ranks(tgt: jax.Array, dist: jax.Array) -> jax.Array:
    """Rank of each edge request within its target group, closest first.

    tgt [P] (-1 = inactive, ranked into their own trailing group),
    dist [P]. Returns rank [P] (0 = closest request for that target).
    """
    p = tgt.shape[0]
    key_t = jnp.where(tgt >= 0, tgt, jnp.int32(2**30))
    ord1 = jnp.argsort(dist, stable=True)
    t1 = jnp.take(key_t, ord1)
    ord2 = jnp.argsort(t1, stable=True)
    order = jnp.take(ord1, ord2)  # sorted by (target, dist)
    ts = jnp.take(key_t, order)
    pos = jnp.arange(p, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), ts[1:] != ts[:-1]]
    )
    seg_start = lax.cummax(jnp.where(is_start, pos, 0))
    rank_sorted = pos - seg_start
    rank = jnp.zeros((p,), jnp.int32).at[order].set(rank_sorted)
    return rank


def _apply_backlinks(
    table: jax.Array,  # [T, Mcap] neighbor table being amended
    vectors: jax.Array,
    vec_sq: jax.Array,
    tgt: jax.Array,  # [P] target node id (must index `table` rows)
    src: jax.Array,  # [P] new neighbor to add
    act: jax.Array,  # [P] bool
    tgt_row: jax.Array,  # [P] row index into table (== tgt for base layer,
    #                       upper_slot[tgt] for upper layers)
    metric: MetricKind,
    r_rounds: int,
    prune: str = "diversity",
    col_off=None,  # traced column offset into a wider packed table
    m_cap: int | None = None,  # list width when col_off is given
) -> jax.Array:
    """Append src into tgt's neighbor row with overflow pruning, resolving
    same-target conflicts over ``r_rounds`` rounds.

    prune="diversity" applies usearch's refine_ heuristic on overflow
    (reconnect_neighbor_nodes_, index.hpp:3308-3312). prune="truncate"
    keeps the m_cap closest instead — one sorted slice instead of a
    sequential keep-scan; cheaper, slightly less navigable graphs.

    col_off/m_cap address one level's m-wide window inside the packed 2D
    upper table [cap_u, L_MAX*M] (GraphState.upper_neighbors layout
    note) — no 3D view is ever materialized in-program.
    """
    if m_cap is None:
        m_cap = table.shape[1]
    t_vec = jnp.take(vectors, jnp.maximum(tgt, 0), axis=0)
    t_sq = jnp.take(vec_sq, jnp.maximum(tgt, 0), axis=0)
    s_d = gather_scores(vectors, vec_sq, src[:, None], t_vec, t_sq, metric)[:, 0]
    ranks = _group_ranks(jnp.where(act, tgt, -1), s_d)

    def round_fn(r, table):
        sel = act & (ranks == r)
        rows = jnp.take(table, jnp.maximum(tgt_row, 0), axis=0)  # [P, Mcap]
        if col_off is not None:
            rows = lax.dynamic_slice_in_dim(rows, col_off, m_cap, axis=1)
        merged = jnp.concatenate([rows, src[:, None]], axis=1)  # [P, Mcap+1]
        # drop duplicate src already present
        dup = jnp.any(rows == src[:, None], axis=1)
        m_valid = merged >= 0
        m_valid = m_valid.at[:, -1].set(m_valid[:, -1] & ~dup)
        d = gather_scores(vectors, vec_sq, merged, t_vec, t_sq, metric)
        d = jnp.where(m_valid, d, INF_SCORE)
        count = jnp.sum(m_valid, axis=1)

        # sort merged ascending by distance to target
        order = jnp.argsort(d, axis=1)
        s_ids = jnp.take_along_axis(merged, order, axis=1)
        s_d2 = jnp.take_along_axis(d, order, axis=1)
        s_ids = jnp.where(s_d2 < INF_SCORE, s_ids, -1)

        # overflow -> prune, else plain append
        appended = s_ids[:, :m_cap]
        if prune == "diversity":
            pruned = select_diverse(vectors, vec_sq, s_ids, s_d2, m_cap,
                                    metric)
        else:  # "truncate": keep closest m_cap (already sorted ascending)
            pruned = appended
        new_rows = jnp.where((count > m_cap)[:, None], pruned, appended)

        row_idx = jnp.where(sel, tgt_row, jnp.int32(2**30))  # drop inactive
        if col_off is None:
            return table.at[row_idx].set(new_rows, mode="drop")
        cols = col_off + jnp.arange(m_cap, dtype=jnp.int32)
        return table.at[row_idx[:, None], cols[None, :]].set(
            new_rows, mode="drop")

    # only run as many conflict-resolution rounds as the deepest target
    # group actually needs (usually 1) — requests past r_rounds are dropped
    rounds_needed = jnp.minimum(
        jnp.max(jnp.where(act, ranks, -1)) + 1, r_rounds)
    return lax.fori_loop(0, rounds_needed, round_fn, table)


def _apply_backlinks_batched(
    table: jax.Array,  # [T, Mcap] neighbor table being amended
    vectors: jax.Array,
    vec_sq: jax.Array,
    tgt: jax.Array,  # [P] target node id
    src: jax.Array,  # [P] new neighbor to add
    act: jax.Array,  # [P] bool
    tgt_row: jax.Array,  # [P] row index into table
    metric: MetricKind,
    r_rounds: int,  # max requests merged per target (rank cap)
    prune: str = "diversity",
    col_off=None,
    m_cap: int | None = None,
) -> jax.Array:
    """Single-pass batched variant of _apply_backlinks.

    The round-based resolver applies one request per target per round —
    r_rounds SEQUENTIAL (gather + merge + sort + diversity-prune +
    scatter) passes, measured at ~100 ms each for P=32k requests at 1M
    scale, the dominant cost of incremental insertion (round-4 probe:
    r_rounds 4 -> 1 cut a 738 ms batch to 435 ms, but rank>=2 conflicts
    are common on clustered inserts and dropping them costs self-recall
    0.999 -> 0.971). This variant instead merges a target's current row
    with ALL of its (up to r_rounds closest) requests at once and runs
    ONE diversity prune over the union — ~1.2x one round's cost for the
    same information. Semantics: a valid diversity prune of
    row ∪ {srcs}; the sequential rounds compute prune(prune(row∪s0)∪s1)
    — both are usearch-compatible resolutions of concurrent
    reconnect_neighbor_nodes_ (index.hpp:3269-3313), which under thread
    interleaving admits many orders anyway."""
    if m_cap is None:
        m_cap = table.shape[1]
    rr = r_rounds
    t_vec = jnp.take(vectors, jnp.maximum(tgt, 0), axis=0)
    t_sq = jnp.take(vec_sq, jnp.maximum(tgt, 0), axis=0)
    s_d = gather_scores(vectors, vec_sq, src[:, None], t_vec, t_sq,
                        metric)[:, 0]
    ranks = _group_ranks(jnp.where(act, tgt, -1), s_d)
    keep = act & (ranks < rr)
    # per-target request table: row = tgt_row, col = rank (unique per
    # target by construction)
    t_rows = table.shape[0]
    req = jnp.full((t_rows, rr), -1, jnp.int32).at[
        jnp.where(keep, tgt_row, jnp.int32(2**30)),
        jnp.where(keep, ranks, 0)].set(
        jnp.where(keep, src, -1), mode="drop")
    owner = keep & (ranks == 0)  # one writer per target
    rows = jnp.take(table, jnp.maximum(tgt_row, 0), axis=0)
    if col_off is not None:
        rows = lax.dynamic_slice_in_dim(rows, col_off, m_cap, axis=1)
    extra = jnp.take(req, jnp.maximum(tgt_row, 0), axis=0)  # [P, rr]
    # drop srcs already present in the row
    dup = jnp.any(extra[:, :, None] == rows[:, None, :], axis=2)
    extra = jnp.where(dup, -1, extra)
    merged = jnp.concatenate([rows, extra], axis=1)  # [P, Mcap+rr]
    d = gather_scores(vectors, vec_sq, merged, t_vec, t_sq, metric)
    d = jnp.where(merged >= 0, d, INF_SCORE)
    count = jnp.sum(merged >= 0, axis=1)
    order = jnp.argsort(d, axis=1)
    s_ids = jnp.take_along_axis(merged, order, axis=1)
    s_d2 = jnp.take_along_axis(d, order, axis=1)
    s_ids = jnp.where(s_d2 < INF_SCORE, s_ids, -1)
    appended = s_ids[:, :m_cap]
    if prune == "diversity":
        pruned = select_diverse(vectors, vec_sq, s_ids, s_d2, m_cap, metric)
    else:
        pruned = appended
    new_rows = jnp.where((count > m_cap)[:, None], pruned, appended)
    row_idx = jnp.where(owner, tgt_row, jnp.int32(2**30))
    if col_off is None:
        return table.at[row_idx].set(new_rows, mode="drop")
    cols = col_off + jnp.arange(m_cap, dtype=jnp.int32)
    return table.at[row_idx[:, None], cols[None, :]].set(
        new_rows, mode="drop")


def _force_nearest_backlink(
    table: jax.Array,  # [T, Mcap]
    vectors: jax.Array,
    vec_sq: jax.Array,
    tgt: jax.Array,  # [B] the new node's CLOSEST forward target
    src: jax.Array,  # [B] the new node
    act: jax.Array,  # [B]
    metric: MetricKind,
    r_rounds: int,
) -> jax.Array:
    """Guarantee src an in-link from its nearest forward target.

    The bulk MXU build saturates every neighbor row (exact-kNN prune to
    a full M0), so incremental back-links must displace an existing edge
    via the diversity heuristic — and a new point is by construction the
    most redundant candidate at its CLOSEST targets, which reject it.
    Measured at 1M x 128 clustered: a third of inserted nodes keep only
    far-away in-links and become unreachable at practical ef
    (self-recall@1 stuck at 0.66 from ef=16 through 128). usearch dodges
    this only because its incrementally grown rows usually have empty
    slots to append into (reconnect_neighbor_nodes_,
    index.hpp:3290-3306). Here the nearest target always adopts the new
    node, evicting its farthest current neighbor (a fill of an empty
    slot when one exists, since empties sort as INF)."""
    t_vec = jnp.take(vectors, jnp.maximum(tgt, 0), axis=0)
    t_sq = jnp.take(vec_sq, jnp.maximum(tgt, 0), axis=0)
    ranks = _group_ranks(jnp.where(act, tgt, -1), jnp.zeros_like(t_sq))

    m_cap = table.shape[1]
    col = jnp.arange(m_cap, dtype=jnp.int32)[None]

    def round_fn(r, table):
        sel = act & (ranks == r)
        rows = jnp.take(table, jnp.maximum(tgt, 0), axis=0)  # [B, Mcap]
        present = jnp.any(rows == src[:, None], axis=1)
        d = gather_scores(vectors, vec_sq, rows, t_vec, t_sq, metric)
        d = jnp.where(rows >= 0, d, INF_SCORE)  # empty slots evict first
        victim = jnp.argmax(d, axis=1)  # [B]
        new_rows = jnp.where(
            (col == victim[:, None]) & ~present[:, None] & sel[:, None],
            src[:, None], rows)
        row_idx = jnp.where(sel, tgt, jnp.int32(2**30))
        return table.at[row_idx].set(new_rows, mode="drop")

    rounds_needed = jnp.minimum(
        jnp.max(jnp.where(act, ranks, -1)) + 1, r_rounds)
    return lax.fori_loop(0, rounds_needed, round_fn, table)


def insert_batch_impl(
    state: GraphState,
    vectors: jax.Array,  # [cap, D] — already contains the new vectors
    vec_sq: jax.Array,  # [cap]
    new_slots: jax.Array,  # [B] int32 (-1 = inactive pad row)
    new_levels: jax.Array,  # [B] int32 sampled levels
    metric: MetricKind,
    m: int,
    m0: int,
    ef_construction: int,
    ef_upper: int = 32,
    expand: int = 2,
    r_rounds: int = 4,
    prune: str = "diversity",
    nbr_vecs: jax.Array | None = None,  # int8 neighborhood layout for the
    nbr_scale: jax.Array | None = None,  # base-layer candidate search
    nbr_sq: jax.Array | None = None,  # (graph.make_neighborhood_tables)
    backlinks: str = "rounds",  # "rounds" (sequential conflict-resolution
    # rounds — the quality default: measured self-recall@1 1.0 vs the
    # batched union-prune's 0.972, because a union prune rejects
    # mutually-close new sources that sequential rounds admit one at a
    # time) | "batched" (one union-prune pass per target,
    # _apply_backlinks_batched — ~1.3x faster insertion, opt-in)
    backlink_cols: int | None = None,  # request back-edges only from the
    # closest backlink_cols forward targets (None = all M0/m): far
    # targets nearly always reject the new node under diversity pruning
    # (see _force_nearest_backlink), so their requests are pure cost —
    # P shrinks from B*M0 to B*backlink_cols in every round
    max_steps_base: int | None = None,  # cap the base-layer beam's step
    # count. The batched while-loop steps until EVERY row converges, so
    # one straggler keeps the whole batch paying gather+score steps;
    # uncapped the bound is 3*ef_c//expand+8 (= 104 at ef 128/expand 4).
    # The search path caps steps from measured recall saturation
    # (bench.py steps_of); this is the construction-side analog.
    max_steps_upper: int | None = None,  # same for the upper-level beams
) -> tuple[GraphState, jax.Array]:
    """Insert a batch of new nodes. Returns (state, n_dist counter).

    Mirrors usearch add(): per level from the top —
    search_to_insert_ (beam) -> refine_ (diversity selection) ->
    connect_new_node_ (forward edges) -> reconnect_neighbor_nodes_
    (back edges) — but for a whole batch at once.

    When the int8 neighborhood tables are given, the base-layer beam
    scores candidates through them (contiguous per-node tiles + int8
    MXU dots — the same fast path search uses) instead of per-candidate
    store gathers; the CALLER must keep the tables consistent with
    neighbors0 across batches (graph.update_neighborhood_rows).
    Traversal ranking picks up ~0.4%-of-row-max quantization noise; the
    diversity selection and back-link pruning still rescore exactly.
    """
    apply_backlinks = (_apply_backlinks_batched if backlinks == "batched"
                       else _apply_backlinks)
    b = new_slots.shape[0]
    active = new_slots >= 0
    safe_slots = jnp.maximum(new_slots, 0)
    q = jnp.take(vectors, safe_slots, axis=0)
    q_sq = jnp.take(vec_sq, safe_slots, axis=0)
    new_levels = jnp.where(active, jnp.minimum(new_levels, L_MAX), -1)

    # ---- allocate upper slots for nodes with level >= 1 -----------------
    has_upper = active & (new_levels >= 1)
    cap_u = state.upper_neighbors.shape[0]
    u_off = jnp.cumsum(has_upper.astype(jnp.int32)) - 1
    u_slot_new = jnp.where(has_upper, state.upper_count + u_off, -1)
    u_slot_new = jnp.where(u_slot_new < cap_u, u_slot_new, -1)  # clamp full
    upper_slot = state.upper_slot.at[
        jnp.where(has_upper & (u_slot_new >= 0), new_slots, jnp.int32(2**30))
    ].set(u_slot_new, mode="drop")
    upper_node = state.upper_node.at[
        jnp.where(u_slot_new >= 0, u_slot_new, jnp.int32(2**30))
    ].set(new_slots, mode="drop")
    n_upper = jnp.sum((u_slot_new >= 0).astype(jnp.int32))
    # nodes that failed upper allocation fall back to level 0
    new_levels = jnp.where(has_upper & (u_slot_new < 0), 0, new_levels)
    levels = state.levels.at[
        jnp.where(active, new_slots, jnp.int32(2**30))
    ].set(new_levels, mode="drop")
    state = state._replace(
        upper_slot=upper_slot, upper_node=upper_node, levels=levels,
        upper_count=state.upper_count + n_upper,
    )

    # ---- intra-batch peer candidates (restores within-batch reachability)
    peer_k = min(16, b)
    peer_s = _pairwise_scores(q[None], q_sq[None], metric)[0]  # [B, B]
    self_mask = jnp.eye(b, dtype=jnp.bool_)
    peer_s = jnp.where(self_mask | ~active[None, :] | ~active[:, None],
                       INF_SCORE, peer_s)
    peer_neg, peer_pos = lax.top_k(-peer_s, peer_k)
    # fewer than peer_k active peers: top_k returns arbitrary INF-masked
    # positions (including self) — drop them or the batch seeds self-edges
    peer_ok = -peer_neg < INF_SCORE
    peer_ids = jnp.where(peer_ok, jnp.take(new_slots, peer_pos), -1)
    peer_levels = jnp.where(peer_ok, jnp.take(new_levels, peer_pos), -1)

    n_dist = jnp.int32(0)

    # ---- phase A: upper levels L_MAX..1 (single traced-level beam) ------
    seeds0 = jnp.broadcast_to(state.entry_node, (b,))[:, None]

    def upper_level(i, carry):
        seeds, upper_neighbors, n_dist = carry
        lvl = L_MAX - i  # L_MAX .. 1
        st = state._replace(upper_neighbors=upper_neighbors)
        level_exists = lvl <= st.max_level
        write_here = active & (new_levels >= lvl)
        touch = level_exists | jnp.any(write_here)

        peer_here = jnp.where(peer_levels >= lvl, peer_ids, -1)
        seed_ids = jnp.concatenate([seeds, peer_here], axis=1)
        scores, ids, nd = beam_search(
            st, vectors, vec_sq, q, q_sq, seed_ids, ef_upper, metric,
            level=lvl, expand=1, active=active & touch,
            max_steps=max_steps_upper,
        )
        n_dist = n_dist + nd
        self_hit = ids == new_slots[:, None]  # never link a node to itself
        ids = jnp.where(self_hit, -1, ids)
        scores = jnp.where(self_hit, INF_SCORE, scores)

        sel = select_diverse(vectors, vec_sq, ids, scores, m, metric)
        sel = jnp.where(write_here[:, None], sel, -1)
        # forward edges: the level's m-wide window of the packed row
        row = jnp.where(write_here, jnp.take(st.upper_slot, safe_slots), -1)
        row = jnp.where(row >= 0, row, jnp.int32(2**30))
        lvl_cols = (lvl - 1) * m + jnp.arange(m, dtype=jnp.int32)
        upper_neighbors = upper_neighbors.at[
            row[:, None], lvl_cols[None, :]].set(sel, mode="drop")

        # back edges at this level: targets' rows live at upper_slot[tgt]
        blc_u = min(backlink_cols or m, m)
        tgt = sel[:, :blc_u].reshape(-1)
        src = jnp.repeat(new_slots, blc_u)
        act = (tgt >= 0) & (src >= 0)
        tgt_uslot = jnp.where(
            act, jnp.take(st.upper_slot, jnp.maximum(tgt, 0)), -1)
        act = act & (tgt_uslot >= 0)
        upper_neighbors = apply_backlinks(
            upper_neighbors, vectors, vec_sq, tgt, src, act,
            jnp.where(act, tgt_uslot, -1), metric, r_rounds, prune,
            col_off=(lvl - 1) * m, m_cap=m,
        )

        # seed next level with this level's beam results (fall back to seeds)
        best = jnp.where(ids[:, :1] >= 0, ids[:, :1], seeds[:, :1])
        next_seeds = jnp.where(level_exists | jnp.any(write_here), best,
                               seeds[:, :1])
        return next_seeds, upper_neighbors, n_dist

    # dynamic trip count: only descend through levels that exist in the
    # graph or in this batch (saves ~6 empty beam invocations per batch)
    top_lvl = jnp.clip(
        jnp.maximum(state.max_level, jnp.max(new_levels)), 0, L_MAX)
    seeds, upper_neighbors, n_dist = lax.fori_loop(
        L_MAX - top_lvl, L_MAX, upper_level,
        (seeds0, state.upper_neighbors, n_dist)
    )
    state = state._replace(upper_neighbors=upper_neighbors)

    # ---- phase B: base layer ------------------------------------------
    # exact coarse routing for the base seeds: the greedy top-down walk
    # strands a third of clustered inserts in the wrong region (forward
    # degree 1-4 at garbage distances, nodes unreachable afterwards —
    # the same local-minimum failure mxu_descent fixed for search),
    # so score the batch against ALL upper-level nodes in one matmul
    from duckdb_vss_tpu.models.graph import mxu_descent

    u_safe = jnp.maximum(state.upper_node, 0)
    uvecs = jnp.take(vectors, u_safe, axis=0).astype(jnp.bfloat16)
    uvsq = jnp.take(vec_sq, u_safe) * (state.upper_node >= 0)
    mxu_seeds, nd_mxu = mxu_descent(
        uvecs, uvsq, state.upper_node, state.entry_node, q, q_sq, metric,
        n_seeds=8)
    n_dist = n_dist + nd_mxu
    # never seed a node with itself
    mxu_seeds = jnp.where(mxu_seeds == new_slots[:, None], -1, mxu_seeds)

    seed_ids = jnp.concatenate([seeds, mxu_seeds, peer_ids], axis=1)
    scores, ids, nd = beam_search(
        state, vectors, vec_sq, q, q_sq, seed_ids, ef_construction, metric,
        level=0, expand=expand, active=active, max_steps=max_steps_base,
        nbr_vecs=nbr_vecs, nbr_scale=nbr_scale, nbr_sq=nbr_sq,
    )
    n_dist = n_dist + nd
    self_hit = ids == new_slots[:, None]
    ids = jnp.where(self_hit, -1, ids)
    scores = jnp.where(self_hit, INF_SCORE, scores)
    sel = select_diverse(vectors, vec_sq, ids, scores, m0, metric)
    sel = jnp.where(active[:, None], sel, -1)
    neighbors0 = state.neighbors0.at[
        jnp.where(active, new_slots, jnp.int32(2**30))
    ].set(sel, mode="drop")

    blc = min(backlink_cols or m0, m0)
    tgt = sel[:, :blc].reshape(-1)  # sel is in selection order,
    # closest-first (select_diverse packs kept candidates by ascending
    # distance), so the first blc columns ARE the closest targets
    src = jnp.repeat(new_slots, blc)
    act = (tgt >= 0) & (src >= 0)
    neighbors0 = apply_backlinks(
        neighbors0, vectors, vec_sq, tgt, src, act,
        jnp.where(act, tgt, -1), metric, r_rounds, prune,
    )
    # reachability floor: the nearest forward target always adopts the
    # new node (see _force_nearest_backlink)
    neighbors0 = _force_nearest_backlink(
        neighbors0, vectors, vec_sq, sel[:, 0], new_slots,
        active & (sel[:, 0] >= 0), metric, r_rounds)
    state = state._replace(neighbors0=neighbors0)

    # ---- entry point / max level update (index.hpp global_mutex_ analog)
    batch_best = jnp.argmax(jnp.where(active, new_levels, -1))
    batch_max = new_levels[batch_best]
    promote = batch_max > state.max_level
    state = state._replace(
        entry_node=jnp.where(
            promote, new_slots[batch_best], state.entry_node
        ).astype(jnp.int32),
        max_level=jnp.where(promote, batch_max, state.max_level).astype(
            jnp.int32),
    )
    # first-ever batch: entry may still be unset if all levels were 0
    need_entry = (state.entry_node < 0) & jnp.any(active)
    first_active = jnp.argmax(active)
    state = state._replace(
        entry_node=jnp.where(
            need_entry, new_slots[first_active], state.entry_node
        ).astype(jnp.int32),
        max_level=jnp.where(
            need_entry, jnp.maximum(state.max_level, 0), state.max_level
        ).astype(jnp.int32),
    )
    return state, n_dist


# jitted entry point used by HNSWIndex.add (single-shard path); the impl is
# also called un-jitted inside shard_map for the sharded build (parallel/).
# NOTE: no donate_argnums — donated-buffer executables are not serialized
# into the persistent compilation cache on the TPU backend, and the
# multi-minute remote compile dwarfs the copy overhead donation saves.
insert_batch = functools.partial(
    jax.jit,
    static_argnames=("metric", "m", "m0", "ef_construction", "ef_upper",
                     "expand", "r_rounds", "prune", "backlinks",
                     "backlink_cols", "max_steps_base", "max_steps_upper"),
)(insert_batch_impl)
