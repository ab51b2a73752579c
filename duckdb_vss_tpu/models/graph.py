"""TPU-native HNSW graph: structure-of-arrays layout + beam-batched search.

The reference's graph is usearch's node tape
[key | level | {count, slot x M} ... per level]
(/root/reference/src/include/usearch/index.hpp:1816-1843) traversed one
node at a time with a candidate heap (search_to_find_in_base_,
index.hpp:3503-3573). The TPU re-design replaces pointer-chasing with
dense arrays and masked, fixed-shape batch operations:

- base layer adjacency is one [cap, M0] int32 table (sentinel -1);
- upper layers (a ~1/M fraction of nodes) live in a compacted
  [cap_u, L_MAX*M] packed table addressed through an upper-slot
  indirection (level-major windows per row);
- traversal processes a whole batch of queries per step: the beam's best
  unexpanded nodes are expanded together, their neighbor lists gathered
  as one [B, E*M] index block, distances computed as one batched
  matvec/matmul, and the beam updated with one masked top-k merge;
- the candidate heap becomes a sorted top-ef selection (lax.top_k);
- the visited set is implicit: the beam keeps the best ef of everything
  ever scored, so an evicted node can never re-enter (monotone top-ef),
  and per-step dedup against the beam prevents re-expansion.

Search quality semantics match usearch's ef-search: expand best
unexpanded candidates until none can improve the top-ef set.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from duckdb_vss_tpu.utils.config import MetricKind
from duckdb_vss_tpu.utils.padding import INF_SCORE

# Static cap on levels above base. P(level >= 8) = M^-8 (~2e-10 at M=16);
# usearch has no static cap but never materializes more in practice.
L_MAX = 8

# upper tables hold cap // UPPER_DIV slots; P(level >= 1) = 1/M = 1/16 for
# the default M, so 1/4 gives 4x headroom (overflow levels are clamped).
UPPER_DIV = 4

_EPS = 1e-30


class GraphState(NamedTuple):
    """Device-resident HNSW graph (all static shapes)."""

    neighbors0: jax.Array  # [cap, M0] int32, -1 padded
    # upper levels, level-major packed per row: [cap_u, L_MAX * M] int32,
    # level l (1-based) occupying columns [(l-1)*M, l*M). Packed 2D rather
    # than [cap_u, L_MAX, M]: XLA tiles the two minor dims of loop-carried
    # values to (8, 128), so a [.., 8, 16] layout pads 8x in-program
    # (12 GB at 10M rows — a measured compile OOM); L_MAX*M = 128 is
    # exactly one lane tile.
    upper_neighbors: jax.Array
    upper_slot: jax.Array  # [cap] int32; slot into upper tables, -1 if level 0
    upper_node: jax.Array  # [cap_u] int32; owning node of an upper slot
    levels: jax.Array  # [cap] int32; node level, -1 for unused slot
    entry_node: jax.Array  # [] int32; -1 while empty
    max_level: jax.Array  # [] int32; -1 while empty
    upper_count: jax.Array  # [] int32; allocated upper slots

    @property
    def capacity(self) -> int:
        return self.neighbors0.shape[0]


def make_graph(cap: int, m: int, m0: int) -> GraphState:
    cap_u = max(cap // UPPER_DIV, 64)
    return GraphState(
        neighbors0=jnp.full((cap, m0), -1, jnp.int32),
        upper_neighbors=jnp.full((cap_u, L_MAX * m), -1, jnp.int32),
        upper_slot=jnp.full((cap,), -1, jnp.int32),
        upper_node=jnp.full((cap_u,), -1, jnp.int32),
        levels=jnp.full((cap,), -1, jnp.int32),
        entry_node=jnp.int32(-1),
        max_level=jnp.int32(-1),
        upper_count=jnp.int32(0),
    )


def grow_graph(state: GraphState, new_cap: int) -> GraphState:
    """Host-side capacity growth (analog of reserve/resize)."""
    cap = state.capacity
    if new_cap <= cap:
        return state
    cap_u = state.upper_neighbors.shape[0]
    new_cap_u = max(new_cap // UPPER_DIV, 64)
    m0 = state.neighbors0.shape[1]
    m = state.upper_neighbors.shape[1] // L_MAX

    def pad(arr, rows, fill):
        extra = jnp.full((rows - arr.shape[0],) + arr.shape[1:], fill, arr.dtype)
        return jnp.concatenate([arr, extra])

    return state._replace(
        neighbors0=pad(state.neighbors0, new_cap, -1),
        upper_neighbors=pad(state.upper_neighbors, new_cap_u, -1),
        upper_slot=pad(state.upper_slot, new_cap, -1),
        upper_node=pad(state.upper_node, new_cap_u, -1),
        levels=pad(state.levels, new_cap, -1),
    )


# ---------------------------------------------------------------------------
# distance helpers for gathered candidate sets
# ---------------------------------------------------------------------------


def gather_scores(
    vectors: jax.Array,  # [cap, D]
    vec_sq: jax.Array,  # [cap]
    ids: jax.Array,  # [B, C] int32 (may contain -1; clipped, mask separately)
    queries: jax.Array,  # [B, D]
    q_sq: jax.Array,  # [B]
    metric: MetricKind,
    precision=lax.Precision.DEFAULT,
    aug: bool = False,
) -> jax.Array:
    """Index-metric scores of gathered candidates: [B, C].

    ``vectors`` may be a reduced-precision (bf16) traversal copy: the
    dot runs in the table's dtype with f32 accumulation; vec_sq stays
    f32. Callers needing exact emitted distances rerank against the f32
    store (search_graph does).

    ``aug=True``: ``vectors`` is an AUGMENTED traversal table whose rows
    already fold the member-side metric terms into the dot (see
    make_aug_table); score = dot + q_sq (q_sq then carries the
    query-side bias). This halves the hot loop's row-gathers — the TPU's
    per-gathered-row cost (~5-9 ns/row, measured in
    benchmarks/profile_step.py) dominates beam-step latency, and the
    separate [B, C] vec_sq gather costs as much as the vector gather
    despite moving 64x fewer bytes."""
    safe = jnp.maximum(ids, 0)
    vecs = jnp.take(vectors, safe, axis=0)  # [B, C, D]
    dot = lax.dot_general(
        vecs,
        queries.astype(vectors.dtype),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=precision,
    )  # [B, C]
    if aug:
        return dot + q_sq[:, None]
    if metric == MetricKind.IP:
        return 1.0 - dot
    v_sq = jnp.take(vec_sq, safe, axis=0)
    return metric_epilogue(dot, v_sq, q_sq, metric)


def metric_epilogue(dot, v_sq, q_sq, metric: MetricKind) -> jax.Array:
    """Index-metric score from a raw dot product + squared norms
    (usearch metric semantics, index_plugins.hpp:977-1053)."""
    if metric == MetricKind.IP:
        return 1.0 - dot
    if metric == MetricKind.L2SQ:
        return jnp.maximum(q_sq[:, None] - 2.0 * dot + v_sq, 0.0)
    if metric == MetricKind.COSINE:
        denom = jnp.sqrt(q_sq[:, None] * v_sq)
        cos = dot / jnp.maximum(denom, _EPS)
        score = 1.0 - cos
        score = jnp.where((q_sq[:, None] <= 0.0) | (v_sq <= 0.0), 1.0, score)
        score = jnp.where((q_sq[:, None] <= 0.0) & (v_sq <= 0.0), 0.0, score)
        return score
    raise ValueError(f"unknown metric {metric}")


def aug_width(d_pad: int, metric: MetricKind) -> int:
    """Lane width of the augmented traversal table (multiple of 128)."""
    if metric == MetricKind.L2SQ:
        # needs 2 extra lanes for the hi/lo split of |v|^2
        from duckdb_vss_tpu.utils.padding import pad_dim

        return pad_dim(d_pad + 2)
    return d_pad


def make_aug_table(
    vectors: jax.Array,  # [cap, d_pad] f32 store (zero-padded past dims)
    vec_sq: jax.Array,  # [cap] f32
    metric: MetricKind,
    dtype=jnp.bfloat16,
) -> jax.Array:
    """Augmented traversal table: one bf16 row per member that folds ALL
    member-side metric terms into a single dot product, so the beam's
    hot loop does exactly one row-gather per candidate.

      l2sq:   row = [-2v | hi(|v|^2), lo(|v|^2)] ; q_aug = [q | 1, 1]
              dot = |v|^2 - 2 v.q ; + bias (= |q|^2) = exact l2sq.
              |v|^2 is split into two bf16 lanes (hi + exact residual)
              to keep ~16 mantissa bits — a single bf16 norm (8 bits)
              visibly costs traversal recall.
      ip:     row = [-v];        q_aug = [q];      bias 1  -> 1 - v.q
      cosine: row = [-v/|v|];    q_aug = [q/|q|];  bias 1  -> 1 - cos
              (zero-norm rows stay 0: score saturates at the bias, and
              the exact rerank restores usearch's zero-norm cases)

    The proxy is monotone in the true metric per query (for cosine it IS
    the true distance up to f.p. error), so beam ranking/convergence are
    unaffected; emitted distances always come from the f32 rerank.
    """
    cap, d_pad = vectors.shape
    d_aug = aug_width(d_pad, metric)
    if metric == MetricKind.L2SQ:
        rows = -2.0 * vectors
        hi = vec_sq.astype(dtype)
        lo = (vec_sq - hi.astype(jnp.float32)).astype(dtype)
        out = jnp.zeros((cap, d_aug), dtype)
        out = out.at[:, :d_pad].set(rows.astype(dtype))
        out = out.at[:, d_pad].set(hi)
        out = out.at[:, d_pad + 1].set(lo)
        return out
    if metric == MetricKind.IP:
        return (-vectors).astype(dtype)
    # cosine
    inv = lax.rsqrt(jnp.maximum(vec_sq, _EPS))
    return (-vectors * inv[:, None]).astype(dtype)


def make_aug_queries(
    queries: jax.Array,  # [B, d_pad] f32 (zero-padded past dims)
    q_sq: jax.Array,  # [B]
    metric: MetricKind,
    d_aug: int,
) -> tuple[jax.Array, jax.Array]:
    """Query-side counterpart of make_aug_table: (q_aug [B, d_aug] f32,
    bias [B] f32) such that proxy_score = dot(row_aug, q_aug) + bias."""
    b, d_pad = queries.shape
    if metric == MetricKind.L2SQ:
        q_aug = jnp.zeros((b, d_aug), jnp.float32)
        q_aug = q_aug.at[:, :d_pad].set(queries)
        q_aug = q_aug.at[:, d_pad].set(1.0)
        q_aug = q_aug.at[:, d_pad + 1].set(1.0)
        return q_aug, q_sq
    if metric == MetricKind.IP:
        return queries, jnp.ones_like(q_sq)
    inv = lax.rsqrt(jnp.maximum(q_sq, _EPS))
    return queries * inv[:, None], jnp.ones_like(q_sq)


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _nbr_fill_chunk(table, scales, vectors, vec_sq, nbr_chunk, off):
    """Quantize one chunk of neighborhoods into the donated tables."""
    safe = jnp.maximum(nbr_chunk, 0)  # [S, M0]
    # f32 quantization arithmetic regardless of store scalar_kind
    rows = jnp.take(vectors, safe, axis=0).astype(jnp.float32)  # [S, M0, D]
    absmax = jnp.max(jnp.abs(rows), axis=-1)  # [S, M0]
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q8 = jnp.clip(jnp.round(rows / scale[..., None]), -127, 127
                  ).astype(jnp.int8)
    table = lax.dynamic_update_slice(table, q8, (off, 0, 0))
    scales = lax.dynamic_update_slice(scales, scale, (off, 0))
    return table, scales


def make_neighborhood_tables(
    vectors: jax.Array,  # [cap, d_pad] f32 store
    vec_sq: jax.Array,  # [cap]
    neighbors0: jax.Array,  # [cap, M0]
    chunk: int = 32768,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Neighborhood-materialized traversal layout: for every node, its M0
    base-layer neighbors' VECTORS stored contiguously as one int8 row.

    Why: on TPU a random-row gather costs ~5-9 ns per row regardless of
    row size until HBM bandwidth binds (measured in
    benchmarks/profile_gather.py — 262k 256 B rows: 1.4 ms; 2k 64 KiB
    rows: 0.16 ms). The beam step's dominant cost is gathering E*M0
    scattered candidate rows per query; with this layout it becomes E
    contiguous 4 KiB rows per query (M0x fewer gathers for M0=32). The
    reference's pointer-chasing equivalent is the node tape holding
    neighbor SLOTS only (usearch index.hpp:1816-1843) — on TPU we trade
    M0x traversal memory for gather contiguity.

    int8 (per-neighbor-vector symmetric scales) rather than bf16: the
    single-program resident ceiling on this backend is ~8.5 GiB, and the
    bf16 table alone is 8 GiB at 1M x 128 x M0=32; int8 halves it AND
    doubles MXU dot throughput. Quantization noise (~0.4% of the row
    max per element) only perturbs traversal ranking — emitted distances
    come from the exact f32 rerank.

    Returns (nbr_vecs [cap, M0, d_pad] int8, nbr_scale [cap, M0] f32,
    nbr_sq [cap, M0] f32). Rows at padding positions (neighbor -1) hold
    node 0's vector and are masked by the caller via the id table.
    Built in chunks with donated updates so peak memory stays near the
    final table size (chunk 32768 keeps the f32 gather temporary under
    ~0.6 GB at d=128, M0=32 — round 2's driver bench OOMed here at
    chunk 131072 with a fragmented post-build HBM).

    The table is 3-D ([cap, M0, D], one node's neighborhood = one
    (M0, D) tile) END TO END: reshaping the 2-D [cap, M0*D] form to 3-D
    inside the search jit relayouts the whole multi-GB table on every
    call — measured 13.3 ms of fixed per-launch cost at 1M x 128, the
    single largest search-time line item found in round 3.
    """
    cap, d_pad = vectors.shape
    m0 = neighbors0.shape[1]
    table = jnp.zeros((cap, m0, d_pad), jnp.int8)
    scales = jnp.ones((cap, m0), jnp.float32)
    for off in range(0, cap, chunk):
        s = min(chunk, cap - off)
        nbr_chunk = lax.dynamic_slice(neighbors0, (off, 0), (s, m0))
        table, scales = _nbr_fill_chunk(table, scales, vectors, vec_sq,
                                        nbr_chunk, off)
    sq = jnp.take(vec_sq, jnp.maximum(neighbors0, 0), axis=0)  # [cap, M0]
    return table, scales, sq


@functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
def update_neighborhood_rows(nbr_vecs, nbr_scale, nbr_sq, nbr_meta,
                             vectors, vec_sq, neighbors0, new_slots):
    """Refresh the neighborhood layout for the rows an insert batch
    changed: the new nodes' own rows plus their forward targets (the
    only rows `insert_batch` amends via back-links /
    _force_nearest_backlink — both target subsets of the new nodes'
    forward edge lists, which ARE neighbors0[new_slots] post-update).
    B*(M0+1) row recomputes instead of a multi-GB table rebuild is what
    makes the fused traversal layout usable DURING construction, not
    just for reads (reference analog: usearch amends neighbor tapes in
    place under per-node locks, index.hpp:3269-3313; here the batch
    rewrites its changed rows after the functional graph step).

    new_slots may contain -1 (inactive pad); duplicate rows are fine —
    every duplicate writes identical values. Donated tables update in
    place (same compile-cache caveat as _refine_seg_scatter: donated
    executables skip the persistent cache; this program is tiny)."""
    from duckdb_vss_tpu.ops.pallas_beam import pack_meta

    nbr_new = jnp.take(neighbors0, jnp.maximum(new_slots, 0), axis=0)
    fwd = jnp.where(new_slots[:, None] >= 0, nbr_new, -1).reshape(-1)
    rows = jnp.concatenate([new_slots, fwd])  # [B*(M0+1)]
    safe_rows = jnp.maximum(rows, 0)
    nbr = jnp.take(neighbors0, safe_rows, axis=0)  # [R, M0]
    safe = jnp.maximum(nbr, 0)
    vrows = jnp.take(vectors, safe, axis=0).astype(jnp.float32)
    absmax = jnp.max(jnp.abs(vrows), axis=-1)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q8 = jnp.clip(jnp.round(vrows / scale[..., None]), -127, 127
                  ).astype(jnp.int8)
    sq = jnp.take(vec_sq, safe)  # unmasked, matching the full build
    meta = pack_meta(nbr, scale, sq)
    drop = jnp.where(rows >= 0, rows, jnp.int32(2**30))
    return (nbr_vecs.at[drop].set(q8, mode="drop"),
            nbr_scale.at[drop].set(scale, mode="drop"),
            nbr_sq.at[drop].set(sq, mode="drop"),
            nbr_meta.at[drop].set(meta, mode="drop"))


def quantize_queries_i8(queries: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-query symmetric int8 quantization: (q8 [B, D], scale [B])."""
    absmax = jnp.max(jnp.abs(queries), axis=-1)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q8 = jnp.clip(jnp.round(queries / scale[:, None]), -127, 127
                  ).astype(jnp.int8)
    return q8, scale


def fetch_upper_neighbors(state: GraphState, ids: jax.Array, level) -> jax.Array:
    """Neighbor lists of ``ids`` at upper ``level`` (1-based): [..., M]."""
    m = state.upper_neighbors.shape[1] // L_MAX
    slot = jnp.take(state.upper_slot, jnp.maximum(ids, 0), axis=0)
    has = (ids >= 0) & (slot >= 0)
    nbrs = jnp.take(
        state.upper_neighbors, jnp.maximum(slot, 0), axis=0
    )  # [..., L_MAX * M]
    lvl_idx = jnp.clip(level - 1, 0, L_MAX - 1)
    nbrs = lax.dynamic_slice_in_dim(
        nbrs, jnp.asarray(lvl_idx, jnp.int32) * m, m, axis=nbrs.ndim - 1)
    return jnp.where(has[..., None], nbrs, -1)


# ---------------------------------------------------------------------------
# greedy upper-level descent (search_for_one_, index.hpp:3383-3422)
# ---------------------------------------------------------------------------


def greedy_descent(
    state: GraphState,
    vectors: jax.Array,
    vec_sq: jax.Array,
    queries: jax.Array,  # [B, D]
    q_sq: jax.Array,
    stop_level: jax.Array,  # [B] int32: descend while level > stop_level
    metric: MetricKind,
    max_iters_per_level: int = 64,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Greedy 1-NN walk from the entry point down to stop_level+1.

    Returns (cur_node [B], cur_score [B], n_dist []). Queries whose
    stop_level >= max_level start at the entry untouched.
    """
    b = queries.shape[0]
    entry = jnp.broadcast_to(state.entry_node, (b,))
    cur = entry
    cur_score = jnp.where(
        entry >= 0,
        gather_scores(vectors, vec_sq, entry[:, None], queries, q_sq, metric)[:, 0],
        INF_SCORE,
    )
    n_dist = jnp.int32(b)

    def level_body(lvl_from_top, carry):
        cur, cur_score, n_dist = carry
        lvl = state.max_level - lvl_from_top  # descend max_level..1
        active_lvl = (lvl >= 1) & (lvl <= state.max_level)

        def step(loop_carry):
            cur, cur_score, moved, n_dist, _it = loop_carry
            nbrs = fetch_upper_neighbors(state, cur, lvl)  # [B, M]
            valid = nbrs >= 0
            s = gather_scores(vectors, vec_sq, nbrs, queries, q_sq, metric)
            s = jnp.where(valid, s, INF_SCORE)
            best_pos = jnp.argmin(s, axis=1)
            best_s = jnp.take_along_axis(s, best_pos[:, None], 1)[:, 0]
            best_id = jnp.take_along_axis(nbrs, best_pos[:, None], 1)[:, 0]
            active_q = active_lvl & (lvl > stop_level) & (cur >= 0)
            improve = active_q & (best_s < cur_score)
            cur = jnp.where(improve, best_id, cur)
            cur_score = jnp.where(improve, best_s, cur_score)
            n_dist = n_dist + jnp.sum(valid & active_q[..., None].astype(bool))
            return cur, cur_score, jnp.any(improve), n_dist, _it + 1

        def cond(loop_carry):
            _, _, moved, _, it = loop_carry
            return moved & (it < max_iters_per_level)

        cur, cur_score, _, n_dist, _ = lax.while_loop(
            cond, step, (cur, cur_score, jnp.bool_(True), n_dist, jnp.int32(0))
        )
        return cur, cur_score, n_dist

    cur, cur_score, n_dist = lax.fori_loop(
        0, jnp.clip(state.max_level, 0, L_MAX), level_body,
        (cur, cur_score, n_dist)
    )
    return cur, cur_score, n_dist


# ---------------------------------------------------------------------------
# beam search at one level (search_to_insert_ / search_to_find_in_base_)
# ---------------------------------------------------------------------------


def beam_search(
    state: GraphState,
    vectors: jax.Array,
    vec_sq: jax.Array,
    queries: jax.Array,  # [B, D]
    q_sq: jax.Array,  # [B]
    entry_nodes: jax.Array,  # [B, P] int32 seeds (-1 allowed)
    ef: int,
    metric: MetricKind,
    level=0,  # 0 = base layer; >0 = upper layer (may be traced)
    expand: int = 2,  # E: beam entries expanded per step
    max_steps: int | None = None,
    active: jax.Array | None = None,  # [B] bool; inactive queries do nothing
    use_pallas: bool = False,  # fused DMA gather+score kernel (TPU only)
    loop: str = "while",  # "while" (early exit) | "scan" | "unroll"
    aug: bool = False,  # vectors/queries/q_sq are augmented (make_aug_table)
    nbr_vecs: jax.Array | None = None,  # [cap, M0, D] i8 neighborhood layout
    nbr_scale: jax.Array | None = None,  # [cap, M0] f32 dequant scales
    nbr_sq: jax.Array | None = None,  # [cap, M0]
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Batched best-first beam search. Returns (scores [B, ef] ascending,
    ids [B, ef], n_dist []). Tombstones are NOT filtered here (matches
    usearch: the filter predicate applies to results, not traversal).

    aug=True: ``vectors`` is an augmented traversal table, ``queries``
    its matching q_aug and ``q_sq`` the per-query bias (make_aug_table /
    make_aug_queries) — one row-gather per candidate instead of two.
    """
    b, p = entry_nodes.shape
    base = isinstance(level, int) and level == 0
    if max_steps is None:
        max_steps = 3 * ef // expand + 8
    if active is None:
        active = jnp.ones((b,), jnp.bool_)

    # init beam from entry points
    seed_valid = (entry_nodes >= 0) & active[:, None]
    seed_s = gather_scores(vectors, vec_sq, entry_nodes, queries, q_sq,
                           metric, aug=aug)
    seed_s = jnp.where(seed_valid, seed_s, INF_SCORE)
    # dedup seeds (same entry may be given twice)
    dup = jnp.triu(
        entry_nodes[:, :, None] == entry_nodes[:, None, :], k=1
    ).any(axis=1)
    seed_s = jnp.where(dup, INF_SCORE, seed_s)

    pad_n = ef - p if ef > p else 0
    scores = jnp.concatenate(
        [seed_s, jnp.full((b, pad_n), INF_SCORE, jnp.float32)], axis=1
    ) if pad_n else seed_s
    ids = jnp.concatenate(
        [jnp.where(seed_valid, entry_nodes, -1),
         jnp.full((b, pad_n), -1, jnp.int32)], axis=1
    ) if pad_n else jnp.where(seed_valid, entry_nodes, -1)
    if p > ef:
        neg, pos = lax.top_k(-scores, ef)
        scores, ids = -neg, jnp.take_along_axis(ids, pos, axis=1)
    expanded = jnp.zeros((b, ef), jnp.bool_)
    n_dist = jnp.sum(seed_valid.astype(jnp.int32))

    beam_pos = jnp.arange(ef, dtype=jnp.int32)

    if nbr_vecs is not None and base:
        q_i8, q_scale = quantize_queries_i8(queries.astype(jnp.float32))
    else:
        q_i8 = q_scale = None

    def fetch(sel_ids):
        if base:
            has = sel_ids >= 0
            nbrs = jnp.take(state.neighbors0, jnp.maximum(sel_ids, 0), axis=0)
            return jnp.where(has[..., None], nbrs, -1)
        return fetch_upper_neighbors(state, sel_ids, level)

    def step(carry):
        scores, ids, expanded, n_dist, it, _ = carry
        # select E best unexpanded candidates
        sel_key = jnp.where(expanded | (scores >= INF_SCORE), INF_SCORE, scores)
        neg_sel, sel_pos = lax.top_k(-sel_key, expand)  # [B, E]
        sel_live = (-neg_sel) < INF_SCORE
        sel_ids = jnp.where(
            sel_live, jnp.take_along_axis(ids, sel_pos, axis=1), -1
        )
        # mark expanded
        hit = jnp.any(
            (beam_pos[None, None, :] == sel_pos[:, :, None]) & sel_live[..., None],
            axis=1,
        )
        expanded = expanded | hit

        nbrs = fetch(sel_ids).reshape(b, -1)  # [B, E*M]
        valid = (nbrs >= 0) & active[:, None]
        # dedup against beam
        in_beam = jnp.any(nbrs[:, :, None] == ids[:, None, :], axis=2)
        # dedup within the new candidate block (keep first occurrence)
        dup_new = jnp.triu(
            nbrs[:, :, None] == nbrs[:, None, :], k=1
        ).any(axis=1)
        keep = valid & ~in_beam & ~dup_new

        if nbr_vecs is not None and base:
            # neighborhood layout: E contiguous int8 rows/query hold the
            # expanded nodes' neighbor VECTORS + norms — M0x fewer
            # gathered rows than per-candidate gathers, int8 MXU dots
            sel_safe = jnp.maximum(sel_ids, 0)  # [B, E]
            d = queries.shape[1]
            rows = jnp.take(nbr_vecs, sel_safe, axis=0)  # [B, E, M0, D] i8
            cand = rows.reshape(b, -1, d)  # [B, E*M0, D]
            v_sq = jnp.take(nbr_sq, sel_safe, axis=0).reshape(b, -1)
            v_scale = jnp.take(nbr_scale, sel_safe, axis=0).reshape(b, -1)
            dot_i = lax.dot_general(
                cand, q_i8,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32)
            dot = dot_i.astype(jnp.float32) * v_scale * q_scale[:, None]
            s = metric_epilogue(dot, v_sq, q_sq, metric)
        elif use_pallas and not aug:
            from duckdb_vss_tpu.ops.pallas_gather import gather_scores_pallas

            s = gather_scores_pallas(
                vectors, jnp.where(keep, nbrs, -1), queries, q_sq, metric)
        else:
            s = gather_scores(vectors, vec_sq, nbrs, queries, q_sq, metric,
                              aug=aug)
        s = jnp.where(keep, s, INF_SCORE)
        n_dist = n_dist + jnp.sum(keep.astype(jnp.int32))

        # merge into beam: top-ef of (beam ∪ new)
        cat_s = jnp.concatenate([scores, s], axis=1)
        cat_i = jnp.concatenate([ids, jnp.where(keep, nbrs, -1)], axis=1)
        cat_e = jnp.concatenate(
            [expanded, jnp.zeros_like(keep)], axis=1
        )
        neg_top, pos = lax.top_k(-cat_s, ef)
        scores = -neg_top
        ids = jnp.take_along_axis(cat_i, pos, axis=1)
        expanded = jnp.take_along_axis(cat_e, pos, axis=1)

        done = jnp.all(expanded | (scores >= INF_SCORE))
        return scores, ids, expanded, n_dist, it + 1, done

    def cond(carry):
        *_, it, done = carry
        return (~done) & (it < max_steps)

    init = (scores, ids, expanded, n_dist, jnp.int32(0), jnp.bool_(False))
    if loop == "while":
        scores, ids, expanded, n_dist, _, _ = lax.while_loop(cond, step, init)
    elif loop == "scan":
        def scan_step(carry, _):
            return step(carry), None

        (scores, ids, expanded, n_dist, _, _), _ = lax.scan(
            scan_step, init, None, length=max_steps)
    else:  # "unroll": fixed trip count, fully fused across steps
        carry = init
        for _ in range(max_steps):
            carry = step(carry)
        scores, ids, expanded, n_dist, _, _ = carry
    return scores, ids, n_dist


def mxu_descent(
    upper_vecs: jax.Array,  # [cap_u, D] (bf16 or f32) vectors of level>=1 nodes
    upper_vec_sq: jax.Array,  # [cap_u] f32
    upper_node: jax.Array,  # [cap_u] int32 owning node, -1 if slot unused
    entry_node: jax.Array,  # [] int32 fallback when no upper nodes exist
    queries: jax.Array,  # [B, D] f32
    q_sq: jax.Array,  # [B]
    metric: MetricKind,
    n_seeds: int,
    block: int = 128,
) -> tuple[jax.Array, jax.Array]:
    """Exact coarse routing on the MXU: score EVERY upper-level node
    against every query in one matmul and take the top-n_seeds as
    base-layer seeds.

    This replaces the reference's sequential greedy descent
    (search_for_one_, /root/reference/src/include/usearch/index.hpp:
    3383-3422) with the operation the TPU is built for: upper-level
    nodes are a ~1/M fraction of the index, so brute-forcing them is one
    [B, D] x [D, cap_u] matmul (~bf16 MXU) instead of ~max_level x
    beam-steps of serialized random-row gathers — and the seeds it
    produces are the EXACT nearest upper nodes, strictly better routing
    than any greedy walk. Returns (seeds [B, n_seeds], n_dist []).
    """
    from duckdb_vss_tpu.ops.topk import flat_topk

    b = queries.shape[0]
    live = upper_node >= 0
    n_dist = jnp.sum(live.astype(jnp.int32)) * b
    # streaming blockwise selection: the [B, cap_u] score matrix never
    # hits HBM (2 GB at B=2048, cap_u=256k), and per-block selection is
    # the TPU's hardware approximate top-k — seeds feed a beam that
    # reranks exactly, so per-block slack is immaterial
    score, slot = flat_topk(
        queries, upper_vecs, n_seeds, metric, vec_sq=upper_vec_sq,
        valid=live, block_n=min(16384, upper_vecs.shape[0]),
        precision=lax.Precision.DEFAULT, approx=True)
    seeds = jnp.where(
        score < INF_SCORE,
        jnp.take(upper_node, jnp.maximum(slot, 0), axis=0),
        -1,
    )
    # no upper level yet: fall back to the entry node as the only seed
    seeds = jnp.where(
        jnp.any(seeds >= 0, axis=1, keepdims=True),
        seeds,
        jnp.broadcast_to(entry_node, seeds.shape),
    )
    return seeds, n_dist


# ---------------------------------------------------------------------------
# full search (descent + base beam + tombstone filter + exact rerank)
# ---------------------------------------------------------------------------


def beam_descent(
    state: GraphState,
    vectors: jax.Array,
    vec_sq: jax.Array,
    queries: jax.Array,  # [B, D]
    q_sq: jax.Array,
    metric: MetricKind,
    descent_ef: int = 16,
    n_seeds: int = 4,
    descent_steps: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Small-beam descent through the upper levels.

    Greedy 1-NN descent (the reference's search_for_one_) is a hill climb
    and strands queries in local minima of the sparse upper graphs —
    especially over bulk-built skeletons on clustered data. A narrow beam
    per level, carried level to level, lands a *set* of good base-layer
    seeds instead of one. Returns (seed_ids [B, n_seeds], n_dist [])."""
    b = queries.shape[0]
    # levels max..2: greedy hill-climb (few nodes, cheap); level 1: one
    # short beam — that's where cluster-level routing is decided and a
    # single greedy path strands queries
    stop_level = jnp.ones((b,), jnp.int32)
    cur, _, nd0 = greedy_descent(
        state, vectors, vec_sq, queries, q_sq, stop_level, metric
    )
    scores, ids, nd1 = beam_search(
        state, vectors, vec_sq, queries, q_sq, cur[:, None], descent_ef,
        metric, level=1, expand=4,
        max_steps=descent_steps or descent_ef,
        active=jnp.broadcast_to(state.max_level >= 1, (b,)),
    )
    seeds = ids[:, :n_seeds]
    seeds = jnp.where(seeds >= 0, seeds, cur[:, None])
    return seeds, nd0 + nd1


def search_graph(
    state: GraphState,
    vectors: jax.Array,
    vec_sq: jax.Array,
    valid_mask: jax.Array,  # [cap] bool; tombstone filter for RESULTS only
    queries: jax.Array,  # [B, D] (padded)
    k: int,
    ef: int,
    metric: MetricKind,
    expand: int = 2,
    max_steps: int | None = None,
    use_pallas: bool = False,
    descent_ef: int = 16,
    n_seeds: int = 4,
    loop: str = "while",
    descent_steps: int | None = None,
    traversal_vectors: jax.Array | None = None,
    descent: str = "beam",  # "beam" | "mxu"
    upper_vecs: jax.Array | None = None,  # required for descent="mxu"
    upper_vec_sq: jax.Array | None = None,
    upper_nodes: jax.Array | None = None,  # slot->node map matching
    # upper_vecs' row count (a compacted slice of state.upper_node;
    # upper slots are allocated sequentially so rows past upper_count
    # are never live). Defaults to the full state.upper_node.
    aug_table: jax.Array | None = None,  # augmented traversal (make_aug_table)
    nbr_vecs: jax.Array | None = None,  # neighborhood layout (make_
    nbr_scale: jax.Array | None = None,  # neighborhood_tables: i8 rows,
    nbr_sq: jax.Array | None = None,  # dequant scales, squared norms)
    nbr_meta: jax.Array | None = None,  # pallas_beam.pack_meta rows
    pallas_beam: bool = False,  # fused on-chip beam kernel (TPU only)
    hop_rerank: int = 0,  # expand the top-`hop_rerank` results one hop
    # at the finish and merge exactly (see _finish_search)
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """End-to-end ANN search. Returns (scores [B, k] ascending exact
    index-metric values, ids [B, k] slot ids with -1 fill, n_dist []).

    traversal_vectors, if given, is a reduced-precision (bf16) copy of
    ``vectors`` used for descent + beam scoring only — halving the
    per-step gather bandwidth; the final rerank always reads the f32
    store so emitted distances stay exact.

    aug_table, if given, supersedes traversal_vectors for the BASE beam:
    an augmented bf16 table (make_aug_table) folding the member-side
    metric terms into the row, so traversal needs one gather per
    candidate instead of two (vector + vec_sq).

    descent="mxu" routes through one exact matmul over all upper-level
    nodes (mxu_descent) instead of the level-1 beam walk; upper_vecs /
    upper_vec_sq must then hold the upper-slot vector table."""
    queries = queries.astype(jnp.float32)
    q_sq = jnp.sum(queries * queries, axis=-1)
    trav = vectors if traversal_vectors is None else traversal_vectors

    if descent == "mxu":
        seeds, n_dist0 = mxu_descent(
            upper_vecs, upper_vec_sq,
            state.upper_node if upper_nodes is None else upper_nodes,
            state.entry_node, queries, q_sq, metric, n_seeds)
    else:
        seeds, n_dist0 = beam_descent(
            state, trav, vec_sq, queries, q_sq, metric,
            descent_ef=descent_ef, n_seeds=n_seeds,
            descent_steps=descent_steps,
        )
    ef_eff = max(ef, k)
    # the fused kernel's merge is a bitonic network (log-depth in
    # ef + expand*M0), so wide beams compile and run on-chip; very wide
    # ef still falls back to the XLA beam's lax.top_k merge
    if (pallas_beam and nbr_vecs is not None and nbr_meta is not None
            and ef_eff <= 128 and expand <= 8):
        from duckdb_vss_tpu.ops.pallas_beam import beam_search_pallas

        # seed beam: score + dedup + sort the descent seeds
        seed_valid = seeds >= 0
        seed_s = gather_scores(vectors, vec_sq, seeds, queries, q_sq, metric)
        seed_s = jnp.where(seed_valid, seed_s, INF_SCORE)
        dup = jnp.triu(
            seeds[:, :, None] == seeds[:, None, :], k=1).any(axis=1)
        seed_s = jnp.where(dup, INF_SCORE, seed_s)
        p = seeds.shape[1]
        if p < ef_eff:
            seed_s = jnp.concatenate(
                [seed_s, jnp.full((seed_s.shape[0], ef_eff - p), INF_SCORE,
                                  jnp.float32)], axis=1)
            seed_i = jnp.concatenate(
                [jnp.where(seed_valid, seeds, -1),
                 jnp.full((seeds.shape[0], ef_eff - p), -1, jnp.int32)],
                axis=1)
        else:
            seed_i = jnp.where(seed_valid, seeds, -1)
        neg, pos0 = lax.top_k(-seed_s, ef_eff)
        seed_s = -neg
        seed_i = jnp.take_along_axis(seed_i, pos0, axis=1)
        # measured on 1M x 128 clustered: recall saturates by ef/2 steps
        # (0.9818 from 8 through 20 steps at ef=16; 0.9959 at 16 steps
        # for ef=32) — the fixed-trip kernel needs no while-loop
        steps = max_steps if max_steps is not None else max(8, ef_eff // 2)
        m0 = state.neighbors0.shape[1]
        scores, ids, n_dist1 = beam_search_pallas(
            queries, q_sq, seed_s, seed_i, nbr_meta, nbr_vecs,
            ef=ef_eff, expand=expand, m0=m0, d=queries.shape[1],
            max_steps=steps, metric=metric,
            interpret=jax.default_backend() == "cpu")
        n_dist1 = n_dist1 + jnp.sum(seed_valid.astype(jnp.int32))
        return _finish_search(state, vectors, vec_sq, valid_mask, queries,
                              q_sq, metric, k, scores, ids,
                              n_dist0 + n_dist1, hop=hop_rerank,
                              nbr_vecs=nbr_vecs, nbr_scale=nbr_scale,
                              nbr_sq=nbr_sq)
    if aug_table is not None and nbr_vecs is None:
        q_aug, bias = make_aug_queries(
            queries, q_sq, metric, aug_table.shape[1])
        beam_tab, beam_q, beam_qsq, beam_vsq = aug_table, q_aug, bias, vec_sq
    else:
        beam_tab, beam_q, beam_qsq, beam_vsq = trav, queries, q_sq, vec_sq
    scores, ids, n_dist1 = beam_search(
        state,
        beam_tab,
        beam_vsq,
        beam_q,
        beam_qsq,
        seeds,
        ef_eff,
        metric,
        level=0,
        expand=expand,
        max_steps=max_steps,
        use_pallas=use_pallas,
        loop=loop,
        aug=aug_table is not None and nbr_vecs is None,
        nbr_vecs=nbr_vecs,
        nbr_scale=nbr_scale,
        nbr_sq=nbr_sq,
    )
    return _finish_search(state, vectors, vec_sq, valid_mask, queries,
                          q_sq, metric, k, scores, ids, n_dist0 + n_dist1,
                          hop=hop_rerank, nbr_vecs=nbr_vecs,
                          nbr_scale=nbr_scale, nbr_sq=nbr_sq)


def _finish_search(state, vectors, vec_sq, valid_mask, queries, q_sq,
                   metric, k, scores, ids, n_dist, hop=0,
                   nbr_vecs=None, nbr_scale=None, nbr_sq=None):
    """Tombstone filter (usearch injects an `allow` predicate over
    results, index_dense.hpp:1797-1827) then exact rerank at HIGHEST
    precision so emitted distances/order match the reference's scalar
    f32 kernels. Deterministic tie order: equal exact distances resolve
    to the higher slot id (hnsw_topk.test:20-28).

    hop > 0 adds a one-hop rerank expansion: score the NEIGHBORS of the
    top-hop results and merge the best into the final top-k. Measured
    on 1M x 128 clustered (round 4): misses at the recall ceiling are
    dominated by rank-9 boundary ties whose true neighbor was never
    visited but IS adjacent to a returned result — one hop recovers
    them (0.9922 -> 0.9972 at ef=96, 0.9906 -> 0.9955 at ef=64/12
    steps) for about one extra beam-step of work. With the int8
    neighborhood layout the hop reads `hop` contiguous tiles per query;
    otherwise it falls back to per-candidate gathers from the store.
    The merged winners are re-scored exactly (f32 HIGHEST), so emitted
    distances and tie order keep reference parity.

    Layout note (round-4 advisor): the top-16 candidate CUT before the
    exact rescore ranks by int8-quantized scores when the neighborhood
    layout is present but by exact scores in the gather fallback, so
    the same hop setting can admit a slightly different candidate-16
    set per layout; the final merge is exact either way, so this only
    matters for candidates straddling the 16th-place int8 quantization
    boundary (~2^-7 relative). Callers needing layout-independent
    results should disable hop_rerank or the neighborhood layout."""
    live = jnp.take(valid_mask, jnp.maximum(ids, 0), axis=0) & (ids >= 0)
    exact = gather_scores(
        vectors, vec_sq, ids, queries, q_sq, metric,
        precision=lax.Precision.HIGHEST,
    )
    exact = jnp.where(live & (scores < INF_SCORE), exact, INF_SCORE)
    # one lexicographic sort on (score asc, id desc) replaces the round-2
    # double stable-argsort + three take_alongs (measured 4.3 ms of the
    # 7.6 ms finish at B=8192, ef=16 — /tmp micro-probe, round 3)
    out_s, neg_i = lax.sort((exact, -ids), dimension=1, num_keys=2)
    out_s = out_s[:, :k]
    out_i = -neg_i[:, :k]
    out_i = jnp.where(out_s >= INF_SCORE, -1, out_i)
    if hop:
        b = queries.shape[0]
        h = min(int(hop), k)
        src = out_i[:, :h]
        has = src >= 0
        safe_src = jnp.maximum(src, 0)
        nbrs = jnp.take(state.neighbors0, safe_src, axis=0)  # [B, h, M0]
        nbrs = jnp.where(has[..., None], nbrs, -1)
        cand = nbrs.reshape(b, -1)  # [B, h*M0]
        if nbr_vecs is not None:
            # tile rows of nbr_vecs[src] ARE the vectors of
            # neighbors0[src], column-aligned with `cand`
            q_i8, q_scale = quantize_queries_i8(queries)
            tiles = jnp.take(nbr_vecs, safe_src, axis=0)  # [B,h,M0,D] i8
            d = queries.shape[1]
            dot_i = lax.dot_general(
                tiles.reshape(b, -1, d), q_i8,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32)
            v_scale = jnp.take(nbr_scale, safe_src, axis=0).reshape(b, -1)
            v_sq = jnp.take(nbr_sq, safe_src, axis=0).reshape(b, -1)
            dot = dot_i.astype(jnp.float32) * v_scale * q_scale[:, None]
            s_c = metric_epilogue(dot, v_sq, q_sq, metric)
        else:
            s_c = gather_scores(vectors, vec_sq, cand, queries, q_sq,
                                metric)
        # mask BEFORE selecting: the top results are each other's
        # neighbors, so without pre-dedup the top-r by score is mostly
        # ids already in the result set (plus copies of the same new
        # candidate reached from several results) and almost no
        # genuinely-new candidate survives — measured: post-selection
        # dedup recovered only ~35% of the host-computed one-hop lift
        in_out = jnp.any(cand[:, :, None] == out_i[:, None, :], axis=2)
        order_c = jnp.argsort(cand, axis=1)
        sorted_c = jnp.take_along_axis(cand, order_c, axis=1)
        dup_sorted = jnp.concatenate(
            [jnp.zeros((b, 1), jnp.bool_),
             sorted_c[:, 1:] == sorted_c[:, :-1]], axis=1)
        dup = jnp.zeros(cand.shape, jnp.bool_).at[
            jnp.arange(b)[:, None], order_c].set(dup_sorted)
        live_c = jnp.take(valid_mask, jnp.maximum(cand, 0), axis=0)
        keep = (cand >= 0) & live_c & ~in_out & ~dup
        s_c = jnp.where(keep, s_c, INF_SCORE)
        n_dist = n_dist + jnp.sum((cand >= 0).astype(jnp.int32))
        r = min(16, cand.shape[1])
        neg_c, pos = lax.top_k(-s_c, r)
        cand_r = jnp.take_along_axis(cand, pos, axis=1)  # [B, r]
        ok_r = ((-neg_c) < INF_SCORE) & (cand_r >= 0)
        exact_r = gather_scores(
            vectors, vec_sq, cand_r, queries, q_sq, metric,
            precision=lax.Precision.HIGHEST)
        exact_r = jnp.where(ok_r, exact_r, INF_SCORE)
        m_s = jnp.concatenate([out_s, exact_r], axis=1)
        m_i = jnp.concatenate([out_i, jnp.where(ok_r, cand_r, -1)], axis=1)
        m_s2, m_neg = lax.sort((m_s, -m_i), dimension=1, num_keys=2)
        out_s = m_s2[:, :k]
        out_i = -m_neg[:, :k]
        out_i = jnp.where(out_s >= INF_SCORE, -1, out_i)
    return out_s, out_i, n_dist
