"""Blockwise top-k selection over HBM-resident vector blocks.

The reference's brute-force path is DuckDB's TopN operator over a scalar
distance projection; its HNSW path materializes the whole k-result at scan
init (/root/reference/src/hnsw/hnsw_index.cpp:285-326). The TPU equivalent
streams [block_n, D] vector blocks through the MXU and keeps a running
top-k accumulator, so the full [B, N] score matrix never hits HBM.

All shapes are static; invalid/padded/deleted rows are masked to a large
finite score (INF_SCORE) so they can never enter the result set.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from duckdb_vss_tpu.ops.distance import score_matrix, sq_norms
from duckdb_vss_tpu.utils.config import MetricKind
from duckdb_vss_tpu.utils.padding import INF_SCORE


def exact_topk_small(s: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """Exact ascending top-k (smallest scores) of ``s`` [B, N] for small k.

    lax.top_k on TPU pays a full-width partial sort per row (~9.5 ms for
    [8192, 16384] k=10 — round-3 micro-probe); this does a two-level
    tournament instead: fold N into 128 bins (one [B, N] min-reduce),
    then k cheap extraction passes over the [B, 128] bin table, each
    re-reducing only the 128-wide bin the winner came from. Exact for
    any input; ~6x faster at the bench shapes. Ties resolve to the
    lowest index (same as lax.top_k).

    N must be a multiple of 128 (callers pad with INF_SCORE).

    Contract for INF-padded rows: when a row has fewer than k finite
    scores, the tail positions carry INF_SCORE with DUPLICATE/arbitrary
    ids (a fully-masked bin re-reduces to position 0, which can win
    again) — unlike lax.top_k, which returns distinct indices. Callers
    must mask results by ``score >= INF_SCORE`` (flat.py does) rather
    than relying on id uniqueness at padded positions.
    """
    b, n = s.shape
    nb = 128
    w = n // nb
    assert n % nb == 0, (n, nb)
    s3 = s.reshape(b, nb, w)
    bin_min = jnp.min(s3, axis=2)  # [B, nb]
    bin_pos = jnp.argmin(s3, axis=2).astype(jnp.int32)  # [B, nb]
    rows = jnp.arange(b)
    lane3 = jnp.arange(w, dtype=jnp.int32)[None, :, None]  # [1, w, 1]

    def extract(j, carry):
        bin_min, bin_pos, out_s, out_i = carry
        g = jnp.argmin(bin_min, axis=1).astype(jnp.int32)  # [B]
        sc = jnp.min(bin_min, axis=1)
        pos = jnp.take_along_axis(bin_pos, g[:, None], axis=1)[:, 0]
        gid = g * w + pos
        out_s = out_s.at[:, j].set(sc)
        out_i = out_i.at[:, j].set(gid)
        # winner's bin: mask EVERY extraction taken from it so far
        # (including this one — s3 is never written, so each regather
        # must re-mask all of the bin's extracted elements), re-reduce
        bin_row = jnp.take_along_axis(s3, g[:, None, None], axis=1)[:, 0]
        taken_in_bin = (out_i // w == g[:, None]) & (
            jnp.arange(out_i.shape[1])[None, :] <= j)
        taken_pos = jnp.where(taken_in_bin, out_i % w, -1)  # [B, k]
        bin_row = jnp.where(
            jnp.any(lane3 == taken_pos[:, None, :], axis=2),
            INF_SCORE, bin_row)
        new_min = jnp.min(bin_row, axis=1)
        new_pos = jnp.argmin(bin_row, axis=1).astype(jnp.int32)
        bin_min = bin_min.at[rows, g].set(new_min)
        bin_pos = bin_pos.at[rows, g].set(new_pos)
        return bin_min, bin_pos, out_s, out_i

    out_s = jnp.full((b, k), INF_SCORE, s.dtype)
    out_i = jnp.full((b, k), -1, jnp.int32)
    _, _, out_s, out_i = lax.fori_loop(
        0, k, extract, (bin_min, bin_pos, out_s, out_i))
    return out_s, out_i


def _stash_budget_bytes() -> int:
    """HBM the stashed-score flat scan may spend on its [B, N] f32
    stash (flat_topk_stashed). Default 0 = DISABLED: the stash path
    measured 2.6x slower than the per-block tournament on TPU v5e (the
    extraction-phase HBM gather — see flat_topk_stashed docstring).
    Set DVT_FLAT_STASH_GB to opt in on backends with fast dynamic
    gathers."""
    import os

    return int(float(os.environ.get("DVT_FLAT_STASH_GB", "0"))
               * (1 << 30))


def merge_topk(
    scores_a: jax.Array,
    ids_a: jax.Array,
    scores_b: jax.Array,
    ids_b: jax.Array,
    k: int,
) -> tuple[jax.Array, jax.Array]:
    """Merge two ascending candidate sets [B, ka] + [B, kb] -> best k.

    Also the building block of the distributed top-k merge (shards
    all-gather their local top-k and every host merges; see parallel/).
    """
    cat_s = jnp.concatenate([scores_a, scores_b], axis=1)
    cat_i = jnp.concatenate([ids_a, ids_b], axis=1)
    neg_top, pos = lax.top_k(-cat_s, k)
    return -neg_top, jnp.take_along_axis(cat_i, pos, axis=1)


def flat_topk_dense(
    queries: jax.Array,
    vectors: jax.Array,
    k: int,
    metric: MetricKind,
    vec_sq: jax.Array | None = None,
    valid: jax.Array | None = None,
    precision=None,
) -> tuple[jax.Array, jax.Array]:
    """Single-matmul top-k for small N: [B, D] x [N, D] -> ([B, k], [B, k]).

    k may exceed N (e.g. a generic TopN with LIMIT > row count): results
    are padded with (INF_SCORE, -1) past N."""
    precision = precision or jax.lax.Precision.HIGHEST
    n = vectors.shape[0]
    q_f32 = queries.astype(jnp.float32)
    s = score_matrix(q_f32.astype(vectors.dtype), vectors, metric,
                     vec_sq=vec_sq, query_sq=sq_norms(q_f32),
                     precision=precision)
    if valid is not None:
        s = jnp.where(valid[None, :], s, INF_SCORE)
    kk = min(k, n)
    if kk <= 32 and n % 128 == 0:
        scores, ids = exact_topk_small(s, kk)
    else:
        neg_top, ids = lax.top_k(-s, kk)
        scores = -neg_top
    if kk < k:
        b = scores.shape[0]
        scores = jnp.concatenate(
            [scores, jnp.full((b, k - kk), INF_SCORE, scores.dtype)], axis=1)
        ids = jnp.concatenate(
            [ids, jnp.full((b, k - kk), -1, ids.dtype)], axis=1)
    return scores, ids


def flat_topk_stashed(
    queries: jax.Array,
    vectors: jax.Array,
    k: int,
    metric: MetricKind,
    vec_sq: jax.Array,
    valid: jax.Array,
    block_n: int,
    precision,
) -> tuple[jax.Array, jax.Array]:
    """Exact streaming top-k with a GLOBAL extraction phase.

    Stashes the full score matrix [B, N] in HBM while the scan computes
    it, folds each block into 128-wide bins, then runs ONLY k global
    extraction passes (vs the per-block tournament's nb*k): argmin over
    the [B, N/128] bin minima, regather the winner's 128-wide bin from
    the stash, re-reduce. Bitwise-identical results and tie order to
    the per-block tournament (the same score values are re-read; ties
    resolve to the lowest bin then lowest lane).

    MEASURED SLOWER on TPU v5e — default OFF (round-5 negative result,
    kept because it is exact, tested, and the trade may flip on other
    backends). At the config-1 shape (131072 x 64, B=8192, k=10):
    per-block tournament 53.9 ms; this path 140.9 ms = 36.3 ms
    scan+stash + 111.5 ms extraction — XLA lowers the dynamic-start
    128-wide row gather from the 4.3 GB stash catastrophically
    (~11 ms/pass for a 4 MB read). Phase 1 alone (HIGHEST-precision
    f32 matmul + bin fold, no stash) is 27.7 ms, so the exact-parity
    scan is matmul-precision-bound: the round-4 "<=20 ms" target is
    unreachable without relaxing the HIGHEST/numpy-parity contract,
    and selection-side work beyond ~26 ms is already secondary."""
    b = queries.shape[0]
    n, d = vectors.shape
    nb = n // block_n
    q_f32 = queries.astype(jnp.float32)
    q_sq = sq_norms(q_f32)
    queries = q_f32.astype(vectors.dtype)
    v_blocks = vectors.reshape(nb, block_n, d)
    sq_blocks = vec_sq.reshape(nb, block_n)
    valid_blocks = valid.reshape(nb, block_n)

    # scan (not fori_loop + dynamic_update_slice): scan's stacked ys
    # write each block's scores ONCE into the preallocated output; a
    # [B, N] loop carry measured 3x slower (XLA copied the multi-GB
    # carry instead of aliasing it in place)
    def step(_, xs):
        v, sq, va = xs
        s = score_matrix(queries, v, metric, vec_sq=sq, query_sq=q_sq,
                         precision=precision)
        s = jnp.where(va[None, :], s, INF_SCORE)
        s3 = s.reshape(b, block_n // 128, 128)
        return 0, (s, jnp.min(s3, axis=2),
                   jnp.argmin(s3, axis=2).astype(jnp.int32))

    _, (s_stack, bm, bp) = lax.scan(
        step, 0, (v_blocks, sq_blocks, valid_blocks))
    # s_stack [nb, B, block_n] stays in block-stacked layout (a
    # transpose to [B, N] would re-copy the multi-GB stash); bins are
    # small and DO get the [B, nbins] layout for the extraction argmin
    bin_min = jnp.moveaxis(bm, 0, 1).reshape(b, -1)  # [B, nbins]
    bin_pos = jnp.moveaxis(bp, 0, 1).reshape(b, -1)
    bins_per_block = block_n // 128

    rows = jnp.arange(b)
    lane3 = jnp.arange(128, dtype=jnp.int32)[None, :, None]
    s_flat = s_stack.reshape(-1)  # [nb * B * block_n]
    slice_flat = jax.vmap(
        lambda st: lax.dynamic_slice(s_flat, (st,), (128,)))

    def extract(j, carry):
        bin_min, bin_pos, out_s, out_i = carry
        g = jnp.argmin(bin_min, axis=1).astype(jnp.int32)  # [B] global bin
        sc = jnp.min(bin_min, axis=1)
        pos = jnp.take_along_axis(bin_pos, g[:, None], axis=1)[:, 0]
        out_s = out_s.at[:, j].set(sc)
        out_i = out_i.at[:, j].set(g * 128 + pos)
        # winner's 128-wide bin from the block-stacked stash
        blk = g // bins_per_block
        start = ((blk * b + rows) * block_n
                 + (g % bins_per_block) * 128)
        bin_row = slice_flat(start)  # [B, 128]
        taken_in_bin = (out_i // 128 == g[:, None]) & (
            jnp.arange(out_i.shape[1])[None, :] <= j)
        taken_pos = jnp.where(taken_in_bin, out_i % 128, -1)
        bin_row = jnp.where(
            jnp.any(lane3 == taken_pos[:, None, :], axis=2),
            INF_SCORE, bin_row)
        bin_min = bin_min.at[rows, g].set(jnp.min(bin_row, axis=1))
        bin_pos = bin_pos.at[rows, g].set(
            jnp.argmin(bin_row, axis=1).astype(jnp.int32))
        return bin_min, bin_pos, out_s, out_i

    out_s = jnp.full((b, k), INF_SCORE, jnp.float32)
    out_i = jnp.full((b, k), -1, jnp.int32)
    _, _, out_s, out_i = lax.fori_loop(
        0, k, extract, (bin_min, bin_pos, out_s, out_i))
    return out_s, out_i


def flat_topk(
    queries: jax.Array,
    vectors: jax.Array,
    k: int,
    metric: MetricKind,
    vec_sq: jax.Array | None = None,
    valid: jax.Array | None = None,
    block_n: int = 16384,
    precision=None,
    approx: bool = False,
    approx_recall: float = 0.95,
) -> tuple[jax.Array, jax.Array]:
    """Streaming top-k: scan over [block_n, D] blocks with a running merge.

    ``vectors`` must be [N, D] with N divisible by ``block_n`` (the store
    guarantees this); returns ascending (scores [B, k], ids [B, k]).

    precision defaults to HIGHEST (exact row parity); the bulk-build kNN
    sweep passes DEFAULT (bf16 MXU passes, ~6x the f32 throughput) since
    its candidates feed graph construction, not user-facing results.

    approx=True swaps the per-block exact lax.top_k for the TPU's
    hardware-tiled lax.approx_max_k (PartialReduce): per-block selection
    is the sweep's wall-clock bound, and candidate lists feeding graph
    construction tolerate ~2% per-block recall slack. User-facing search
    paths must keep approx=False (exact row parity).
    """
    precision = precision or jax.lax.Precision.HIGHEST
    n, d = vectors.shape
    b = queries.shape[0]
    if n <= block_n:
        return flat_topk_dense(queries, vectors, k, metric, vec_sq, valid,
                               precision)
    assert n % block_n == 0, (n, block_n)
    nb = n // block_n
    if (not approx and k <= 32 and block_n % 128 == 0
            and b * n * 4 <= _stash_budget_bytes()):
        if vec_sq is None:
            vec_sq = sq_norms(vectors)
        if valid is None:
            valid = jnp.ones((n,), dtype=jnp.bool_)
        return flat_topk_stashed(queries, vectors, k, metric, vec_sq,
                                 valid, block_n, precision)

    # norms in f32 always; the matmul runs in the vector table's dtype
    # (a bf16 table — the bulk sweep — halves HBM traffic and doubles
    # MXU rate; the f32 store keeps exact user-facing results)
    q_f32 = queries.astype(jnp.float32)
    q_sq = sq_norms(q_f32)
    queries = q_f32.astype(vectors.dtype)
    if vec_sq is None:
        vec_sq = sq_norms(vectors)
    if valid is None:
        valid = jnp.ones((n,), dtype=jnp.bool_)

    v_blocks = vectors.reshape(nb, block_n, d)
    sq_blocks = vec_sq.reshape(nb, block_n)
    valid_blocks = valid.reshape(nb, block_n)
    offsets = jnp.arange(nb, dtype=jnp.int32) * block_n

    kc = min(k, block_n)

    # per block: matmul + per-block top-kc only; the running-merge is
    # replaced by ONE final selection over all blocks' candidates —
    # mathematically identical (global top-k = top-k of the union of
    # per-block top-k's) and it removes nb-1 merge ops from the scan,
    # which dominate the bulk sweep's wall-clock after the matmul
    def step(_, xs):
        v, sq, va, off = xs
        s = score_matrix(queries, v, metric, vec_sq=sq, query_sq=q_sq,
                         precision=precision)
        s = jnp.where(va[None, :], s, INF_SCORE)
        if approx:
            neg_top, pos = lax.approx_max_k(-s, kc,
                                            recall_target=approx_recall)
            pos = pos.astype(jnp.int32)
            blk_s = -neg_top
        elif kc <= 32 and block_n % 128 == 0:
            blk_s, pos = exact_topk_small(s, kc)
        else:
            neg_top, pos = lax.top_k(-s, kc)
            blk_s = -neg_top
        blk_ids = pos.astype(jnp.int32) + off
        return 0, (blk_s, blk_ids)

    _, (all_s, all_i) = lax.scan(
        step, 0, (v_blocks, sq_blocks, valid_blocks, offsets)
    )  # [nb, b, kc]
    all_s = jnp.moveaxis(all_s, 0, 1).reshape(b, nb * kc)
    all_i = jnp.moveaxis(all_i, 0, 1).reshape(b, nb * kc)
    kk = min(k, nb * kc)
    neg_top, pos = lax.top_k(-all_s, kk)
    scores = -neg_top
    ids = jnp.take_along_axis(all_i, pos, axis=1)
    if kk < k:  # LIMIT beyond candidate count: pad like flat_topk_dense
        scores = jnp.concatenate(
            [scores, jnp.full((b, k - kk), INF_SCORE, scores.dtype)], axis=1)
        ids = jnp.concatenate(
            [ids, jnp.full((b, k - kk), -1, ids.dtype)], axis=1)
    return scores, ids
