"""Fused Pallas TPU kernel: the entire base-layer beam search in one
kernel launch.

The XLA beam loop (models/graph.py beam_search) pays per-step XLA op
overheads (top-k merges, dedup masks, gather launches) that dominate
once the neighborhood layout makes the gather itself cheap: ~3 ms per
step at B=2048 against a ~20 us roofline. This kernel keeps the beam
state (scores/ids/expanded) in VMEM for a tile of queries and runs ALL
steps on-chip:

  per step, per tile of TB queries:
    1. top-E unexpanded selection (iterative argmin, VPU)
    2. selected ids staged in a VMEM scratch row and read back as
       scalars to address HBM
    3. 4 DMAs per (query, expansion): the three sections of a packed
       meta row [M0 neighbor ids | M0 dequant scales | M0 squared
       norms] (i32, bitcast) and the int8 neighbor-vector row [M0*D] —
       the neighborhood-materialized layout from
       graph.make_neighborhood_tables, so each step's vector traffic is
       E contiguous rows per query
    4. dequantized VPU scoring + metric epilogue
    5. dedup (vs beam, within block) and iterative top-ef merge

  The reference's equivalent inner loop is usearch's per-candidate heap
  walk (search_to_find_in_base_, /root/reference/src/include/usearch/
  index.hpp:3503-3573); here a whole query tile advances one step per
  loop iteration with all memory traffic explicit.

Shapes are static; queries are tiled TB per grid program (grid runs
sequentially on the single TensorCore, DMAs pipelined within a step).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from duckdb_vss_tpu.utils.config import MetricKind
from duckdb_vss_tpu.utils.padding import INF_SCORE

_EPS = 1e-30
import os as _os
TB = int(_os.environ.get("DVT_BEAM_TB", "64"))  # query rows per program
_ABLATE = None  # debug ablations: "noread" | "nomerge" | "nodma" |
# "noscore" | "nodedup"


def pack_meta(neighbors0, nbr_scale, nbr_sq) -> jax.Array:
    """Packed per-node meta row for single-DMA fetch:
    [M0 ids (i32) | M0 scales (f32 bits) | M0 norms (f32 bits) | pad],
    padded to a 128-lane multiple so full-row DMAs are lane-aligned."""
    m0 = neighbors0.shape[1]
    row = jnp.concatenate(
        [neighbors0,
         lax.bitcast_convert_type(nbr_scale, jnp.int32),
         lax.bitcast_convert_type(nbr_sq, jnp.int32)], axis=1)
    width = ((3 * m0 + 127) // 128) * 128
    if width != 3 * m0:
        row = jnp.concatenate(
            [row, jnp.full((row.shape[0], width - 3 * m0), -1, jnp.int32)],
            axis=1)
    return row


def _rolls(x, s):
    """(roll(x, -s), roll(x, +s)) along the lane dim via static slices
    (Mosaic-friendly: two slices + one concat each)."""
    return (jnp.concatenate([x[:, s:], x[:, :s]], axis=1),
            jnp.concatenate([x[:, -s:], x[:, :-s]], axis=1))


def _compare_exchange(score, payloads, s, asc):
    """One bitonic compare-exchange at stride s: lane i pairs with
    lane i^s; ascending blocks keep (min, max), descending (max, min).
    ``asc`` is a [1, P] bool mask of per-lane block direction, or None
    for all-ascending. Ties keep both lanes' own elements (consistent,
    no duplication). Bool tensors are combined with bitwise ops only —
    Mosaic rejects select-on-bool-operands (i8->i1 trunci)."""
    p = score.shape[1]
    lane = lax.broadcasted_iota(jnp.int32, (1, p), 1)
    low = (lane & s) == 0  # this lane is the block-low element
    sl, sr = _rolls(score, s)
    other_s = jnp.where(low, sl, sr)
    take_asc = (low & (other_s < score)) | (~low & (other_s > score))
    if asc is None:
        take = take_asc
    else:
        take_desc = (low & (other_s > score)) | (~low & (other_s < score))
        take = (asc & take_asc) | (~asc & take_desc)
    new_score = jnp.where(take, other_s, score)
    new_payloads = []
    for pay in payloads:
        pl_, pr_ = _rolls(pay, s)
        new_payloads.append(
            jnp.where(take, jnp.where(low, pl_, pr_), pay))
    return new_score, new_payloads


def _bitonic_sort(score, payloads, ascending=True):
    """Full bitonic sort over the lane dim (P a power of two).
    log2(P)*(log2(P)+1)/2 compare-exchange stages — depth grows with
    log^2(P), not P, so wide pools compile where an iterative argmin
    unroll explodes."""
    p = score.shape[1]
    lane = lax.broadcasted_iota(jnp.int32, (1, p), 1)
    k = 2
    while k <= p:
        asc_k = (lane & k) == 0 if ascending else (lane & k) != 0
        s = k // 2
        while s >= 1:
            score, payloads = _compare_exchange(score, payloads, s, asc_k)
            s //= 2
        k *= 2
    return score, payloads


def _bitonic_merge_asc(score, payloads):
    """Bitonic merge of a bitonic sequence (ascending run then
    descending run) into fully ascending order: log2(P) stages."""
    p = score.shape[1]
    s = p // 2
    while s >= 1:
        score, payloads = _compare_exchange(score, payloads, s, None)
        s //= 2
    return score, payloads


def _kernel(q_ref, qsq_ref, seed_s_ref, seed_i_ref,
            meta_hbm, vecs_hbm,
            out_s_ref, out_i_ref, out_nd_ref,
            sel_vmem, meta_scr, vec_scr, nd_acc,
            sem_meta, sem_vec,
            *, ef, expand, m0, d, max_steps, metric):
    """One tile: full beam search for TB queries.

    q_ref [TB, D] f32; qsq [TB, 1] f32; seed beam [TB, ef];
    meta_hbm [cap, W] i32 (W = 3*M0 padded to 128 lanes);
    vecs_hbm [cap, M0, D] i8 — 3-D so one node's slice is a whole
    (32, 128) int8 tile (1-row slices of a 2-D i8 array break its
    32-sublane HBM tiling).
    Scratch (all 2-D, lane-aligned — Mosaic rejects reshapes that merge
    a sub-128 minor dim): sel_vmem [TB, 128] i32 staging row read back
    as scalars for DMA addressing; ids/scale/sq scratches [TB, E*M0];
    vec_scr [TB, E*M0*D] i8; nd_acc [1, 1] i32 in SMEM.
    """
    c = expand * m0  # candidates per step

    beam_s = seed_s_ref[:]  # [TB, ef] f32
    beam_i = seed_i_ref[:]  # [TB, ef] i32
    # expanded flags carried as i32: Mosaic cannot round-trip bool
    # (i1) arrays through a fori_loop carry
    beam_e = jnp.zeros((TB, ef), jnp.int32)
    nd_acc[0, 0] = 0

    q = q_ref[:]  # [TB, D] f32
    q_bf = q.astype(jnp.bfloat16)
    q_sq = qsq_ref[:]  # [TB, 1]

    ef_pos = lax.broadcasted_iota(jnp.int32, (TB, ef), 1)

    def step(_, carry):
        beam_s, beam_i, beam_e = carry

        # -- 1. select top-E unexpanded candidates -----------------------
        # (no scatter in Mosaic; and no [TB, expand] narrow vectors —
        # Mosaic chokes on sub-lane bool casts — so per-e picks live in
        # 1-D vectors and a 128-lane staging row)
        key = jnp.where((beam_e != 0) | (beam_s >= INF_SCORE), INF_SCORE,
                        beam_s)
        lane = lax.broadcasted_iota(jnp.int32, (TB, 128), 1)
        sel_pad = jnp.zeros((TB, 128), jnp.int32)
        oks = []  # per-e [TB] bool
        for e in range(expand):
            pos = jnp.argmin(key, axis=1)  # [TB]
            hit = ef_pos == pos[:, None]  # [TB, ef] one-hot
            ok = jnp.min(key, axis=1) < INF_SCORE
            picked = jnp.sum(jnp.where(hit, beam_i, 0), axis=1)
            picked = jnp.where(ok, picked, 0)
            sel_pad = jnp.where(lane == e, picked[:, None], sel_pad)
            oks.append(ok)
            beam_e = jnp.maximum(
                beam_e, (hit & ok[:, None]).astype(jnp.int32))
            key = jnp.where(hit, INF_SCORE, key)

        # -- 2. stage selection for scalar readback ----------------------
        sel_vmem[:] = sel_pad

        # -- 3. fetch meta + vector rows (2 full-row DMAs per (t, e)) ----
        # scratch layout [E, TB, row]: .at[e, t] is a full VMEM row —
        # partial-row DMA destinations are rejected by Mosaic
        n_dma = 0 if _ABLATE == "nodma" else TB
        for t in range(n_dma):
            for e in range(expand):
                row = (t * expand + e if _ABLATE == "noread"
                       else sel_vmem[t, e])
                pltpu.make_async_copy(
                    meta_hbm.at[row], meta_scr.at[e, t], sem_meta).start()
                pltpu.make_async_copy(
                    vecs_hbm.at[row], vec_scr.at[e, t], sem_vec).start()
        meta_proto = pltpu.make_async_copy(
            meta_hbm.at[0], meta_scr.at[0, 0], sem_meta)
        vec_proto = pltpu.make_async_copy(
            vecs_hbm.at[0], vec_scr.at[0, 0], sem_vec)
        for _i in range(n_dma * expand):
            meta_proto.wait()
            vec_proto.wait()

        # -- 4. parse + score --------------------------------------------
        # per-e lane slices, rebuilt into contiguous [TB, C] via concat
        nbr_e, scale_e, sq_e, dot_e = [], [], [], []
        for e in range(expand):
            meta_e = meta_scr[e]  # [TB, W] i32
            nbr_e.append(meta_e[:, :m0])
            scale_e.append(meta_e[:, m0:2 * m0])
            sq_e.append(meta_e[:, 2 * m0:3 * m0])
            if _ABLATE == "noscore":
                dot_e.append(meta_e[:, :m0].astype(jnp.float32))
            else:
                # bf16 products, f32 accumulate: halves the live VMEM of
                # the scoring temporaries (the kernel's scoped budget
                # bounds the query tile TB); the int8 quantization noise
                # dominates the bf16 rounding anyway
                cand_e = vec_scr[e].astype(jnp.bfloat16)  # [TB, M0, D]
                prod = cand_e * q_bf[:, None, :]
                dot_e.append(jnp.sum(prod.astype(jnp.float32), axis=-1))
        nbr = jnp.concatenate(nbr_e, axis=1)  # [TB, C]
        v_scale = lax.bitcast_convert_type(
            jnp.concatenate(scale_e, axis=1), jnp.float32)
        v_sq = lax.bitcast_convert_type(
            jnp.concatenate(sq_e, axis=1), jnp.float32)
        dot = jnp.concatenate(dot_e, axis=1) * v_scale  # [TB, C]
        if metric == MetricKind.IP:
            s_new = 1.0 - dot
        elif metric == MetricKind.L2SQ:
            s_new = jnp.maximum(q_sq - 2.0 * dot + v_sq, 0.0)
        else:  # cosine
            denom = jnp.sqrt(q_sq * v_sq)
            cos = dot / jnp.maximum(denom, _EPS)
            s_new = jnp.where((q_sq <= 0.0) | (v_sq <= 0.0), 1.0, 1.0 - cos)
            s_new = jnp.where((q_sq <= 0.0) & (v_sq <= 0.0), 0.0, s_new)

        # -- 5. mask, dedup, merge ----------------------------------------
        e_of_c = lax.broadcasted_iota(jnp.int32, (TB, c), 1) // m0
        # no bool-typed zeros constant: Mosaic rejects the i8->i1 trunci
        # a materialized bool literal lowers to
        sel_valid = (e_of_c == 0) & oks[0][:, None]
        for e in range(1, expand):
            sel_valid = sel_valid | ((e_of_c == e) & oks[e][:, None])
        keep = (nbr >= 0) & sel_valid
        if _ABLATE != "nodedup":
            # dedup via broadcast masks: a few big VPU ops beat the
            # log-depth id-sort network tried in round 2 (measured
            # +3ms/8192 queries — small sequential network stages are
            # op-issue-bound on the VPU, wide compares are not)
            in_beam = jnp.any(nbr[:, :, None] == beam_i[:, None, :], axis=2)
            lo = lax.broadcasted_iota(jnp.int32, (c, c), 0)
            hi = lax.broadcasted_iota(jnp.int32, (c, c), 1)
            upper = (lo < hi)[None]  # strict upper triangle
            dup_new = jnp.any(
                (nbr[:, :, None] == nbr[:, None, :]) & upper, axis=1)
            keep = keep & ~in_beam & ~dup_new
        s_new = jnp.where(keep, s_new, INF_SCORE)
        nd_acc[0, 0] += jnp.sum(keep.astype(jnp.int32))

        if _ABLATE == "nomerge":
            return beam_s, jnp.maximum(beam_i, nbr[:, :ef]), beam_e
        # -- merge: bitonic network (log-depth, so ef=64+ compiles where
        # the round-1 iterative argmin unrolled ef passes and blew up
        # Mosaic compile time). Invariant: beam_s is ascending (seeds
        # arrive sorted; the merge emits sorted). Sort the candidates
        # DESCENDING, append after the ascending beam (+ INF mid-pad to a
        # power of two) -> bitonic sequence -> one merge pass -> first ef
        # lanes are the new beam.
        c_pow = 1 << (c - 1).bit_length()
        cand_i = jnp.where(keep, nbr, -1)
        if c_pow != c:
            s_new = jnp.concatenate(
                [s_new, jnp.full((TB, c_pow - c), INF_SCORE, jnp.float32)],
                axis=1)
            cand_i = jnp.concatenate(
                [cand_i, jnp.full((TB, c_pow - c), -1, jnp.int32)], axis=1)
        cs, (ci,) = _bitonic_sort(s_new, [cand_i], ascending=False)
        ce = jnp.zeros((TB, c_pow), jnp.int32)
        p_tot = 1 << (ef + c_pow - 1).bit_length()
        mid = p_tot - ef - c_pow
        pool_s = jnp.concatenate(
            [beam_s]
            + ([jnp.full((TB, mid), INF_SCORE, jnp.float32)] if mid else [])
            + [cs], axis=1)
        pool_i = jnp.concatenate(
            [beam_i]
            + ([jnp.full((TB, mid), -1, jnp.int32)] if mid else [])
            + [ci], axis=1)
        pool_e = jnp.concatenate(
            [beam_e]
            + ([jnp.zeros((TB, mid), jnp.int32)] if mid else [])
            + [ce], axis=1)
        pool_s, (pool_i, pool_e) = _bitonic_merge_asc(
            pool_s, [pool_i, pool_e])
        new_s = pool_s[:, :ef]
        new_i = jnp.where(new_s >= INF_SCORE, -1, pool_i[:, :ef])
        return new_s, new_i, pool_e[:, :ef]

    beam_s, beam_i, beam_e = lax.fori_loop(
        0, max_steps, step, (beam_s, beam_i, beam_e))
    out_s_ref[:] = beam_s
    out_i_ref[:] = beam_i
    out_nd_ref[pl.program_id(0), 0] = nd_acc[0, 0]


@functools.partial(
    jax.jit,
    static_argnames=("ef", "expand", "m0", "d", "max_steps", "metric",
                     "interpret"))
def beam_search_pallas(
    queries: jax.Array,  # [B, D] f32 (B multiple of TB; pad outside)
    q_sq: jax.Array,  # [B]
    seed_scores: jax.Array,  # [B, ef] f32 ascending (INF padded)
    seed_ids: jax.Array,  # [B, ef] i32 (-1 padded)
    meta_packed: jax.Array,  # [cap, W] i32 (pack_meta)
    nbr_vecs: jax.Array,  # [cap, M0, D] i8 (3-D end to end — reshaping
    # a 2-D table here would relayout all of it per call: 13.3 ms at 1M)
    *,
    ef: int,
    expand: int,
    m0: int,
    d: int,
    max_steps: int,
    metric: MetricKind,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Fused beam search. Returns (scores [B, ef], ids [B, ef], n_dist [])."""
    b0 = queries.shape[0]
    b = ((b0 + TB - 1) // TB) * TB
    if b != b0:  # pad to a tile multiple; padded rows carry empty beams
        pad = b - b0
        queries = jnp.concatenate(
            [queries, jnp.zeros((pad, queries.shape[1]), queries.dtype)])
        q_sq = jnp.concatenate([q_sq, jnp.zeros((pad,), q_sq.dtype)])
        seed_scores = jnp.concatenate(
            [seed_scores, jnp.full((pad, ef), INF_SCORE, jnp.float32)])
        seed_ids = jnp.concatenate(
            [seed_ids, jnp.full((pad, ef), -1, jnp.int32)])
    meta_w = meta_packed.shape[1]
    assert nbr_vecs.ndim == 3, nbr_vecs.shape
    grid = (b // TB,)
    kernel = functools.partial(
        _kernel, ef=ef, expand=expand, m0=m0, d=d, max_steps=max_steps,
        metric=metric)
    out_s, out_i, out_nd = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, ef), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, ef), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # meta stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # vecs stay in HBM
        ],
        out_specs=(
            pl.BlockSpec((TB, ef), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, ef), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # nd: full array,
            # each sequential program writes its own row
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, ef), jnp.float32),
            jax.ShapeDtypeStruct((b, ef), jnp.int32),
            jax.ShapeDtypeStruct((b // TB, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((TB, 128), jnp.int32),       # sel_vmem (lane pad)
            pltpu.VMEM((expand, TB, meta_w), jnp.int32),   # meta_scr
            pltpu.VMEM((expand, TB, m0, d), jnp.int8),     # vec_scr
            pltpu.SMEM((1, 1), jnp.int32),          # nd accumulator
            pltpu.SemaphoreType.DMA(()),            # meta copies
            pltpu.SemaphoreType.DMA(()),            # vec copies
        ],
        # the 16 MB scoped-VMEM default blocks TB>=128; v5e has 128 MB
        # VMEM per core, so give the kernel room for bigger query tiles
        # (fewer grid steps -> less per-tile fixed cost)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(queries, q_sq[:, None], seed_scores, seed_ids, meta_packed, nbr_vecs)
    return out_s[:b0], out_i[:b0], jnp.sum(out_nd)
