"""Pallas TPU kernel: fused row-gather + distance scoring.

Computes metric(q[b], vectors[ids[b, c]]) for candidate ids [B, C]
without materializing a gathered [B, C, D] block in HBM: per query row,
the C candidate rows are DMA'd HBM->VMEM and scored on the VPU, with the
next row's DMAs prefetched while the current row computes.

Note on need: XLA's fused gather+dot on this backend already runs near
the HBM roofline (~0.13 ms for [1024, 128] rows at D=128), so this
kernel is an opt-in alternative (DVT_PALLAS=1) rather than the default;
it exists to keep the whole traversal step fusable and to cut the
per-step op count, which — not bandwidth — bounds beam-search latency.

Grid: one program per tile of TILE_B query rows (TPU tiling requires
the sublane dim of SMEM/VMEM blocks divisible by 8). All stores are
full-row (lane-aligned); invalid ids (-1) are masked by the caller.

Corresponds to the reference's per-candidate `context.measure` calls in
the beam loops (/root/reference/src/include/usearch/index.hpp:3485,3560)
— batched C-wide instead of one pair per indirect call.
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
TILE_B = 8  # query rows per grid program


def _kernel(ids_ref, q_ref, qsq_ref, vec_hbm, out_ref, scratch, sems,
            *, metric: MetricKind, c_total: int):
    """scratch: [2, C, D] VMEM; sems: [2, C] DMA semaphores."""

    def start_row(b, slot):
        for c in range(c_total):
            row = jnp.maximum(ids_ref[b, c], 0)
            pltpu.make_async_copy(
                vec_hbm.at[row], scratch.at[slot, c], sems.at[slot, c]
            ).start()

    def wait_row(slot):
        for c in range(c_total):
            pltpu.make_async_copy(
                vec_hbm.at[0], scratch.at[slot, c], sems.at[slot, c]
            ).wait()

    start_row(0, 0)
    for b in range(TILE_B):
        slot = b % 2
        if b + 1 < TILE_B:
            start_row(b + 1, (b + 1) % 2)
        wait_row(slot)
        v = scratch[slot]  # [C, D]
        q = q_ref[b, :]  # [D]
        dot = jnp.sum(v * q[None, :], axis=1)  # [C]
        if metric == MetricKind.IP:
            s = 1.0 - dot
        elif metric == MetricKind.L2SQ:
            v2 = jnp.sum(v * v, axis=1)
            s = jnp.maximum(qsq_ref[b, 0] + v2 - 2.0 * dot, 0.0)
        else:  # cosine
            v2 = jnp.sum(v * v, axis=1)
            qs = qsq_ref[b, 0]
            denom = jnp.sqrt(qs * v2)
            s = 1.0 - dot / jnp.maximum(denom, _EPS)
            s = jnp.where((qs <= 0.0) | (v2 <= 0.0), 1.0, s)
            s = jnp.where((qs <= 0.0) & (v2 <= 0.0), 0.0, s)
        out_ref[b, :] = s  # full-row, lane-aligned store


@functools.partial(jax.jit,
                   static_argnames=("metric", "interpret"))
def gather_scores_pallas(
    vectors: jax.Array,  # [N, D] f32, D multiple of 128
    ids: jax.Array,  # [B, C] int32
    queries: jax.Array,  # [B, D] f32
    q_sq: jax.Array,  # [B]
    metric: MetricKind = MetricKind.L2SQ,
    interpret: bool = False,
) -> jax.Array:
    """Fused gather+score: [B, C] index-metric scores (INF for id < 0)."""
    b, c = ids.shape
    n, d = vectors.shape
    c_pad = max(((c + 127) // 128) * 128, 128)
    if c_pad != c:
        ids = jnp.concatenate(
            [ids, jnp.full((b, c_pad - c), -1, jnp.int32)], axis=1)
    b_pad = ((b + TILE_B - 1) // TILE_B) * TILE_B
    if b_pad != b:
        ids = jnp.concatenate(
            [ids, jnp.full((b_pad - b, c_pad), -1, jnp.int32)])
        queries = jnp.concatenate(
            [queries, jnp.zeros((b_pad - b, d), queries.dtype)])
        q_sq = jnp.concatenate([q_sq, jnp.zeros((b_pad - b,), q_sq.dtype)])

    kernel = functools.partial(_kernel, metric=metric, c_total=c_pad)
    out = pl.pallas_call(
        kernel,
        grid=(b_pad // TILE_B,),
        in_specs=[
            pl.BlockSpec((TILE_B, c_pad), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE_B, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # vectors stay in HBM
        ],
        out_specs=pl.BlockSpec((TILE_B, c_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, c_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, c_pad, d), jnp.float32),
            pltpu.SemaphoreType.DMA((2, c_pad)),
        ],
        interpret=interpret,
    )(ids, queries, q_sq[:, None], vectors)
    out = jnp.where(ids >= 0, out, INF_SCORE)
    return out[:b, :c]
