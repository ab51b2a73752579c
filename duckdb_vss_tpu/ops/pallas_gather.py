"""Pallas TPU kernel: fused row-gather + distance scoring.

The traversal hot op is: given candidate ids [B, C], compute
metric(q[b], vectors[ids[b, c]]) without materializing the gathered
[B, C, D] block in HBM. The XLA lowering of jnp.take + dot_general does
exactly that materialization (HBM write + re-read) and lowers row
gathers poorly; this kernel DMAs each candidate row HBM->VMEM once and
computes the scores in VMEM.

Grid: one program per query row b. Per program:
- ids row  [1, C]  in SMEM (int32, -1 = invalid),
- query row [1, D] in VMEM,
- vectors stay in HBM (ANY); C row-DMAs are issued in chunked groups and
  double-buffered against the VPU score computation;
- scores row [1, C] written to VMEM output (INF_SCORE for invalid ids).

Corresponds to the reference's per-candidate `context.measure` calls in
the beam loops (/root/reference/src/include/usearch/index.hpp:3485,3560)
— but batched C-wide per step instead of one pair per indirect call.
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
_CHUNK = 8  # rows per DMA wait-group (double-buffered)


def _kernel(ids_ref, q_ref, qsq_ref, vec_hbm, out_ref, scratch, sems,
            *, metric: MetricKind, c_total: int, d: int):
    n_chunks = c_total // _CHUNK

    def start_chunk(g, slot):
        # issue _CHUNK row DMAs for group g into scratch[slot]
        for j in range(_CHUNK):
            row = jnp.maximum(ids_ref[0, g * _CHUNK + j], 0)
            pltpu.make_async_copy(
                vec_hbm.at[row],
                scratch.at[slot, j],
                sems.at[slot, j],
            ).start()

    def wait_chunk(slot):
        for j in range(_CHUNK):
            # descriptor shape must match the start; row used only for size
            pltpu.make_async_copy(
                vec_hbm.at[0],
                scratch.at[slot, j],
                sems.at[slot, j],
            ).wait()

    start_chunk(0, 0)

    def body(g, _):
        slot = lax.rem(g, 2)
        nxt = lax.rem(g + 1, 2)

        @pl.when(g + 1 < n_chunks)
        def _():
            start_chunk(g + 1, nxt)

        wait_chunk(slot)
        v = scratch[slot]  # [_CHUNK, D]
        q = q_ref[0, :]  # [D]
        dot = jnp.sum(v * q[None, :], axis=1)  # [_CHUNK]
        if metric == MetricKind.IP:
            s = 1.0 - dot
        elif metric == MetricKind.L2SQ:
            v2 = jnp.sum(v * v, axis=1)
            s = jnp.maximum(qsq_ref[0, 0] + v2 - 2.0 * dot, 0.0)
        else:  # cosine
            v2 = jnp.sum(v * v, axis=1)
            qs = qsq_ref[0, 0]
            denom = jnp.sqrt(qs * v2)
            s = 1.0 - dot / jnp.maximum(denom, _EPS)
            s = jnp.where((qs <= 0.0) | (v2 <= 0.0), 1.0, s)
            s = jnp.where((qs <= 0.0) & (v2 <= 0.0), 0.0, s)
        out_ref[0, pl.ds(g * _CHUNK, _CHUNK)] = s
        return 0

    lax.fori_loop(0, n_chunks, body, 0)
    # invalid ids (-1) are masked to INF_SCORE by the caller


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
    c_pad = ((c + _CHUNK - 1) // _CHUNK) * _CHUNK
    if c_pad != c:
        ids = jnp.concatenate(
            [ids, jnp.full((b, c_pad - c), -1, jnp.int32)], axis=1)

    kernel = functools.partial(_kernel, metric=metric, c_total=c_pad, d=d)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, c_pad), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # vectors stay in HBM
        ],
        out_specs=pl.BlockSpec((1, c_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, _CHUNK, d), jnp.float32),
            pltpu.SemaphoreType.DMA((2, _CHUNK)),
        ],
        interpret=interpret,
    )(ids, queries, q_sq[:, None], vectors)
    out = jnp.where(ids >= 0, out, INF_SCORE)
    return out[:, :c]
