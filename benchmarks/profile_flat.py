"""Config-1 exact flat-scan breakdown (round-3 verdict item 6: the scan
sits at ~6% of the MXU floor; find where the 48 ms goes before writing
a fused kernel). Shape: B=8192 queries x N=98304 rows x 128d, k=10.

Variants timed (completion-barriered, utils/timing.device_time):
  matmul        per-block score matrix + min-reduce (no selection) —
                the score-production floor incl. HBM spill if any
  matmul_bf16   same at DEFAULT precision (MXU-rate reference)
  fold          matmul + 128-bin min fold (tournament stage 1 only)
  topk_full     the production flat_topk (tournament top-k)
  topk_laxtopk  flat_topk with per-block lax.top_k forced
  extract_only  tournament stages on a PRE-MATERIALIZED score block
                (isolates the k extraction passes)

Usage: python benchmarks/profile_flat.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from duckdb_vss_tpu.ops.distance import score_matrix, sq_norms
from duckdb_vss_tpu.ops.topk import exact_topk_small, flat_topk
from duckdb_vss_tpu.utils.config import MetricKind
from duckdb_vss_tpu.utils.padding import INF_SCORE
from duckdb_vss_tpu.utils.timing import device_time


def main():
    b, n, d, k, bn = 8192, 98304, 128, 10, 16384
    metric = MetricKind.L2SQ
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    vsq = sq_norms(v)
    qsq = sq_norms(q)
    jax.block_until_ready((v, q, vsq, qsq))
    nb = n // bn

    def blocks(fn_block, precision):
        @jax.jit
        def run():
            def step(carry, xs):
                vb, sqb = xs
                s = score_matrix(q, vb, metric, vec_sq=sqb, query_sq=qsq,
                                 precision=precision)
                return carry, fn_block(s)
            _, outs = lax.scan(
                step, 0, (v.reshape(nb, bn, d), vsq.reshape(nb, bn)))
            return outs
        return run

    P = lax.Precision
    variants = {
        "matmul": blocks(lambda s: jnp.min(s, axis=1), P.HIGHEST),
        "matmul_bf16": blocks(lambda s: jnp.min(s, axis=1), P.DEFAULT),
        "fold": blocks(
            lambda s: jnp.min(s.reshape(b, 128, bn // 128), axis=2),
            P.HIGHEST),
        "topk_full": jax.jit(functools.partial(
            flat_topk, q, v, k, metric, vec_sq=vsq, block_n=bn)),
    }

    @jax.jit
    def topk_laxtopk():
        def step(carry, xs):
            vb, sqb, off = xs
            s = score_matrix(q, vb, metric, vec_sq=sqb, query_sq=qsq,
                             precision=P.HIGHEST)
            neg, pos = lax.top_k(-s, k)
            return carry, (-neg, pos.astype(jnp.int32) + off)
        _, (all_s, all_i) = lax.scan(
            step, 0, (v.reshape(nb, bn, d), vsq.reshape(nb, bn),
                      jnp.arange(nb, dtype=jnp.int32) * bn))
        all_s = jnp.moveaxis(all_s, 0, 1).reshape(b, nb * k)
        all_i = jnp.moveaxis(all_i, 0, 1).reshape(b, nb * k)
        neg, pos = lax.top_k(-all_s, k)
        return -neg, jnp.take_along_axis(all_i, pos, axis=1)
    variants["topk_laxtopk"] = topk_laxtopk

    s_block = jax.jit(lambda: score_matrix(
        q, v[:bn], metric, vec_sq=vsq[:bn], query_sq=qsq,
        precision=P.HIGHEST))()
    jax.block_until_ready(s_block)
    variants["extract_only_1blk"] = jax.jit(
        functools.partial(exact_topk_small, s_block, k))

    for name, fn in variants.items():
        try:
            ms = device_time(fn, iters=5, warm=2) * 1e3
            print(f"{name:18s}: {ms:8.2f} ms", flush=True)
        except Exception as e:
            print(f"{name:18s}: FAILED {e}", flush=True)


if __name__ == "__main__":
    main()
