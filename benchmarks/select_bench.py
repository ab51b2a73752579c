"""Microbench: per-chunk top-k selection strategies for the bulk IVF
sweep ([4096, 49152] scores -> top-48 per row). Round-1 measured the
selection at ~323 ms/chunk vs ~38 ms for the matmul — the build's bound.

Candidates:
  a) lax.approx_max_k on the full row (current)
  b) blockwise approx_max_k (k per 8192-block) + exact merge
  c) exact lax.top_k
  d) fused: matmul + selection in one jit (what the sweep actually runs)

Usage: python benchmarks/select_bench.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


from duckdb_vss_tpu.utils.timing import device_time


def bench(fn, *args, iters=10, warm=2):
    return device_time(fn, *args, iters=iters, warm=warm) * 1e3


def main():
    qb, nc, k, d = 4096, 49152, 48, 128
    rng = np.random.default_rng(0)
    s = jnp.asarray(rng.normal(size=(qb, nc)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(qb, d)).astype(np.float32))
    cand = jnp.asarray(rng.normal(size=(nc, d)).astype(np.float32)
                       ).astype(jnp.bfloat16)
    jax.block_until_ready((s, q, cand))

    @jax.jit
    def sel_approx(s):
        neg, pos = lax.approx_max_k(-s, k, recall_target=0.99)
        return -neg, pos

    @jax.jit
    def sel_block(s):
        nb = nc // 8192
        sb = s.reshape(qb, nb, 8192)
        neg, pos = lax.approx_max_k(-sb, k, recall_target=0.99)
        off = (jnp.arange(nb, dtype=jnp.int32) * 8192)[None, :, None]
        pos = pos.astype(jnp.int32) + off
        negf = neg.reshape(qb, nb * k)
        posf = pos.reshape(qb, nb * k)
        neg2, p2 = lax.top_k(negf, k)
        return -neg2, jnp.take_along_axis(posf, p2, axis=1)

    @jax.jit
    def sel_exact(s):
        neg, pos = lax.top_k(-s, k)
        return -neg, pos

    @jax.jit
    def matmul_only(q, cand):
        return lax.dot_general(q.astype(jnp.bfloat16), cand,
                               (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)

    @jax.jit
    def fused_approx(q, cand):
        ss = -2.0 * lax.dot_general(q.astype(jnp.bfloat16), cand,
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        neg, pos = lax.approx_max_k(-ss, k, recall_target=0.99)
        return -neg, pos

    @jax.jit
    def fused_block(q, cand):
        ss = -2.0 * lax.dot_general(q.astype(jnp.bfloat16), cand,
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        nb = nc // 8192
        sb = ss.reshape(qb, nb, 8192)
        neg, pos = lax.approx_max_k(-sb, k, recall_target=0.99)
        off = (jnp.arange(nb, dtype=jnp.int32) * 8192)[None, :, None]
        posf = (pos.astype(jnp.int32) + off).reshape(qb, nb * k)
        neg2, p2 = lax.top_k(neg.reshape(qb, nb * k), k)
        return -neg2, jnp.take_along_axis(posf, p2, axis=1)

    print(f"matmul only ({qb}x{nc}x{d} bf16): "
          f"{bench(matmul_only, q, cand):7.2f} ms", flush=True)
    print(f"approx_max_k full row:  {bench(sel_approx, s):7.2f} ms",
          flush=True)
    print(f"blockwise approx+merge: {bench(sel_block, s):7.2f} ms",
          flush=True)
    print(f"exact top_k:            {bench(sel_exact, s):7.2f} ms",
          flush=True)
    print(f"fused matmul+approx:    {bench(fused_approx, q, cand):7.2f} ms",
          flush=True)
    print(f"fused matmul+blockwise: {bench(fused_block, q, cand):7.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
