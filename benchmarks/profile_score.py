"""Scoring-formulation shootout for gathered candidates on the TPU.

gather_scores = row gather + batched matvec. The bare gather costs
~1.4 ms at [2048, 128] rows x 256 B, but gather+score costs ~5.4 ms —
the batched dot_general ([B,C,D] x [B,D], batch=B) is the real cost:
batch-of-matvec is the worst MXU shape. Variants measured (all fused
with the gather inside one scan iteration):

  1. dot_general batch matvec (current)
  2. multiply + sum over D (pure VPU)
  3. multiply + sum, f32 accumulate from bf16
  4. dot_general with C as contracting-free dim per 8-query tile

Usage: python benchmarks/profile_score.py
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

ITERS_LO, ITERS_HI = 4, 20
N, B, C, D = 1 << 20, 2048, 128, 128


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf))


def timed_loop(label, body, init, *tables, reps=3):
    def run(n_iters):
        def scan_fn(carry, _, tabs):
            return body(carry, *tabs), None

        f = jax.jit(lambda carry, *tabs: lax.scan(
            partial(scan_fn, tabs=tabs), carry, None, length=n_iters)[0])
        out = f(init, *tables)
        _sync(out)
        best = np.inf
        for _ in range(reps):
            t0 = time.time()
            out = f(init, *tables)
            _sync(out)
            best = min(best, time.time() - t0)
        return best

    t_lo, t_hi = run(ITERS_LO), run(ITERS_HI)
    per = (t_hi - t_lo) / (ITERS_HI - ITERS_LO)
    print(f"{label:62s} {per*1e3:9.3f} ms/iter", flush=True)
    return per


def main():
    rng = np.random.default_rng(0)
    trav = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32)).astype(
        jnp.bfloat16)
    vec_sq = jnp.abs(jnp.asarray(rng.normal(size=(N,)).astype(np.float32)))
    q = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    ids0 = jnp.asarray(rng.integers(0, N, (B, C)).astype(np.int32))

    def nxt(ids, s):
        return (ids + s[:, :C].astype(jnp.int32) % 3 + 1) % N

    # 1. current: dot_general batch matvec
    def v1(ids, trav, vec_sq, q):
        vecs = jnp.take(trav, ids, axis=0)  # [B, C, D] bf16
        dot = lax.dot_general(
            vecs, q.astype(trav.dtype),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        s = jnp.take(vec_sq, ids, axis=0) - 2.0 * dot
        return nxt(ids, s)
    timed_loop("1. dot_general batch matvec (current)", v1, ids0,
               trav, vec_sq, q)

    # 2. multiply + sum over D (VPU)
    def v2(ids, trav, vec_sq, q):
        vecs = jnp.take(trav, ids, axis=0)  # [B, C, D] bf16
        prod = vecs.astype(jnp.float32) * q[:, None, :]
        dot = jnp.sum(prod, axis=-1)
        s = jnp.take(vec_sq, ids, axis=0) - 2.0 * dot
        return nxt(ids, s)
    timed_loop("2. multiply + f32 sum over D (VPU)", v2, ids0,
               trav, vec_sq, q)

    # 3. bf16 multiply, f32 accumulate via einsum
    def v3(ids, trav, vec_sq, q):
        vecs = jnp.take(trav, ids, axis=0)
        dot = jnp.einsum("bcd,bd->bc", vecs, q.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        s = jnp.take(vec_sq, ids, axis=0) - 2.0 * dot
        return nxt(ids, s)
    timed_loop("3. einsum bcd,bd->bc bf16", v3, ids0, trav, vec_sq, q)

    # 4. flatten batch: gather [B*C, D], multiply by repeated q
    def v4(ids, trav, vec_sq, q):
        flat = jnp.take(trav, ids.reshape(-1), axis=0)  # [B*C, D]
        qrep = jnp.repeat(q, C, axis=0)  # [B*C, D] — materializes 2 GB? no, B*C=262k x 512B = 134 MB
        dot = jnp.sum(flat.astype(jnp.float32) * qrep, axis=-1).reshape(B, C)
        s = jnp.take(vec_sq, ids, axis=0) - 2.0 * dot
        return nxt(ids, s)
    timed_loop("4. flat gather + broadcast multiply", v4, ids0,
               trav, vec_sq, q)

    # 5. no-score baseline: gather only
    def v5(ids, trav, vec_sq, q):
        vecs = jnp.take(trav, ids, axis=0)
        s = vecs[..., 0].astype(jnp.float32)
        return nxt(ids, s)
    timed_loop("5. gather only (no scoring)", v5, ids0, trav, vec_sq, q)


if __name__ == "__main__":
    main()
