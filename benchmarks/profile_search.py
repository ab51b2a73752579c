"""Isolate where search wall-time goes at the 1M operating point.

Uses a synthetic random graph (recall is irrelevant here; only shapes and
memory traffic matter) so no 100s bulk build is needed. Measures:
  1. bare dispatch round-trip (axon tunnel floor)
  2. mxu_descent alone
  3. beam_search at fixed step counts (per-step cost)
  4. full search_graph at the bench operating point

Usage: python benchmarks/profile_search.py [N] [B]
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from duckdb_vss_tpu.models.graph import (
    GraphState, beam_search, mxu_descent, search_graph)
from duckdb_vss_tpu.utils.config import MetricKind

L_MAX = 8


def _sync(out):
    # axon's block_until_ready can be a no-op; force a host read of one
    # (small) leaf, which transitively waits for the whole program
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf))


def timed(label, fn, *args, iters=10):
    # one completion fetch at the END of the dispatch train, rtt
    # subtracted — fetching inside the loop inflates every op by the
    # ~26 ms tunnel round trip (utils/timing.py)
    from duckdb_vss_tpu.utils.timing import device_time

    out = fn(*args)
    _sync(out)
    dt = device_time(fn, *args, iters=iters, warm=0)
    print(f"{label:55s} {dt*1e3:9.2f} ms", flush=True)
    return dt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    d, m, m0 = 128, 16, 32
    cap_u = max(n // 4, 64)
    n_upper = n // m
    rng = np.random.default_rng(0)

    print(f"n={n} b={b} d={d} cap_u={cap_u} n_upper={n_upper}", flush=True)
    vecs = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    vec_sq = jnp.sum(vecs * vecs, axis=-1)
    trav = vecs.astype(jnp.bfloat16)
    valid = jnp.ones((n,), jnp.bool_)

    nbr0 = jnp.asarray(rng.integers(0, n, (n, m0)).astype(np.int32))
    upper_n = jnp.full((cap_u, L_MAX, m), -1, jnp.int32)
    upper_n = upper_n.at[:n_upper, 0].set(
        jnp.asarray(rng.integers(0, n, (n_upper, m)).astype(np.int32)))
    upper_slot = jnp.full((n,), -1, jnp.int32)
    upper_slot = upper_slot.at[:n_upper].set(jnp.arange(n_upper, dtype=jnp.int32))
    upper_node = jnp.full((cap_u,), -1, jnp.int32)
    upper_node = upper_node.at[:n_upper].set(jnp.arange(n_upper, dtype=jnp.int32))
    levels = jnp.zeros((n,), jnp.int32).at[:n_upper].set(1)
    state = GraphState(nbr0, upper_n, upper_slot, upper_node, levels,
                       jnp.int32(0), jnp.int32(1), jnp.int32(n_upper))

    uv = jnp.zeros((cap_u, d), jnp.bfloat16).at[:n_upper].set(trav[:n_upper])
    uvsq = jnp.zeros((cap_u,), jnp.float32).at[:n_upper].set(vec_sq[:n_upper])

    q = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    q_sq = jnp.sum(q * q, axis=-1)

    # 1. dispatch floor
    tiny = jax.jit(lambda x: x + 1.0)
    timed("dispatch roundtrip (tiny program)", tiny, jnp.zeros((8,)), iters=50)

    # 2. descent alone
    desc = jax.jit(partial(mxu_descent, metric=MetricKind.L2SQ, n_seeds=8))
    timed("mxu_descent (b x cap_u bf16 matmul + approx topk)",
          desc, uv, uvsq, upper_node, state.entry_node, q, q_sq)

    # 3. beam at fixed step counts
    seeds = jnp.asarray(rng.integers(0, n, (b, 8)).astype(np.int32))
    steps_times = {}
    for steps in (1, 2, 4, 8):
        f = jax.jit(partial(
            beam_search, ef=16, metric=MetricKind.L2SQ, level=0, expand=4,
            max_steps=steps, loop="scan"))
        steps_times[steps] = timed(
            f"beam scan {steps} steps (ef=16 expand=4)",
            f, state, trav, vec_sq, q, q_sq, seeds)
    per_step = (steps_times[8] - steps_times[2]) / 6
    print(f"--> marginal per-step cost: {per_step*1e3:.2f} ms", flush=True)

    # 4. full search at the bench operating point
    def _full(state, vecs, vec_sq, valid, q, trav, uv, uvsq):
        return search_graph(
            state, vecs, vec_sq, valid, q, k=10, ef=16,
            metric=MetricKind.L2SQ, expand=4, n_seeds=8, descent="mxu",
            traversal_vectors=trav, upper_vecs=uv, upper_vec_sq=uvsq)

    full = jax.jit(_full)
    timed("full search_graph (while loop, ef=16)",
          full, state, vecs, vec_sq, valid, q, trav, uv, uvsq)

    # 5. full search with the augmented traversal table (one gather/step)
    from duckdb_vss_tpu.models.graph import make_aug_table

    aug = jax.jit(partial(make_aug_table, metric=MetricKind.L2SQ))(
        vecs, vec_sq)

    def _full_aug(state, vecs, vec_sq, valid, q, augt, uv, uvsq):
        return search_graph(
            state, vecs, vec_sq, valid, q, k=10, ef=16,
            metric=MetricKind.L2SQ, expand=4, n_seeds=8, descent="mxu",
            aug_table=augt, upper_vecs=uv, upper_vec_sq=uvsq)

    full_aug = jax.jit(_full_aug)
    timed("full search_graph AUG (while loop, ef=16)",
          full_aug, state, vecs, vec_sq, valid, q, aug, uv, uvsq)

    # 6. beam scan step cost with aug scoring
    from duckdb_vss_tpu.models.graph import make_aug_queries

    q_aug, bias = jax.jit(partial(make_aug_queries,
                                  metric=MetricKind.L2SQ,
                                  d_aug=aug.shape[1]))(q, q_sq)
    seeds2 = jnp.asarray(rng.integers(0, n, (b, 8)).astype(np.int32))
    for steps in (2, 8):
        f = jax.jit(partial(
            beam_search, ef=16, metric=MetricKind.L2SQ, level=0, expand=4,
            max_steps=steps, loop="scan", aug=True))
        t = timed(f"beam scan AUG {steps} steps (ef=16 expand=4)",
                  f, state, aug, vec_sq, q_aug, bias, seeds2)
        if steps == 2:
            t2 = t
    print(f"--> marginal per-step cost AUG: {(t - t2)/6*1e3:.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
