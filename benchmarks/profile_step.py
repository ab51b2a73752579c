"""Decompose one beam_search step into sub-ops; time each on the TPU.

The axon tunnel adds ~31 ms of dispatch+D2H per program, so every sub-op
is timed INSIDE a lax.scan: marginal cost = (T(iters_hi) - T(iters_lo))
/ (iters_hi - iters_lo), all within one dispatch. A data dependency is
threaded through the carry so XLA cannot hoist the body out of the loop.

Sub-ops (models/graph.py beam_search.step):
  a. select top-E unexpanded            lax.top_k over [B, ef]
  b. neighbor fetch                     int32 gather [B, E] -> [B, E, M0]
  c. dedup vs beam                      [B, C, ef] compare
  d. dedup within block                 [B, C, C] triu compare
  e. gather+score                       [B, C, D] row gather + batched matvec
  f. merge top-ef of beam+new           lax.top_k over [B, ef+C]
  g. pallas fused gather+score          (alternative to e)

Usage: python benchmarks/profile_step.py [N] [B]
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

from duckdb_vss_tpu.models.graph import gather_scores
from duckdb_vss_tpu.utils.config import MetricKind

ITERS_LO, ITERS_HI = 4, 24


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf))


def timed_loop(label, body, init_ids, *tables, reps=3):
    """body(ids, *tables) -> new int32 ids (data-dependent chain).

    Large tables are passed as jit ARGUMENTS, not closure constants:
    captured constants are embedded into the remote-compile request and
    blow the tunnel's request-size limit (HTTP 413)."""

    def run(n_iters):
        def scan_fn(ids, _, tabs):
            return body(ids, *tabs), None

        f = jax.jit(lambda ids, *tabs: lax.scan(
            partial(scan_fn, tabs=tabs), ids, None, length=n_iters)[0])
        out = f(init_ids, *tables)
        _sync(out)
        best = np.inf
        for _ in range(reps):
            t0 = time.time()
            out = f(init_ids, *tables)
            _sync(out)
            best = min(best, time.time() - t0)
        return best

    t_lo, t_hi = run(ITERS_LO), run(ITERS_HI)
    per = (t_hi - t_lo) / (ITERS_HI - ITERS_LO)
    print(f"{label:55s} {per*1e3:9.3f} ms/iter", flush=True)
    return per


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    d, m0, ef, expand = 128, 32, 16, 4
    c = expand * m0
    rng = np.random.default_rng(0)

    print(f"n={n} b={b} d={d} c={c} ef={ef}", flush=True)
    trav = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32)).astype(
        jnp.bfloat16)
    vec_sq = jnp.asarray(rng.normal(size=(n,)).astype(np.float32)) ** 2
    q = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    q_sq = jnp.sum(q * q, axis=-1)
    beam_ids = jnp.asarray(rng.integers(0, n, (b, ef)).astype(np.int32))
    nbrs0 = jnp.asarray(rng.integers(0, n, (b, c)).astype(np.int32))
    nbr_tab = jnp.asarray(rng.integers(0, n, (n, m0)).astype(np.int32))
    scores0 = jnp.asarray(rng.random((b, ef)).astype(np.float32))

    def rot(ids):
        # cheap data-dependent perturbation keeping ids in range
        return (ids + 1) % n

    # a. select top-E
    def a(ids):
        key = (ids[:, :ef] % 1000).astype(jnp.float32)
        _, pos = lax.top_k(-key, expand)
        return rot(ids + pos.sum(1, keepdims=True))
    timed_loop("a. select top-E (top_k over [B, ef])", a, beam_ids)

    # b. neighbor fetch (int32 row gather)
    def bfn(ids, tab):
        nb = jnp.take(tab, ids[:, :expand] % n, axis=0)  # [B, E, M0]
        return rot(ids + nb[:, 0, :ef] % 7)
    timed_loop("b. neighbor gather [B, E] -> [B, E, M0]", bfn, beam_ids,
               nbr_tab)

    # c. dedup vs beam
    def cfn(ids):
        nb = (ids[:, :1] + jnp.arange(c, dtype=jnp.int32)[None]) % n
        eq = jnp.any(nb[:, :, None] == ids[:, None, :], axis=2)
        return rot(ids + eq[:, :ef].astype(jnp.int32))
    timed_loop("c. dedup vs beam [B, C, ef]", cfn, beam_ids)

    # d. dedup within block
    def dfn(ids):
        nb = (ids[:, :1] + jnp.arange(c, dtype=jnp.int32)[None]) % n
        dup = jnp.triu(nb[:, :, None] == nb[:, None, :], k=1).any(axis=1)
        return rot(ids + dup[:, :ef].astype(jnp.int32))
    timed_loop("d. dedup within block [B, C, C]", dfn, beam_ids)

    # e. gather+score (bf16 traversal table)
    def efn(ids, tv, vsq, qq, qqsq):
        nb = (ids[:, :1] * 13 + jnp.arange(c, dtype=jnp.int32)[None] * 977) % n
        s = gather_scores(tv, vsq, nb, qq, qqsq, MetricKind.L2SQ)
        return rot(ids + s[:, :ef].astype(jnp.int32) % 5)
    timed_loop("e. gather+score [B, C, D] bf16 (random rows)", efn, beam_ids,
               trav, vec_sq, q, q_sq)

    # f. merge top-ef
    def ffn(ids):
        new_s = (ids % 1000).astype(jnp.float32) @ jnp.ones(
            (ef, c), jnp.float32)
        cat = jnp.concatenate([scores0, new_s], axis=1)
        _, pos = lax.top_k(-cat, ef)
        return rot(ids + pos)
    timed_loop("f. merge top-ef (top_k over [B, ef+C])", ffn, beam_ids)

    # g. pallas fused gather+score
    try:
        from duckdb_vss_tpu.ops.pallas_gather import gather_scores_pallas
        trav32 = trav.astype(jnp.float32)

        def gfn(ids, tv, qq, qqsq):
            nb = (ids[:, :1] * 13
                  + jnp.arange(c, dtype=jnp.int32)[None] * 977) % n
            s = gather_scores_pallas(tv, nb, qq, qqsq, MetricKind.L2SQ)
            return rot(ids + s[:, :ef].astype(jnp.int32) % 5)
        timed_loop("g. pallas fused gather+score (f32)", gfn, beam_ids,
                   trav32, q, q_sq)
    except Exception as err:  # noqa: BLE001
        print(f"g. pallas kernel failed: {err}", flush=True)


if __name__ == "__main__":
    main()
