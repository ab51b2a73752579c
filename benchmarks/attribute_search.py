"""Attribute per-chunk search wall-clock to pipeline stages.

Round-1 left ~30 ms per 8192-query chunk unattributed (STATUS.md): total
device+host time beyond MXU descent (~6 ms) and the fused beam kernel
(~13 ms). This script builds the bench-shaped index once, then times:

  1. end-to-end idx.search() steady state (host wall-clock)
  2. the jitted search program with device-resident queries (device time)
  3. each stage jitted separately: mxu_descent / seed prep / pallas beam
     / finish (rerank+filter)
  4. H2D query transfer alone

so that (1) - (2) = transfer+host overhead and (2) - sum(3) = XLA glue.

Usage: python benchmarks/attribute_search.py [N] [B] [ef]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from duckdb_vss_tpu import HNSWConfig
from duckdb_vss_tpu.models.hnsw import HNSWIndex
from duckdb_vss_tpu.models import graph as G
from duckdb_vss_tpu.utils.config import MetricKind
from duckdb_vss_tpu.utils.padding import INF_SCORE


from duckdb_vss_tpu.utils.timing import device_time


def timeit(fn, *args, iters=10, warm=2):
    # completion-barriered (utils/timing.py)
    return device_time(fn, *args, iters=iters, warm=warm) * 1e3  # ms


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    ef = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    d, k, expand = 128, 10, 4
    rng = np.random.default_rng(0)
    centers = rng.normal(size=(4096, d)).astype(np.float32)
    asg = rng.integers(0, 4096, n)
    vecs = (centers[asg] + 0.25 * rng.normal(size=(n, d)).astype(np.float32))
    q_np = (centers[rng.integers(0, 4096, b)]
            + 0.25 * rng.normal(size=(b, d)).astype(np.float32))

    cache = os.environ.get("DVT_ATTR_CACHE", f"/tmp/attr_idx_{n}_{d}.vss")
    if cache and os.path.exists(cache):
        from duckdb_vss_tpu.utils import persist
        t0 = time.time()
        idx = persist.load_index(cache, lazy=False)
        print(f"# loaded cached index: {time.time() - t0:.1f}s", flush=True)
    else:
        idx = HNSWIndex(d, HNSWConfig(), capacity=n)
        t0 = time.time()
        idx.add(vecs, np.arange(n))
        print(f"# build: {time.time() - t0:.1f}s", flush=True)
        if cache:
            from duckdb_vss_tpu.utils import persist
            persist.save_index(idx, cache)

    # --- 1. end-to-end steady state -----------------------------------
    idx.search(q_np, k, ef=ef, chunk=b)  # warm/compile
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        idx.search(q_np, k, ef=ef, chunk=b)
    e2e_ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"e2e search ({b} queries): {e2e_ms:.2f} ms "
          f"({b / e2e_ms * 1000:.0f} QPS)", flush=True)

    # --- 2. device program with resident queries ----------------------
    q_dev = idx.store.prepare_queries(q_np)
    jax.block_until_ready(q_dev)
    dev_ms = timeit(lambda: idx.search_device(q_dev, k, ef=ef))
    print(f"jitted search (device-resident q): {dev_ms:.2f} ms", flush=True)

    # --- 4. H2D alone ---------------------------------------------------
    h2d_ms = timeit(lambda: idx.store.prepare_queries(q_np))
    print(f"H2D prepare_queries: {h2d_ms:.2f} ms", flush=True)

    # --- 3. stages -----------------------------------------------------
    uv, uvsq, unode = idx._upper_vectors()
    nv, nscale, nsq, nmeta = idx._neighborhood_tables()
    state = idx.graph
    q_sq = jnp.sum(q_dev * q_dev, axis=-1)

    import functools

    @functools.partial(jax.jit, static_argnames=())
    def ds(uv, uvsq, unode, entry, q, qs):
        return G.mxu_descent(uv, uvsq, unode, entry, q, qs,
                             MetricKind.L2SQ, 8)

    dsc = lambda: ds(uv, uvsq, unode, state.entry_node, q_dev, q_sq)
    seeds, _nd = dsc()
    jax.block_until_ready(seeds)
    print(f"stage mxu_descent: {timeit(dsc):.2f} ms", flush=True)

    ef_eff = max(ef, k)
    ef_eff = ((ef_eff + 15) // 16) * 16

    def seed_prep(seeds, q, qs, vectors, vec_sq):
        seed_valid = seeds >= 0
        seed_s = G.gather_scores(vectors, vec_sq,
                                 seeds, q, qs, MetricKind.L2SQ)
        seed_s = jnp.where(seed_valid, seed_s, INF_SCORE)
        dup = jnp.triu(seeds[:, :, None] == seeds[:, None, :], k=1).any(1)
        seed_s = jnp.where(dup, INF_SCORE, seed_s)
        p = seeds.shape[1]
        pad = ef_eff - p
        seed_s = jnp.concatenate(
            [seed_s, jnp.full((seed_s.shape[0], pad), INF_SCORE,
                              jnp.float32)], axis=1)
        seed_i = jnp.concatenate(
            [jnp.where(seed_valid, seeds, -1),
             jnp.full((seeds.shape[0], pad), -1, jnp.int32)], axis=1)
        neg, pos0 = jax.lax.top_k(-seed_s, ef_eff)
        return -neg, jnp.take_along_axis(seed_i, pos0, axis=1)

    sp = jax.jit(seed_prep)
    spc = lambda: sp(seeds, q_dev, q_sq, idx.store._vectors,
                     idx.store._vec_sq)
    seed_s, seed_i = spc()
    jax.block_until_ready((seed_s, seed_i))
    print(f"stage seed_prep: {timeit(spc):.2f} ms", flush=True)

    from duckdb_vss_tpu.ops.pallas_beam import beam_search_pallas
    m0 = state.neighbors0.shape[1]
    steps = max(8, ef_eff // 2)

    def beam(q, qs, ss, si):
        return beam_search_pallas(
            q, qs, ss, si, nmeta, nv, ef=ef_eff, expand=expand, m0=m0,
            d=d, max_steps=steps, metric=MetricKind.L2SQ)

    bs, bi, nd = beam(q_dev, q_sq, seed_s, seed_i)
    jax.block_until_ready((bs, bi))
    print(f"stage pallas_beam ({steps} steps): "
          f"{timeit(beam, q_dev, q_sq, seed_s, seed_i):.2f} ms", flush=True)

    @functools.partial(jax.jit, static_argnames=())
    def fin(s, i, q, qs, vectors, vec_sq, valid):
        # _finish_search does not read state; None avoids baking the
        # 128MB+ graph arrays into the program as constants
        return G._finish_search(None, vectors, vec_sq, valid,
                                q, qs, MetricKind.L2SQ, k, s, i,
                                jnp.int32(0))

    finc = lambda: fin(bs, bi, q_dev, q_sq, idx.store._vectors,
                       idx.store._vec_sq, idx.store._valid)
    out = finc()
    jax.block_until_ready(out)
    print(f"stage finish: {timeit(finc):.2f} ms", flush=True)

    # D2H of final results
    def fetch():
        return jax.device_get(out[:2])
    print(f"D2H results: {timeit(fetch):.2f} ms", flush=True)


if __name__ == "__main__":
    main()
