"""Decompose the fused beam kernel's step time via the _ABLATE hooks.

Runs beam_search_pallas on a bench-shaped synthetic graph with each
ablation and prints per-variant times, so the 35.7 ms/8192-query cost
(benchmarks/attribute_search.py) is attributed to DMA issue/wait,
scalar readback, scoring, dedup, or the merge network.

Usage: python benchmarks/kernel_ablate.py [B] [ef] [steps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from duckdb_vss_tpu.models.graph import make_neighborhood_tables
from duckdb_vss_tpu.ops import pallas_beam as PB
from duckdb_vss_tpu.utils.config import MetricKind


from duckdb_vss_tpu.utils.timing import device_time


def bench(fn, iters=10, warm=2):
    # completion-barriered (utils/timing.py)
    return device_time(fn, iters=iters, warm=warm) * 1e3


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    ef = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    n, d, m0, expand = 1 << 20, 128, 32, 4
    rng = np.random.default_rng(0)

    vecs = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    vec_sq = jnp.sum(vecs * vecs, axis=-1)
    nbr = jnp.asarray(rng.integers(0, n, (n, m0)).astype(np.int32))
    vecs_i8, v_scale, v_sq = make_neighborhood_tables(vecs, vec_sq, nbr)
    meta = jax.jit(PB.pack_meta)(nbr, v_scale, v_sq)
    jax.block_until_ready((vecs_i8, meta))

    q = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    q_sq = jnp.sum(q * q, axis=-1)
    seeds = jnp.asarray(rng.integers(0, n, (b, ef)).astype(np.int32))
    seed_s = jnp.sort(jnp.abs(jnp.asarray(
        rng.normal(size=(b, ef)).astype(np.float32))), axis=1)

    for mode in (None, "nodma", "noread", "noscore", "nodedup", "nomerge"):
        PB._ABLATE = mode
        # new ablation constant -> new kernel; clear the jit cache entry
        PB.beam_search_pallas.clear_cache()

        def run():
            return PB.beam_search_pallas(
                q, q_sq, seed_s, seeds, meta, vecs_i8,
                ef=ef, expand=expand, m0=m0, d=d, max_steps=steps,
                metric=MetricKind.L2SQ)

        out = run()
        csum = float(jnp.sum(jnp.where(out[0] < 1e30, out[0], 0.0)))
        nd = int(out[2])
        ms = bench(run, iters=30)
        print(f"ablate={str(mode):8s}: {ms:7.2f} ms csum={csum:.3e} nd={nd} "
              f"({b * steps / ms * 1000 / 1e6:.1f}M step-queries/s)",
              flush=True)
    PB._ABLATE = None


if __name__ == "__main__":
    main()
