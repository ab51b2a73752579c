"""Microbenchmarks for the traversal hot op on real TPU:
XLA take+dot vs the fused Pallas gather+score kernel, plus correctness
cross-check. Usage: python benchmarks/kernel_bench.py"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from duckdb_vss_tpu.models.graph import gather_scores
from duckdb_vss_tpu.ops.pallas_gather import gather_scores_pallas
from duckdb_vss_tpu.utils.config import MetricKind


from duckdb_vss_tpu.utils.timing import device_time


def bench(fn, *args, iters=20):
    # completion-barriered (utils/timing.py)
    return device_time(fn, *args, iters=iters, warm=1)


def main():
    rng = np.random.default_rng(0)
    n, d = 1 << 20, 128
    vecs = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    vec_sq = jnp.sum(vecs * vecs, axis=-1)
    for b, c in [(256, 128), (1024, 128), (1024, 256)]:
        ids = jnp.asarray(rng.integers(0, n, (b, c)).astype(np.int32))
        q = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
        q_sq = jnp.sum(q * q, axis=-1)

        xla = jax.jit(lambda v, vs, i, qq, qs: gather_scores(
            v, vs, i, qq, qs, MetricKind.L2SQ))
        t_xla = bench(xla, vecs, vec_sq, ids, q, q_sq)

        try:
            pal = jax.jit(lambda v, i, qq, qs: gather_scores_pallas(
                v, i, qq, qs, MetricKind.L2SQ))
            got = np.asarray(pal(vecs, ids, q, q_sq))
            want = np.asarray(xla(vecs, vec_sq, ids, q, q_sq))
            err = np.abs(got - want).max()
            t_pal = bench(pal, vecs, ids, q, q_sq)
            gb = b * c * d * 4 / 1e9
            print(f"B={b} C={c}: xla={t_xla*1e3:.2f}ms "
                  f"pallas={t_pal*1e3:.2f}ms (x{t_xla/t_pal:.1f}) "
                  f"err={err:.2e} gather={gb:.2f}GB "
                  f"pallas_bw={gb/t_pal:.0f}GB/s", flush=True)
        except Exception as e:
            print(f"B={b} C={c}: xla={t_xla*1e3:.2f}ms pallas FAILED: "
                  f"{type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
