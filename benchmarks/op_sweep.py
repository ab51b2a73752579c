"""Operating-point sweep on the bench-shaped 1M x 128 index: (ef,
expand, steps) -> (recall@10, device QPS, e2e QPS). Reuses the cached
index from attribute_search.py. Picks the per-recall-tier winners.

Usage: python benchmarks/op_sweep.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from duckdb_vss_tpu import HNSWConfig
from duckdb_vss_tpu.models.hnsw import HNSWIndex
from duckdb_vss_tpu.utils import persist
from duckdb_vss_tpu.utils.timing import device_time


def main():
    n, d, k = 1_000_000, 128, 10
    rng = np.random.default_rng(0)
    centers = rng.normal(size=(4096, d)).astype(np.float32)
    cache = f"/tmp/attr_idx_{n}_{d}.vss"
    if os.path.exists(cache):
        idx = persist.load_index(cache, lazy=False)
        print("# loaded cache", flush=True)
    else:
        asg = rng.integers(0, 4096, n)
        vecs = (centers[asg]
                + 0.25 * rng.normal(size=(n, d)).astype(np.float32))
        idx = HNSWIndex(d, HNSWConfig(), capacity=n)
        idx.add(vecs, np.arange(n))
        persist.save_index(idx, cache)
    idx.query_transfer_dtype = "bf16"

    nq = 8192
    q = (centers[rng.integers(0, 4096, nq)]
         + 0.25 * rng.normal(size=(nq, d)).astype(np.float32))
    # ground truth on first 1024 queries (host matmul; need the store)
    vecs_host = np.asarray(jax.device_get(idx.store._vectors))[:, :d]
    v2 = (vecs_host * vecs_host).sum(1)
    n_gt = 1024
    gt = np.empty((n_gt, k), np.int64)
    for i in range(0, n_gt, 128):
        d2 = v2[None, :] - 2.0 * (q[i:i + 128] @ vecs_host.T)
        gt[i:i + 128] = np.argsort(d2, 1)[:, :k]
    print("# gt done", flush=True)

    def recall(got):
        return np.mean([len(set(a) & set(b)) / k
                        for a, b in zip(got[:n_gt].tolist(), gt.tolist())])

    # (ef, expand, steps, n_seeds); DVT_SWEEP=hi runs the >=0.99-recall
    # envelope hunt (round-3 verdict item 3: the ef=64 fixed 24-step
    # schedule lands at ~150k device QPS — find the cheapest schedule
    # and seed count that clears 0.99, target >=170k)
    if os.environ.get("DVT_SWEEP", "") == "hi":
        grid = [
            (64, 4, 24, 8),  # round-3 operating point (reference)
            (64, 4, 20, 8), (64, 4, 16, 8), (64, 4, 12, 8),
            (64, 8, 12, 8), (64, 8, 10, 8), (64, 8, 8, 8),
            (64, 4, 16, 16), (64, 4, 12, 16), (64, 8, 8, 16),
            (64, 8, 10, 16), (64, 8, 12, 16),
            (48, 4, 16, 8), (48, 8, 10, 8), (48, 8, 12, 16),
            (96, 8, 10, 8), (96, 8, 12, 8), (96, 8, 10, 16),
        ]
    else:
        grid = [
            (16, 4, 8, 8), (16, 4, 6, 8), (16, 2, 10, 8), (16, 2, 12, 8),
            (16, 2, 8, 8),
            (32, 4, 16, 8), (32, 4, 10, 8), (32, 2, 16, 8), (32, 2, 20, 8),
            (48, 4, 24, 8), (48, 2, 24, 8),
            (64, 4, 32, 8), (64, 2, 32, 8),
        ]
    for ef, expand, steps, n_seeds in grid:
        try:
            _, keys = idx.search(q, k, ef=ef, expand=expand,
                                 max_steps=steps, n_seeds=n_seeds,
                                 chunk=8192)
            r = recall(keys)
            t0 = time.perf_counter()
            iters = 4
            for _ in range(iters):
                idx.search(q, k, ef=ef, expand=expand, max_steps=steps,
                           n_seeds=n_seeds, chunk=8192)
            e2e = nq * iters / (time.perf_counter() - t0)
            # device-resident timing (completion-barriered; plain
            # block_until_ready returns at dispatch on this backend —
            # utils/timing.py)
            qd = idx.store.prepare_queries(q)
            jax.block_until_ready(qd)
            secs = device_time(
                lambda: idx.search_device(qd, k, ef=ef, expand=expand,
                                          max_steps=steps,
                                          n_seeds=n_seeds),
                iters=max(iters, 8))
            dev = nq / secs
            print(f"ef={ef:3d} expand={expand} steps={steps:2d} "
                  f"seeds={n_seeds:2d}: recall@10={r:.4f} "
                  f"e2e={e2e / 1e3:7.1f}k dev={dev / 1e3:7.1f}k QPS",
                  flush=True)
        except Exception as e:
            print(f"ef={ef} expand={expand} steps={steps}: FAILED {e}",
                  flush=True)


if __name__ == "__main__":
    main()
