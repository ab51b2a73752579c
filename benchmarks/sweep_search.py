"""Operating-point sweep for 1M-scale graph search on the TPU.

Builds (or reloads) the bench-shaped index once, computes exact ground
truth, then sweeps search parameters reporting recall@10 and QPS for
each point. The built index is cached on disk (utils/persist container)
so iterating on search code skips the ~3 min build.

Usage:
  python benchmarks/sweep_search.py           # build/load + default grid
  DVT_SWEEP_GRID=quick python benchmarks/sweep_search.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CACHE = os.environ.get("DVT_SWEEP_CACHE", "/tmp/dvt_sweep_index.vss")
N = int(os.environ.get("DVT_SWEEP_N", 1_000_000))
NQ = 4096
N_GT = 1024
D, K = 128, 10


def make_data(rng, n, d, n_centers=4096, sigma=0.25, chunk=200_000):
    centers = rng.normal(size=(n_centers, d)).astype(np.float32)
    out = np.empty((n, d), np.float32)
    for off in range(0, n, chunk):
        m = min(chunk, n - off)
        asg = rng.integers(0, n_centers, m)
        out[off:off + m] = centers[asg] + sigma * rng.normal(
            size=(m, d)).astype(np.float32)
    return out, centers


def main():
    from duckdb_vss_tpu import HNSWConfig
    from duckdb_vss_tpu.models.hnsw import HNSWIndex
    from duckdb_vss_tpu.utils import persist

    rng = np.random.default_rng(1234)  # match bench.py exactly
    vecs, centers = make_data(rng, N, D)
    q = (centers[rng.integers(0, len(centers), NQ)]
         + 0.25 * rng.normal(size=(NQ, D)).astype(np.float32))

    if os.path.exists(CACHE):
        t0 = time.time()
        idx = persist.load_index(CACHE)
        print(f"# loaded cached index in {time.time()-t0:.1f}s", flush=True)
    else:
        idx = HNSWIndex(D, HNSWConfig(), capacity=N, build_batch=1024,
                        build_expand=2)
        t0 = time.time()
        idx.add(vecs, np.arange(N))
        print(f"# built in {time.time()-t0:.1f}s", flush=True)
        persist.save_index(idx, CACHE)

    # exact ground truth (host)
    t0 = time.time()
    v2 = (vecs * vecs).sum(1)
    gt = np.empty((N_GT, K), np.int64)
    for i in range(0, N_GT, 128):
        dots = q[i:i + 128] @ vecs.T
        gt[i:i + 128] = np.argsort(v2[None, :] - 2.0 * dots, 1)[:, :K]
    print(f"# gt in {time.time()-t0:.1f}s", flush=True)

    def recall(got):
        hits = sum(len(set(g) & set(w)) for g, w in
                   zip(got.tolist(), gt.tolist()))
        return hits / gt.size

    grid_name = os.environ.get("DVT_SWEEP_GRID", "default")
    if grid_name == "quick":
        full = [dict(ef=16, expand=4, n_seeds=8, max_steps=None),
                dict(ef=16, expand=4, n_seeds=8, max_steps=8)]
    else:
        full = []
        for ef, expand, steps in [
            (16, 4, None), (16, 4, 8), (16, 4, 6),
            (16, 8, 4), (32, 8, 4), (24, 8, 5), (16, 4, 4),
        ]:
            full.append(dict(ef=ef, expand=expand, n_seeds=8,
                             max_steps=steps))
    # aug=False arm: defaults only (recall/QPS A/B vs the aug path)
    arms = [(True, full), (False, full[:2])]

    for aug_on, grid in arms:
        idx.use_aug = aug_on
        idx._aug_cache = None
        idx._trav_cache = None
        for g in grid:
            kw = dict(chunk=2048, **g)
            _, got = idx.search(q[:N_GT], K, **kw)  # warm + recall
            r = recall(got)
            iters = 3
            t0 = time.time()
            for _ in range(iters):
                idx.search(q, K, **kw)
            qps = NQ * iters / (time.time() - t0)
            print(f"aug={int(aug_on)} ef={g['ef']:>3} expand={g['expand']} "
                  f"steps={str(g['max_steps']):>4} recall={r:.4f} "
                  f"qps={qps:,.0f}", flush=True)


if __name__ == "__main__":
    main()
