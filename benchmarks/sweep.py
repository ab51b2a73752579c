"""Parameter sweep on the real TPU: build rate and search QPS/recall
across (build_batch, expand, ef). Populates the persistent compile cache
as a side effect. Usage: python benchmarks/sweep.py [N] [D]"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from duckdb_vss_tpu import HNSWConfig, MetricKind
from duckdb_vss_tpu.models.flat import FlatIndex
from duckdb_vss_tpu.models.hnsw import HNSWIndex


def clustered(rng, n, d, c=None, sigma=0.25):
    c = c or max(64, n // 100)
    centers = rng.normal(size=(c, d)).astype(np.float32)
    asg = rng.integers(0, c, n)
    return (centers[asg] + sigma * rng.normal(size=(n, d))).astype(np.float32), centers


def recall(got, want):
    hits = sum(len(set(g) & set(w)) for g, w in zip(got.tolist(), want.tolist()))
    return hits / want.size


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    k = 10
    rng = np.random.default_rng(0)
    vecs, centers = clustered(rng, n, d)
    nq = 1000
    q = (centers[rng.integers(0, len(centers), nq)]
         + 0.25 * rng.normal(size=(nq, d))).astype(np.float32)

    flat = FlatIndex(d, MetricKind.L2SQ, capacity=n)
    flat.add(vecs, np.arange(n))
    t0 = time.time()
    _, gt = flat.search(q, k)
    print(f"flat gt for {nq} queries: {time.time()-t0:.2f}s", flush=True)

    for bb, bx in [(256, 2), (1024, 2), (1024, 4)]:
        idx = HNSWIndex(d, HNSWConfig(), capacity=max(n, 100_000),
                        build_batch=bb, build_expand=bx)
        t0 = time.time()
        idx.add(vecs[:2 * bb], np.arange(2 * bb))
        compile_s = time.time() - t0
        t0 = time.time()
        idx.add(vecs[2 * bb:], np.arange(2 * bb, n))
        dt = time.time() - t0
        rate = (n - 2 * bb) / dt
        print(f"build bb={bb} expand={bx}: compile={compile_s:.0f}s "
              f"rate={rate:.0f} vec/s", flush=True)

        for ef in (32, 64):
            for sx in (2, 4, 8):
                idx.search(q[:8], k, ef=ef, expand=sx)  # compile
                for B in (256, 1024):
                    qq = q[:B]
                    idx.search(qq, k, ef=ef, expand=sx)
                    t0 = time.time()
                    it = 5
                    for _ in range(it):
                        s, got = idx.search(qq, k, ef=ef, expand=sx)
                    dt = (time.time() - t0) / it
                    r = recall(got, gt[:B])
                    print(f"  search ef={ef} expand={sx} B={B}: "
                          f"{dt*1e3:.1f}ms {B/dt:.0f} QPS recall={r:.3f}",
                          flush=True)


if __name__ == "__main__":
    main()
