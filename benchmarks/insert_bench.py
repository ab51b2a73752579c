"""Incremental insert throughput vs graph quality, by build_batch.

The reference inserts one row per thread through usearch add()
(hnsw_index.cpp:391-449); the TPU path inserts a BATCH per dispatch
(models/build.insert_batch). Larger batches amortize the per-dispatch
beam search but insert against a staler graph (intra-batch peers
mitigate). This sweeps build_batch and reports vec/s + self-recall@1
+ recall@10 of the inserted rows, so the default can sit at the
largest batch that holds the quality bar (VERDICT round-1 item 5:
>=5k vec/s at the test_hnsw self-recall bar).

Usage: python benchmarks/insert_bench.py [base_n] [n_insert]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from duckdb_vss_tpu import HNSWConfig
from duckdb_vss_tpu.models.hnsw import HNSWIndex
from duckdb_vss_tpu.utils import persist


def main():
    base_n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_ins = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
    d, k = 128, 10
    rng = np.random.default_rng(0)
    centers = rng.normal(size=(4096, d)).astype(np.float32)
    cache = f"/tmp/attr_idx_{base_n}_{d}.vss"

    new_vecs = (centers[rng.integers(0, 4096, n_ins)]
                + 0.25 * rng.normal(size=(n_ins, d)).astype(np.float32))
    # warm-up rows must be DISTINCT from the timed rows: inserting the
    # same vector twice makes self-recall@1 measure which twin's
    # in-links win the exact-score tie, not insertion quality
    warm_vecs = (centers[rng.integers(0, 4096, 4096)]
                 + 0.25 * rng.normal(size=(4096, d)).astype(np.float32))

    for bb in (256, 1024, 2048, 4096):
        if os.path.exists(cache):
            idx = persist.load_index(cache, lazy=False)
        else:
            asg = rng.integers(0, 4096, base_n)
            vecs = (centers[asg]
                    + 0.25 * rng.normal(size=(base_n, d)).astype(np.float32))
            idx = HNSWIndex(d, HNSWConfig(), capacity=base_n)
            idx.add(vecs, np.arange(base_n))
            persist.save_index(idx, cache)
        idx.build_batch = bb
        keys = base_n + np.arange(n_ins)
        # pre-grow capacity: a mid-timing grow would also rebuild the
        # multi-GB neighborhood table (capacity invalidates it); in
        # production that cost amortizes over capacity-doubling
        idx.reserve(base_n + n_ins + 2 * bb)
        # warm the insert program shape on a throwaway batch (also
        # builds the int8 neighborhood table the fused path inserts
        # through — excluded from the timed region like the compile)
        idx.add(warm_vecs[:bb], 10_000_000 + np.arange(bb))
        t0 = time.time()
        idx.add(new_vecs, keys)
        dt = time.time() - t0
        # self-recall@1: every inserted row must find itself
        _, got1 = idx.search(new_vecs[:2048], 1, ef=16)
        self_r = float(np.mean(got1[:, 0] == keys[:2048]))
        # recall@10 of inserted rows against brute force over new rows
        # + a sample of the base (cheap proxy: only check that inserted
        # rows appear for queries at their location)
        _, got10 = idx.search(new_vecs[:1024], k, ef=32)
        hit10 = float(np.mean([keys[i] in set(r) for i, r in
                               enumerate(got10.tolist())]))
        print(f"build_batch={bb:5d}: {n_ins / dt:8.0f} vec/s "
              f"({dt:.1f}s) self-recall@1={self_r:.4f} "
              f"in-top10={hit10:.4f}", flush=True)


if __name__ == "__main__":
    main()
