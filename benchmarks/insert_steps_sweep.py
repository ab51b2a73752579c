"""Sweep the construction-beam step cap (round-4 verdict item 3).

The insert base-layer beam is a batched while-loop that steps until
EVERY row of the batch converges; uncapped its bound is
3*ef_c//expand+8 = 104 steps at the defaults, and one straggler row
bills the whole batch. The search path caps steps from measured recall
saturation (bench.py steps_of); this sweep measures the same trade for
construction: insert vec/s vs self-recall@1 (ef=32) and
inserted-in-top10, at 1M x 128 clustered base.

Usage: python benchmarks/insert_steps_sweep.py [steps ...]
  (default sweep: 0=uncapped 48 40 32 24)
Writes INSERT_STEPS.json next to the repo root.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from duckdb_vss_tpu import HNSWConfig
from duckdb_vss_tpu.models.hnsw import HNSWIndex
from duckdb_vss_tpu.utils import persist


def main():
    base_n, n_ins, d, k = 1_000_000, 8192, 128, 10
    bb = int(os.environ.get("DVT_INSERT_BB", "1024"))
    steps_list = ([int(a) for a in sys.argv[1:]]
                  or [0, 48, 40, 32, 24])
    rng = np.random.default_rng(0)
    centers = rng.normal(size=(4096, d)).astype(np.float32)
    cache = f"/tmp/attr_idx_{base_n}_{d}.vss"
    if not os.path.exists(cache):
        print("no cached 1M index; run benchmarks/insert_bench.py first",
              file=sys.stderr)
        sys.exit(1)

    new_vecs = (centers[rng.integers(0, 4096, n_ins)]
                + 0.25 * rng.normal(size=(n_ins, d)).astype(np.float32))
    warm_vecs = (centers[rng.integers(0, 4096, 4096)]
                 + 0.25 * rng.normal(size=(4096, d)).astype(np.float32))

    out = []
    for ms in steps_list:
        idx = persist.load_index(cache, lazy=False)
        idx.build_batch = bb
        idx.build_max_steps = ms  # 0 -> uncapped (see HNSWIndex)
        if os.environ.get("DVT_SWEEP_BLC"):
            idx.build_backlink_cols = int(os.environ["DVT_SWEEP_BLC"])
        keys = base_n + np.arange(n_ins)
        idx.reserve(base_n + n_ins + 2 * bb)
        t_w = time.time()
        idx.add(warm_vecs[:bb], 10_000_000 + np.arange(bb))  # compile+warm
        warm_s = time.time() - t_w
        t0 = time.time()
        idx.add(new_vecs, keys)
        dt = time.time() - t0
        _, got1 = idx.search(new_vecs[:2048], 1, ef=32)
        self_r = float(np.mean(got1[:, 0] == keys[:2048]))
        _, got10 = idx.search(new_vecs[:1024], k, ef=32)
        hit10 = float(np.mean([keys[i] in set(r) for i, r in
                               enumerate(got10.tolist())]))
        # base-graph health after the inserts: recall@10 of base-row
        # queries must stay in the pre-insert class (back-link pruning
        # rewrites existing rows; this catches over-aggressive configs)
        bq = (centers[rng.integers(0, 4096, 512)]
              + 0.25 * rng.normal(size=(512, d)).astype(np.float32))
        _, got_b = idx.search(bq, k, ef=32)
        base_found = float(np.mean(got_b[:, 0] >= 0))
        row = {"max_steps": ms, "vec_per_s": round(n_ins / dt, 1),
               "seconds": round(dt, 2), "self_recall_at_1": self_r,
               "in_top10": hit10, "build_batch": bb,
               "r_rounds": idx.build_r_rounds,
               "backlink_cols": idx.build_backlink_cols,
               "base_top1_found": base_found,
               "warm_seconds": round(warm_s, 1)}
        out.append(row)
        print(json.dumps(row), flush=True)
        del idx

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "INSERT_STEPS.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
