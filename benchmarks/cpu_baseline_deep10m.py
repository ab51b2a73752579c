"""Measured CPU reference baseline at config-5 scale (10M x FLOAT[96]).

Round-4 verdict item 2: DEEP10M_r04's 8.4k QPS / 569 s numbers had no
measured baseline. This runs the reference-semantics CPU HNSW
(native/cpu_hnsw.cpp — insertion-based construction per usearch
index_gt::add, /root/reference/src/include/usearch/index.hpp:2330-2335,
and the scalar search loop, index.hpp:3503-3573; one task per thread on
all host cores, simsimd compile-time OFF as in the reference's default
build) over the SAME Deep10M-shaped data as benchmarks/deep10m.py
(cache /tmp/deep_data_10000000_96.npz, rng seed 77), builds its OWN
graph, sweeps ef to the engine's recorded operating recall, and writes
CPU_BASELINE_10M.json.

Run: python benchmarks/cpu_baseline_deep10m.py  (pure CPU; ~1 h on 4 cores)
Env: DVT_DEEP_N (default 10_000_000), DVT_CPU_Q (default 4096).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from duckdb_vss_tpu.utils.cpu_baseline import CPUBaseline

# the engine's recorded 10M operating point (DEEP10M_r04.json)
ENGINE_RECALL = 0.9564


def main():
    n = int(os.environ.get("DVT_DEEP_N", 10_000_000))
    d, k = 96, 10
    cache = f"/tmp/deep_data_{n}_{d}.npz"
    if not os.path.exists(cache):
        print(f"# no data cache at {cache}; run benchmarks/deep10m.py "
              "first (it writes the cache)", file=sys.stderr)
        sys.exit(1)
    z = np.load(cache)
    vecs, q, gt = z["vecs"], z["q"], z["gt"]
    n_gt = gt.shape[0]
    print(f"# loaded {vecs.shape} + {n_gt} gt rows", file=sys.stderr,
          flush=True)

    # same level sampling as bench.py's baseline leg (usearch geometric
    # with 1/ln(M) scaling ~ log base 16, index_plugins.hpp analog)
    rng_b = np.random.default_rng(777)
    u = rng_b.random(n)
    levels = np.minimum(
        np.floor(-np.log(np.maximum(u, 1e-12)) / np.log(16.0)), 8
    ).astype(np.int32)

    t0 = time.time()
    cb, build_s = CPUBaseline.build(vecs, levels, m=16, m0=32,
                                    ef_construction=128)
    print(f"# build: {build_s:.1f}s ({n / build_s:.0f} vec/s) "
          f"[wall {time.time() - t0:.1f}s]", file=sys.stderr, flush=True)

    def recall(ids):
        return float(np.mean([len(set(a) & set(b)) / k for a, b in
                              zip(ids.tolist(), gt.tolist())]))

    sweep = {}
    chosen = None
    for ef in (16, 24, 32, 48, 64, 96, 128, 192, 256):
        ids, secs = cb.search(q[:n_gt], k, ef=ef)
        r = recall(ids.astype(np.int64))
        sweep[ef] = round(r, 4)
        print(f"# ef={ef}: recall@10={r:.4f} ({n_gt / secs:.0f} qps)",
              file=sys.stderr, flush=True)
        chosen = (ef, r)
        if r >= ENGINE_RECALL:
            break

    ef, rec = chosen
    n_cpu = int(os.environ.get("DVT_CPU_Q", 4096))
    cb.search(q[:256], k, ef=ef)  # warm threads
    best = None
    for _ in range(3):
        _, secs = cb.search(q[:n_cpu], k, ef=ef)
        best = secs if best is None else min(best, secs)
    qps = n_cpu / best

    # also a high-ef point for the recall-ceiling question
    hi_ef = 256
    ids_hi, secs_hi = cb.search(q[:n_gt], k, ef=hi_ef)
    rec_hi = recall(ids_hi.astype(np.int64))

    out = {
        "metric": "deep10m_cpu_baseline",
        "n": n, "dims": d,
        "build_seconds": round(build_s, 1),
        "build_vectors_per_s": round(n / build_s, 1),
        "qps": round(qps, 1),
        "recall_at_10": round(rec, 4),
        "ef_search": ef,
        "recall_sweep": sweep,
        "recall_at_ef256": round(rec_hi, 4),
        "engine_recall_target": ENGINE_RECALL,
        "cores": os.cpu_count(),
        "notes": ("reference-semantics CPU HNSW (insertion build + "
                  "scalar search, usearch index.hpp:2330-2335/3503-3573 "
                  "semantics) on all host cores, own graph, same data "
                  "as benchmarks/deep10m.py"),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "CPU_BASELINE_10M.json")
    with open(path, "w") as f:
        json.dump(out, f)
        f.write("\n")
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
