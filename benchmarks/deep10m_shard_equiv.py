"""Config-5 per-shard-scale fused-path validation (round-4 verdict
item 6).

DEEP10M_r04 noted "sharded 8-way the int8 neighborhood table fits
5 GB/shard and the fused kernel returns" — a layout claim that had
never executed. This builds EXACTLY the 8-way-sharded per-device shape
on the one real chip: 1.25M x FLOAT[96], scalar_kind=bf16 store, int8
neighborhood table, fused Pallas beam kernel — and measures QPS/recall
at the shard-equivalent operating point (ef_local=16 per the
ShardedHNSWIndex scaling policy at S=8/ef=64, plus ef=64 for the
single-index framing).

Writes DEEP10M_SHARD_EQUIV.json. Run on the TPU chip (~5 min).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from duckdb_vss_tpu import HNSWConfig
from duckdb_vss_tpu.models.hnsw import HNSWIndex


def main():
    n, d, k, nq, n_gt = 1_250_000, 96, 10, 8192, 512
    rng = np.random.default_rng(77)
    n_centers = 8192
    centers = rng.normal(size=(n_centers, d)).astype(np.float32)
    t0 = time.time()
    chunk = 250_000
    vecs = np.empty((n, d), np.float32)
    for off in range(0, n, chunk):
        m = min(chunk, n - off)
        asg = rng.integers(0, n_centers, m)
        vecs[off:off + m] = (centers[asg]
                             + 0.25 * rng.normal(size=(m, d)).astype(
                                 np.float32))
    q = (centers[rng.integers(0, n_centers, nq)]
         + 0.25 * rng.normal(size=(nq, d)).astype(np.float32))
    v2 = (vecs * vecs).sum(1)
    gt = np.empty((n_gt, k), np.int64)
    for i in range(0, n_gt, 64):
        d2 = v2[None, :] - 2.0 * (q[i:i + 64] @ vecs.T)
        gt[i:i + 64] = np.argsort(d2, 1)[:, :k]
    print(f"# gen+gt {time.time() - t0:.0f}s", file=sys.stderr, flush=True)

    os.environ.setdefault("DVT_BUILD_KNN_K", "32")
    idx = HNSWIndex(d, HNSWConfig(), capacity=n, scalar_kind="bf16")
    idx.query_transfer_dtype = "bf16"
    t0 = time.time()
    idx.add(vecs, np.arange(n))
    build_s = time.time() - t0
    print(f"# build {build_s:.0f}s ({n / build_s:.0f} vec/s)",
          file=sys.stderr, flush=True)

    def recall(got):
        return float(np.mean([len(set(a) & set(b)) / k for a, b in
                              zip(got[:n_gt].tolist(), gt.tolist())]))

    # confirm the fused path is actually on at this scale
    nv, _, _, _ = idx._neighborhood_tables()
    fused = nv is not None

    points = []
    steps_of = {16: 6, 32: 10, 64: 24}
    for ef in (16, 32, 64):
        kw = dict(expand=4, n_seeds=8, chunk=8192,
                  max_steps=steps_of.get(ef))
        _, got = idx.search(q[:n_gt], k, ef=ef, **kw)
        r = recall(got)
        idx.search(q, k, ef=ef, **kw)  # warm
        best = None
        for _ in range(5):
            t0 = time.time()
            idx.search(q, k, ef=ef, **kw)
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        points.append({"ef": ef, "recall_at_10": round(r, 4),
                       "qps_e2e": round(nq / best, 1)})
        print(f"# ef={ef}: recall={r:.4f} qps={nq / best:.0f}",
              file=sys.stderr, flush=True)

    out = {
        "metric": "deep10m_shard_equivalent_fused",
        "n": n, "dims": d,
        "fused_layout_active": fused,
        "build_seconds": round(build_s, 1),
        "build_vectors_per_s": round(n / build_s, 1),
        "points": points,
        "notes": ("1.25Mx96 bf16 store + int8 neighborhood table on one "
                  "chip = the exact per-device shape of the 8-way-"
                  "sharded Deep10M plan; validates the fused-kernel "
                  "path DEEP10M_r04 claimed for the sharded layout. "
                  "Aggregate pod QPS ~ 8x the ef_local=16 point "
                  "(sharded policy at S=8, one all-gather merge per "
                  "batch)."),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "DEEP10M_SHARD_EQUIV.json")
    with open(path, "w") as f:
        json.dump(out, f)
        f.write("\n")
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
