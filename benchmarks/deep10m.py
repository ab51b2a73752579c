"""Config 5 scale validation: 10M x FLOAT[96] (Deep10M-shaped) build +
top-10 search on one chip (BASELINE.json config #5's single-chip leg;
the multi-host leg is validated structurally on the virtual mesh —
tests/test_sharded.py + __graft_entry__.dryrun_multichip).

Memory story at this scale (16 GB HBM v5e), scalar_kind="bf16" (the
lean storage mode, usearch scalar-cast analog — models/flat.py):
  bf16 store 12.58Mcap x 128pad  3.2 GB  (resident; IS the traversal
                                          table — no separate copy)
  base adjacency cap x 32 i32    1.6 GB
  upper tables                   ~0.4 GB
  build temporaries (knn lists   ~4.3 GB peak (DVT_BUILD_KNN_K=32)
    [cap,32] ids+scores, rev, IVF chunk scores)
  int8 neighborhood table       41   GB  -> DOES NOT FIT: the layout
  auto-gate (DVT_NBR_BUDGET_GB) disables it and search rides the XLA
  beam over the bf16 store. Sharding the table 8-way (5 GB/shard)
  restores the fused-kernel path on a pod — the config-5 multi-host
  plan. An f32 store (5.1 GB + separate bf16 traversal copy 2.6 GB)
  also fits at rest but leaves no headroom for the build temporaries;
  bf16 rounding costs ~2^-8 relative on emitted distances and is
  absorbed by the measured-recall operating point.

Prints one JSON line. Env: DVT_DEEP_N (default 10_000_000),
DVT_DEEP_SCALAR (default bf16).
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
    n = int(os.environ.get("DVT_DEEP_N", 10_000_000))
    d, k, nq = 96, 10, 8192
    n_gt = 512
    chunk = 500_000
    cache = f"/tmp/deep_data_{n}_{d}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        vecs, q, gt = z["vecs"], z["q"], z["gt"]
        print("# data cache hit", file=sys.stderr, flush=True)
    else:
        rng = np.random.default_rng(77)
        n_centers = 8192
        centers = rng.normal(size=(n_centers, d)).astype(np.float32)
        t0 = time.time()
        vecs = np.empty((n, d), np.float32)
        for off in range(0, n, chunk):
            m = min(chunk, n - off)
            asg = rng.integers(0, n_centers, m)
            vecs[off:off + m] = (centers[asg]
                                 + 0.25 * rng.normal(size=(m, d)).astype(
                                     np.float32))
        q = (centers[rng.integers(0, n_centers, nq)]
             + 0.25 * rng.normal(size=(nq, d)).astype(np.float32))
        gen_s = time.time() - t0
        print(f"# gen: {gen_s:.0f}s", file=sys.stderr, flush=True)

        # exact ground truth for n_gt queries (host matmul, chunked)
        t0 = time.time()
        best_d = np.full((n_gt, k), np.inf, np.float32)
        best_i = np.full((n_gt, k), -1, np.int64)
        qg = q[:n_gt]
        for off in range(0, n, chunk):
            blk = vecs[off:off + chunk]
            d2 = (blk * blk).sum(1)[None, :] - 2.0 * (qg @ blk.T)
            cat_d = np.concatenate([best_d, d2], axis=1)
            cat_i = np.concatenate(
                [best_i, np.broadcast_to(np.arange(off, off + len(blk)),
                                         (n_gt, len(blk)))], axis=1)
            pos = np.argpartition(cat_d, k, axis=1)[:, :k]
            best_d = np.take_along_axis(cat_d, pos, axis=1)
            best_i = np.take_along_axis(cat_i, pos, axis=1)
        order = np.argsort(best_d, axis=1)
        gt = np.take_along_axis(best_i, order, axis=1)
        gt_s = time.time() - t0
        print(f"# gt: {gt_s:.0f}s", file=sys.stderr, flush=True)
        np.savez(cache, vecs=vecs, q=q, gt=gt)

    scalar = os.environ.get("DVT_DEEP_SCALAR", "bf16")
    os.environ.setdefault("DVT_BUILD_KNN_K", "32")
    idx = HNSWIndex(d, HNSWConfig(), capacity=n, scalar_kind=scalar)
    idx.query_transfer_dtype = "bf16"
    t0 = time.time()
    idx.add(vecs, np.arange(n))
    build_s = time.time() - t0
    print(f"# build: {build_s:.0f}s ({n / build_s:.0f} vec/s)",
          file=sys.stderr, flush=True)

    def recall(got):
        return float(np.mean([len(set(a) & set(b)) / k for a, b in
                              zip(got[:n_gt].tolist(), gt.tolist())]))

    # full ef sweep (round-4 verdict: one operating point at 10M was
    # thin — record the curve + the recall ceiling, not just the
    # cheapest >=0.95 point)
    sweep = []
    chosen = hi = None
    prev_r = -1.0
    for ef in (16, 32, 48, 64, 96, 128, 192, 256):
        _, got = idx.search(q[:n_gt], k, ef=ef, chunk=8192)
        r = recall(got)
        print(f"# ef={ef}: recall@10={r:.4f}", file=sys.stderr, flush=True)
        sweep.append({"ef": ef, "recall_at_10": round(r, 4)})
        if chosen is None and r >= 0.95:
            chosen = (ef, r)
        if r >= 0.99:
            hi = (ef, r)
            break
        if r <= prev_r + 1e-4 and chosen is not None:
            break  # saturated: recall ceiling reached
        prev_r = r
    if chosen is None:
        chosen = (sweep[-1]["ef"], sweep[-1]["recall_at_10"])
    if hi is None and sweep[-1]["recall_at_10"] > chosen[1] + 1e-4:
        hi = (sweep[-1]["ef"], sweep[-1]["recall_at_10"])

    def timed_qps(ef):
        idx.search(q, k, ef=ef, chunk=8192)  # warm
        best = None
        for _ in range(3):
            t0 = time.time()
            idx.search(q, k, ef=ef, chunk=8192)
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return nq / best

    ef, rec = chosen
    qps = timed_qps(ef)
    hi_entry = None
    if hi is not None and hi[0] != ef:
        hi_entry = {"ef": hi[0], "recall_at_10": round(hi[1], 4),
                    "qps_e2e": round(timed_qps(hi[0]), 1)}
    out = {
        "metric": "deep10m_shaped_top10_qps_per_chip",
        "value": round(qps, 1),
        "unit": "qps",
        "recall_at_10": round(rec, 4),
        "ef_search": ef,
        "recall_sweep": sweep,
        "high_recall_point": hi_entry,
        "build_seconds": round(build_s, 1),
        "build_vectors_per_s": round(n / build_s, 1),
        "n": n, "dims": d,
        "layout": f"scalar_kind={scalar} store (int8 neighborhood table "
                  "exceeds 1-chip HBM at 10M; sharded 8-way it fits "
                  "5 GB/shard)",
    }
    art = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "DEEP10M_r05.json")
    with open(art, "w") as f:
        json.dump(out, f)
        f.write("\n")
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
