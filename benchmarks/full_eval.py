"""Multi-config evaluation against BASELINE.json's config list.

Prints one JSON line per config (stdout); progress on stderr.

configs:
1. l2sq brute-force top-10: 100k x FLOAT[64] (exact, flat MXU scan)
3. cosine + inner-product HNSW variants (100k x 128 clustered)
4. insert/delete churn + compaction, verifying post-compaction results

(config 2, the 1M headline, is bench.py; config 5, multi-host, runs on
the CPU mesh in tests/test_sharded.py — no multi-chip hardware here.)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(obj):
    print(json.dumps(obj), flush=True)


def recall_at_k(got, want):
    hits = sum(len(set(g) & set(w)) for g, w in zip(got.tolist(),
                                                    want.tolist()))
    return hits / want.size


def clustered(rng, n, d, c, sigma=0.25):
    centers = rng.normal(size=(c, d)).astype(np.float32)
    asg = rng.integers(0, c, n)
    return (centers[asg] + sigma * rng.normal(size=(n, d))
            .astype(np.float32)), centers


def config1_flat(rng):
    from duckdb_vss_tpu import MetricKind
    from duckdb_vss_tpu.models.flat import FlatIndex

    n, d, k, nq = 100_000, 64, 10, 8192
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    q = rng.normal(size=(nq, d)).astype(np.float32)
    idx = FlatIndex(d, MetricKind.L2SQ, capacity=n)
    idx.add(vecs, np.arange(n))
    idx.search(q, k)  # warm/compile
    t0 = time.time()
    it = 10
    for _ in range(it):
        s, keys = idx.search(q, k)
    qps = nq * it / (time.time() - t0)
    # exact parity vs numpy on a subset
    sub = 64
    d2 = ((q[:sub, None, :] - vecs[None, :, :]) ** 2).sum(-1)
    gt = np.argsort(d2, 1)[:, :k]
    exact = np.array_equal(np.sort(keys[:sub], 1), np.sort(gt, 1))
    emit({"config": "1-flat-l2sq-100kx64", "qps": round(qps, 1),
          "exact_parity": bool(exact), "k": k, "batch": nq})


def config3_metrics(rng):
    from duckdb_vss_tpu import HNSWConfig, MetricKind
    from duckdb_vss_tpu.models.hnsw import HNSWIndex

    n, d, k, nq = 100_000, 128, 10, 8192
    vecs, centers = clustered(rng, n, d, 1000)
    q = (centers[rng.integers(0, 1000, nq)]
         + 0.25 * rng.normal(size=(nq, d)).astype(np.float32))
    for metric in (MetricKind.COSINE, MetricKind.IP):
        # numpy ground truth
        if metric == MetricKind.COSINE:
            qs = q / np.linalg.norm(q, axis=1, keepdims=True)
            vs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
            scores = -(qs @ vs.T)
        else:
            scores = -(q @ vecs.T)
        gt = np.argsort(scores, 1)[:, :k]
        idx = HNSWIndex(d, HNSWConfig(metric=metric), capacity=n)
        t0 = time.time()
        idx.add(vecs, np.arange(n))
        build_s = time.time() - t0
        idx.search(q[:8], k, ef=16)
        _, got = idx.search(q, k, ef=16)
        rec = recall_at_k(got, gt)
        t0 = time.time()
        it = 5
        for _ in range(it):
            idx.search(q, k, ef=16)
        qps = nq * it / (time.time() - t0)
        emit({"config": f"3-hnsw-{metric.value}-100kx128",
              "qps": round(qps, 1), "recall_at_10": round(rec, 4),
              "build_s": round(build_s, 1), "ef": 16})


def config4_churn(rng):
    from duckdb_vss_tpu import HNSWConfig, MetricKind
    from duckdb_vss_tpu.models.hnsw import HNSWIndex

    n, d, k = 100_000, 128, 10
    vecs, centers = clustered(rng, n, d, 1000)
    idx = HNSWIndex(d, HNSWConfig(), capacity=n + 20_000)
    idx.add(vecs, np.arange(n))
    # churn: delete 10%, insert 10% new
    del_keys = rng.choice(n, n // 10, replace=False)
    t0 = time.time()
    idx.remove(del_keys)
    del_s = time.time() - t0
    new_v, _ = clustered(rng, n // 10, d, 1000)
    t0 = time.time()
    idx.add(new_v, np.arange(10**6, 10**6 + n // 10))
    ins_s = time.time() - t0
    q = (centers[rng.integers(0, 1000, 256)]
         + 0.25 * rng.normal(size=(256, d)).astype(np.float32))
    _, before = idx.search(q, k, ef=32)
    t0 = time.time()
    idx.compact()
    compact_s = time.time() - t0
    _, after = idx.search(q, k, ef=32)
    overlap = recall_at_k(after, before)
    deleted_leaked = bool(
        set(after.ravel().tolist()) & set(del_keys.tolist()))
    emit({"config": "4-churn-compact-100kx128",
          "delete_s": round(del_s, 2), "insert_10pct_s": round(ins_s, 1),
          "compact_s": round(compact_s, 1),
          "pre_post_overlap": round(overlap, 4),
          "deleted_rows_leaked": deleted_leaked})


def main():
    rng = np.random.default_rng(99)
    which = sys.argv[1:] or ["1", "3", "4"]
    if "1" in which:
        log("config 1: flat l2sq 100k x 64")
        config1_flat(rng)
    if "3" in which:
        log("config 3: metric variants")
        config3_metrics(rng)
    if "4" in which:
        log("config 4: churn + compact")
        config4_churn(rng)


if __name__ == "__main__":
    main()
