"""Measure whether query upload overlaps device compute in the chunked
search path (round-4 verdict item 8: "double-buffer H2D against the
previous chunk's device program").

Method: on a populated 1M index, measure
  (a) pure upload time of the full query batch (prepare_queries +
      block), chunk by chunk;
  (b) pure device search time with queries already resident
      (device_time, RTT-subtracted);
  (c) e2e search time (upload + search + one result fetch).
If (c) ~= (a) + small tail, uploads already overlap compute and e2e
sits at the tunnel bound — the remaining gap is the pipe, not the
pipeline. If (c) ~= (a) + (b), the path serializes and explicit
double-buffering would pay.

Writes H2D_OVERLAP.json. Run on the TPU chip.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from duckdb_vss_tpu.utils import persist


def main():
    import jax

    from duckdb_vss_tpu.utils.timing import device_time, measure_rtt

    idx = persist.load_index("/tmp/attr_idx_1000000_128.vss", lazy=False)
    rng = np.random.default_rng(0)
    centers = rng.normal(size=(4096, 128)).astype(np.float32)
    nq, k, chunk = 16384, 10, 8192
    q = (centers[rng.integers(0, 4096, nq)]
         + 0.25 * rng.normal(size=(nq, 128)).astype(np.float32))
    kw = dict(ef=16, expand=4, n_seeds=8, chunk=chunk, max_steps=6)

    idx.search(q, k, **kw)  # warm programs + tables

    # (a) upload-only, chunk by chunk (blocked)
    best_up = None
    for _ in range(5):
        t0 = time.time()
        for off in range(0, nq, chunk):
            qd = idx.store.prepare_queries(
                q[off:off + chunk], transfer_dtype="bf16")
            jax.block_until_ready(qd)
        dt = time.time() - t0
        best_up = dt if best_up is None else min(best_up, dt)

    # (b) device-resident search (per chunk x n_chunks)
    qd = idx.store.prepare_queries(q[:chunk], transfer_dtype="bf16")
    jax.block_until_ready(qd)
    dev_chunk = device_time(
        lambda: idx.search_device(qd, k, ef=16, expand=4, max_steps=6),
        iters=8)
    dev_total = dev_chunk * (nq // chunk)

    # (c) e2e
    best_e2e = None
    for _ in range(7):
        t0 = time.time()
        idx.search(q, k, **kw)
        dt = time.time() - t0
        best_e2e = dt if best_e2e is None else min(best_e2e, dt)

    rtt = measure_rtt()
    overlap_gap = best_e2e - best_up  # compute exposed beyond upload
    out = {
        "metric": "h2d_overlap_probe",
        "upload_seconds": round(best_up, 4),
        "device_compute_seconds": round(dev_total, 4),
        "e2e_seconds": round(best_e2e, 4),
        "exposed_beyond_upload_seconds": round(overlap_gap, 4),
        "serialized_estimate_seconds": round(best_up + dev_total, 4),
        "rtt_ms": round(rtt * 1e3, 1),
        "qps_e2e": round(nq / best_e2e, 1),
        "query_batch": nq, "chunk": chunk,
        "verdict": ("overlapped (e2e ~ upload bound)"
                    if overlap_gap < 0.5 * dev_total else
                    "serialized (double-buffering would pay)"),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "H2D_OVERLAP.json")
    with open(path, "w") as f:
        json.dump(out, f)
        f.write("\n")
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
