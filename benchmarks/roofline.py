"""Per-operator roofline accounting at the bench shapes.

For every hot operator: analytic bytes moved + FLOPs, the resulting
HBM-bandwidth and MXU floors, measured time, and %-of-roofline. Emits a
markdown table (paste into ROOFLINE.md) plus one JSON line per op.

v5e (1 chip) peaks used for the floors:
  MXU:  197 TFLOP/s bf16, 394 TOP/s int8
  HBM:  819 GB/s
(If the part differs, override via DVT_PEAK_TFLOPS / DVT_PEAK_GBPS.)

Usage: python benchmarks/roofline.py [N] [B]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from duckdb_vss_tpu import HNSWConfig
from duckdb_vss_tpu.models.hnsw import HNSWIndex
from duckdb_vss_tpu.models import graph as G
from duckdb_vss_tpu.utils import persist
from duckdb_vss_tpu.utils.config import MetricKind
from duckdb_vss_tpu.utils.timing import device_time

PEAK_TFLOPS_BF16 = float(os.environ.get("DVT_PEAK_TFLOPS", 197.0))
PEAK_TOPS_INT8 = 2 * PEAK_TFLOPS_BF16
PEAK_GBPS = float(os.environ.get("DVT_PEAK_GBPS", 819.0))


def timeit(fn, iters=10, warm=2):
    # completion-barriered (block_until_ready returns at dispatch on the
    # tunneled backend — utils/timing.py)
    return device_time(fn, iters=iters, warm=warm)


def report(rows, name, secs, flops, bytes_, peak_tflops=PEAK_TFLOPS_BF16):
    t_mxu = flops / (peak_tflops * 1e12)
    t_hbm = bytes_ / (PEAK_GBPS * 1e9)
    floor = max(t_mxu, t_hbm)
    bound = "MXU" if t_mxu > t_hbm else "HBM"
    rows.append({
        "op": name,
        "measured_ms": round(secs * 1e3, 3),
        "flops_g": round(flops / 1e9, 2),
        "bytes_mb": round(bytes_ / 1e6, 1),
        "floor_ms": round(floor * 1e3, 3),
        "bound": bound,
        "pct_of_roofline": round(100 * floor / secs, 1),
    })
    print(f"| {name} | {secs * 1e3:.2f} | {flops / 1e9:.1f} | "
          f"{bytes_ / 1e6:.0f} | {floor * 1e3:.3f} ({bound}) | "
          f"{100 * floor / secs:.0f}% |", flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    d, k, ef, expand = 128, 10, 16, 4
    rng = np.random.default_rng(0)
    centers = rng.normal(size=(4096, d)).astype(np.float32)
    cache = f"/tmp/attr_idx_{n}_{d}.vss"
    if os.path.exists(cache):
        idx = persist.load_index(cache, lazy=False)
    else:
        asg = rng.integers(0, 4096, n)
        vecs = (centers[asg]
                + 0.25 * rng.normal(size=(n, d)).astype(np.float32))
        idx = HNSWIndex(d, HNSWConfig(), capacity=n)
        idx.add(vecs, np.arange(n))
        persist.save_index(idx, cache)
    q_np = (centers[rng.integers(0, 4096, b)]
            + 0.25 * rng.normal(size=(b, d)).astype(np.float32))
    q = idx.store.prepare_queries(q_np)
    q_sq = jnp.sum(q * q, axis=-1)
    jax.block_until_ready(q)
    cap = idx.store.capacity
    d_pad = idx.store.d_pad
    m0 = idx.graph.neighbors0.shape[1]

    print("| op | measured ms | GFLOP | MB moved | floor ms (bound) | "
          "% roofline |", flush=True)
    print("|---|---|---|---|---|---|", flush=True)
    rows = []

    # ---- 1. flat exact scan (config-1 shape: 100k x 64, B=8192) -------
    from duckdb_vss_tpu.models.flat import FlatIndex

    nf, df = 100_000, 64
    fvecs = rng.normal(size=(nf, df)).astype(np.float32)
    fi = FlatIndex(df, MetricKind.L2SQ, capacity=nf)
    fi.add(fvecs, np.arange(nf))
    fq = fi.prepare_queries(q_np[:, :df])
    jax.block_until_ready(fq)
    secs = timeit(lambda: fi.search_device(fq, k))
    flops = 2.0 * b * fi.capacity * fi.d_pad  # f32 matmul
    bytes_ = fi.capacity * fi.d_pad * 4  # stream the store once
    report(rows, f"flat_scan_{nf}x{df}_B{b}", secs, flops, bytes_,
           peak_tflops=PEAK_TFLOPS_BF16 / 2)  # f32 MXU rate

    # ---- 2. MXU descent ------------------------------------------------
    uv, uvsq, unode = idx._upper_vectors()
    cap_u = uv.shape[0]
    import functools

    @functools.partial(jax.jit)
    def ds(uv, uvsq, unode, entry, q, qs):
        return G.mxu_descent(uv, uvsq, unode, entry, q, qs,
                             MetricKind.L2SQ, 8)

    entry = idx.graph.entry_node
    jax.block_until_ready(ds(uv, uvsq, unode, entry, q, q_sq))
    secs = timeit(lambda: ds(uv, uvsq, unode, entry, q, q_sq))
    flops = 2.0 * b * cap_u * d_pad  # bf16 matmul
    bytes_ = cap_u * d_pad * 2  # bf16 table streamed once
    report(rows, f"mxu_descent_U{cap_u}_B{b}", secs, flops, bytes_)

    # ---- 3. fused beam kernel (per full search, 8 steps) ---------------
    from duckdb_vss_tpu.ops.pallas_beam import beam_search_pallas

    nv, nsc, nsq, nmeta = idx._neighborhood_tables()
    seeds, _ = ds(uv, uvsq, unode, entry, q, q_sq)
    seed_s = G.gather_scores(idx.store._vectors, idx.store._vec_sq, seeds,
                             q, q_sq, MetricKind.L2SQ)
    seed_s = jnp.sort(seed_s, axis=1)
    pad = ef - seeds.shape[1]
    seed_i = jnp.concatenate(
        [seeds, jnp.full((b, pad), -1, jnp.int32)], axis=1)
    seed_sp = jnp.concatenate(
        [seed_s, jnp.full((b, pad), 3.4e38, jnp.float32)], axis=1)
    steps = 8

    def beam():
        return beam_search_pallas(
            q, q_sq, seed_sp, seed_i, nmeta, nv, ef=ef, expand=expand,
            m0=m0, d=d_pad, max_steps=steps, metric=MetricKind.L2SQ)

    jax.block_until_ready(beam())
    secs = timeit(beam)
    # per (query, step, expansion): one int8 vec row + one meta row
    bytes_ = b * steps * expand * (m0 * d_pad + nmeta.shape[1] * 4)
    flops = 2.0 * b * steps * expand * m0 * d_pad  # int8 dots
    report(rows, f"pallas_beam_ef{ef}x{steps}_B{b}", secs, flops, bytes_,
           peak_tflops=PEAK_TOPS_INT8)

    # ---- 4. rerank gather + sort (finish) -------------------------------
    bs, bi, _ = beam()
    jax.block_until_ready((bs, bi))

    @functools.partial(jax.jit)
    def fin(s, i, q, qs, vectors, vec_sq, valid):
        return G._finish_search(None, vectors, vec_sq, valid, q, qs,
                                MetricKind.L2SQ, k, s, i, jnp.int32(0))

    args = (bs, bi, q, q_sq, idx.store._vectors, idx.store._vec_sq,
            idx.store._valid)
    jax.block_until_ready(fin(*args))
    secs = timeit(lambda: fin(*args))
    bytes_ = b * ef * d_pad * 4  # ef scattered f32 rows per query
    flops = 2.0 * b * ef * d_pad
    report(rows, f"rerank_ef{ef}_B{b}", secs, flops, bytes_,
           peak_tflops=PEAK_TFLOPS_BF16 / 2)

    # ---- 5. bulk kNN sweep block (bf16, approx top-k) -------------------
    from duckdb_vss_tpu.ops.topk import flat_topk

    vecs_bf = idx.store._vectors.astype(jnp.bfloat16)
    jax.block_until_ready(vecs_bf)

    @functools.partial(jax.jit)
    def sweep(qq, vv, sq, va):
        return flat_topk(qq, vv, 48, MetricKind.L2SQ, vec_sq=sq, valid=va,
                         block_n=16384, approx=True)

    args5 = (q, vecs_bf, idx.store._vec_sq, idx.store._valid)
    jax.block_until_ready(sweep(*args5))
    secs = timeit(lambda: sweep(*args5), iters=3)
    flops = 2.0 * b * cap * d_pad
    bytes_ = cap * d_pad * 2
    report(rows, f"bulk_sweep_{cap}x{d_pad}_B{b}", secs, flops, bytes_)

    for r in rows:
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
