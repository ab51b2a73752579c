"""XLA row-gather cost model on the TPU: per-row vs per-byte.

Times jnp.take(table, ids, axis=0) inside a scan for:
  - varying number of gathered rows at fixed row size
  - varying row size (grouped layouts [N/G, G*D]) at fixed total rows
  - varying row size at fixed total bytes

If cost is ~linear in ROWS and flat in row bytes (until bandwidth),
grouped gathers of consecutive slots are the win for beam search.

Usage: python benchmarks/profile_gather.py
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

ITERS_LO, ITERS_HI = 4, 20


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf))


def timed_loop(label, body, init, *tables, reps=3):
    def run(n_iters):
        def scan_fn(carry, _, tabs):
            return body(carry, *tabs), None

        f = jax.jit(lambda carry, *tabs: lax.scan(
            partial(scan_fn, tabs=tabs), carry, None, length=n_iters)[0])
        out = f(init, *tables)
        _sync(out)
        best = np.inf
        for _ in range(reps):
            t0 = time.time()
            out = f(init, *tables)
            _sync(out)
            best = min(best, time.time() - t0)
        return best

    t_lo, t_hi = run(ITERS_LO), run(ITERS_HI)
    per = (t_hi - t_lo) / (ITERS_HI - ITERS_LO)
    print(f"{label:62s} {per*1e3:9.3f} ms/iter", flush=True)
    return per


def main():
    n_bytes = 1 << 28  # 256 MB table
    rng = np.random.default_rng(0)

    for rows, row_f32 in [
        (262_144, 64),   # current shape: 256 B rows (bf16 D=128 equiv)
        (262_144, 512),  # same rows, 8x bytes
        (65_536, 64),
        (65_536, 256),
        (65_536, 512),   # grouped G=8
        (32_768, 512),
        (32_768, 1024),
        (8_192, 1024),   # 4 KB rows
        (2_048, 16384),  # 64 KB rows (cluster blocks)
    ]:
        n_rows_tab = n_bytes // (row_f32 * 4)
        tab = jnp.asarray(
            rng.normal(size=(n_rows_tab, row_f32)).astype(np.float32))
        ids0 = jnp.asarray(
            rng.integers(0, n_rows_tab, (rows,)).astype(np.int32))

        def body(ids, tab, n_rows_tab=n_rows_tab):
            g = jnp.take(tab, ids, axis=0)
            return (ids + g[:, :1].astype(jnp.int32)[:, 0] % 3 + 1) % n_rows_tab

        mb = rows * row_f32 * 4 / 1e6
        timed_loop(
            f"take rows={rows:>7} rowbytes={row_f32*4:>6} ({mb:7.1f} MB)",
            body, ids0, tab)


if __name__ == "__main__":
    main()
