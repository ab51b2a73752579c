"""Honest device timing over remote-dispatch backends.

On this environment's tunneled TPU backend (``axon``),
``jax.block_until_ready`` returns once the *dispatch* is acknowledged,
NOT when the computation finishes — a timing loop that ends with
``block_until_ready`` measures dispatch overhead only (measured: a
51 GFLOP matmul "completes" in 0.04 ms = 1.3 PFLOP/s, 6x over the
hardware peak). The only reliable completion barrier is a host fetch of
data derived from the output (``jax.device_get``), which costs one
tunnel round trip (~25 ms).

``device_time`` therefore times N back-to-back dispatches followed by
ONE tiny scalar fetch of the last output: device execution is
sequential, so ``t_total ≈ N * t_op + rtt``; with the separately
measured rtt of an empty fetch subtracted and N large, per-op error is
rtt_jitter / N. Used by every benchmark in benchmarks/ and by
bench.py's device-resident measurement.
"""

from __future__ import annotations

import time
from typing import Any, Callable

import jax
import jax.numpy as jnp


def _fetch_scalar(out: Any) -> None:
    """Force completion: host-fetch one element of (some leaf of) out."""
    leaves = jax.tree_util.tree_leaves(out)
    for leaf in leaves:
        if hasattr(leaf, "shape"):
            flat = jnp.ravel(leaf) if leaf.ndim else leaf
            jax.device_get(flat[:1] if leaf.ndim else flat)
            return
    raise ValueError("no array leaf in output to synchronize on")


def measure_rtt(sample: Any = None, reps: int = 5) -> float:
    """Round-trip time of a minimal device->host fetch (seconds)."""
    x = jnp.zeros((1,), jnp.float32) if sample is None else sample
    jax.device_get(jnp.ravel(x)[:1])
    t0 = time.perf_counter()
    for _ in range(reps):
        jax.device_get(jnp.ravel(x)[:1])
    return (time.perf_counter() - t0) / reps


def device_time(
    fn: Callable[..., Any],
    *args: Any,
    iters: int = 20,
    warm: int = 2,
    subtract_rtt: bool = True,
) -> float:
    """Mean seconds per call of fn(*args), completion-barriered.

    fn must return at least one jax array. Dispatches ``iters`` calls
    back to back, fetches one scalar from the final output, and divides;
    subtracts the fetch round trip measured on the same connection.
    """
    out = None
    for _ in range(warm):
        out = fn(*args)
    _fetch_scalar(out)
    rtt = measure_rtt() if subtract_rtt else 0.0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _fetch_scalar(out)
    total = time.perf_counter() - t0
    return max(total - rtt, 1e-9) / iters
