"""Profiler hooks (SURVEY §5: the reference exposes usearch's
computed_distances/visited counters but discards them and has no
tracer; this engine surfaces the counters in `HNSWIndex.stats()` /
`pragma_hnsw_index_info()` AND exposes the XLA/TPU profiler).

Usage:

    from duckdb_vss_tpu.utils.tracing import trace, annotate

    with trace("/tmp/tb"):              # XLA profiler -> TensorBoard dir
        idx.search(q, 10)

    with annotate("bulk_build"):        # named region in the trace
        idx.add(vecs, keys)

The trace captures device timelines for every jitted program and Pallas
kernel (the fused beam kernel shows up as a `tpu_custom_call`).
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XLA device profile into ``log_dir`` (TensorBoard
    `trace_viewer` format)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that appears on the profiler timeline."""
    import jax

    return jax.profiler.TraceAnnotation(name)
