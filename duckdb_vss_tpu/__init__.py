"""duckdb_vss_tpu — a TPU-native vector-search execution engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
duckdb/duckdb_vss extension (HNSW ANN indexing over fixed-size float
array columns, query-plan rewrites for top-k distance queries, brute
force fallbacks, persistence, and introspection), built for TPU:
batched MXU distance kernels, beam-batched graph traversal, masked
static-shape control flow, and mesh-sharded multi-host search.
"""

import os as _os

import jax as _jax

# Persistent XLA compilation cache: TPU compiles of the scan/traversal
# programs take minutes; cache them across processes. Disable by setting
# DVT_NO_COMPILE_CACHE=1.
def _machine_tag() -> str:
    """CPU-feature fingerprint suffix for the cache directory.

    XLA:CPU cache entries are AOT artifacts compiled for the exact host
    ISA; loading entries produced on a different machine emits
    'Machine type ... doesn't match' warnings and can SIGILL/segfault
    outright (observed: the full test suite segfaulted inside
    backend_compile_and_load on a cache populated by a host with a
    different avx512 feature set). Scoping the directory per
    fingerprint makes a foreign cache invisible instead of fatal."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    import hashlib

                    return hashlib.sha1(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    import platform

    return platform.machine()


# CPU-only sessions (tests force jax_platforms=cpu before importing the
# package) skip the persistent cache entirely: XLA:CPU gains little
# (compiles are local and fast) and both directions of the cache have
# bitten — loading foreign-host AOT entries can SIGILL, and writing
# (serializing) certain CPU executables aborted the full test suite
# inside put_executable_and_time. The cache exists for the tunneled TPU
# compiles, which cost minutes per program — so it is enabled ONLY when
# an accelerator platform is explicitly requested (jax_platforms or
# JAX_PLATFORMS naming something other than cpu). An UNSET platform
# resolves to whatever backend registers, which on a plain CPU host is
# XLA:CPU — treating unset as CPU keeps the SIGILL/serialize-abort
# failure modes unreachable there (round-4 advisor). Force with
# DVT_COMPILE_CACHE=1 on an accelerator host that leaves it unset.
_platforms = str(
    getattr(_jax.config, "jax_platforms", None)
    or _os.environ.get("JAX_PLATFORMS", "")
)
_wants_accel = bool(_platforms) and not all(
    p.strip() in ("cpu", "") for p in _platforms.split(","))
if not _os.environ.get("DVT_NO_COMPILE_CACHE") and (
        _wants_accel or _os.environ.get("DVT_COMPILE_CACHE") == "1"):
    _cache_dir = _os.environ.get(
        "DVT_COMPILE_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache",
                      "duckdb_vss_tpu_xla_" + _machine_tag()),
    )
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    # persist even sub-second compiles: on a tunneled TPU every compile
    # pays seconds of round-trip, so re-compiling the dozens of tiny
    # eager ops per process dominates cold-start (measured: reserve()
    # alone swung 0.4s -> 27s between processes before this)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from duckdb_vss_tpu.utils.config import (  # noqa: F401
    BinderError,
    HNSWConfig,
    MetricKind,
)

__version__ = "0.1.0"
