"""Measured CPU reference baseline: scalar usearch-style HNSW search
(native/cpu_hnsw.cpp) over THIS engine's graph, one query per thread on
all cores — the reference extension's execution model
(hnsw_index.cpp:301-309, one search per scheduler thread; scalar
autovectorized distance loops, simsimd default OFF).

bench.py uses this to ground vs_baseline in a measurement on the bench
host instead of round 1's documented 10k-QPS estimate."""

from __future__ import annotations

import ctypes
import os

import numpy as np


class _Graph(ctypes.Structure):
    _fields_ = [
        ("vectors", ctypes.c_void_p),
        ("nbr0", ctypes.c_void_p),
        ("upper", ctypes.c_void_p),
        ("upper_slot", ctypes.c_void_p),
        ("valid", ctypes.c_void_p),
        ("cap", ctypes.c_int64),
        ("cap_u", ctypes.c_int64),
        ("d_pad", ctypes.c_int32),
        ("dims", ctypes.c_int32),
        ("m0", ctypes.c_int32),
        ("levels", ctypes.c_int32),
        ("m", ctypes.c_int32),
        ("entry_node", ctypes.c_int32),
        ("max_level", ctypes.c_int32),
    ]


_LIB = None


def get_lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    path = os.path.join(here, "native", "libcpu_hnsw.so")
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.cpu_hnsw_search_batch.restype = ctypes.c_double
    lib.cpu_hnsw_search_batch.argtypes = [
        ctypes.POINTER(_Graph), ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
        ctypes.c_void_p]
    lib.cpu_hnsw_build.restype = ctypes.c_double
    lib.cpu_hnsw_build.argtypes = [
        ctypes.POINTER(_Graph), ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_int, ctypes.c_int]
    _LIB = lib
    return lib


class CPUBaseline:
    """Host-resident copy of an HNSWIndex's graph + scalar search."""

    @classmethod
    def build(cls, vectors: np.ndarray, levels: np.ndarray,
              m: int = 16, m0: int = 32, ef_construction: int = 128,
              l_max: int = 8, n_threads: int = 0):
        """Standalone reference-semantics build: insertion-based HNSW
        construction (usearch index_gt::add semantics — descent +
        ef_construction beam + refine_ diversity + back-link re-prune,
        /root/reference/src/include/usearch/index.hpp:2297-2378) over
        ``vectors`` with caller-sampled ``levels``. The resulting
        CPUBaseline owns its OWN graph, exactly like the reference
        extension builds its own index — so bench.py's vs_baseline
        compares whole engines at matching recall, not the reference's
        search loop over a graph tuned for multi-seed MXU descent.

        Returns (baseline, build_seconds)."""
        lib = get_lib()
        if lib is None:
            raise RuntimeError("libcpu_hnsw.so not built (make -C native)")
        vectors = np.ascontiguousarray(vectors, np.float32)
        n, d = vectors.shape
        levels = np.ascontiguousarray(levels, np.int32)
        cap_u = max(int((levels >= 1).sum()), 1)
        self = cls.__new__(cls)
        self.vectors = vectors
        self.nbr0 = np.full((n, m0), -1, np.int32)
        self.upper = np.full((cap_u, l_max, m), -1, np.int32)
        self.upper_slot = np.full((n,), -1, np.int32)
        self.valid = np.ones((n,), np.uint8)
        self.dims = d
        self.d_pad = d
        self.keys = np.arange(n, dtype=np.int64)
        self._g = _Graph(
            vectors=self.vectors.ctypes.data,
            nbr0=self.nbr0.ctypes.data,
            upper=self.upper.ctypes.data,
            upper_slot=self.upper_slot.ctypes.data,
            valid=self.valid.ctypes.data,
            cap=n, cap_u=cap_u, d_pad=d, dims=d, m0=m0,
            levels=l_max, m=m, entry_node=-1, max_level=-1)
        secs = lib.cpu_hnsw_build(
            ctypes.byref(self._g), levels.ctypes.data, n,
            int(ef_construction), int(n_threads))
        if secs < 0:
            raise RuntimeError("cpu_hnsw_build failed (upper overflow)")
        return self, float(secs)

    def __init__(self, index):
        import jax

        index._ensure_loaded()
        g = index.graph
        st = index.store
        # C side expects f32 rows (a bf16 scalar_kind store is upcast)
        self.vectors = np.ascontiguousarray(
            np.asarray(jax.device_get(st._vectors), np.float32))
        self.nbr0 = np.ascontiguousarray(jax.device_get(g.neighbors0))
        from duckdb_vss_tpu.models.graph import L_MAX as _L_MAX

        un2 = np.asarray(jax.device_get(g.upper_neighbors))
        self.upper = np.ascontiguousarray(
            un2.reshape(un2.shape[0], _L_MAX, -1))
        self.upper_slot = np.ascontiguousarray(
            jax.device_get(g.upper_slot))
        self.valid = np.ascontiguousarray(
            np.asarray(jax.device_get(st._valid)).astype(np.uint8))
        self.dims = st.dims
        self.d_pad = st.d_pad
        self.keys = st._keys
        self._g = _Graph(
            vectors=self.vectors.ctypes.data,
            nbr0=self.nbr0.ctypes.data,
            upper=self.upper.ctypes.data,
            upper_slot=self.upper_slot.ctypes.data,
            valid=self.valid.ctypes.data,
            cap=self.vectors.shape[0],
            cap_u=self.upper.shape[0],
            d_pad=self.d_pad,
            dims=self.dims,
            m0=self.nbr0.shape[1],
            levels=self.upper.shape[1],
            m=self.upper.shape[2],
            entry_node=int(jax.device_get(g.entry_node)),
            max_level=int(jax.device_get(g.max_level)),
        )

    def search(self, queries: np.ndarray, k: int, ef: int,
               n_threads: int = 0):
        """Returns (ids [B, k] slot ids, seconds). n_threads=0 = all."""
        lib = get_lib()
        if lib is None:
            raise RuntimeError("libcpu_hnsw.so not built (make -C native)")
        q = np.zeros((len(queries), self.d_pad), np.float32)
        q[:, : self.dims] = np.asarray(queries, np.float32)[:, : self.dims]
        out = np.empty((len(queries), k), np.int32)
        secs = lib.cpu_hnsw_search_batch(
            ctypes.byref(self._g), q.ctypes.data, len(q), k, ef,
            n_threads, out.ctypes.data, None)
        return out, float(secs)
