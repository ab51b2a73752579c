"""Index persistence through the native vss_store container.

Python orchestrates (device -> host arrays, object reconstruction); the
C++ library (native/vss_store.cpp) owns the on-disk format: sectioned
container, 256 KiB checksummed blocks (LinkedBlock analog,
/root/reference/src/hnsw/hnsw_index.cpp:15-114), mmap deferred-load read
path (reference defers index load until first access, hnsw_index.cpp:192-206).

Falls back to a pure-numpy .npz container if the shared library is
missing (e.g. no toolchain) so persistence never hard-fails.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

from duckdb_vss_tpu.utils.config import HNSWConfig, MetricKind

_METRIC_CODE = {MetricKind.L2SQ: 0, MetricKind.COSINE: 1, MetricKind.IP: 2}
_CODE_METRIC = {v: k for k, v in _METRIC_CODE.items()}
# on-device storage precision (FlatIndex scalar_kind; usearch
# scalar_kind_t analog) — header reserved[0]
_SCALAR_CODE = {"f32": 0, "bf16": 1}
_CODE_SCALAR = {v: k for k, v in _SCALAR_CODE.items()}


def _vec_np_dtype(scalar_kind: str):
    if scalar_kind == "bf16":
        import ml_dtypes

        return ml_dtypes.bfloat16
    return np.float32


class _FileHeader(ctypes.Structure):
    _fields_ = [
        ("magic", ctypes.c_uint64),
        ("version", ctypes.c_uint32),
        ("n_sections", ctypes.c_uint32),
        ("metric", ctypes.c_uint32),
        ("dims", ctypes.c_uint32),
        ("d_pad", ctypes.c_uint32),
        ("m", ctypes.c_uint32),
        ("m0", ctypes.c_uint32),
        ("ef_construction", ctypes.c_uint32),
        ("ef_search", ctypes.c_uint32),
        ("max_level", ctypes.c_int32),
        ("entry_node", ctypes.c_int64),
        ("count", ctypes.c_uint64),
        ("capacity", ctypes.c_uint64),
        ("cap_upper", ctypes.c_uint64),
        ("upper_count", ctypes.c_uint64),
        ("reserved", ctypes.c_uint64 * 4),
    ]


_LIB = None


def _find_lib() -> str | None:
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    for cand in (
        os.path.join(here, "native", "libvss_store.so"),
        os.path.join(os.path.dirname(__file__), "libvss_store.so"),
    ):
        if os.path.exists(cand):
            return cand
    return None


def get_lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    path = _find_lib()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.vss_writer_open.restype = ctypes.c_void_p
    lib.vss_writer_open.argtypes = [ctypes.c_char_p,
                                    ctypes.POINTER(_FileHeader)]
    lib.vss_writer_section.restype = ctypes.c_int
    lib.vss_writer_section.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint32, ctypes.c_void_p,
        ctypes.c_uint64]
    lib.vss_writer_close.restype = ctypes.c_int
    lib.vss_writer_close.argtypes = [ctypes.c_void_p]
    lib.vss_reader_open.restype = ctypes.c_void_p
    lib.vss_reader_open.argtypes = [ctypes.c_char_p]
    lib.vss_reader_open_mem.restype = ctypes.c_void_p
    lib.vss_reader_open_mem.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
    lib.vss_reader_header.restype = ctypes.POINTER(_FileHeader)
    lib.vss_reader_header.argtypes = [ctypes.c_void_p]
    lib.vss_reader_section.restype = ctypes.c_int64
    lib.vss_reader_section.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_void_p, ctypes.c_uint64]
    lib.vss_reader_close.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


class PersistError(RuntimeError):
    pass


def save_index(index, path: str) -> None:
    """Serialize an HNSWIndex (skips if not dirty, like PersistToDisk,
    hnsw_index.cpp:514-517 — callers may force)."""
    import jax

    index._ensure_loaded()
    st = index.store
    g = index.graph
    cfg = index.config
    arrays = {
        "keys": np.ascontiguousarray(st._keys),
        "valid": np.ascontiguousarray(
            np.asarray(jax.device_get(st._valid)).astype(np.uint8)),
        "vectors": np.ascontiguousarray(jax.device_get(st._vectors)),
        "neighbors0": np.ascontiguousarray(jax.device_get(g.neighbors0)),
        # disk format keeps the logical [cap_u, L_MAX, m] shape (bytes are
        # identical to the packed-2D device layout, row-major)
        "upper_nbrs": np.ascontiguousarray(
            jax.device_get(g.upper_neighbors)),
        "upper_slot": np.ascontiguousarray(jax.device_get(g.upper_slot)),
        "upper_node": np.ascontiguousarray(jax.device_get(g.upper_node)),
        "levels": np.ascontiguousarray(jax.device_get(g.levels)),
    }
    meta = dict(
        metric=_METRIC_CODE[cfg.metric],
        dims=st.dims,
        d_pad=st.d_pad,
        m=cfg.m,
        m0=cfg.m0,
        ef_construction=cfg.ef_construction,
        ef_search=cfg.ef_search,
        max_level=int(jax.device_get(g.max_level)),
        entry_node=int(jax.device_get(g.entry_node)),
        count=st.size,
        capacity=st.capacity,
        cap_upper=g.upper_neighbors.shape[0],
        upper_count=int(jax.device_get(g.upper_count)),
    )
    meta["scalar_kind"] = _SCALAR_CODE[st.scalar_kind]
    extra = dict(next_slot=st._next_slot,
                 free_slots=np.asarray(st._free_slots, np.int64))
    lib = get_lib()
    if lib is None:
        # np.savez appends ".npz" to bare string paths; write through a file
        # object so the caller's exact path is honored. bf16 vectors ride
        # as a u16 view (npy descr for ml_dtypes does not round-trip).
        if st.scalar_kind == "bf16":
            arrays["vectors"] = arrays["vectors"].view(np.uint16)
        with open(path, "wb") as f:
            np.savez(f, __meta__=np.array([list(meta.values())], np.int64),
                     __meta_keys__=np.array(list(meta.keys())),
                     __next_slot__=np.int64(extra["next_slot"]),
                     __free_slots__=extra["free_slots"], **arrays)
        return
    hdr = _FileHeader()
    for k, v in meta.items():
        if k == "scalar_kind":
            hdr.reserved[0] = v
        else:
            setattr(hdr, k, v)
    w = lib.vss_writer_open(path.encode(), ctypes.byref(hdr))
    if not w:
        raise PersistError(f"cannot open {path} for writing")
    arrays["free_slots"] = extra["free_slots"]
    arrays["next_slot"] = np.asarray([extra["next_slot"]], np.int64)
    try:
        for name, arr in arrays.items():
            rc = lib.vss_writer_section(
                w, name.encode(), 0,
                arr.ctypes.data_as(ctypes.c_void_p), arr.nbytes)
            if rc != 0:
                raise PersistError(f"write section {name} failed rc={rc}")
    finally:
        lib.vss_writer_close(w)
    index.is_dirty = False


def load_index(path: str, lazy: bool | None = None):
    """Reconstruct an HNSWIndex (reindex_keys_ analog rebuilds the
    key->slot map + free list, index_dense.hpp:1901-1929).

    lazy (default: env DVT_DEFERRED_LOAD, on) mirrors the reference's
    deferred load (hnsw_index.cpp:192-206, load on first access): only
    the header + host-side key map are read now; the device arrays are
    materialized by the first data-touching call on the index. The
    container stays on disk (mmap'd per materialize), so opening a
    database with large indexes is O(ms)."""
    lib = get_lib()
    if lib is None or not os.path.exists(path):
        return _load_npz(path)
    return _load_native(
        lambda: (lib.vss_reader_open(path.encode()), None),
        lazy=lazy, what=path)


def load_index_from_buffer(get_bytes, lazy: bool | None = None):
    """Like load_index but over an in-memory container image.

    get_bytes is a zero-arg callable returning the image (so a lazy load
    re-reads from the source — e.g. block storage — at materialize time
    instead of pinning the whole image in RAM), or a bytes object."""
    lib = get_lib()
    if lib is None:
        raise PersistError("native vss_store library unavailable")
    factory = get_bytes if callable(get_bytes) else (lambda: get_bytes)

    def open_reader():
        buf = factory()
        # hold a reference to the buffer alongside the handle: the
        # reader views caller-owned memory
        return lib.vss_reader_open_mem(buf, len(buf)), buf

    return _load_native(open_reader, lazy=lazy, what="<buffer>")


def _load_native(open_reader, lazy: bool | None, what: str):
    import jax.numpy as jnp

    from duckdb_vss_tpu.models.graph import GraphState, L_MAX
    from duckdb_vss_tpu.models.hnsw import HNSWIndex

    if lazy is None:
        lazy = os.environ.get("DVT_DEFERRED_LOAD", "1") == "1"
    lib = get_lib()
    r, _buf = open_reader()
    if not r:
        raise PersistError(f"cannot open {what} (missing or corrupt header)")
    try:
        # copy header fields immediately: .contents views memory owned by
        # the reader handle and is freed by vss_reader_close
        hptr = lib.vss_reader_header(r).contents
        hdr = type("H", (), {
            f: int(getattr(hptr, f)) for f, _ in _FileHeader._fields_
            if f != "reserved"})
        scalar_kind = _CODE_SCALAR[int(hptr.reserved[0])]
        cap = int(hdr.capacity)
        cap_u = int(hdr.cap_upper)
        d_pad = int(hdr.d_pad)
        cfg = HNSWConfig(
            metric=_CODE_METRIC[int(hdr.metric)],
            ef_construction=int(hdr.ef_construction),
            ef_search=int(hdr.ef_search),
            m=int(hdr.m),
            m0=int(hdr.m0),
        )

        def read(name, dtype, shape, rr=None):
            rr = r if rr is None else rr
            arr = np.empty(shape, dtype)
            got = lib.vss_reader_section(
                rr, name.encode(), arr.ctypes.data_as(ctypes.c_void_p),
                arr.nbytes)
            if got < 0:
                raise PersistError(f"section {name}: rc={got} (corrupt?)")
            if got != arr.nbytes:
                raise PersistError(
                    f"section {name}: size {got} != expected {arr.nbytes}")
            return arr

        # host-side bookkeeping is always eager (key map, free list):
        # small, and needed for catalog-level answers without a load
        keys = read("keys", np.int64, (cap,))
        n_free = lib.vss_reader_section(r, b"free_slots", None, 0) // 8
        free_slots = read("free_slots", np.int64, (int(n_free),)) \
            if n_free > 0 else np.zeros((0,), np.int64)
        next_slot = int(read("next_slot", np.int64, (1,))[0])
    except Exception:
        lib.vss_reader_close(r)
        raise

    m, m0 = int(hdr.m), int(hdr.m0)

    def _fill(ix, rr):
        """Read the device sections into an index (shared by the eager
        path and the deferred materializer)."""
        valid = read("valid", np.uint8, (cap,), rr).astype(bool)
        vectors = read("vectors", _vec_np_dtype(scalar_kind), (cap, d_pad),
                       rr)
        neighbors0 = read("neighbors0", np.int32, (cap, m0), rr)
        upper_nbrs = read("upper_nbrs", np.int32, (cap_u, L_MAX * m), rr)
        upper_slot = read("upper_slot", np.int32, (cap,), rr)
        upper_node = read("upper_node", np.int32, (cap_u,), rr)
        levels = read("levels", np.int32, (cap,), rr)
        st = ix.store
        st._vectors = jnp.asarray(vectors)
        v32 = st._vectors.astype(jnp.float32)
        st._vec_sq = jnp.sum(v32 * v32, axis=-1)
        st._valid = jnp.asarray(valid)
        ix.graph = GraphState(
            neighbors0=jnp.asarray(neighbors0),
            upper_neighbors=jnp.asarray(upper_nbrs),
            upper_slot=jnp.asarray(upper_slot),
            upper_node=jnp.asarray(upper_node),
            levels=jnp.asarray(levels),
            entry_node=jnp.int32(int(hdr.entry_node)),
            max_level=jnp.int32(int(hdr.max_level)),
            upper_count=jnp.int32(int(hdr.upper_count)),
        )

    idx = HNSWIndex(int(hdr.dims), cfg, capacity=cap,
                    scalar_kind=scalar_kind, _defer_alloc=lazy)
    st = idx.store
    st._keys = keys
    st._key_to_slot = {
        int(k): i for i, k in enumerate(keys.tolist()) if k >= 0}
    st._free_slots = [int(x) for x in free_slots.tolist()]
    st._next_slot = next_slot
    st.size = int(hdr.count)
    if lazy:
        lib.vss_reader_close(r)

        def _materialize(ix):
            r2, _buf2 = open_reader()
            if not r2:
                raise PersistError(f"cannot re-open {what} for deferred "
                                   "load")
            try:
                _fill(ix, r2)
            finally:
                lib.vss_reader_close(r2)

        idx._pending_load = _materialize
    else:
        try:
            _fill(idx, r)
        finally:
            lib.vss_reader_close(r)
    idx.is_dirty = False
    return idx


def _load_npz(path: str):
    import jax.numpy as jnp

    from duckdb_vss_tpu.models.graph import GraphState
    from duckdb_vss_tpu.models.hnsw import HNSWIndex

    # save_index's fallback writes to the exact path; older callers may
    # have produced a ".npz"-suffixed file
    npz_path = path if os.path.exists(path) else path + ".npz"
    if not os.path.exists(npz_path):
        raise PersistError(f"no such checkpoint: {path}")
    z = np.load(npz_path, allow_pickle=False)
    meta = dict(zip([str(k) for k in z["__meta_keys__"]],
                    z["__meta__"][0].tolist()))
    cfg = HNSWConfig(
        metric=_CODE_METRIC[int(meta["metric"])],
        ef_construction=int(meta["ef_construction"]),
        ef_search=int(meta["ef_search"]), m=int(meta["m"]),
        m0=int(meta["m0"]))
    scalar_kind = _CODE_SCALAR[int(meta.get("scalar_kind", 0))]
    idx = HNSWIndex(int(meta["dims"]), cfg, capacity=int(meta["capacity"]),
                    scalar_kind=scalar_kind)
    st = idx.store
    vec_np = z["vectors"]
    if scalar_kind == "bf16":
        vec_np = vec_np.view(_vec_np_dtype("bf16"))
    st._vectors = jnp.asarray(vec_np)
    v32 = st._vectors.astype(jnp.float32)
    st._vec_sq = jnp.sum(v32 * v32, axis=-1)
    st._valid = jnp.asarray(z["valid"].astype(bool))
    st._keys = z["keys"].copy()
    st._key_to_slot = {
        int(k): i for i, k in enumerate(st._keys.tolist()) if k >= 0}
    st._free_slots = [int(x) for x in z["__free_slots__"].tolist()]
    st._next_slot = int(z["__next_slot__"])
    st.size = int(meta["count"])
    idx.graph = GraphState(
        neighbors0=jnp.asarray(z["neighbors0"]),
        upper_neighbors=jnp.asarray(
            z["upper_nbrs"].reshape(z["upper_nbrs"].shape[0], -1)),
        upper_slot=jnp.asarray(z["upper_slot"]),
        upper_node=jnp.asarray(z["upper_node"]),
        levels=jnp.asarray(z["levels"]),
        entry_node=jnp.int32(int(meta["entry_node"])),
        max_level=jnp.int32(int(meta["max_level"])),
        upper_count=jnp.int32(int(meta["upper_count"])),
    )
    idx.is_dirty = False
    return idx
