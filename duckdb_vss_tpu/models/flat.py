"""Flat (brute-force) vector index — the HBM-resident array store.

Replaces two things from the reference with one TPU-native structure:
- DuckDB's brute-force TopN path over `array_distance` projections
  (the vss_join/vss_match macro fallback,
  /root/reference/src/hnsw/hnsw_index_macros.cpp:10-75), and
- usearch's slot-addressed vector store (vectors_lookup_ /
  vectors_tape_allocator_, /root/reference/src/include/usearch/
  index_dense.hpp:380-385) with its key<->slot maps and deleted-slot
  free-list ring (index_dense.hpp:422-435).

Layout: one dense [capacity, D_pad] block in HBM plus per-slot squared
norms (cached for the matmul-expansion distance epilogue), a validity mask
(deletes are tombstones, searched-around exactly like usearch's free_key_
predicate, index_dense.hpp:1797-1827), and an int64 slot->key table.
Capacity grows by buckets (powers of two, plus 1.5x-power-of-two at
scale — utils/padding.round_up_capacity), mirroring the reference's
optimistic resize (/root/reference/src/hnsw/hnsw_index.cpp:410-431)
while keeping the set of distinct jit shapes bounded.

scalar_kind selects the on-device storage precision — "f32" (default,
exact parity with the reference's FLOAT-only SCALAR_KIND_MAP,
hnsw_index.cpp:247-260) or "bf16" (half the HBM and half the H2D
bytes; the memory mode for 10M-scale single-chip stores). This is the
TPU analog of usearch's scalar casts (index_dense.hpp:363-375,
b1x8/i8/f16/f32/f64), which the reference extension compiles in but
never exposes. Squared norms are always f32, computed from the
rounded stored values so the matmul-expansion identity stays
internally consistent; distances emitted from a bf16 store carry
~2^-8 relative rounding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from duckdb_vss_tpu.ops.topk import flat_topk
from duckdb_vss_tpu.utils.config import MetricKind
from duckdb_vss_tpu.utils.padding import (INF_SCORE, pad_2d_np, pad_dim,
                                           round_up, round_up_capacity)

MIN_CAPACITY = 1024
DEFAULT_BLOCK_N = 16384


@jax.jit
def _dequant_queries(q8, scale):
    return q8.astype(jnp.float32) * scale[:, None]


@functools.partial(jax.jit, static_argnames=("k", "metric", "block_n"))
def _search_jit(queries, vectors, vec_sq, valid, k, metric, block_n):
    scores, slots = flat_topk(
        queries, vectors, k, metric, vec_sq=vec_sq, valid=valid, block_n=block_n
    )
    # mark missing results inside the jit boundary: one device round-trip total
    slots = jnp.where(scores >= INF_SCORE, -1, slots)
    return scores, slots


class FlatIndex:
    """Mutable flat index over row-keyed float vectors."""

    def __init__(self, dims: int, metric: MetricKind = MetricKind.L2SQ,
                 capacity: int = MIN_CAPACITY, defer_alloc: bool = False,
                 scalar_kind: str = "f32"):
        self.dims = int(dims)
        self.d_pad = pad_dim(self.dims)
        self.metric = metric
        if scalar_kind not in ("f32", "bf16"):
            raise ValueError(
                f"scalar_kind must be f32 or bf16, got {scalar_kind!r}")
        self.scalar_kind = scalar_kind
        self._dtype = jnp.bfloat16 if scalar_kind == "bf16" else jnp.float32
        self.capacity = round_up_capacity(capacity)
        if defer_alloc:
            # deferred load (persist.load_index lazy path): device arrays
            # are filled by the loader on first access — no device memory
            # is touched until then (reference defers index load until
            # first table access, hnsw_index.cpp:192-206)
            self._vectors = None
            self._vec_sq = None
            self._valid = None
        else:
            self._vectors = jnp.zeros((self.capacity, self.d_pad),
                                      self._dtype)
            self._vec_sq = jnp.zeros((self.capacity,), jnp.float32)
            self._valid = jnp.zeros((self.capacity,), jnp.bool_)
        # slot -> key map lives host-side: rowids are 64-bit and the mapping
        # is outside the hot compute path (device returns slots, host maps).
        self._keys = np.full((self.capacity,), -1, np.int64)
        self._key_to_slot: dict[int, int] = {}
        self._free_slots: list[int] = []
        self._next_slot = 0
        self.size = 0

    # -- capacity ---------------------------------------------------------

    def reserve(self, n: int) -> None:
        """Grow capacity to at least n (power of two), like the reference's
        exclusive-lock resize (/root/reference/src/hnsw/hnsw_index.cpp:410-431)."""
        if n <= self.capacity:
            return
        new_cap = round_up_capacity(n)
        pad = new_cap - self.capacity
        self._vectors = jnp.concatenate(
            [self._vectors, jnp.zeros((pad, self.d_pad), self._dtype)])
        self._vec_sq = jnp.concatenate([self._vec_sq, jnp.zeros((pad,), jnp.float32)])
        self._valid = jnp.concatenate([self._valid, jnp.zeros((pad,), jnp.bool_)])
        self._keys = np.concatenate([self._keys, np.full((pad,), -1, np.int64)])
        self.capacity = new_cap

    # -- mutation ---------------------------------------------------------

    def add(self, vectors: np.ndarray, keys: np.ndarray) -> np.ndarray:
        """Bulk insert; reuses tombstoned slots first (free-list pop,
        index_dense.hpp:1748-1794). Returns the slot ids assigned."""
        vectors = np.asarray(vectors, np.float32)
        keys = np.asarray(keys, np.int64).reshape(-1)
        n = vectors.shape[0]
        assert vectors.shape == (n, self.dims), vectors.shape
        slots = np.empty((n,), np.int64)
        n_reuse = min(len(self._free_slots), n)
        for i in range(n_reuse):
            slots[i] = self._free_slots.pop()
        fresh = n - n_reuse
        if fresh:
            self.reserve(self._next_slot + fresh)
            slots[n_reuse:] = np.arange(self._next_slot, self._next_slot + fresh)
            self._next_slot += fresh
        for k_, s_ in zip(keys.tolist(), slots.tolist()):
            if k_ in self._key_to_slot:
                raise ValueError(f"duplicate key {k_}")
            self._key_to_slot[k_] = s_

        vec_pad = pad_2d_np(vectors, n, self.d_pad)
        if self.size == 0 and n_reuse == 0 and slots[0] == 0:
            # bulk load into an empty index: build the device arrays straight
            # from host buffers (no scatter, no full-array device copy)
            if self.scalar_kind == "bf16":
                import ml_dtypes

                host_vec = np.zeros((self.capacity, self.d_pad),
                                    ml_dtypes.bfloat16)
                host_vec[:n] = vec_pad.astype(ml_dtypes.bfloat16)
                rounded = host_vec[:n].astype(np.float32)
                sq = np.zeros((self.capacity,), np.float32)
                sq[:n] = (rounded * rounded).sum(-1)
                self._vectors = jnp.asarray(host_vec)
                self._vec_sq = jnp.asarray(sq)
            else:
                host_vec = np.zeros((self.capacity, self.d_pad), np.float32)
                host_vec[:n] = vec_pad
                self._vectors = jnp.asarray(host_vec)
                self._vec_sq = jnp.asarray((host_vec * host_vec).sum(-1))
            valid_np = np.zeros((self.capacity,), np.bool_)
            valid_np[:n] = True
            self._valid = jnp.asarray(valid_np)
        else:
            slots_j = jnp.asarray(slots, jnp.int32)
            vec_j = jnp.asarray(vec_pad).astype(self._dtype)
            vec_f32 = vec_j.astype(jnp.float32)
            self._vectors = self._vectors.at[slots_j].set(vec_j)
            self._vec_sq = self._vec_sq.at[slots_j].set(
                jnp.sum(vec_f32 * vec_f32, axis=-1))
            self._valid = self._valid.at[slots_j].set(True)
        self._keys[slots] = keys
        self.size += n
        return slots

    def remove(self, keys: np.ndarray) -> int:
        """Tombstone deletes: slot to free-list, mask from search
        (index_dense.hpp:1228-1300)."""
        keys = np.asarray(keys, np.int64).reshape(-1)
        slots = []
        for k_ in keys.tolist():
            s_ = self._key_to_slot.pop(k_, None)
            if s_ is not None:
                slots.append(s_)
                self._free_slots.append(s_)
        if slots:
            slots_np = np.asarray(slots, np.int64)
            self._valid = self._valid.at[jnp.asarray(slots_np, jnp.int32)].set(False)
            self._keys[slots_np] = -1
            self.size -= len(slots)
        return len(slots)

    def compact(self) -> None:
        """Pack live slots to the front (analog of index_dense compact(),
        index_dense.hpp:1478-1496 — trivial here, no graph to remap)."""
        valid = np.asarray(self._valid)
        live = np.nonzero(valid)[0]
        perm = jnp.asarray(live, jnp.int32)
        n_live = len(live)
        new_cap = round_up_capacity(max(n_live, 1))
        vecs = jnp.zeros((new_cap, self.d_pad), self._dtype)
        self._vectors = vecs.at[: n_live].set(self._vectors[perm])
        self._vec_sq = jnp.zeros((new_cap,), jnp.float32).at[:n_live].set(
            self._vec_sq[perm])
        self._valid = jnp.zeros((new_cap,), jnp.bool_).at[:n_live].set(True)
        keys_np = self._keys[live]
        self._keys = np.full((new_cap,), -1, np.int64)
        self._keys[:n_live] = keys_np
        self._key_to_slot = {int(k): i for i, k in enumerate(keys_np.tolist())}
        self._free_slots = []
        self._next_slot = n_live
        self.capacity = new_cap

    # -- search -----------------------------------------------------------

    def prepare_queries(self, queries: np.ndarray,
                        transfer_dtype: str = "f32") -> jax.Array:
        """Pad + upload a query batch.

        transfer_dtype="bf16" ships the batch over the host->device link
        as bfloat16 and upcasts on device — half the H2D bytes;
        "int8" ships per-query symmetric-quantized rows + one f32 scale
        each (~4x fewer bytes than f32) and dequantizes on device.
        Measured over the shared TPU tunnel the H2D transfer costs
        several times the whole search program
        (benchmarks/attribute_search.py), so serving paths that tolerate
        query rounding (ANN search does; the rerank's DISTANCES shift by
        ~2^-9 relative for bf16, ~2^-7 for int8, but the top-k SET is
        stable — bench.py measures recall WITH the chosen transfer
        dtype) should opt in. Exact-parity paths (SQL flat scans) keep
        f32."""
        queries = np.asarray(queries, np.float32)
        if queries.ndim == 1:
            queries = queries[None, :]
        b, d = queries.shape
        assert d == self.dims, (d, self.dims)
        # bucket the batch to a power of two (min 8): every distinct shape
        # costs a multi-minute remote compile on the TPU backend
        b_pad = max(8, 1 << (max(b, 1) - 1).bit_length())
        padded = pad_2d_np(queries, b_pad, self.d_pad)
        if transfer_dtype == "bf16":
            import ml_dtypes

            return jnp.asarray(padded.astype(ml_dtypes.bfloat16)
                               ).astype(jnp.float32)
        if transfer_dtype == "int8":
            absmax = np.abs(padded).max(axis=1)
            scale = np.where(absmax > 0, absmax / 127.0, 1.0
                             ).astype(np.float32)
            q8 = np.clip(np.round(padded / scale[:, None]), -127, 127
                         ).astype(np.int8)
            return _dequant_queries(jnp.asarray(q8), jnp.asarray(scale))
        return jnp.asarray(padded)

    def search_device(self, queries_padded: jax.Array, k: int,
                      block_n: int = DEFAULT_BLOCK_N
                      ) -> tuple[jax.Array, jax.Array]:
        """Device-resident search (no host transfer): (scores, slots)."""
        eff_block = block_n if self.capacity % block_n == 0 else self.capacity
        return _search_jit(
            queries_padded, self._vectors, self._vec_sq, self._valid, int(k),
            self.metric, eff_block)

    def search(self, queries: np.ndarray, k: int,
               block_n: int = DEFAULT_BLOCK_N) -> tuple[np.ndarray, np.ndarray]:
        """Top-k by index metric. Returns (scores [B, k], keys [B, k]);
        missing results (k > live size) have key -1 and score INF_SCORE."""
        b = 1 if np.asarray(queries).ndim == 1 else np.asarray(queries).shape[0]
        q = self.prepare_queries(queries)
        eff_block = block_n if self.capacity % block_n == 0 else self.capacity
        scores, slots = _search_jit(
            q, self._vectors, self._vec_sq, self._valid, int(k), self.metric,
            eff_block)
        # exactly one D2H round trip (tunnel latency dominates small calls),
        # then slice/map on host
        scores_np, slots_np = jax.device_get((scores, slots))
        slots_np = slots_np[:b]
        keys = np.where(slots_np >= 0, self._keys[np.maximum(slots_np, 0)],
                        np.int64(-1))
        return scores_np[:b], keys

    # -- introspection ----------------------------------------------------

    def get_vector(self, key: int) -> np.ndarray:
        slot = self._key_to_slot[int(key)]
        return np.asarray(self._vectors[slot, : self.dims], np.float32)

    def __len__(self) -> int:
        return self.size
