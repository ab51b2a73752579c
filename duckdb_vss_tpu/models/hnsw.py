"""HNSWIndex — the user-facing TPU HNSW index.

Plays the role of the reference's HNSWIndex : BoundIndex binding
(/root/reference/src/hnsw/hnsw_index.cpp) over the usearch core: owns the
vector store (FlatIndex), the graph (GraphState), the config, the level
sampler, tombstone bookkeeping, and the operation counters that usearch
keeps per-context (computed_distances / visited_members,
index.hpp:1888-1915).

Concurrency model: the reference guards the index with a rwlock +
per-node bit-mutexes. Here every mutation is a whole-batch functional
update of device arrays inside one jit step — determinism replaces locks.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from duckdb_vss_tpu.models.build import insert_batch
from duckdb_vss_tpu.models.flat import FlatIndex
from duckdb_vss_tpu.models.graph import (
    GraphState,
    L_MAX,
    make_graph,
    grow_graph,
    search_graph,
)
from duckdb_vss_tpu.utils.config import HNSWConfig, MetricKind
from duckdb_vss_tpu.utils.padding import round_up

DEFAULT_BUILD_BATCH = 256


@functools.partial(
    jax.jit, static_argnames=("k", "ef", "metric", "expand", "use_pallas",
                              "descent_ef", "n_seeds", "loop", "max_steps",
                              "descent_steps"))
def _hnsw_search_jit(state, vectors, vec_sq, valid, queries, k, ef, metric,
                     expand=4, use_pallas=False, descent_ef=48, n_seeds=8,
                     loop="while", max_steps=None, descent_steps=16):
    return search_graph(state, vectors, vec_sq, valid, queries, k, ef, metric,
                        expand=expand, use_pallas=use_pallas,
                        descent_ef=descent_ef, n_seeds=n_seeds, loop=loop,
                        max_steps=max_steps, descent_steps=descent_steps)


class HNSWIndex:
    """TPU-native HNSW index over row-keyed float vectors."""

    def __init__(
        self,
        dims: int,
        config: HNSWConfig | None = None,
        capacity: int = 1024,
        seed: int = 0x5EED,
        build_batch: int = DEFAULT_BUILD_BATCH,
        build_expand: int = 2,
        build_prune: str = "diversity",
    ):
        self.config = config or HNSWConfig()
        self.store = FlatIndex(dims, self.config.metric, capacity)
        self.graph = make_graph(
            self.store.capacity, self.config.m, self.config.m0)
        self.build_batch = int(build_batch)
        self.build_expand = int(build_expand)
        self.build_prune = str(build_prune)
        # bulk loads into an empty graph at/above this size use the exact
        # kNN-graph MXU build instead of batched insertion
        self.bulk_threshold = 4096
        # fused DMA gather+score Pallas kernel for traversal (TPU only)
        import os as _os
        self.use_pallas = _os.environ.get("DVT_PALLAS", "0") == "1"
        self._level_rng = np.random.default_rng(seed)
        # observability counters (usearch add_result_t/search_result_t
        # computed_distances, index.hpp:2360-2370, discarded by the
        # reference extension but surfaced here per SURVEY §5)
        self.build_distance_count = 0
        self.search_distance_count = 0
        self.is_dirty = False

    # ------------------------------------------------------------------
    @property
    def dims(self) -> int:
        return self.store.dims

    @property
    def metric(self) -> MetricKind:
        return self.config.metric

    def __len__(self) -> int:
        return self.store.size

    def _sample_levels(self, n: int) -> np.ndarray:
        """Exponential level sampling -ln(U)/ln(M)
        (usearch index.hpp:3315-3319)."""
        u = self._level_rng.random(n)
        inv_log_m = 1.0 / math.log(max(self.config.m, 2))
        lv = np.floor(-np.log(np.maximum(u, 1e-12)) * inv_log_m)
        return np.minimum(lv, L_MAX).astype(np.int32)

    def reserve(self, n: int) -> None:
        self.store.reserve(n)
        if self.store.capacity > self.graph.capacity:
            self.graph = grow_graph(self.graph, self.store.capacity)

    # ------------------------------------------------------------------
    def add(self, vectors: np.ndarray, keys) -> np.ndarray:
        """Bulk/incremental insert (reference Construct,
        hnsw_index.cpp:391-449). Returns assigned slot ids."""
        vectors = np.asarray(vectors, np.float32)
        if vectors.ndim == 1:
            vectors = vectors[None, :]
        keys = np.asarray(keys, np.int64).reshape(-1)
        n = vectors.shape[0]
        graph_empty = int(jax.device_get(self.graph.entry_node)) < 0
        self.reserve(self.store.size + n)
        slots = self.store.add(vectors, keys)
        if self.store.capacity > self.graph.capacity:
            self.graph = grow_graph(self.graph, self.store.capacity)
        levels = self._sample_levels(n)

        if graph_empty and n >= self.bulk_threshold:
            # CREATE INDEX-style bulk path: exact-kNN graph on the MXU
            # (PhysicalCreateHNSWIndex analog; models/bulk.py)
            from duckdb_vss_tpu.models.bulk import bulk_build

            self.graph = bulk_build(
                self.store._vectors, self.store._vec_sq,
                np.asarray(slots, np.int32), levels, self.config,
                self.metric, host_vectors=vectors)
            self.build_distance_count += n * self.store.capacity  # exact sweep
            self.is_dirty = True
            return slots

        bb = self.build_batch
        cfg = self.config
        nd_total = jnp.int32(0)
        for off in range(0, n, bb):
            batch_slots = np.full((bb,), -1, np.int32)
            batch_levels = np.zeros((bb,), np.int32)
            chunk = slots[off : off + bb]
            batch_slots[: len(chunk)] = chunk
            batch_levels[: len(chunk)] = levels[off : off + bb]
            self.graph, nd = insert_batch(
                self.graph,
                self.store._vectors,
                self.store._vec_sq,
                jnp.asarray(batch_slots),
                jnp.asarray(batch_levels),
                cfg.metric,
                cfg.m,
                cfg.m0,
                cfg.ef_construction,
                expand=self.build_expand,
                prune=self.build_prune,
            )
            nd_total = nd_total + nd
        self.build_distance_count += int(jax.device_get(nd_total))
        self.is_dirty = True
        return slots

    # ------------------------------------------------------------------
    def remove(self, keys) -> int:
        """Tombstone delete (hnsw_index.cpp:466-482 -> index_dense
        remove(), edges remain; search filters)."""
        n = self.store.remove(keys)
        if n:
            self.is_dirty = True
        return n

    # ------------------------------------------------------------------
    def search(
        self,
        queries: np.ndarray,
        k: int,
        ef: int | None = None,
        expand: int = 4,
        descent_ef: int = 48,
        n_seeds: int = 8,
        chunk: int = 1024,
    ) -> tuple[np.ndarray, np.ndarray]:
        """ANN top-k. ef defaults to config.ef_search and may be overridden
        per call (the hnsw_ef_search session setting,
        hnsw_index.cpp:288-299). Returns (scores, keys [B, k])."""
        qarr = np.asarray(queries, np.float32)
        if qarr.ndim == 1:
            qarr = qarr[None, :]
        b = qarr.shape[0]
        ef_eff = max(int(ef or self.config.ef_search), k)
        # bucket ef to limit distinct compiled programs
        ef_eff = round_up(ef_eff, 16)
        # device programs are fastest around batch 1024: larger requests
        # are chunked host-side (dispatches overlap; one D2H per chunk)
        outs = []
        for off in range(0, b, chunk):
            q = self.store.prepare_queries(qarr[off : off + chunk])
            outs.append((_hnsw_search_jit(
                self.graph, self.store._vectors, self.store._vec_sq,
                self.store._valid, q, int(k), ef_eff, self.metric, expand,
                self.use_pallas, descent_ef, n_seeds),
                min(chunk, b - off)))
        scores_list, keys_list, nd_total = [], [], 0
        for (scores, slots, nd), nb in outs:
            scores_np, slots_np, nd_np = jax.device_get((scores, slots, nd))
            nd_total += int(nd_np)
            slots_np = slots_np[:nb]
            keys = np.where(
                slots_np >= 0, self.store._keys[np.maximum(slots_np, 0)],
                np.int64(-1))
            scores_list.append(scores_np[:nb])
            keys_list.append(keys)
        self.search_distance_count += nd_total
        return (np.concatenate(scores_list), np.concatenate(keys_list))

    def search_device(self, queries_padded: jax.Array, k: int,
                      ef: int | None = None, expand: int = 4):
        """Device-resident search: returns (scores, slots, n_dist)."""
        ef_eff = round_up(max(int(ef or self.config.ef_search), k), 16)
        return _hnsw_search_jit(
            self.graph, self.store._vectors, self.store._vec_sq,
            self.store._valid, queries_padded, int(k), ef_eff, self.metric,
            expand)

    # ------------------------------------------------------------------
    def compact(self) -> None:
        """Slot permutation compaction (usearch compact(),
        index.hpp:3002-3096; PRAGMA hnsw_compact_index,
        hnsw_index_pragmas.cpp:154-190).

        Live nodes are permuted to the front ordered by (level desc) —
        mirroring usearch's sort phase — all neighbor slots remapped
        through the inverse permutation, and tombstoned nodes' edges
        dropped (isolate(), index.hpp:3109-3146).
        """
        valid = np.asarray(self.store._valid)
        levels = np.asarray(self.graph.levels)
        live = np.nonzero(valid)[0]
        n_live = len(live)
        # order: level desc, then old slot (deterministic)
        order = np.lexsort((live, -levels[live]))
        old_of_new = live[order]  # new slot -> old slot
        cap = self.store.capacity
        new_of_old = np.full((cap,), -1, np.int64)
        new_of_old[old_of_new] = np.arange(n_live)

        # remap helper for neighbor tables: old id -> new id (-1 for
        # tombstoned/invalid — this is the isolate() edge drop)
        remap = jnp.asarray(np.concatenate([new_of_old, [-1]]), jnp.int32)

        def remap_ids(tbl):
            return jnp.take(remap, jnp.where(tbl >= 0, tbl, cap))

        perm = jnp.asarray(old_of_new, jnp.int32)
        g = self.graph
        neighbors0 = remap_ids(jnp.take(g.neighbors0, perm, axis=0))
        pad0 = jnp.full((cap - n_live, g.neighbors0.shape[1]), -1, jnp.int32)
        neighbors0 = jnp.concatenate([neighbors0, pad0])

        # rebuild compacted upper tables in new-slot order
        lv_new = levels[old_of_new]
        has_upper = lv_new >= 1
        n_upper = int(has_upper.sum())
        cap_u = g.upper_neighbors.shape[0]
        upper_slot_np = np.full((cap,), -1, np.int64)
        upper_slot_np[np.nonzero(has_upper)[0]] = np.arange(n_upper)
        old_uslot = np.asarray(g.upper_slot)[old_of_new[has_upper]]
        un = jnp.take(g.upper_neighbors,
                      jnp.asarray(old_uslot, jnp.int32), axis=0)
        un = remap_ids(un)
        pad_u = jnp.full(
            (cap_u - n_upper,) + g.upper_neighbors.shape[1:], -1, jnp.int32)
        upper_neighbors = jnp.concatenate([un, pad_u])
        upper_node_np = np.full((cap_u,), -1, np.int64)
        upper_node_np[:n_upper] = np.nonzero(has_upper)[0]

        new_levels = np.full((cap,), -1, np.int64)
        new_levels[:n_live] = lv_new
        max_level = int(lv_new.max()) if n_live else -1
        entry = 0 if n_live else -1  # highest level sorts first

        self.graph = GraphState(
            neighbors0=neighbors0,
            upper_neighbors=upper_neighbors,
            upper_slot=jnp.asarray(upper_slot_np, jnp.int32),
            upper_node=jnp.asarray(upper_node_np, jnp.int32),
            levels=jnp.asarray(new_levels, jnp.int32),
            entry_node=jnp.int32(entry),
            max_level=jnp.int32(max_level),
            upper_count=jnp.int32(n_upper),
        )
        # permute the store the same way (cannot reuse store.compact():
        # the graph's permutation must match the store's)
        st = self.store
        st._vectors = jnp.concatenate(
            [jnp.take(st._vectors, perm, axis=0),
             jnp.zeros((cap - n_live, st.d_pad), jnp.float32)])
        st._vec_sq = jnp.concatenate(
            [jnp.take(st._vec_sq, perm),
             jnp.zeros((cap - n_live,), jnp.float32)])
        valid_new = np.zeros((cap,), np.bool_)
        valid_new[:n_live] = True
        st._valid = jnp.asarray(valid_new)
        keys_np = st._keys[old_of_new]
        st._keys = np.full((cap,), -1, np.int64)
        st._keys[:n_live] = keys_np
        st._key_to_slot = {int(k): i for i, k in enumerate(keys_np.tolist())}
        st._free_slots = []
        st._next_slot = n_live
        self.is_dirty = True

    # ------------------------------------------------------------------
    def stats(self) -> dict:
        """Per-level stats (pragma_hnsw_index_info analog,
        /root/reference/src/hnsw/hnsw_index_pragmas.cpp:22-148)."""
        levels = np.asarray(self.graph.levels)
        valid = np.asarray(self.store._valid)
        nb0 = np.asarray(self.graph.neighbors0)
        live = valid & (levels >= 0)
        out_levels = []
        n0 = int(live.sum())
        e0 = int((nb0[live] >= 0).sum())
        out_levels.append({
            "level": 0, "nodes": n0, "edges": e0,
            "max_edges": n0 * self.config.m0,
            "allocated_bytes": int(nb0.nbytes),
        })
        if int(self.graph.max_level) >= 1:
            un = np.asarray(self.graph.upper_neighbors)
            uslot = np.asarray(self.graph.upper_slot)
            for lvl in range(1, int(self.graph.max_level) + 1):
                nodes_l = live & (levels >= lvl)
                n_l = int(nodes_l.sum())
                slots_l = uslot[nodes_l]
                e_l = int((un[slots_l, lvl - 1] >= 0).sum()) if n_l else 0
                out_levels.append({
                    "level": lvl, "nodes": n_l, "edges": e_l,
                    "max_edges": n_l * self.config.m,
                    "allocated_bytes": int(un[:, lvl - 1].nbytes),
                })
        return {
            "metric": self.metric.value,
            "dimensions": self.dims,
            "count": self.store.size,
            "capacity": self.store.capacity,
            "approx_size": int(
                np.asarray(self.store._vectors).nbytes
                + np.asarray(self.graph.neighbors0).nbytes
                + np.asarray(self.graph.upper_neighbors).nbytes),
            "max_level": int(self.graph.max_level),
            "entry_node": int(self.graph.entry_node),
            "levels": out_levels,
            "build_distance_count": self.build_distance_count,
            "search_distance_count": self.search_distance_count,
        }

    # ------------------------------------------------------------------
    # usearch index_dense_gt parity helpers (index_dense.hpp: rename
    # :1318, get/distance_between :1338-1400, export_keys :1445,
    # contains/count :1201-1220). The reference extension doesn't call
    # these, but they complete the index surface.
    def contains(self, key: int) -> bool:
        return int(key) in self.store._key_to_slot

    def count(self, key: int) -> int:
        return 1 if self.contains(key) else 0

    def rename(self, old_key: int, new_key: int) -> bool:
        """Reassign a member's key (index_dense rename())."""
        st = self.store
        if int(new_key) in st._key_to_slot:
            return False
        slot = st._key_to_slot.pop(int(old_key), None)
        if slot is None:
            return False
        st._key_to_slot[int(new_key)] = slot
        st._keys[slot] = int(new_key)
        self.is_dirty = True
        return True

    def get_vector(self, key: int) -> np.ndarray:
        return self.store.get_vector(key)

    def distance_between(self, key_a: int, key_b: int) -> float:
        """Index-metric distance between two members."""
        from duckdb_vss_tpu.ops.distance import pair_scores

        a = self.store.get_vector(key_a)[None, :]
        b = self.store.get_vector(key_b)[None, :]
        return float(np.asarray(pair_scores(a, b, self.metric))[0])

    def export_keys(self) -> np.ndarray:
        """All live member keys (export_keys analog)."""
        keys = self.store._keys
        return keys[keys >= 0].copy()
