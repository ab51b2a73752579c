"""Mesh-sharded search: hash-partitioned vectors, per-shard local search,
ICI all-gather + distributed top-k merge.

The reference is single-process/single-node (SURVEY §2.4); this module is
the BASELINE.json north-star extension: vectors are hash-partitioned
across a `jax.sharding.Mesh` axis ("shard"), every device searches its
local partition with the same kernels as the single-chip path (flat
blockwise top-k or beam-batched HNSW), and per-shard top-k candidate sets
are exchanged with one all-gather over ICI and merged with lax.top_k —
one collective per query batch, not one per traversal hop.

Queries can additionally be data-parallel over a second mesh axis ("q"),
giving a 2-D (query-dp x vector-shard) layout; the all-gather then rides
only the "shard" axis.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from duckdb_vss_tpu.models import build as B
from duckdb_vss_tpu.models import graph as G
from duckdb_vss_tpu.ops.topk import flat_topk
from duckdb_vss_tpu.utils.config import HNSWConfig, MetricKind
from duckdb_vss_tpu.utils.padding import INF_SCORE, pad_2d_np, pad_dim, round_up


def make_mesh(n_shards: int | None = None, n_q: int = 1) -> Mesh:
    """Build a ("q", "shard") mesh over the available devices."""
    devs = jax.devices()
    n_shards = n_shards or (len(devs) // n_q)
    assert n_q * n_shards <= len(devs), (n_q, n_shards, len(devs))
    arr = np.array(devs[: n_q * n_shards]).reshape(n_q, n_shards)
    return Mesh(arr, ("q", "shard"))


def shard_keys(keys: np.ndarray, n_shards: int) -> np.ndarray:
    """Hash partition: shard = key mod n_shards (BASELINE north star)."""
    return (np.asarray(keys, np.int64) % n_shards).astype(np.int32)


# ---------------------------------------------------------------------------
# sharded flat (brute force) index
# ---------------------------------------------------------------------------


class ShardedFlatIndex:
    """Hash-partitioned brute-force index over a device mesh.

    Device arrays carry a leading shard axis [S, cap, ...] sharded over
    the mesh "shard" axis; searches run SPMD under shard_map.
    """

    def __init__(self, dims: int, metric: MetricKind, mesh: Mesh,
                 capacity_per_shard: int = 1024):
        self.dims = int(dims)
        self.d_pad = pad_dim(self.dims)
        self.metric = metric
        self.mesh = mesh
        self.n_shards = mesh.shape["shard"]
        cap = max(1024, int(capacity_per_shard))
        self.cap = 1 << (cap - 1).bit_length()
        s = self.n_shards
        self._sharding = NamedSharding(mesh, P(None, "shard"))
        shape3 = NamedSharding(mesh, P("shard", None, None))
        shape2 = NamedSharding(mesh, P("shard", None))
        self._vectors = jax.device_put(
            jnp.zeros((s, self.cap, self.d_pad), jnp.float32), shape3)
        self._vec_sq = jax.device_put(
            jnp.zeros((s, self.cap), jnp.float32), shape2)
        self._valid = jax.device_put(
            jnp.zeros((s, self.cap), jnp.bool_), shape2)
        self._keys = np.full((s, self.cap), -1, np.int64)
        self._counts = np.zeros((s,), np.int64)

    @functools.partial(jax.jit, static_argnums=(0,))
    def _scatter_flat(self, vectors, vec_sq, valid, batch_v, batch_slots):
        def shard_fn(vectors, vec_sq, valid, bv, bs):
            rows = jnp.where(bs[0] >= 0, bs[0], jnp.int32(2**30))
            v = vectors[0].at[rows].set(bv[0], mode="drop")
            sq = vec_sq[0].at[rows].set(
                jnp.sum(bv[0] * bv[0], axis=-1), mode="drop")
            va = valid[0].at[rows].set(True, mode="drop")
            return v[None], sq[None], va[None]

        return jax.shard_map(
            shard_fn,
            mesh=self.mesh,
            in_specs=(P("shard", None, None), P("shard", None),
                      P("shard", None), P("shard", None, None),
                      P("shard", None)),
            out_specs=(P("shard", None, None), P("shard", None),
                       P("shard", None)),
        )(vectors, vec_sq, valid, batch_v, batch_slots)

    def add(self, vectors: np.ndarray, keys: np.ndarray) -> None:
        vectors = np.asarray(vectors, np.float32)
        keys = np.asarray(keys, np.int64).reshape(-1)
        shards = shard_keys(keys, self.n_shards)
        s = self.n_shards
        max_n = max((shards == i).sum() + self._counts[i] for i in range(s))
        if max_n > self.cap:
            raise ValueError("shard capacity exceeded; grow not implemented")
        per_shard = [np.nonzero(shards == i)[0] for i in range(s)]
        bb = 4096  # scatter batch (on-device; no host round trip)
        slot_lists = []
        for i in range(s):
            off = int(self._counts[i])
            n_i = len(per_shard[i])
            self._keys[i, off : off + n_i] = keys[per_shard[i]]
            slot_lists.append(np.arange(off, off + n_i, dtype=np.int32))
            self._counts[i] += n_i
        n_steps = max((len(sl) + bb - 1) // bb for sl in slot_lists) if \
            slot_lists else 0
        sh3 = NamedSharding(self.mesh, P("shard", None, None))
        sh2 = NamedSharding(self.mesh, P("shard", None))
        for step in range(n_steps):
            bv = np.zeros((s, bb, self.d_pad), np.float32)
            bs = np.full((s, bb), -1, np.int32)
            for i in range(s):
                chunk = slot_lists[i][step * bb : (step + 1) * bb]
                src = per_shard[i][step * bb : (step + 1) * bb]
                bv[i, : len(chunk), : self.dims] = vectors[src]
                bs[i, : len(chunk)] = chunk
            self._vectors, self._vec_sq, self._valid = self._scatter_flat(
                self._vectors, self._vec_sq, self._valid,
                jax.device_put(jnp.asarray(bv), sh3),
                jax.device_put(jnp.asarray(bs), sh2))

    @functools.partial(jax.jit, static_argnums=(0, 2))
    def _search_sharded(self, queries, k: int, vectors=None, vec_sq=None,
                        valid=None):
        """SPMD search: local top-k per shard, all-gather, merge."""
        metric = self.metric
        cap = self.cap

        def shard_fn(q, vecs, vsq, valid):
            # per-device blocks: q [Bq_local, D]; vecs [1, cap, D]
            scores, slots = flat_topk(
                q, vecs[0], k, metric, vec_sq=vsq[0], valid=valid[0],
                block_n=min(16384, vecs.shape[1]))
            sid = lax.axis_index("shard").astype(jnp.int32)
            gid = jnp.where(slots >= 0, sid * cap + slots, -1)
            # distributed top-k merge over the shard axis
            all_s = lax.all_gather(scores, "shard", axis=0)  # [S, B, k]
            all_g = lax.all_gather(gid, "shard", axis=0)
            b = q.shape[0]
            cat_s = jnp.moveaxis(all_s, 0, 1).reshape(b, -1)
            cat_g = jnp.moveaxis(all_g, 0, 1).reshape(b, -1)
            neg, pos = lax.top_k(-cat_s, k)
            return -neg, jnp.take_along_axis(cat_g, pos, axis=1)

        return jax.shard_map(
            shard_fn,
            mesh=self.mesh,
            in_specs=(P("q", None), P("shard", None, None),
                      P("shard", None), P("shard", None)),
            out_specs=(P("q", None), P("q", None)),
            check_vma=False,  # outputs are replicated over "shard" by the
            # all_gather+top_k merge; the static checker can't infer that
        )(queries, vectors, vec_sq, valid)

    def search(self, queries: np.ndarray, k: int):
        queries = np.asarray(queries, np.float32)
        if queries.ndim == 1:
            queries = queries[None]
        b = queries.shape[0]
        n_q = self.mesh.shape["q"]
        b_pad = round_up(max(b, 1), max(8, n_q))
        q = jnp.asarray(pad_2d_np(queries, b_pad, self.d_pad))
        q = jax.device_put(q, NamedSharding(self.mesh, P("q", None)))
        scores, gids = jax.device_get(self._search_sharded(
            q, int(k), self._vectors, self._vec_sq, self._valid))
        scores, gids = scores[:b], gids[:b]
        keys = np.full(gids.shape, -1, np.int64)
        ok = gids >= 0
        keys[ok] = self._keys.reshape(-1)[gids[ok]]
        return scores, keys


# ---------------------------------------------------------------------------
# sharded HNSW index
# ---------------------------------------------------------------------------


class ShardedGraph(NamedTuple):
    """Per-shard HNSW graphs stacked on a leading shard axis."""

    neighbors0: jax.Array  # [S, cap, M0]
    upper_neighbors: jax.Array  # [S, cap_u, L_MAX, M]
    upper_slot: jax.Array  # [S, cap]
    upper_node: jax.Array  # [S, cap_u]
    levels: jax.Array  # [S, cap]
    entry_node: jax.Array  # [S]
    max_level: jax.Array  # [S]
    upper_count: jax.Array  # [S]


def _stack_state(g: ShardedGraph) -> G.GraphState:
    """View one shard's slice (inside shard_map, leading dim == 1)."""
    return G.GraphState(
        neighbors0=g.neighbors0[0],
        upper_neighbors=g.upper_neighbors[0],
        upper_slot=g.upper_slot[0],
        upper_node=g.upper_node[0],
        levels=g.levels[0],
        entry_node=g.entry_node[0],
        max_level=g.max_level[0],
        upper_count=g.upper_count[0],
    )


def _restack(st: G.GraphState) -> ShardedGraph:
    return ShardedGraph(
        neighbors0=st.neighbors0[None],
        upper_neighbors=st.upper_neighbors[None],
        upper_slot=st.upper_slot[None],
        upper_node=st.upper_node[None],
        levels=st.levels[None],
        entry_node=st.entry_node[None],
        max_level=st.max_level[None],
        upper_count=st.upper_count[None],
    )


class ShardedHNSWIndex:
    """Hash-partitioned HNSW over a device mesh: independent per-shard
    subgraphs, SPMD build + search, one top-k merge collective per batch."""

    def __init__(self, dims: int, config: HNSWConfig, mesh: Mesh,
                 capacity_per_shard: int = 4096, seed: int = 0x5EED,
                 build_batch: int = 128):
        self.dims = int(dims)
        self.d_pad = pad_dim(self.dims)
        self.config = config
        self.mesh = mesh
        self.n_shards = mesh.shape["shard"]
        self.build_batch = build_batch
        cap = max(1024, int(capacity_per_shard))
        self.cap = 1 << (cap - 1).bit_length()
        s = self.n_shards
        self._rng = np.random.default_rng(seed)
        sh3 = NamedSharding(mesh, P("shard", None, None))
        sh2 = NamedSharding(mesh, P("shard", None))
        sh1 = NamedSharding(mesh, P("shard"))
        self._vectors = jax.device_put(
            jnp.zeros((s, self.cap, self.d_pad), jnp.float32), sh3)
        self._vec_sq = jax.device_put(jnp.zeros((s, self.cap), jnp.float32), sh2)
        self._valid = jax.device_put(jnp.zeros((s, self.cap), jnp.bool_), sh2)
        self._keys = np.full((s, self.cap), -1, np.int64)
        self._counts = np.zeros((s,), np.int64)
        cap_u = max(self.cap // G.UPPER_DIV, 64)
        g0 = ShardedGraph(
            neighbors0=jax.device_put(
                jnp.full((s, self.cap, config.m0), -1, jnp.int32), sh3),
            upper_neighbors=jax.device_put(
                jnp.full((s, cap_u, G.L_MAX, config.m), -1, jnp.int32),
                NamedSharding(mesh, P("shard", None, None, None))),
            upper_slot=jax.device_put(
                jnp.full((s, self.cap), -1, jnp.int32), sh2),
            upper_node=jax.device_put(jnp.full((s, cap_u), -1, jnp.int32), sh2),
            levels=jax.device_put(jnp.full((s, self.cap), -1, jnp.int32), sh2),
            entry_node=jax.device_put(jnp.full((s,), -1, jnp.int32), sh1),
            max_level=jax.device_put(jnp.full((s,), -1, jnp.int32), sh1),
            upper_count=jax.device_put(jnp.zeros((s,), jnp.int32), sh1),
        )
        self.graph = g0

    def _stack_graphs(self, states) -> "ShardedGraph":
        """Stack per-shard GraphStates into the sharded layout."""
        mesh = self.mesh
        field_specs = {
            "neighbors0": P("shard", None, None),
            "upper_neighbors": P("shard", None, None, None),
            "upper_slot": P("shard", None),
            "upper_node": P("shard", None),
            "levels": P("shard", None),
            "entry_node": P("shard"),
            "max_level": P("shard"),
            "upper_count": P("shard"),
        }
        out = {}
        for f, spec in field_specs.items():
            stacked = jnp.stack([getattr(st, f) for st in states])
            out[f] = jax.device_put(stacked, NamedSharding(mesh, spec))
        return ShardedGraph(**out)

    # -- build ----------------------------------------------------------
    @functools.partial(jax.jit, static_argnums=(0,))
    def _scatter_step(self, vectors, vec_sq, valid, batch_v, batch_slots):
        """SPMD scatter of one [S, B, D] batch into the stacked store."""

        def shard_fn(vectors, vec_sq, valid, bv, bs):
            rows = jnp.where(bs[0] >= 0, bs[0], jnp.int32(2**30))
            v = vectors[0].at[rows].set(bv[0], mode="drop")
            sq = vec_sq[0].at[rows].set(
                jnp.sum(bv[0] * bv[0], axis=-1), mode="drop")
            va = valid[0].at[rows].set(True, mode="drop")
            return v[None], sq[None], va[None]

        return jax.shard_map(
            shard_fn,
            mesh=self.mesh,
            in_specs=(P("shard", None, None), P("shard", None),
                      P("shard", None), P("shard", None, None),
                      P("shard", None)),
            out_specs=(P("shard", None, None), P("shard", None),
                       P("shard", None)),
        )(vectors, vec_sq, valid, batch_v, batch_slots)

    def add(self, vectors: np.ndarray, keys: np.ndarray) -> None:
        """Hash-partition and insert. Each SPMD step scatters one batch of
        up to ``build_batch`` vectors into every shard's store on-device
        (no host round trip of the stacked arrays) and then runs the
        SPMD graph-insert step."""
        vectors = np.asarray(vectors, np.float32)
        keys = np.asarray(keys, np.int64).reshape(-1)
        shards = shard_keys(keys, self.n_shards)
        s = self.n_shards
        per_shard = [np.nonzero(shards == i)[0] for i in range(s)]
        if any(len(p) + self._counts[i] > self.cap
               for i, p in enumerate(per_shard)):
            raise ValueError("shard capacity exceeded")

        slot_lists = []
        for i in range(s):
            idx = per_shard[i]
            off = int(self._counts[i])
            n_i = len(idx)
            self._keys[i, off : off + n_i] = keys[idx]
            slot_lists.append(np.arange(off, off + n_i, dtype=np.int32))
            self._counts[i] += n_i

        bb = self.build_batch
        sh3 = NamedSharding(self.mesh, P("shard", None, None))
        sh2 = NamedSharding(self.mesh, P("shard", None))
        n_scatter = max((len(sl) + bb - 1) // bb for sl in slot_lists) if \
            slot_lists else 0
        for step in range(n_scatter):
            bv = np.zeros((s, bb, self.d_pad), np.float32)
            bs = np.full((s, bb), -1, np.int32)
            for i in range(s):
                chunk = slot_lists[i][step * bb : (step + 1) * bb]
                src = per_shard[i][step * bb : (step + 1) * bb]
                bv[i, : len(chunk), : self.dims] = vectors[src]
                bs[i, : len(chunk)] = chunk
            self._vectors, self._vec_sq, self._valid = self._scatter_step(
                self._vectors, self._vec_sq, self._valid,
                jax.device_put(jnp.asarray(bv), sh3),
                jax.device_put(jnp.asarray(bs), sh2))
        # bulk load into empty shards: per-shard local MXU bulk build
        # (on a real pod each host builds its partition locally; only
        # search needs collectives), then stack the per-shard graphs
        graphs_empty = int(np.asarray(
            jax.device_get(self.graph.max_level)).max()) < 0
        if graphs_empty and len(keys) >= 4096:
            from duckdb_vss_tpu.models.bulk import bulk_build

            states = []
            host_v = np.asarray(jax.device_get(self._vectors))
            host_q = np.asarray(jax.device_get(self._vec_sq))
            for i in range(s):
                sl = slot_lists[i]
                lv = self._sample_levels(len(sl))
                states.append(bulk_build(
                    jnp.asarray(host_v[i]), jnp.asarray(host_q[i]),
                    sl.astype(np.int32), lv, self.config, self.config.metric,
                    host_vectors=host_v[i][sl][:, : self.dims]))
            self.graph = self._stack_graphs(states)
            return

        n_steps = max((len(sl) + bb - 1) // bb for sl in slot_lists) or 0
        for step in range(n_steps):
            batch_slots = np.full((s, bb), -1, np.int32)
            batch_levels = np.zeros((s, bb), np.int32)
            for i in range(s):
                chunk = slot_lists[i][step * bb : (step + 1) * bb]
                batch_slots[i, : len(chunk)] = chunk
                batch_levels[i, : len(chunk)] = self._sample_levels(len(chunk))
            self.graph = self._insert_step(
                self.graph, self._vectors, self._vec_sq,
                jax.device_put(jnp.asarray(batch_slots),
                               NamedSharding(self.mesh, P("shard", None))),
                jax.device_put(jnp.asarray(batch_levels),
                               NamedSharding(self.mesh, P("shard", None))))

    def _sample_levels(self, n: int) -> np.ndarray:
        import math
        u = self._rng.random(n)
        inv = 1.0 / math.log(max(self.config.m, 2))
        return np.minimum(np.floor(-np.log(np.maximum(u, 1e-12)) * inv),
                          G.L_MAX).astype(np.int32)

    @functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(1,))
    def _insert_step(self, graph, vectors, vec_sq, slots, levels):
        cfg = self.config

        def shard_fn(graph, vectors, vec_sq, slots, levels):
            st = _stack_state(graph)
            st, _ = B.insert_batch_impl(
                st, vectors[0], vec_sq[0], slots[0], levels[0],
                cfg.metric, cfg.m, cfg.m0, cfg.ef_construction)
            return _restack(st)

        spec = ShardedGraph(
            neighbors0=P("shard", None, None),
            upper_neighbors=P("shard", None, None, None),
            upper_slot=P("shard", None),
            upper_node=P("shard", None),
            levels=P("shard", None),
            entry_node=P("shard"),
            max_level=P("shard"),
            upper_count=P("shard"),
        )
        return jax.shard_map(
            shard_fn,
            mesh=self.mesh,
            in_specs=(spec, P("shard", None, None), P("shard", None),
                      P("shard", None), P("shard", None)),
            out_specs=spec,
            check_vma=False,  # beam-search while_loops mix replicated and
            # shard-varying carries; skip static VMA tracking
        )(graph, vectors, vec_sq, slots, levels)

    # -- search ---------------------------------------------------------
    @functools.partial(jax.jit, static_argnums=(0, 6, 7))
    def _search_step(self, graph, vectors, vec_sq, valid, q, k, ef):
        metric = self.config.metric
        cap = self.cap

        def shard_fn(graph, vectors, vec_sq, valid, q):
            st = _stack_state(graph)
            # per-shard upper-level vector table for the MXU descent
            # (gathered once per query batch; the descent matmul then
            # routes every query exactly — see graph.mxu_descent)
            node = st.upper_node
            safe = jnp.maximum(node, 0)
            uv = jnp.where((node >= 0)[:, None],
                           jnp.take(vectors[0], safe, axis=0),
                           0.0).astype(jnp.bfloat16)
            uvsq = jnp.take(vec_sq[0], safe) * (node >= 0)
            scores, slots, _ = G.search_graph(
                st, vectors[0], vec_sq[0], valid[0], q, k, ef, metric,
                descent="mxu", upper_vecs=uv, upper_vec_sq=uvsq)
            sid = lax.axis_index("shard").astype(jnp.int32)
            gid = jnp.where(slots >= 0, sid * cap + slots, -1)
            all_s = lax.all_gather(scores, "shard", axis=0)
            all_g = lax.all_gather(gid, "shard", axis=0)
            b = q.shape[0]
            cat_s = jnp.moveaxis(all_s, 0, 1).reshape(b, -1)
            cat_g = jnp.moveaxis(all_g, 0, 1).reshape(b, -1)
            neg, pos = lax.top_k(-cat_s, k)
            return -neg, jnp.take_along_axis(cat_g, pos, axis=1)

        spec = ShardedGraph(
            neighbors0=P("shard", None, None),
            upper_neighbors=P("shard", None, None, None),
            upper_slot=P("shard", None),
            upper_node=P("shard", None),
            levels=P("shard", None),
            entry_node=P("shard"),
            max_level=P("shard"),
            upper_count=P("shard"),
        )
        return jax.shard_map(
            shard_fn,
            mesh=self.mesh,
            in_specs=(spec, P("shard", None, None), P("shard", None),
                      P("shard", None), P("q", None)),
            out_specs=(P("q", None), P("q", None)),
            check_vma=False,  # replicated over "shard" post-merge
        )(graph, vectors, vec_sq, valid, q)

    def search(self, queries: np.ndarray, k: int, ef: int | None = None):
        queries = np.asarray(queries, np.float32)
        if queries.ndim == 1:
            queries = queries[None]
        b = queries.shape[0]
        n_q = self.mesh.shape["q"]
        b_pad = round_up(max(b, 1), max(8, n_q))
        q = jnp.asarray(pad_2d_np(queries, b_pad, self.d_pad))
        q = jax.device_put(q, NamedSharding(self.mesh, P("q", None)))
        ef_eff = round_up(max(int(ef or self.config.ef_search), k), 16)
        scores, gids = jax.device_get(self._search_step(
            self.graph, self._vectors, self._vec_sq, self._valid, q,
            int(k), ef_eff))
        scores, gids = scores[:b], gids[:b]
        keys = np.full(gids.shape, -1, np.int64)
        ok = gids >= 0
        keys[ok] = self._keys.reshape(-1)[gids[ok]]
        return scores, keys
