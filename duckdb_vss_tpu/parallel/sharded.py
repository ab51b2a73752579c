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


def _fetch(x):
    """Host value of a (possibly multi-controller) global array pytree.

    Single process (and fully-replicated or fully-addressable arrays):
    plain device_get. Under jax.distributed with >1 process, arrays
    sharded over mesh axes span processes and device_get cannot reach
    remote shards — process_allgather (an all-gather program + host
    fetch of the replicated result) is the multi-controller substitute.
    Every process receives the full value, keeping replicated host
    state (keys, placement, compaction permutations) in lockstep."""
    leaves, treedef = jax.tree.flatten(x)
    if jax.process_count() == 1 or all(
            getattr(l, "is_fully_addressable", True) for l in leaves):
        return jax.tree.unflatten(
            treedef, [np.asarray(l) for l in jax.device_get(leaves)])
    from jax.experimental import multihost_utils

    return jax.tree.unflatten(treedef, [
        np.asarray(multihost_utils.process_allgather(l, tiled=True))
        if not getattr(l, "is_fully_addressable", True)
        else np.asarray(jax.device_get(l)) for l in leaves])


@functools.lru_cache(maxsize=None)
def _full_program(shape, dtype, fill, sharding):
    return jax.jit(lambda: jnp.full(shape, fill, dtype),
                   out_shardings=sharding)


def _device_full(shape, dtype, fill, sharding):
    """Allocate a global array directly INTO a sharding. jnp.zeros +
    device_put materializes on the default device first, which breaks
    under multi-controller (the host array is process-local, and
    resharding a committed single-device array across processes is not
    allowed); a jitted full() with out_shardings is an SPMD program
    every process executes over its own devices."""
    return _full_program(tuple(shape), jnp.dtype(dtype), fill, sharding)()


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer — uniform virtual-shard hashing even for
    pathological key patterns (sequential, strided, clustered)."""
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


class VirtualPlacement:
    """Over-partitioned key placement: keys hash into V = alpha * S
    virtual shards; each virtual shard is assigned to a physical shard
    the first time it is seen, greedily to the least-loaded one.

    This is the BASELINE north-star skew handling ("over-partitioning
    hot shards"): a hot key range concentrates into a few virtual
    shards, and the load-aware assignment spreads those across physical
    shards instead of letting `key mod S` pile them onto one. Placement
    is deterministic given the insert order and persists with the index.
    """

    def __init__(self, n_shards: int, alpha: int = 16):
        self.n_shards = int(n_shards)
        self.v = int(alpha) * self.n_shards
        self.assign = np.full((self.v,), -1, np.int32)
        self.load = np.zeros((self.n_shards,), np.int64)

    def place(self, keys: np.ndarray) -> np.ndarray:
        """Physical shard per key; assigns unseen virtual shards."""
        keys = np.asarray(keys, np.int64)
        vs = (_splitmix64(keys) % np.uint64(self.v)).astype(np.int64)
        counts = np.bincount(vs, minlength=self.v)
        new = np.nonzero((self.assign < 0) & (counts > 0))[0]
        # heaviest new virtual shards first -> best balance
        for vshard in new[np.argsort(-counts[new], kind="stable")]:
            tgt = int(np.argmin(self.load))
            self.assign[vshard] = tgt
            self.load[tgt] += int(counts[vshard])
        seen = np.nonzero((self.assign >= 0) & (counts > 0))[0]
        for vshard in seen:
            if vshard not in new:
                self.load[self.assign[vshard]] += int(counts[vshard])
        return self.assign[vs]

    def unplace_counts(self, phys_counts: np.ndarray) -> None:
        """Subtract per-physical-shard removal counts from the load."""
        self.load -= np.asarray(phys_counts, np.int64)


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
        self._vectors = _device_full((s, self.cap, self.d_pad),
                                     jnp.float32, 0, shape3)
        self._vec_sq = _device_full((s, self.cap), jnp.float32, 0, shape2)
        self._valid = _device_full((s, self.cap), jnp.bool_, False, shape2)
        self._keys = np.full((s, self.cap), -1, np.int64)
        self._counts = np.zeros((s,), np.int64)

    def _scatter_flat(self, vectors, vec_sq, valid, batch_v, batch_slots):
        return _scatter_sharded(vectors, vec_sq, valid, batch_v,
                                batch_slots, mesh=self.mesh)

    def reserve(self, capacity_per_shard: int) -> None:
        """Grow every shard's capacity (mirrors ShardedHNSWIndex.reserve;
        the reference's exclusive-lock resize, hnsw_index.cpp:410-431)."""
        new_cap = 1 << (int(capacity_per_shard) - 1).bit_length()
        if new_cap <= self.cap:
            return
        s, pad = self.n_shards, new_cap - self.cap
        sh3 = NamedSharding(self.mesh, P("shard", None, None))
        sh2 = NamedSharding(self.mesh, P("shard", None))
        self._vectors = jax.device_put(
            jnp.pad(self._vectors, ((0, 0), (0, pad), (0, 0))), sh3)
        self._vec_sq = jax.device_put(
            jnp.pad(self._vec_sq, ((0, 0), (0, pad))), sh2)
        self._valid = jax.device_put(
            jnp.pad(self._valid, ((0, 0), (0, pad))), sh2)
        self._keys = np.concatenate(
            [self._keys, np.full((s, pad), -1, np.int64)], axis=1)
        self.cap = new_cap

    def add(self, vectors: np.ndarray, keys: np.ndarray) -> None:
        vectors = np.asarray(vectors, np.float32)
        keys = np.asarray(keys, np.int64).reshape(-1)
        shards = shard_keys(keys, self.n_shards)
        s = self.n_shards
        max_n = max((shards == i).sum() + self._counts[i] for i in range(s))
        if max_n > self.cap:
            self.reserve(int(max_n))
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
                jax.device_put(bv, sh3),
                jax.device_put(bs, sh2))

    def _search_sharded(self, queries, k: int, vectors=None, vec_sq=None,
                        valid=None):
        return _search_sharded_flat(
            queries, vectors, vec_sq, valid, mesh=self.mesh, k=int(k),
            metric=self.metric, cap=self.cap)

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


@functools.partial(jax.jit, static_argnames=("mesh", "k", "metric", "cap"))
def _search_sharded_flat(queries, vectors, vec_sq, valid, *, mesh, k,
                         metric, cap):
    """SPMD flat search: local top-k per shard, all-gather, merge."""

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
        mesh=mesh,
        in_specs=(P("q", None), P("shard", None, None),
                  P("shard", None), P("shard", None)),
        out_specs=(P("q", None), P("q", None)),
        check_vma=False,  # outputs are replicated over "shard" by the
        # all_gather+top_k merge; the static checker can't infer that
    )(queries, vectors, vec_sq, valid)


# ---------------------------------------------------------------------------
# sharded HNSW index
# ---------------------------------------------------------------------------


class ShardedGraph(NamedTuple):
    """Per-shard HNSW graphs stacked on a leading shard axis."""

    neighbors0: jax.Array  # [S, cap, M0]
    upper_neighbors: jax.Array  # [S, cap_u, L_MAX*M] (packed 2D per
    #   shard — GraphState.upper_neighbors layout note)
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


# ---------------------------------------------------------------------------
# SPMD steps (module-level jits: `self` never enters a jit cache key, so
# programs are shared across index instances — round-1 hashed `self` by
# id via static_argnums=(0,) and recompiled per instance)
# ---------------------------------------------------------------------------

_GRAPH_SPEC = ShardedGraph(
    neighbors0=P("shard", None, None),
    upper_neighbors=P("shard", None, None),
    upper_slot=P("shard", None),
    upper_node=P("shard", None),
    levels=P("shard", None),
    entry_node=P("shard"),
    max_level=P("shard"),
    upper_count=P("shard"),
)


@functools.partial(jax.jit, static_argnames=("mesh",))
def _scatter_sharded(vectors, vec_sq, valid, batch_v, batch_slots, *, mesh):
    """SPMD scatter of one [S, B, D] batch into the stacked store."""

    def shard_fn(vectors, vec_sq, valid, bv, bs):
        rows = jnp.where(bs[0] >= 0, bs[0], jnp.int32(2**30))
        upd = bv[0].astype(vectors.dtype)  # scalar_kind store cast
        u32 = upd.astype(jnp.float32)  # norms from the ROUNDED values
        v = vectors[0].at[rows].set(upd, mode="drop")
        sq = vec_sq[0].at[rows].set(
            jnp.sum(u32 * u32, axis=-1), mode="drop")
        va = valid[0].at[rows].set(True, mode="drop")
        return v[None], sq[None], va[None]

    return jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P("shard", None, None), P("shard", None),
                  P("shard", None), P("shard", None, None),
                  P("shard", None)),
        out_specs=(P("shard", None, None), P("shard", None),
                   P("shard", None)),
    )(vectors, vec_sq, valid, batch_v, batch_slots)


@functools.partial(jax.jit, static_argnames=("mesh",))
def _tombstone_sharded(valid, rows, *, mesh):
    """Scatter False into [S, cap] valid at per-shard row lists."""

    def shard_fn(valid, rows):
        r = jnp.where(rows[0] >= 0, rows[0], jnp.int32(2**30))
        return valid[0].at[r].set(False, mode="drop")[None]

    return jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("shard", None), P("shard", None)),
        out_specs=P("shard", None),
    )(valid, rows)


@functools.partial(jax.jit, static_argnames=("mesh", "metric", "m", "m0",
                                             "ef_construction"))
def _insert_sharded(graph, vectors, vec_sq, slots, levels, *, mesh, metric,
                    m, m0, ef_construction):
    def shard_fn(graph, vectors, vec_sq, slots, levels):
        st = _stack_state(graph)
        st, _ = B.insert_batch_impl(
            st, vectors[0], vec_sq[0], slots[0], levels[0],
            metric, m, m0, ef_construction)
        return _restack(st)

    return jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(_GRAPH_SPEC, P("shard", None, None), P("shard", None),
                  P("shard", None), P("shard", None)),
        out_specs=_GRAPH_SPEC,
        check_vma=False,  # beam-search while_loops mix replicated and
        # shard-varying carries; skip static VMA tracking
    )(graph, vectors, vec_sq, slots, levels)


@functools.partial(jax.jit, static_argnames=("mesh",))
def _upper_tables_sharded(vectors, vec_sq, upper_node, *, mesh):
    """Per-shard upper-level vector tables for the MXU descent, built
    ONCE per mutation epoch and cached (round-1 re-gathered these from
    HBM inside every search call)."""

    def shard_fn(vectors, vec_sq, upper_node):
        node = upper_node[0]
        safe = jnp.maximum(node, 0)
        uv = jnp.where((node >= 0)[:, None],
                       jnp.take(vectors[0], safe, axis=0),
                       0.0).astype(jnp.bfloat16)
        uvsq = jnp.take(vec_sq[0], safe) * (node >= 0)
        return uv[None], uvsq[None]

    return jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("shard", None, None), P("shard", None),
                  P("shard", None)),
        out_specs=(P("shard", None, None), P("shard", None)),
    )(vectors, vec_sq, upper_node)


@functools.partial(jax.jit, static_argnames=("mesh",))
def _nbr_tables_sharded(vectors, vec_sq, neighbors0, *, mesh):
    """Per-shard int8 neighborhood layout + packed meta (the single-chip
    fast path, graph.make_neighborhood_tables, per shard)."""
    from duckdb_vss_tpu.models.graph import make_neighborhood_tables
    from duckdb_vss_tpu.ops.pallas_beam import pack_meta

    def shard_fn(vectors, vec_sq, neighbors0):
        nv, sc, sq = make_neighborhood_tables(
            vectors[0], vec_sq[0], neighbors0[0])
        meta = pack_meta(neighbors0[0], sc, sq)
        return nv[None], sc[None], sq[None], meta[None]

    return jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("shard", None, None), P("shard", None),
                  P("shard", None, None)),
        out_specs=(P("shard", None, None, None), P("shard", None, None),
                   P("shard", None, None), P("shard", None, None)),
    )(vectors, vec_sq, neighbors0)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "metric", "cap", "k", "ef", "expand",
                     "pallas_beam", "has_nbr", "hop_rerank"))
def _search_sharded_hnsw(graph, vectors, vec_sq, valid, trav, uv, uvsq, q,
                         nbr_vecs, nbr_scale, nbr_sq, nbr_meta, *, mesh,
                         metric, cap, k, ef, expand, pallas_beam, has_nbr,
                         hop_rerank=0):
    """SPMD search: per-shard graph search through the SAME fast path as
    the single-chip engine (MXU descent over the cached upper table,
    int8 neighborhood layout + fused Pallas beam kernel when present),
    then one all-gather + lax.top_k merge over the shard axis."""

    def shard_fn(graph, vectors, vec_sq, valid, trav, uv, uvsq, q,
                 nv, nsc, nsq, nmeta):
        st = _stack_state(graph)
        kwargs = dict(descent="mxu", upper_vecs=uv[0], upper_vec_sq=uvsq[0],
                      expand=expand, hop_rerank=hop_rerank)
        if has_nbr:
            kwargs.update(nbr_vecs=nv[0], nbr_scale=nsc[0], nbr_sq=nsq[0],
                          nbr_meta=nmeta[0], pallas_beam=pallas_beam)
        else:
            kwargs.update(traversal_vectors=trav[0])
        scores, slots, _ = G.search_graph(
            st, vectors[0], vec_sq[0], valid[0], q, k, ef, metric, **kwargs)
        sid = lax.axis_index("shard").astype(jnp.int32)
        gid = jnp.where(slots >= 0, sid * cap + slots, -1)
        all_s = lax.all_gather(scores, "shard", axis=0)
        all_g = lax.all_gather(gid, "shard", axis=0)
        b = q.shape[0]
        cat_s = jnp.moveaxis(all_s, 0, 1).reshape(b, -1)
        cat_g = jnp.moveaxis(all_g, 0, 1).reshape(b, -1)
        neg, pos = lax.top_k(-cat_s, k)
        return -neg, jnp.take_along_axis(cat_g, pos, axis=1)

    sh3 = P("shard", None, None)
    sh2 = P("shard", None)
    # nbr_vecs is [S, cap, M0, D] when present (3-D per shard, end to
    # end — see make_neighborhood_tables), a [S, 1, 1] placeholder when
    # not; spec rank follows the value
    nv_spec = P("shard", *([None] * (nbr_vecs.ndim - 1)))
    return jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(_GRAPH_SPEC, sh3, sh2, sh2, sh3, sh3, sh2, P("q", None),
                  nv_spec, sh3, sh3, sh3),
        out_specs=(P("q", None), P("q", None)),
        check_vma=False,  # replicated over "shard" post-merge
    )(graph, vectors, vec_sq, valid, trav, uv, uvsq, q,
      nbr_vecs, nbr_scale, nbr_sq, nbr_meta)


@functools.partial(jax.jit, static_argnames=("mesh",))
def _isolate_sharded(neighbors0, upper_neighbors, valid, *, mesh):
    """Per-shard isolate(): drop edges into tombstoned slots
    (usearch isolate(), index.hpp:3109-3146)."""

    def shard_fn(neighbors0, upper_neighbors, valid):
        def mask(tbl):
            ok = (tbl >= 0) & jnp.take(valid[0], jnp.maximum(tbl, 0))
            return jnp.where(ok, tbl, -1)

        def drop(tbl):
            t = mask(tbl)
            order = jnp.argsort(jnp.where(t >= 0, 0, 1), axis=-1,
                                stable=True)
            return jnp.take_along_axis(t, order, axis=-1)

        # base lists pack live entries first; the packed-2D upper table
        # is mask-only (see models/hnsw._isolate_jit)
        return drop(neighbors0[0])[None], mask(upper_neighbors[0])[None]

    return jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("shard", None, None), P("shard", None, None),
                  P("shard", None)),
        out_specs=(P("shard", None, None), P("shard", None, None)),
    )(neighbors0, upper_neighbors, valid)


@functools.partial(jax.jit, static_argnames=("mesh",))
def _apply_compact_sharded(graph, vectors, vec_sq, perm, remap, old_uslot,
                           row_live, urow_live, upper_slot_new,
                           upper_node_new, levels_new, entry_new, maxlv_new,
                           ucount_new, *, mesh):
    """Apply host-computed per-shard compaction permutations on device:
    gather rows into new-slot order and remap every edge id
    (usearch compact() phases 2-3, index.hpp:3002-3096)."""

    def shard_fn(graph, vectors, vec_sq, perm, remap, old_uslot, row_live,
                 urow_live, upper_slot_new, upper_node_new, levels_new,
                 entry_new, maxlv_new, ucount_new):
        g = _stack_state(graph)
        p = perm[0]
        rm = remap[0]
        cap_ = g.neighbors0.shape[0]

        def remap_ids(tbl):
            return jnp.take(rm, jnp.where(tbl >= 0, tbl, cap_))

        nb0 = remap_ids(jnp.take(g.neighbors0, p, axis=0))
        nb0 = jnp.where(row_live[0][:, None], nb0, -1)
        un = remap_ids(jnp.take(g.upper_neighbors, old_uslot[0], axis=0))
        un = jnp.where(urow_live[0][:, None], un, -1)
        v = jnp.take(vectors[0], p, axis=0) * row_live[0][:, None]
        sq = jnp.take(vec_sq[0], p) * row_live[0]
        new_g = G.GraphState(
            neighbors0=nb0,
            upper_neighbors=un,
            upper_slot=upper_slot_new[0],
            upper_node=upper_node_new[0],
            levels=levels_new[0],
            entry_node=entry_new[0],
            max_level=maxlv_new[0],
            upper_count=ucount_new[0],
        )
        return _restack(new_g), v[None], sq[None], row_live

    sh2 = P("shard", None)
    return jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(_GRAPH_SPEC, P("shard", None, None), sh2, sh2, sh2, sh2,
                  sh2, sh2, sh2, sh2, sh2, P("shard"), P("shard"),
                  P("shard")),
        out_specs=(_GRAPH_SPEC, P("shard", None, None), sh2, sh2),
    )(graph, vectors, vec_sq, perm, remap, old_uslot, row_live, urow_live,
      upper_slot_new, upper_node_new, levels_new, entry_new, maxlv_new,
      ucount_new)


class ShardedHNSWIndex:
    """Hash-partitioned HNSW over a device mesh.

    Production surface parity with the single-chip HNSWIndex
    (hnsw_index.cpp:466-482 delete / :451-464 compact / :410-431 grow /
    :510-532 persist), plus the north-star distribution features:
    independent per-shard subgraphs, SPMD build + search with ONE top-k
    merge collective per batch, virtual-shard placement for hot-key skew,
    and the single-chip fast path (cached upper tables, int8 neighborhood
    layout, fused Pallas beam kernel) inside shard_map.
    """

    def __init__(self, dims: int, config: HNSWConfig, mesh: Mesh,
                 capacity_per_shard: int = 4096, seed: int = 0x5EED,
                 build_batch: int = 128, placement_alpha: int = 16,
                 scalar_kind: str = "f32"):
        self.dims = int(dims)
        self.d_pad = pad_dim(self.dims)
        self.config = config
        self.mesh = mesh
        self.n_shards = mesh.shape["shard"]
        self.build_batch = build_batch
        if scalar_kind not in ("f32", "bf16"):
            raise ValueError(
                f"scalar_kind must be f32 or bf16, got {scalar_kind!r}")
        # bf16 = the lean storage mode (FlatIndex docstring); per shard
        # the store then doubles as the traversal table
        self.scalar_kind = scalar_kind
        self._dtype = jnp.bfloat16 if scalar_kind == "bf16" else jnp.float32
        cap = max(1024, int(capacity_per_shard))
        self.cap = 1 << (cap - 1).bit_length()
        s = self.n_shards
        self._rng = np.random.default_rng(seed)
        self.placement = VirtualPlacement(s, alpha=placement_alpha)
        self._alloc_store(s, self.cap)
        self._keys = np.full((s, self.cap), -1, np.int64)
        self._key_to_slot = [dict() for _ in range(s)]
        self._free_slots = [[] for _ in range(s)]
        self._next_slot = np.zeros((s,), np.int64)
        self.graph = self._empty_graph()
        self._upper_cache = None
        self._nbr_cache = None
        self._trav_cache = None
        import os as _os
        self.layout = _os.environ.get("DVT_LAYOUT", "auto")
        self.use_pallas_beam = _os.environ.get("DVT_PALLAS_BEAM",
                                               "1") == "1"
        # one-hop exact rerank at the finish (models/graph._finish_search;
        # opt-in — see HNSWIndex.hop_rerank for the measured trade-off)
        self.hop_rerank = int(_os.environ.get("DVT_HOP_RERANK", "0"))
        self.is_dirty = False

    # -- storage helpers --------------------------------------------------
    def _sh(self, *spec):
        return NamedSharding(self.mesh, P(*spec))

    def _alloc_store(self, s, cap):
        self._vectors = _device_full(
            (s, cap, self.d_pad), self._dtype, 0,
            self._sh("shard", None, None))
        self._vec_sq = _device_full(
            (s, cap), jnp.float32, 0, self._sh("shard", None))
        self._valid = _device_full(
            (s, cap), jnp.bool_, False, self._sh("shard", None))

    def _empty_graph(self) -> ShardedGraph:
        s, cap, cfg = self.n_shards, self.cap, self.config
        cap_u = max(cap // G.UPPER_DIV, 64)
        return ShardedGraph(
            neighbors0=_device_full((s, cap, cfg.m0), jnp.int32, -1,
                                    self._sh("shard", None, None)),
            upper_neighbors=_device_full(
                (s, cap_u, G.L_MAX * cfg.m), jnp.int32, -1,
                self._sh("shard", None, None)),
            upper_slot=_device_full((s, cap), jnp.int32, -1,
                                    self._sh("shard", None)),
            upper_node=_device_full((s, cap_u), jnp.int32, -1,
                                    self._sh("shard", None)),
            levels=_device_full((s, cap), jnp.int32, -1,
                                self._sh("shard", None)),
            entry_node=_device_full((s,), jnp.int32, -1,
                                    self._sh("shard")),
            max_level=_device_full((s,), jnp.int32, -1, self._sh("shard")),
            upper_count=_device_full((s,), jnp.int32, 0,
                                     self._sh("shard")),
        )

    def _invalidate(self):
        self._upper_cache = None
        self._nbr_cache = None
        self._trav_cache = None
        self.is_dirty = True

    def _stack_graphs(self, states) -> "ShardedGraph":
        """Stack per-shard GraphStates into the sharded layout."""
        out = {}
        for f, spec in _GRAPH_SPEC._asdict().items():
            stacked = jnp.stack([getattr(st, f) for st in states])
            out[f] = jax.device_put(stacked, NamedSharding(self.mesh, spec))
        return ShardedGraph(**out)

    def _bulk_build_multiproc(self, bulk_build, slot_lists, lv_lists,
                              vectors, per_shard) -> "ShardedGraph":
        """Multi-controller bulk build: each process runs bulk_build
        ONLY for the shards its local devices own (the reference's
        fully-parallel construct-task analog across hosts,
        hnsw_index_physical_create.cpp:231-243), entirely on local
        data — the per-shard store slice comes from the sharded store's
        addressable shards, so construction crosses no process
        boundary. The global stacked graph is assembled from the
        per-device local results with make_array_from_single_device_
        arrays; only search needs collectives afterwards."""
        pidx = jax.process_index()
        s = self.n_shards
        vec_blk, sq_blk = {}, {}
        for sh_ in self._vectors.addressable_shards:
            i = sh_.index[0].start or 0
            vec_blk.setdefault(i, sh_.data[0])
        for sh_ in self._vec_sq.addressable_shards:
            i = sh_.index[0].start or 0
            sq_blk.setdefault(i, sh_.data[0])
        states = {}
        for i in sorted(vec_blk):
            states[i] = bulk_build(
                vec_blk[i], sq_blk[i], slot_lists[i].astype(np.int32),
                lv_lists[i], self.config, self.config.metric,
                host_vectors=vectors[per_shard[i]])
        mesh_devs = self.mesh.devices  # [n_q, S]
        out = {}
        for f, spec in _GRAPH_SPEC._asdict().items():
            blocks, tail = [], ()
            for (_, i), dev in np.ndenumerate(mesh_devs):
                if dev.process_index != pidx:
                    continue
                block = jnp.asarray(getattr(states[i], f))[None]
                tail = block.shape[1:]
                blocks.append(jax.device_put(block, dev))
            out[f] = jax.make_array_from_single_device_arrays(
                (s,) + tail, NamedSharding(self.mesh, spec), blocks)
        return ShardedGraph(**out)

    def __len__(self) -> int:
        return sum(len(m) for m in self._key_to_slot)

    @property
    def counts(self) -> np.ndarray:
        """Live members per physical shard."""
        return np.array([len(m) for m in self._key_to_slot], np.int64)

    # -- grow -------------------------------------------------------------
    def reserve(self, capacity_per_shard: int) -> None:
        """Grow every shard's capacity (the reference's exclusive-lock
        resize, hnsw_index.cpp:410-431)."""
        new_cap = 1 << (int(capacity_per_shard) - 1).bit_length()
        if new_cap <= self.cap:
            return
        s, old = self.n_shards, self.cap
        pad = new_cap - old
        self._vectors = jax.device_put(jnp.pad(
            self._vectors, ((0, 0), (0, pad), (0, 0))),
            self._sh("shard", None, None))
        self._vec_sq = jax.device_put(jnp.pad(
            self._vec_sq, ((0, 0), (0, pad))), self._sh("shard", None))
        self._valid = jax.device_put(jnp.pad(
            self._valid, ((0, 0), (0, pad))), self._sh("shard", None))
        self._keys = np.concatenate(
            [self._keys, np.full((s, pad), -1, np.int64)], axis=1)
        g = self.graph
        cap_u_new = max(new_cap // G.UPPER_DIV, 64)
        pad_u = cap_u_new - g.upper_neighbors.shape[1]
        self.graph = ShardedGraph(
            neighbors0=jax.device_put(jnp.pad(
                g.neighbors0, ((0, 0), (0, pad), (0, 0)),
                constant_values=-1), self._sh("shard", None, None)),
            upper_neighbors=jax.device_put(jnp.pad(
                g.upper_neighbors, ((0, 0), (0, pad_u), (0, 0)),
                constant_values=-1), self._sh("shard", None, None)),
            upper_slot=jax.device_put(jnp.pad(
                g.upper_slot, ((0, 0), (0, pad)), constant_values=-1),
                self._sh("shard", None)),
            upper_node=jax.device_put(jnp.pad(
                g.upper_node, ((0, 0), (0, pad_u)), constant_values=-1),
                self._sh("shard", None)),
            levels=jax.device_put(jnp.pad(
                g.levels, ((0, 0), (0, pad)), constant_values=-1),
                self._sh("shard", None)),
            entry_node=g.entry_node,
            max_level=g.max_level,
            upper_count=g.upper_count,
        )
        self.cap = new_cap
        self._invalidate()

    # -- build ------------------------------------------------------------
    def _sample_levels(self, n: int) -> np.ndarray:
        import math
        u = self._rng.random(n)
        inv = 1.0 / math.log(max(self.config.m, 2))
        return np.minimum(np.floor(-np.log(np.maximum(u, 1e-12)) * inv),
                          G.L_MAX).astype(np.int32)

    def add(self, vectors: np.ndarray, keys: np.ndarray) -> None:
        """Place keys onto shards (virtual-shard, load-aware), scatter
        vectors on-device, then build/extend each shard's graph SPMD."""
        vectors = np.asarray(vectors, np.float32)
        keys = np.asarray(keys, np.int64).reshape(-1)
        shards = self.placement.place(keys)
        s = self.n_shards
        per_shard = [np.nonzero(shards == i)[0] for i in range(s)]
        need = max((len(p) + int(self._next_slot[i])
                    - len(self._free_slots[i]))
                   for i, p in enumerate(per_shard))
        if need > self.cap:
            self.reserve(need)

        slot_lists = []
        for i in range(s):
            idx = per_shard[i]
            n_i = len(idx)
            sl = np.empty((n_i,), np.int64)
            reuse = min(len(self._free_slots[i]), n_i)
            for j in range(reuse):
                sl[j] = self._free_slots[i].pop()
            fresh = n_i - reuse
            if fresh:
                off = int(self._next_slot[i])
                sl[reuse:] = np.arange(off, off + fresh)
                self._next_slot[i] += fresh
            for k_, s_ in zip(keys[idx].tolist(), sl.tolist()):
                if k_ in self._key_to_slot[i]:
                    raise ValueError(f"duplicate key {k_}")
                self._key_to_slot[i][k_] = int(s_)
            self._keys[i, sl] = keys[idx]
            slot_lists.append(sl.astype(np.int32))

        bb = max(self.build_batch, 4096)
        n_scatter = max(((len(sl) + bb - 1) // bb for sl in slot_lists),
                        default=0)
        for step in range(n_scatter):
            bv = np.zeros((s, bb, self.d_pad), np.float32)
            bs = np.full((s, bb), -1, np.int32)
            for i in range(s):
                chunk = slot_lists[i][step * bb : (step + 1) * bb]
                src = per_shard[i][step * bb : (step + 1) * bb]
                bv[i, : len(chunk), : self.dims] = vectors[src]
                bs[i, : len(chunk)] = chunk
            self._vectors, self._vec_sq, self._valid = _scatter_sharded(
                self._vectors, self._vec_sq, self._valid,
                jax.device_put(bv, self._sh("shard", None, None)),
                jax.device_put(bs, self._sh("shard", None)),
                mesh=self.mesh)

        # bulk load into empty shards: per-shard local MXU bulk build
        # over the shard's DEVICE-RESIDENT store slice — the stacked
        # store never round-trips the host (round 3 device_get the
        # whole [S, cap, D] array and re-uploaded per shard; at
        # config-5 scale that is minutes through a 55 MB/s link).
        # `_vectors[i]` is an XLA slice of the sharded array: data moves
        # device-to-device (or not at all when the slice's owner is the
        # build device). The per-shard loop is sequential here because
        # this is a single controller; on a real pod the same code runs
        # SPMD multi-controller — each host executes ONLY its own
        # shard's bulk_build over its local slice (the reference's
        # fully-parallel construct-task analog,
        # hnsw_index_physical_create.cpp:231-243) and only search needs
        # collectives. The repair phase's host_vectors come from the
        # caller's input rows (already on host), not from the store.
        graphs_empty = int(_fetch(self.graph.max_level).max()) < 0
        if graphs_empty and len(keys) >= 4096:
            from duckdb_vss_tpu.models.bulk import bulk_build

            # level streams are drawn for EVERY shard on every process
            # so the shared host RNG advances identically everywhere
            # (multi-controller: each process then builds only the
            # shards its devices own)
            lv_lists = [self._sample_levels(len(sl)) for sl in slot_lists]
            if jax.process_count() > 1:
                self.graph = self._bulk_build_multiproc(
                    bulk_build, slot_lists, lv_lists, vectors, per_shard)
                self._invalidate()
                return
            states = []
            for i in range(s):
                sl = slot_lists[i]
                states.append(bulk_build(
                    self._vectors[i], self._vec_sq[i],
                    sl.astype(np.int32), lv_lists[i], self.config,
                    self.config.metric,
                    host_vectors=vectors[per_shard[i]]))
            self.graph = self._stack_graphs(states)
            self._invalidate()
            return

        bb = self.build_batch
        cfg = self.config
        n_steps = max(((len(sl) + bb - 1) // bb for sl in slot_lists),
                      default=0)
        for step in range(n_steps):
            batch_slots = np.full((s, bb), -1, np.int32)
            batch_levels = np.zeros((s, bb), np.int32)
            for i in range(s):
                chunk = slot_lists[i][step * bb : (step + 1) * bb]
                batch_slots[i, : len(chunk)] = chunk
                batch_levels[i, : len(chunk)] = self._sample_levels(
                    len(chunk))
            self.graph = _insert_sharded(
                self.graph, self._vectors, self._vec_sq,
                jax.device_put(batch_slots, self._sh("shard", None)),
                jax.device_put(batch_levels, self._sh("shard", None)),
                mesh=self.mesh, metric=cfg.metric, m=cfg.m, m0=cfg.m0,
                ef_construction=cfg.ef_construction)
        self._invalidate()

    # -- delete / compact ---------------------------------------------------
    def remove(self, keys) -> int:
        """Tombstone delete across shards (hnsw_index.cpp:466-482 ->
        free-list push + search-time filtering)."""
        keys = np.asarray(keys, np.int64).reshape(-1)
        s = self.n_shards
        rows = [[] for _ in range(s)]
        removed = np.zeros((s,), np.int64)
        for k_ in keys.tolist():
            for i in range(s):
                slot = self._key_to_slot[i].pop(int(k_), None)
                if slot is not None:
                    rows[i].append(slot)
                    self._keys[i, slot] = -1
                    self._free_slots[i].append(slot)
                    removed[i] += 1
                    break
        n = int(removed.sum())
        if n == 0:
            return 0
        width = max(len(r) for r in rows)
        width = max(8, 1 << (width - 1).bit_length())
        batch = np.full((s, width), -1, np.int32)
        for i in range(s):
            batch[i, : len(rows[i])] = rows[i]
        self._valid = _tombstone_sharded(
            self._valid,
            jax.device_put(batch, self._sh("shard", None)),
            mesh=self.mesh)
        self.placement.unplace_counts(removed)
        self.is_dirty = True  # tombstones only; caches stay valid
        return n

    def isolate(self) -> None:
        """Drop edges into tombstoned nodes on every shard."""
        nb0, un = _isolate_sharded(
            self.graph.neighbors0, self.graph.upper_neighbors, self._valid,
            mesh=self.mesh)
        self.graph = self.graph._replace(neighbors0=nb0,
                                         upper_neighbors=un)
        self._invalidate()

    def compact(self) -> None:
        """Per-shard slot-permutation compaction (usearch compact(),
        index.hpp:3002-3096): permutations are computed host-side from
        the (small) valid/levels arrays, then applied on device in one
        SPMD step of gathers + id remaps."""
        s, cap = self.n_shards, self.cap
        valid, levels, uslot = _fetch(
            (self._valid, self.graph.levels, self.graph.upper_slot))
        cap_u = self.graph.upper_neighbors.shape[1]

        perm = np.zeros((s, cap), np.int32)
        remap = np.full((s, cap + 1), -1, np.int32)
        old_uslot = np.zeros((s, cap_u), np.int32)
        row_live = np.zeros((s, cap), bool)
        urow_live = np.zeros((s, cap_u), bool)
        upper_slot_new = np.full((s, cap), -1, np.int32)
        upper_node_new = np.full((s, cap_u), -1, np.int32)
        levels_new = np.full((s, cap), -1, np.int32)
        entry_new = np.full((s,), -1, np.int32)
        maxlv_new = np.full((s,), -1, np.int32)
        ucount_new = np.zeros((s,), np.int32)
        keys_new = np.full((s, cap), -1, np.int64)

        for i in range(s):
            live = np.nonzero(valid[i])[0]
            n_live = len(live)
            order = np.lexsort((live, -levels[i][live]))
            old_of_new = live[order]
            perm[i, :n_live] = old_of_new
            remap[i, old_of_new] = np.arange(n_live)
            row_live[i, :n_live] = True
            lv_new = levels[i][old_of_new]
            levels_new[i, :n_live] = lv_new
            has_upper = lv_new >= 1
            n_up = int(has_upper.sum())
            upper_slot_new[i, np.nonzero(has_upper)[0]] = np.arange(n_up)
            old_uslot[i, :n_up] = uslot[i][old_of_new[has_upper]]
            urow_live[i, :n_up] = True
            upper_node_new[i, :n_up] = np.nonzero(has_upper)[0]
            ucount_new[i] = n_up
            if n_live:
                maxlv_new[i] = int(lv_new.max())
                entry_new[i] = 0  # highest level sorts first
            keys_new[i, :n_live] = self._keys[i][old_of_new]
            self._key_to_slot[i] = {
                int(k): j for j, k in enumerate(keys_new[i, :n_live])}
            self._free_slots[i] = []
            self._next_slot[i] = n_live

        sh2 = self._sh("shard", None)
        sh1 = self._sh("shard")
        dev = lambda a, sh: jax.device_put(np.asarray(a), sh)
        (self.graph, self._vectors, self._vec_sq,
         valid_new) = _apply_compact_sharded(
            self.graph, self._vectors, self._vec_sq,
            dev(perm, sh2), dev(remap, sh2), dev(old_uslot, sh2),
            dev(row_live, sh2), dev(urow_live, sh2),
            dev(upper_slot_new, sh2), dev(upper_node_new, sh2),
            dev(levels_new, sh2), dev(entry_new, sh1),
            dev(maxlv_new, sh1), dev(ucount_new, sh1), mesh=self.mesh)
        self._valid = valid_new
        self._keys = keys_new
        self._invalidate()

    # -- search -------------------------------------------------------------
    def _tables(self):
        if self._upper_cache is None:
            self._upper_cache = _upper_tables_sharded(
                self._vectors, self._vec_sq, self.graph.upper_node,
                mesh=self.mesh)
        use_nbr = self.layout == "neighborhood" or (
            self.layout == "auto"
            and jax.default_backend() != "cpu"
            and self._nbr_budget_ok())
        if use_nbr and self._nbr_cache is None:
            self._nbr_cache = _nbr_tables_sharded(
                self._vectors, self._vec_sq, self.graph.neighbors0,
                mesh=self.mesh)
        if not use_nbr and self._trav_cache is None:
            self._trav_cache = (
                self._vectors if self._vectors.dtype == jnp.bfloat16
                else jax.jit(
                    lambda v: v.astype(jnp.bfloat16))(self._vectors))
        return self._upper_cache, (self._nbr_cache if use_nbr else None)

    def _nbr_budget_ok(self) -> bool:
        """Per-DEVICE accounting: each mesh device holds exactly ONE
        shard's int8 table (sharded over "shard", replicated over "q"),
        so the check is per-shard bytes vs the per-chip HBM budget.
        Round 3 summed the table across shards — correct only for the
        single-host virtual mesh where every "device" shares one RAM,
        and wrong on a pod: it disabled the fused-kernel fast path at
        exactly the config-5 scale where sharding 8-way (5 GB/shard)
        restores it (benchmarks/deep10m.py memory story). On the CPU
        virtual mesh the shards DO share host memory, so there the sum
        over process-local mesh devices still applies."""
        import os as _os
        m0 = self.graph.neighbors0.shape[2]
        per_shard = self.cap * m0 * self.d_pad  # int8
        budget = float(_os.environ.get("DVT_NBR_BUDGET_GB", "6")) * (1 << 30)
        if jax.default_backend() == "cpu":
            local = sum(1 for d in self.mesh.devices.flat
                        if d.process_index == jax.process_index())
            return per_shard * max(local, 1) <= budget
        return per_shard <= budget

    def search(self, queries: np.ndarray, k: int, ef: int | None = None,
               expand: int = 4, chunk: int = 8192,
               ef_local: int | None = None):
        """SPMD top-k. Large batches are chunked HOST-SIDE like the
        single-chip path (models/hnsw.py search): one compiled program
        per chunk-size bucket (not per total batch shape), bounded
        per-program intermediates, overlapped dispatch across chunks,
        and a single device_get for all results.

        Per-shard beam width scales DOWN with shard count: each shard
        searches 1/S of the data and contributes only k candidates to
        the merge, so running the full global ef on every shard inflates
        total work ~S-fold for recall nobody asked for (round-4 SCALING
        artifact: recall ROSE 0.9627->0.9852 from S=1->8 while per-shard
        work stayed flat). The default policy ef_local =
        min(ef, max(k+6, ceil(ef/S)+6)) recovers the single-index
        recall class at a per-shard cost that falls with S (measured,
        32k x 64 S=8: ef_local 16 -> recall 0.9635 vs single-index
        0.9627 at 2.3x the full-ef policy's QPS —
        benchmarks/sharded_scaling.py); pass ef_local explicitly
        (e.g. ef_local=ef) for the old behavior.

        Caveat (131k-scale run, SCALING_r05_131k.json): in HIGH-recall
        regimes the policy trades recall — at S=8 it reads 0.9658
        where the single index reads 0.999 (full ef per shard reads
        0.976 there: sharding itself costs ~2pp at that operating
        point). The policy is an iso-recall-CLASS default for the
        ~0.95-0.97 operating tier; recall-critical callers should pass
        ef_local=ef (or higher)."""
        queries = np.asarray(queries, np.float32)
        if queries.ndim == 1:
            queries = queries[None]
        b = queries.shape[0]
        n_q = self.mesh.shape["q"]
        q_mult = max(8, n_q)
        chunk = round_up(max(int(chunk), q_mult), q_mult)
        ef_req = max(int(ef or self.config.ef_search), k)
        if ef_local is None:
            ef_req = min(ef_req, max(k + 6, -(-ef_req // self.n_shards)
                                     + 6))
        else:
            ef_req = max(int(ef_local), k)
        ef_eff = round_up(ef_req, 16)
        (uv, uvsq), nbr = self._tables()
        has_nbr = nbr is not None
        if has_nbr:
            nv, nsc, nsq, nmeta = nbr
            trav = self._vectors  # unused on this path
        else:
            nv = nsc = nsq = nmeta = jnp.zeros(
                (self.n_shards, 1, 1), jnp.float32)
            nv = jax.device_put(nv, self._sh("shard", None, None))
            nsc = nsq = nmeta = nv
            trav = self._trav_cache
        outs = []
        for off in range(0, b, chunk):
            qc = queries[off : off + chunk]
            b_pad = round_up(max(len(qc), 1), q_mult)
            q = jnp.asarray(pad_2d_np(qc, b_pad, self.d_pad))
            q = jax.device_put(q, self._sh("q", None))
            outs.append((_search_sharded_hnsw(
                self.graph, self._vectors, self._vec_sq, self._valid,
                trav, uv, uvsq, q, nv, nsc, nsq, nmeta, mesh=self.mesh,
                metric=self.config.metric, cap=self.cap, k=int(k),
                ef=ef_eff, expand=expand,
                pallas_beam=self.use_pallas_beam and has_nbr,
                has_nbr=has_nbr,
                hop_rerank=min(self.hop_rerank, int(k))), len(qc)))
        fetched = _fetch([o for o, _ in outs])
        scores = np.concatenate(
            [s[:nb] for (s, _), (_, nb) in zip(fetched, outs)])
        gids = np.concatenate(
            [g[:nb] for (_, g), (_, nb) in zip(fetched, outs)])
        keys = np.full(gids.shape, -1, np.int64)
        ok = gids >= 0
        keys[ok] = self._keys.reshape(-1)[gids[ok]]
        return scores, keys

    # -- introspection / persistence ----------------------------------------
    def stats(self) -> dict:
        levels, valid = _fetch((self.graph.levels, self._valid))
        per = []
        for i in range(self.n_shards):
            per.append({
                "count": int(valid[i].sum()),
                "max_level": int(levels[i].max()),
                "capacity": self.cap,
            })
        return {"n_shards": self.n_shards, "count": len(self),
                "placement_load": self.placement.load.tolist(),
                "shards": per}

    def save(self, path: str) -> None:
        """Whole-index serialization of the stacked shard arrays through
        the native container (PersistToDisk analog)."""
        from duckdb_vss_tpu.utils import persist as PS

        lib = PS.get_lib()
        if lib is None:
            raise PS.PersistError("native vss_store library unavailable")
        import ctypes

        s, cap = self.n_shards, self.cap
        g = self.graph
        cap_u = g.upper_neighbors.shape[1]
        hdr = PS._FileHeader()
        hdr.metric = PS._METRIC_CODE[self.config.metric]
        hdr.dims = self.dims
        hdr.d_pad = self.d_pad
        hdr.m = self.config.m
        hdr.m0 = self.config.m0
        hdr.ef_construction = self.config.ef_construction
        hdr.ef_search = self.config.ef_search
        hdr.max_level = 0
        hdr.entry_node = 0
        hdr.count = len(self)
        hdr.capacity = cap
        hdr.cap_upper = cap_u
        hdr.upper_count = 0
        hdr.reserved[0] = s
        hdr.reserved[1] = self.placement.v
        hdr.reserved[2] = PS._SCALAR_CODE[self.scalar_kind]
        free_flat = np.concatenate(
            [np.asarray(f, np.int64) for f in self._free_slots]) \
            if any(self._free_slots) else np.zeros((0,), np.int64)
        free_off = np.zeros((s + 1,), np.int64)
        for i in range(s):
            free_off[i + 1] = free_off[i] + len(self._free_slots[i])
        dev_arrays = _fetch({
            "valid": self._valid, "vectors": self._vectors,
            "neighbors0": g.neighbors0, "upper_nbrs": g.upper_neighbors,
            "upper_slot": g.upper_slot, "upper_node": g.upper_node,
            "levels": g.levels, "entry_node": g.entry_node,
            "smax_level": g.max_level, "supper_count": g.upper_count,
        })
        arrays = {
            "keys": np.ascontiguousarray(self._keys),
            "valid": np.ascontiguousarray(
                dev_arrays["valid"].astype(np.uint8)),
            **{name: np.ascontiguousarray(dev_arrays[name])
               for name in ("vectors", "neighbors0", "upper_nbrs",
                            "upper_slot", "upper_node", "levels",
                            "entry_node", "smax_level", "supper_count")},
            "next_slot": np.ascontiguousarray(self._next_slot),
            "free_slots": free_flat,
            "free_off": free_off,
            "pl_assign": np.ascontiguousarray(self.placement.assign),
            "pl_load": np.ascontiguousarray(self.placement.load),
        }
        if jax.process_count() > 1 and jax.process_index() != 0:
            # multi-controller: every process computes the (replicated)
            # host image above — process 0 alone writes the container,
            # the barrier keeps the others from racing ahead into ops
            # that assume the file exists
            from jax.experimental import multihost_utils

            self.is_dirty = False
            multihost_utils.sync_global_devices("sharded_save")
            return
        w = lib.vss_writer_open(path.encode(), ctypes.byref(hdr))
        if not w:
            raise PS.PersistError(f"cannot open {path} for writing")
        try:
            for name, arr in arrays.items():
                rc = lib.vss_writer_section(
                    w, name.encode(), 0,
                    arr.ctypes.data_as(ctypes.c_void_p), arr.nbytes)
                if rc != 0:
                    raise PS.PersistError(
                        f"write section {name} failed rc={rc}")
        finally:
            lib.vss_writer_close(w)
        self.is_dirty = False
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("sharded_save")

    @classmethod
    def load(cls, path: str, mesh: Mesh) -> "ShardedHNSWIndex":
        from duckdb_vss_tpu.utils import persist as PS

        lib = PS.get_lib()
        if lib is None:
            raise PS.PersistError("native vss_store library unavailable")
        import ctypes

        r = lib.vss_reader_open(path.encode())
        if not r:
            raise PS.PersistError(f"cannot open {path}")
        try:
            h = lib.vss_reader_header(r).contents
            s = int(h.reserved[0])
            v_virtual = int(h.reserved[1])
            scalar_kind = PS._CODE_SCALAR[int(h.reserved[2])]
            cap = int(h.capacity)
            cap_u = int(h.cap_upper)
            d_pad = int(h.d_pad)
            m, m0 = int(h.m), int(h.m0)
            cfg = HNSWConfig(
                metric=PS._CODE_METRIC[int(h.metric)],
                ef_construction=int(h.ef_construction),
                ef_search=int(h.ef_search), m=m, m0=m0)
            dims = int(h.dims)
            assert s == mesh.shape["shard"], (s, dict(mesh.shape))

            def read(name, dtype, shape):
                arr = np.empty(shape, dtype)
                got = lib.vss_reader_section(
                    r, name.encode(),
                    arr.ctypes.data_as(ctypes.c_void_p), arr.nbytes)
                if got != arr.nbytes:
                    raise PS.PersistError(f"section {name}: rc={got}")
                return arr

            keys = read("keys", np.int64, (s, cap))
            valid = read("valid", np.uint8, (s, cap)).astype(bool)
            vectors = read("vectors", PS._vec_np_dtype(scalar_kind),
                           (s, cap, d_pad))
            neighbors0 = read("neighbors0", np.int32, (s, cap, m0))
            upper_nbrs = read("upper_nbrs", np.int32,
                              (s, cap_u, G.L_MAX * m))
            upper_slot = read("upper_slot", np.int32, (s, cap))
            upper_node = read("upper_node", np.int32, (s, cap_u))
            levels = read("levels", np.int32, (s, cap))
            entry_node = read("entry_node", np.int32, (s,))
            smax_level = read("smax_level", np.int32, (s,))
            supper_count = read("supper_count", np.int32, (s,))
            next_slot = read("next_slot", np.int64, (s,))
            n_free = lib.vss_reader_section(r, b"free_slots", None, 0) // 8
            free_flat = read("free_slots", np.int64, (int(n_free),)) \
                if n_free > 0 else np.zeros((0,), np.int64)
            free_off = read("free_off", np.int64, (s + 1,))
            pl_assign = read("pl_assign", np.int32, (v_virtual,))
            pl_load = read("pl_load", np.int64, (s,))
        finally:
            lib.vss_reader_close(r)

        idx = cls(dims, cfg, mesh, capacity_per_shard=cap,
                  placement_alpha=max(1, v_virtual // s),
                  scalar_kind=scalar_kind)
        assert idx.cap == cap
        idx.placement.assign = pl_assign
        idx.placement.load = pl_load
        sh = idx._sh
        # host numpy -> global sharding directly (multi-controller safe:
        # every process reads the shared container and device_puts only
        # its addressable shards)
        idx._vectors = jax.device_put(vectors, sh("shard", None, None))
        # recompute norms ON DEVICE with the same op as the scatter path
        # (_scatter_sharded shard_fn): a host numpy re-sum differs in
        # final ulps from XLA's reduction and broke exact roundtrip
        # score parity (first 2-process run). jit keeps it
        # multi-controller safe (SPMD over the global array).
        idx._vec_sq = jax.jit(
            lambda a: jnp.sum(jnp.square(a.astype(jnp.float32)), axis=-1),
            out_shardings=sh("shard", None))(idx._vectors)
        idx._valid = jax.device_put(valid, sh("shard", None))
        idx._keys = keys
        idx._key_to_slot = [
            {int(k): j for j, k in enumerate(keys[i].tolist()) if k >= 0}
            for i in range(s)]
        idx._free_slots = [
            free_flat[free_off[i]:free_off[i + 1]].astype(int).tolist()
            for i in range(s)]
        idx._next_slot = next_slot
        idx.graph = ShardedGraph(
            neighbors0=jax.device_put(neighbors0, sh("shard", None, None)),
            upper_neighbors=jax.device_put(upper_nbrs,
                                           sh("shard", None, None)),
            upper_slot=jax.device_put(upper_slot, sh("shard", None)),
            upper_node=jax.device_put(upper_node, sh("shard", None)),
            levels=jax.device_put(levels, sh("shard", None)),
            entry_node=jax.device_put(entry_node, sh("shard")),
            max_level=jax.device_put(smax_level, sh("shard")),
            upper_count=jax.device_put(supper_count, sh("shard")),
        )
        idx.is_dirty = False
        return idx
