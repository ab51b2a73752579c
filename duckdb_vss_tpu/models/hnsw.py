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
                              "descent_steps", "descent", "pallas_beam",
                              "hop_rerank"))
def _hnsw_search_jit(state, vectors, vec_sq, valid, queries, k, ef, metric,
                     expand=4, use_pallas=False, descent_ef=48, n_seeds=8,
                     loop="while", max_steps=None, descent_steps=16,
                     traversal_vectors=None, descent="beam",
                     upper_vecs=None, upper_vec_sq=None, aug_table=None,
                     nbr_vecs=None, nbr_scale=None, nbr_sq=None,
                     nbr_meta=None, pallas_beam=False, upper_nodes=None,
                     hop_rerank=0):
    return search_graph(state, vectors, vec_sq, valid, queries, k, ef, metric,
                        expand=expand, use_pallas=use_pallas,
                        descent_ef=descent_ef, n_seeds=n_seeds, loop=loop,
                        max_steps=max_steps, descent_steps=descent_steps,
                        traversal_vectors=traversal_vectors, descent=descent,
                        upper_vecs=upper_vecs, upper_vec_sq=upper_vec_sq,
                        aug_table=aug_table, nbr_vecs=nbr_vecs,
                        nbr_scale=nbr_scale, nbr_sq=nbr_sq,
                        nbr_meta=nbr_meta, pallas_beam=pallas_beam,
                        upper_nodes=upper_nodes, hop_rerank=hop_rerank)


@jax.jit
def _isolate_jit(neighbors0, upper_neighbors, valid):
    """Mask edges into tombstoned slots; base lists also pack live
    entries first. Upper lists are mask-only: traversal already skips -1
    anywhere in a list, and packing the packed-2D upper table would need
    a per-level-window sort (or a [cap_u*L_MAX, m] reshape, whose
    in-program tiled layout pads 8x — the GraphState layout note)."""

    def mask(tbl):
        ok = (tbl >= 0) & jnp.take(valid, jnp.maximum(tbl, 0))
        return jnp.where(ok, tbl, -1)

    def drop(tbl):
        t = mask(tbl)
        order = jnp.argsort(jnp.where(t >= 0, 0, 1), axis=-1, stable=True)
        return jnp.take_along_axis(t, order, axis=-1)

    return drop(neighbors0), mask(upper_neighbors)


@functools.partial(jax.jit, static_argnames=("level", "metric"))
def _cluster_jit(state, vectors, vec_sq, queries, level, metric):
    from duckdb_vss_tpu.models.graph import gather_scores, greedy_descent
    from jax import lax

    queries = queries.astype(jnp.float32)
    q_sq = jnp.sum(queries * queries, axis=-1)
    b = queries.shape[0]
    stop = jnp.full((b,), level - 1, jnp.int32)
    cur, _, nd = greedy_descent(state, vectors, vec_sq, queries, q_sq, stop,
                                metric)
    exact = gather_scores(vectors, vec_sq, cur[:, None], queries, q_sq,
                          metric, precision=lax.Precision.HIGHEST)[:, 0]
    return cur, exact, nd


def _default_build_steps(ef_c: int, expand: int) -> int:
    """Construction base-beam step cap, measured on 1M x 128 clustered
    insertion (benchmarks/insert_steps_sweep.py / INSERT_STEPS.json):
    self-recall@1 and inserted-in-top10 hold at 1.0 all the way down to
    12 steps at the ef_c=128/expand=4 defaults (the mxu_descent exact
    coarse seeding is why so few steps suffice — the beam starts in the
    right neighborhood), while throughput rises 1254 (uncapped) ->
    3869 vec/s. Default ef_c//(2*expand) = 16 at the defaults keeps a
    2x margin over the measured quality cliff; floor 12. The full
    default set (16 steps + r_rounds=2 + backlink_cols=4) measured
    4467 vec/s best-of-3 under the churn protocol at a 0.999 quality
    floor (INSERT_RECORD.json)."""
    return max(12, ef_c // (2 * max(expand, 1)))


class HNSWIndex:
    """TPU-native HNSW index over row-keyed float vectors."""

    def __init__(
        self,
        dims: int,
        config: HNSWConfig | None = None,
        capacity: int = 1024,
        seed: int = 0x5EED,
        build_batch: int = DEFAULT_BUILD_BATCH,
        build_expand: int = 4,  # beam expansion per insert step: 4 cuts
        # the sequential step count vs 2 (+85% insert throughput at 1M,
        # measured) at equal clean-protocol self-recall (0.966 both)
        build_prune: str = "diversity",
        build_backlink_cols: int = 4,  # request back-edges from the 4
        # closest forward targets only; far targets reject the new node
        # under diversity pruning anyway and P drops per round
        # (round-5 measured, 1M churn protocol: quality floor identical
        # to cols=8 — self@1 0.999 — at +27% insert throughput;
        # pure-incremental from-empty quality guarded by
        # test_backlink_cap_pure_incremental_quality)
        traversal_dtype: str | None = None,
        scalar_kind: str = "f32",
        build_max_steps: int | None = None,  # cap the insert base-layer
        # beam's sequential steps (build.insert_batch max_steps_base).
        # None = the search-side saturation default for ef_construction
        # (see _default_build_steps); 0 disables the cap entirely.
        _defer_alloc: bool = False,  # persist.load_index lazy path
    ):
        self.config = config or HNSWConfig()
        # scalar_kind="bf16" stores the vectors themselves in bf16 (the
        # 10M-scale single-chip memory mode; FlatIndex docstring) — the
        # traversal copy below then aliases the store instead of
        # duplicating it, and the rerank runs in bf16.
        self.store = FlatIndex(dims, self.config.metric, capacity,
                               defer_alloc=_defer_alloc,
                               scalar_kind=scalar_kind)
        # reduced-precision traversal copy of the vector store (usearch's
        # scalar-cast layer, index_dense.hpp:363-375, recast TPU-side:
        # beam scoring gathers bf16 rows — half the HBM bytes — while the
        # exact rerank and emitted distances stay f32)
        import os as _os0
        self.traversal_dtype = (traversal_dtype
                                or _os0.environ.get("DVT_TRAVERSAL_DTYPE",
                                                    "bf16"))
        if self.traversal_dtype not in ("f32", "bf16"):
            raise ValueError(
                f"traversal_dtype must be f32 or bf16, got "
                f"{self.traversal_dtype!r}")
        self._trav_cache: jax.Array | None = None
        self._aug_cache: jax.Array | None = None
        self._upper_cache: tuple[jax.Array, jax.Array] | None = None
        # descent strategy: "mxu" (exact matmul over upper-level nodes)
        # or "beam" (level-1 beam walk)
        self.descent = _os0.environ.get("DVT_DESCENT", "mxu")
        self.graph = None if _defer_alloc else make_graph(
            self.store.capacity, self.config.m, self.config.m0)
        self.build_batch = int(build_batch)
        self.build_expand = int(build_expand)
        self.build_prune = str(build_prune)
        self.build_backlink_cols = (None if build_backlink_cols is None
                                    else int(build_backlink_cols))
        import os as _os2
        _env_ms = _os2.environ.get("DVT_BUILD_MAX_STEPS")
        if build_max_steps is None and _env_ms is not None:
            build_max_steps = int(_env_ms)
        self.build_max_steps = build_max_steps
        # back-link conflict-resolution rounds (build._apply_backlinks).
        # Default 2 (round 5): the rounds are ~25% of a capped insert
        # batch (benchmarks/insert_steps_sweep.py device profile) and
        # the churn-protocol quality floor measured identical to 4
        # rounds (self@1 0.999, in-top10 0.999, best-of-3 4690 vec/s
        # at 1Mx128); DVT_BUILD_R_ROUNDS=4 restores the conservative
        # setting
        self.build_r_rounds = int(_os2.environ.get("DVT_BUILD_R_ROUNDS",
                                                   "2"))
        # bulk loads into an empty graph at/above this size use the exact
        # kNN-graph MXU build instead of batched insertion
        self.bulk_threshold = 4096
        # fused DMA gather+score Pallas kernel for traversal (TPU only)
        import os as _os
        self.use_pallas = _os.environ.get("DVT_PALLAS", "0") == "1"
        # augmented traversal table (one gather/candidate instead of two;
        # graph.make_aug_table). Default OFF: measured on 1M x 128
        # clustered data it costs ~2.4pp recall@10 at the default ef=16
        # operating point (0.9625 vs 0.9860; benchmarks/sweep_search.py)
        # for only ~10% step-time gain — at wider operating points
        # (ef=32, expand=8, 4 steps) recall matches (0.9950 both arms)
        self.use_aug = _os.environ.get("DVT_AUG", "0") == "1"
        # traversal layout: "auto" (neighborhood when it fits the memory
        # budget), "neighborhood" (force), "flat" (per-candidate gathers)
        self.layout = _os.environ.get("DVT_LAYOUT", "auto")
        self._nbr_cache = None
        # fused on-chip beam kernel over the neighborhood layout
        # (ops/pallas_beam.py); applies only when the layout is active
        self.use_pallas_beam = _os.environ.get("DVT_PALLAS_BEAM",
                                               "1") == "1"
        # H2D query transfer dtype ("f32" | "bf16"); bf16 halves the
        # host->device bytes (see FlatIndex.prepare_queries)
        self.query_transfer_dtype = _os.environ.get("DVT_QUERY_TRANSFER",
                                                    "f32")
        # one-hop exact rerank expansion at the search finish (number of
        # top results expanded; 0 disables). Default OFF: measured on
        # 1M x 128 clustered it recovers rank-boundary misses only at
        # WEAK operating points (+0.5pp at ef=16/6 steps; ~0 at ef>=32)
        # while its XLA-side batched scoring costs several beam-steps
        # of device time (387k -> 77k dev QPS at ef=16). Useful opt-in
        # when beam budget is tight or no fused layout exists; folding
        # it into the Pallas kernel is the path to making it cheap.
        self.hop_rerank = int(_os.environ.get("DVT_HOP_RERANK", "0"))
        self._level_rng = np.random.default_rng(seed)
        # observability counters (usearch add_result_t/search_result_t
        # computed_distances, index.hpp:2360-2370, discarded by the
        # reference extension but surfaced here per SURVEY §5)
        self.build_distance_count = 0
        self.search_distance_count = 0
        self.is_dirty = False
        # deferred load: persist.load_index(lazy=True) parks a loader
        # closure here; the first data-touching call materializes the
        # device arrays (reference semantics: index deserialization is
        # deferred to first access, hnsw_index.cpp:192-206)
        self._pending_load = None

    def _ensure_loaded(self) -> None:
        if self._pending_load is not None:
            fn, self._pending_load = self._pending_load, None
            fn(self)

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

    def _traversal_vectors(self) -> jax.Array | None:
        """Plain bf16 traversal copy for the beam-descent path, rebuilt
        lazily after store mutations."""
        if self.store.scalar_kind == "bf16":
            # the store IS the reduced-precision table; no copy
            return self.store._vectors
        if self.traversal_dtype == "f32":
            return None
        if (self._trav_cache is None
                or self._trav_cache.shape[0] != self.store.capacity):
            self._trav_cache = self.store._vectors.astype(jnp.bfloat16)
        return self._trav_cache

    def _neighborhood_tables(self):
        """(nbr_vecs [cap, M0, D] int8, nbr_scale [cap, M0] f32,
        nbr_sq [cap, M0] f32) — the
        neighborhood-materialized traversal layout
        (graph.make_neighborhood_tables): each node's neighbors' vectors
        stored contiguously, cutting the beam step's gathered-row count
        M0x at the price of M0x traversal memory. Enabled when the table
        fits the memory budget (DVT_NBR_BUDGET_GB, default 9); rebuilt
        lazily after any graph mutation."""
        import os as _os

        if self.layout == "flat":
            return None, None, None, None
        if self.layout != "neighborhood" \
                and jax.default_backend() == "cpu":
            # a TPU-memory-layout optimization; on the CPU backend the
            # int8 dot path is slower and just burns test time
            return None, None, None, None
        m0 = self.graph.neighbors0.shape[1]
        table_bytes = self.store.capacity * m0 * self.store.d_pad  # int8
        budget = float(_os.environ.get("DVT_NBR_BUDGET_GB", "6")) * (1 << 30)
        if self.layout != "neighborhood" and table_bytes > budget:
            return None, None, None, None
        if self._nbr_cache is None:
            from duckdb_vss_tpu.models.graph import make_neighborhood_tables
            from duckdb_vss_tpu.ops.pallas_beam import pack_meta

            try:
                vecs_i8, scale, sq = make_neighborhood_tables(
                    self.store._vectors, self.store._vec_sq,
                    self.graph.neighbors0)
                meta = jax.jit(pack_meta)(self.graph.neighbors0, scale, sq)
                self._nbr_cache = (vecs_i8, scale, sq, meta)
            except jax.errors.JaxRuntimeError as e:
                if "RESOURCE_EXHAUSTED" not in str(e):
                    raise
                # table didn't fit (fragmented/shared HBM): fall back to
                # the flat per-candidate-gather layout for this index
                # rather than killing the query (round-2 driver bench
                # died here)
                import sys as _sys
                print("# neighborhood layout OOM; falling back to flat",
                      file=_sys.stderr, flush=True)
                self.layout = "flat"
                return None, None, None, None
        return self._nbr_cache

    def _aug_table(self) -> jax.Array | None:
        """Augmented bf16 traversal table (graph.make_aug_table): folds
        the member-side metric terms into each row so base-beam scoring
        needs ONE row-gather per candidate. Rebuilt lazily after store
        mutations."""
        if self.traversal_dtype == "f32" or not self.use_aug:
            return None
        if (self._aug_cache is None
                or self._aug_cache.shape[0] != self.store.capacity):
            from duckdb_vss_tpu.models.graph import make_aug_table

            self._aug_cache = jax.jit(
                make_aug_table, static_argnames=("metric",))(
                    self.store._vectors, self.store._vec_sq, self.metric)
        return self._aug_cache

    def _upper_vectors(self) -> tuple[jax.Array, jax.Array, jax.Array]:
        """(rows [u_lim, D] bf16, sq [u_lim] f32, nodes [u_lim] int32) —
        vector table of upper-level (level>=1) nodes for the MXU
        descent, derived lazily from the store through the graph's
        upper_node map. Compacted to a power-of-two bucket of
        upper_count: upper slots are allocated sequentially, so rows
        past upper_count are never live and scanning the full
        cap//UPPER_DIV table wastes ~4x descent matmul + top-k work.
        bf16 rows (routing only; seeds feed an exact-reranked beam)."""
        cap_u = self.graph.upper_node.shape[0]
        n_up = int(jax.device_get(self.graph.upper_count))
        u_lim = min(cap_u, max(256, 1 << max(0, n_up - 1).bit_length()))
        if self._upper_cache is None or (
                self._upper_cache[0].shape[0] != u_lim):
            node = self.graph.upper_node[:u_lim]
            safe = jnp.maximum(node, 0)
            rows = jnp.take(self.store._vectors, safe, axis=0)
            rows = jnp.where((node >= 0)[:, None], rows, 0.0)
            self._upper_cache = (
                rows.astype(jnp.bfloat16),
                jnp.take(self.store._vec_sq, safe) * (node >= 0),
                node,
            )
        return self._upper_cache

    # ------------------------------------------------------------------
    def add(self, vectors: np.ndarray, keys, on_progress=None) -> np.ndarray:
        """Bulk/incremental insert (reference Construct,
        hnsw_index.cpp:391-449). Returns assigned slot ids.

        on_progress, if given, is called as on_progress(fraction) with the
        build fraction in [0, 1] — the reference's task-level progress
        reporting (hnsw_index_physical_create.cpp:308-323 GetSinkProgress,
        build phase)."""
        self._ensure_loaded()
        import os as _os2
        import time as _time2
        _trace = _os2.environ.get("DVT_BUILD_TRACE", "0") == "1"
        _t = _time2.time()

        def _mark(label):
            nonlocal _t
            if _trace:
                now = _time2.time()
                print(f"# hnsw.add {label}: {now - _t:.1f}s", flush=True)
                _t = now

        vectors = np.asarray(vectors, np.float32)
        if vectors.ndim == 1:
            vectors = vectors[None, :]
        keys = np.asarray(keys, np.int64).reshape(-1)
        n = vectors.shape[0]
        graph_empty = int(jax.device_get(self.graph.entry_node)) < 0
        old_capacity = self.store.capacity
        self.reserve(self.store.size + n)
        _mark("reserve")
        slots = self.store.add(vectors, keys)
        _mark("store_add")
        self._trav_cache = None
        self._aug_cache = None
        self._upper_cache = None
        # the neighborhood layout stays VALID across adds (existing rows'
        # neighbor lists are untouched by storing new vectors); the
        # incremental path below keeps it consistent batch by batch via
        # update_neighborhood_rows. Only a capacity grow (table shape
        # change) or the bulk path (whole-graph rebuild) invalidates it.
        if self.store.capacity != old_capacity:
            self._nbr_cache = None
        if self.store.capacity > self.graph.capacity:
            self.graph = grow_graph(self.graph, self.store.capacity)
        levels = self._sample_levels(n)

        if graph_empty and n >= self.bulk_threshold:
            # CREATE INDEX-style bulk path: exact-kNN graph on the MXU
            # (PhysicalCreateHNSWIndex analog; models/bulk.py)
            from duckdb_vss_tpu.models.bulk import bulk_build

            if on_progress is not None:
                on_progress(0.0)
            _mark("pre_bulk")
            bstats: dict = {}
            from duckdb_vss_tpu.models.bulk import KNN_K as _KNN_K

            # DVT_BUILD_KNN_K trims the candidate-list width (the [cap, K]
            # knn tables are the bulk build's largest temporaries — at 10M
            # rows K=48 costs 4.8 GB; K=32 is the config-5 memory plan)
            knn_k = int(_os2.environ.get("DVT_BUILD_KNN_K", _KNN_K))
            self.graph = bulk_build(
                self.store._vectors, self.store._vec_sq,
                np.asarray(slots, np.int32), levels, self.config,
                self.metric, knn_k=knn_k, host_vectors=vectors,
                stats_out=bstats)
            _mark("bulk_build")
            # actual work done (IVF-pruned sweeps do ~1/30 of the exact
            # n*capacity cost the round-1 estimate claimed)
            self.build_distance_count += bstats.get(
                "n_distances", n * self.store.capacity)
            self.is_dirty = True
            self._nbr_cache = None  # whole graph replaced
            if on_progress is not None:
                on_progress(1.0)
            return slots

        bb = self.build_batch
        cfg = self.config
        nd_total = jnp.int32(0)
        # fused incremental path: when the int8 neighborhood layout is
        # active (budget-gated, TPU), each batch's base-layer candidate
        # search runs through it — the same contiguous-tile + int8-MXU
        # economics that carry search — and the batch then refreshes
        # only its changed rows (<= B*(M0+1)) in the table
        # (graph.update_neighborhood_rows). Falls back to per-candidate
        # store gathers when the layout is off (CPU, over budget,
        # DVT_LAYOUT=flat).
        nv, nsc, nsq, nmeta = self._neighborhood_tables()
        use_nbr = nv is not None
        # step caps for the construction beams: the batched while-loop
        # steps until EVERY row converges, so uncapped (3*ef_c//expand+8
        # = 104 at the defaults) one straggler row bills the whole batch
        # (measured: the cap is the single biggest insert-throughput
        # lever — benchmarks/insert_steps_sweep.py)
        msb = self.build_max_steps
        if msb is None:
            msb = _default_build_steps(cfg.ef_construction,
                                       self.build_expand)
        msb = None if not msb else int(msb)
        # upper levels are tiny + expand=1; their beams only wire upper
        # edges (base-layer seeding is carried by mxu_descent's exact
        # coarse routing), so the cap can sit low
        msu = (int(_os2.environ.get("DVT_BUILD_MAX_STEPS_UPPER", "16"))
               if msb else None)
        msu = msu or None
        # the loop below donates these arrays into their own updates;
        # drop the cache reference now so a mid-loop failure can't leave
        # it pointing at donated (deleted) buffers
        self._nbr_cache = None
        from duckdb_vss_tpu.models.graph import update_neighborhood_rows

        # ONE H2D transfer for every batch's slots + levels, sliced on
        # device per step. Per-batch jnp.asarray uploads cost a tunnel
        # round trip EACH and sat on the host critical path: measured
        # (insert_steps_sweep + device_time profile), the host side ran
        # ~250 ms/batch while the capped program takes ~200-265 ms, so
        # host overhead — not the device program — bounded e2e insert
        # throughput once the step caps landed.
        n_steps = (n + bb - 1) // bb
        all_slots = np.full((n_steps, bb), -1, np.int32)
        all_levels = np.zeros((n_steps, bb), np.int32)
        for i in range(n_steps):
            chunk = slots[i * bb : (i + 1) * bb]
            all_slots[i, : len(chunk)] = chunk
            all_levels[i, : len(chunk)] = levels[i * bb : (i + 1) * bb]
        all_slots_j = jnp.asarray(all_slots)
        all_levels_j = jnp.asarray(all_levels)
        nds = []
        for i in range(n_steps):
            slots_j = all_slots_j[i]
            self.graph, nd = insert_batch(
                self.graph,
                self.store._vectors,
                self.store._vec_sq,
                slots_j,
                all_levels_j[i],
                cfg.metric,
                cfg.m,
                cfg.m0,
                cfg.ef_construction,
                expand=self.build_expand,
                prune=self.build_prune,
                backlink_cols=self.build_backlink_cols,
                r_rounds=self.build_r_rounds,
                max_steps_base=msb, max_steps_upper=msu,
                nbr_vecs=nv, nbr_scale=nsc, nbr_sq=nsq,
            )
            if use_nbr:
                nv, nsc, nsq, nmeta = update_neighborhood_rows(
                    nv, nsc, nsq, nmeta, self.store._vectors,
                    self.store._vec_sq, self.graph.neighbors0, slots_j)
            nds.append(nd)
            if on_progress is not None:
                on_progress(min(1.0, (i + 1) * bb / max(n, 1)))
        if use_nbr:
            self._nbr_cache = (nv, nsc, nsq, nmeta)
        # one scalar fetch for the whole add (a per-batch accumulate
        # added one more tiny dispatch per step)
        if nds:
            nd_total = nd_total + jnp.sum(jnp.stack(nds))
        self.build_distance_count += int(jax.device_get(nd_total))
        self.is_dirty = True
        return slots

    # ------------------------------------------------------------------
    def remove(self, keys) -> int:
        """Tombstone delete (hnsw_index.cpp:466-482 -> index_dense
        remove(), edges remain; search filters)."""
        self._ensure_loaded()
        n = self.store.remove(keys)
        if n:
            self.is_dirty = True
        return n

    # ------------------------------------------------------------------
    def isolate(self) -> None:
        """Drop every edge pointing INTO a tombstoned node; tombstoned
        nodes keep their outgoing edges (usearch isolate(),
        index.hpp:3109-3146; index_dense.hpp:1447-1459). The reference
        runs this as a parallel sweep over all neighbor lists — here it
        is one masked gather + stable repack over the whole adjacency."""
        self._ensure_loaded()
        nb0, un = _isolate_jit(self.graph.neighbors0,
                               self.graph.upper_neighbors,
                               self.store._valid)
        self.graph = self.graph._replace(neighbors0=nb0,
                                         upper_neighbors=un)
        self._nbr_cache = None
        self.is_dirty = True

    # ------------------------------------------------------------------
    def search(
        self,
        queries: np.ndarray,
        k: int,
        ef: int | None = None,
        expand: int = 4,
        descent_ef: int = 48,
        n_seeds: int = 8,
        chunk: int = 8192,
        max_steps: int | None = None,
        loop: str = "while",
        hop_rerank: int | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """ANN top-k. ef defaults to config.ef_search and may be overridden
        per call (the hnsw_ef_search session setting,
        hnsw_index.cpp:288-299). Returns (scores, keys [B, k]).

        hop_rerank (default: the index's hop_rerank attribute, off) adds
        a one-hop exact rerank expansion at the finish — an opt-in that
        recovers rank-boundary misses at weak operating points; see the
        measured trade-off note at the attribute definition."""
        self._ensure_loaded()
        qarr = np.asarray(queries, np.float32)
        if qarr.ndim == 1:
            qarr = qarr[None, :]
        b = qarr.shape[0]
        ef_eff = max(int(ef or self.config.ef_search), k)
        # bucket ef to limit distinct compiled programs
        ef_eff = round_up(ef_eff, 16)
        hop = self.hop_rerank if hop_rerank is None else int(hop_rerank)
        hop = min(hop, k)
        # big chunks amortize the per-dispatch round trip (measured:
        # chunk 8192 nearly doubles 1M-scale QPS over 2048); larger
        # requests are chunked host-side (dispatches overlap; one D2H
        # per chunk). The NEXT chunk's upload is prefetched on a helper
        # thread while this chunk dispatches: the tunnel serializes
        # upload -> dispatch -> fetch (H2D_OVERLAP.json: e2e exceeded
        # even upload+compute), so overlapping the upload against the
        # previous chunk's device program reclaims up to one chunk's
        # compute time per batch (round-4 verdict item 8).
        import concurrent.futures as _cf
        import os as _os3

        offs = list(range(0, b, chunk))

        def _prep(off):
            return self.store.prepare_queries(
                qarr[off : off + chunk],
                transfer_dtype=self.query_transfer_dtype)

        prefetch = (_os3.environ.get("DVT_PREFETCH_H2D", "1") == "1"
                    and len(offs) > 1)
        ex = fut = None
        if prefetch:
            ex = _cf.ThreadPoolExecutor(max_workers=1)
            fut = ex.submit(_prep, offs[0])
        outs = []
        for i_off, off in enumerate(offs):
            q = fut.result() if prefetch else _prep(off)
            if prefetch and i_off + 1 < len(offs):
                fut = ex.submit(_prep, offs[i_off + 1])
            uv, uvsq, unode = (self._upper_vectors()
                               if self.descent == "mxu"
                               else (None, None, None))
            nv, nscale, nsq, nmeta = self._neighborhood_tables()
            # with the neighborhood layout the base beam reads nv/nsq;
            # a separate traversal copy is only needed for beam descent
            want_trav = (self.descent == "beam"
                         or (nv is None and not self.use_aug))
            outs.append((_hnsw_search_jit(
                self.graph, self.store._vectors, self.store._vec_sq,
                self.store._valid, q, int(k), ef_eff, self.metric, expand,
                self.use_pallas, descent_ef, n_seeds, loop, max_steps,
                traversal_vectors=(self._traversal_vectors()
                                   if want_trav else None),
                descent=self.descent, upper_vecs=uv, upper_vec_sq=uvsq,
                aug_table=(None if nv is not None else self._aug_table()),
                nbr_vecs=nv, nbr_scale=nscale, nbr_sq=nsq, nbr_meta=nmeta,
                pallas_beam=self.use_pallas_beam and nv is not None,
                upper_nodes=unode, hop_rerank=hop),
                min(chunk, b - off)))
        if ex is not None:
            ex.shutdown(wait=False)
        # one device_get for every chunk's results (a fetch per chunk
        # costs a full tunnel round trip each)
        fetched = jax.device_get([o for o, _ in outs])
        scores_list, keys_list, nd_total = [], [], 0
        for (scores_np, slots_np, nd_np), (_, nb) in zip(fetched, outs):
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
                      ef: int | None = None, expand: int = 4,
                      max_steps: int | None = None, n_seeds: int = 8,
                      hop_rerank: int | None = None):
        """Device-resident search: returns (scores, slots, n_dist)."""
        self._ensure_loaded()
        hop = min(self.hop_rerank if hop_rerank is None
                  else int(hop_rerank), k)
        ef_eff = round_up(max(int(ef or self.config.ef_search), k), 16)
        uv, uvsq, unode = (self._upper_vectors()
                           if self.descent == "mxu"
                           else (None, None, None))
        nv, nscale, nsq, nmeta = self._neighborhood_tables()
        want_trav = (self.descent == "beam"
                     or (nv is None and not self.use_aug))
        return _hnsw_search_jit(
            self.graph, self.store._vectors, self.store._vec_sq,
            self.store._valid, queries_padded, int(k), ef_eff, self.metric,
            expand, max_steps=max_steps, n_seeds=n_seeds,
            traversal_vectors=(self._traversal_vectors()
                               if want_trav else None),
            descent=self.descent, upper_vecs=uv, upper_vec_sq=uvsq,
            aug_table=(None if nv is not None else self._aug_table()),
            nbr_vecs=nv, nbr_scale=nscale, nbr_sq=nsq, nbr_meta=nmeta,
            pallas_beam=self.use_pallas_beam and nv is not None,
            upper_nodes=unode, hop_rerank=hop)

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
        self._ensure_loaded()
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
        self._trav_cache = None
        self._aug_cache = None
        self._nbr_cache = None
        self._upper_cache = None
        self.is_dirty = True

    # ------------------------------------------------------------------
    def stats(self) -> dict:
        """Per-level stats (pragma_hnsw_index_info analog,
        /root/reference/src/hnsw/hnsw_index_pragmas.cpp:22-148)."""
        self._ensure_loaded()
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
            un2 = np.asarray(self.graph.upper_neighbors)
            un = un2.reshape(un2.shape[0], L_MAX, -1)
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
        self._ensure_loaded()
        return self.store.get_vector(key)

    def distance_between(self, key_a: int, key_b: int) -> float:
        """Index-metric distance between two members."""
        self._ensure_loaded()
        from duckdb_vss_tpu.ops.distance import pair_scores

        a = self.store.get_vector(key_a)[None, :]
        b = self.store.get_vector(key_b)[None, :]
        return float(np.asarray(pair_scores(a, b, self.metric))[0])

    def export_keys(self) -> np.ndarray:
        """All live member keys (export_keys analog)."""
        keys = self.store._keys
        return keys[keys >= 0].copy()

    # ------------------------------------------------------------------
    def cluster(self, queries: np.ndarray, level: int = 1,
                chunk: int = 1024) -> tuple[np.ndarray, np.ndarray]:
        """Nearest cluster head per query at an upper graph level.

        usearch's k-level clustering (index_dense.hpp:1550+ cluster())
        routes a vector down the hierarchy and reports the closest node
        at the requested level — upper-layer nodes act as cluster heads.
        level is clamped to [1, max_level]; an index with no upper
        layers clusters everything to the entry node. Returns
        (keys [B], scores [B]).
        """
        self._ensure_loaded()
        qarr = np.asarray(queries, np.float32)
        if qarr.ndim == 1:
            qarr = qarr[None, :]
        b = qarr.shape[0]
        max_level = int(jax.device_get(self.graph.max_level))
        lvl = int(np.clip(level, 1, max(max_level, 1)))
        keys_out = np.empty((b,), np.int64)
        scores_out = np.empty((b,), np.float32)
        nd_total = 0
        for off in range(0, b, chunk):
            q = self.store.prepare_queries(qarr[off : off + chunk])
            nodes, scores, nd = _cluster_jit(
                self.graph, self.store._vectors, self.store._vec_sq, q,
                lvl, self.metric)
            nodes_np, scores_np, nd_np = jax.device_get((nodes, scores, nd))
            nb = min(chunk, b - off)
            nodes_np = nodes_np[:nb]
            keys_out[off : off + nb] = np.where(
                nodes_np >= 0, self.store._keys[np.maximum(nodes_np, 0)],
                np.int64(-1))
            scores_out[off : off + nb] = scores_np[:nb]
            nd_total += int(nd_np)
        self.search_distance_count += nd_total
        return keys_out, scores_out

    def join(self, other: "HNSWIndex", k: int = 16,
             ef: int | None = None) -> dict[int, int]:
        """Stable-marriage semantic join against another index.

        Parity with usearch's join() (index_dense.hpp:1498-1522, the
        stable-marriage solver in index.hpp join_gt; unused by the
        reference extension but part of the index surface). Members of
        ``self`` propose to their nearest neighbors in ``other``;
        Gale-Shapley over ANN preference lists of width k yields a
        stable matching. Members whose preference list is exhausted stay
        unmatched (absent from the result), matching usearch's bounded-
        effort semantics. Returns {self_key: other_key}.
        """
        self._ensure_loaded()
        if self.metric != other.metric or self.dims != other.dims:
            raise ValueError("join requires matching metric and dims")
        men_keys = self.export_keys()
        if len(men_keys) == 0 or len(other) == 0:
            return {}
        k_eff = min(int(k), len(other))
        vecs = np.stack([self.store.get_vector(int(kk)) for kk in men_keys])
        # preference lists: ANN top-k of each proposer in `other`
        pref_scores, pref_keys = other.search(vecs, k_eff, ef=ef)

        # Gale-Shapley (host; matching is not a hot path). Distance is
        # symmetric for all three metrics, so the woman's ranking of a
        # proposal is the same score the proposer computed.
        next_choice = np.zeros(len(men_keys), np.int64)
        engaged_to: dict[int, int] = {}  # other_key -> man index
        engaged_score: dict[int, float] = {}
        free = list(range(len(men_keys)))
        while free:
            m = free.pop()
            while next_choice[m] < k_eff:
                c = int(next_choice[m])
                next_choice[m] += 1
                w = int(pref_keys[m, c])
                s = float(pref_scores[m, c])
                if w < 0:
                    continue
                if w not in engaged_to:
                    engaged_to[w] = m
                    engaged_score[w] = s
                    break
                if s < engaged_score[w]:
                    loser = engaged_to[w]
                    engaged_to[w] = m
                    engaged_score[w] = s
                    free.append(loser)
                    break
                # else: rejected, try next preference
        return {int(men_keys[m]): w for w, m in engaged_to.items()}
