"""Batched distance computation — the L0 kernel layer, MXU-shaped.

The reference computes one (query, neighbor) scalar distance per indirect
function call (/root/reference/src/include/usearch/index.hpp:3485,3560 via
metric_punned_t, index_plugins.hpp:1374-1376), with optional SIMD kernels
(simsimd, default OFF). On TPU the equivalent layer is batched: all three
metrics are expressed as a Q @ V^T matmul on the MXU plus a cheap epilogue
on the VPU, letting XLA fuse and tile.

Index metric semantics follow usearch (lower score = closer):
- l2sq:   sum((a-b)^2), no sqrt        (index_plugins.hpp:1033-1053)
- cos:    1 - <a,b>/(|a||b|), with zero-norm handling
          (both zero -> 0, one zero -> 1; index_plugins.hpp:1002-1027)
- ip:     1 - <a,b>                    (index_plugins.hpp:977-994)

SQL scalar-function semantics follow DuckDB's array functions (the host
engine's functions the extension matches by name,
/root/reference/src/hnsw/hnsw_index.cpp:632-662):
- array_distance                = sqrt(l2sq)   (Euclidean)
- array_cosine_distance         = 1 - cosine_similarity
- array_negative_inner_product  = -<a,b>
Orderings are identical to the index metrics, so index scans preserve exact
row order parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from duckdb_vss_tpu.utils.config import MetricKind

_EPS = 1e-30


def dot_scores(
    queries: jax.Array,
    vectors: jax.Array,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """[B, D] x [N, D] -> [B, N] inner products, f32 accumulate on MXU.

    Default HIGHEST precision: the TPU MXU's default f32 matmul is a
    bf16-decomposed pass, which breaks exact row-order parity with the
    reference's scalar f32 kernels. Search paths that trade exactness for
    throughput (HNSW traversal) pass precision=DEFAULT explicitly.

    Mixed dtypes (a bf16 scalar_kind store scored against f32 queries)
    run in the STORE's dtype: queries are cast down rather than the
    table up, so a lean store never materializes an f32 copy of itself.
    """
    if queries.dtype != vectors.dtype:
        queries = queries.astype(vectors.dtype)
    return jax.lax.dot_general(
        queries,
        vectors,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )


def sq_norms(x: jax.Array) -> jax.Array:
    """Row-wise squared L2 norms, f32."""
    x = x.astype(jnp.float32)
    return jnp.sum(x * x, axis=-1)


def score_matrix(
    queries: jax.Array,
    vectors: jax.Array,
    metric: MetricKind,
    vec_sq: jax.Array | None = None,
    query_sq: jax.Array | None = None,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """Pairwise index-metric scores [B, N]; lower = closer.

    ``vec_sq`` / ``query_sq`` are optional precomputed squared norms (the
    store caches vec_sq so steady-state search does one matmul + epilogue).
    """
    dot = dot_scores(queries, vectors, precision=precision)
    if metric == MetricKind.IP:
        return 1.0 - dot
    if vec_sq is None:
        vec_sq = sq_norms(vectors)
    if query_sq is None:
        query_sq = sq_norms(queries)
    if metric == MetricKind.L2SQ:
        # max(0, .) guards tiny negative values from the expansion identity.
        return jnp.maximum(query_sq[:, None] - 2.0 * dot + vec_sq[None, :], 0.0)
    if metric == MetricKind.COSINE:
        q_zero = query_sq[:, None] <= 0.0
        v_zero = vec_sq[None, :] <= 0.0
        denom = jnp.sqrt(query_sq[:, None] * vec_sq[None, :])
        cos = dot / jnp.maximum(denom, _EPS)
        score = 1.0 - cos
        # usearch zero-norm handling: both zero -> 0, exactly one zero -> 1.
        score = jnp.where(q_zero | v_zero, 1.0, score)
        score = jnp.where(q_zero & v_zero, 0.0, score)
        return score
    raise ValueError(f"unknown metric {metric}")


def pair_scores(a: jax.Array, b: jax.Array, metric: MetricKind) -> jax.Array:
    """Row-aligned index-metric scores: [B, D] x [B, D] -> [B]."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    dot = jnp.sum(a * b, axis=-1)
    if metric == MetricKind.IP:
        return 1.0 - dot
    if metric == MetricKind.L2SQ:
        d = a - b
        return jnp.sum(d * d, axis=-1)
    if metric == MetricKind.COSINE:
        a2 = jnp.sum(a * a, axis=-1)
        b2 = jnp.sum(b * b, axis=-1)
        a_zero = a2 <= 0.0
        b_zero = b2 <= 0.0
        cos = dot / jnp.maximum(jnp.sqrt(a2 * b2), _EPS)
        score = 1.0 - cos
        score = jnp.where(a_zero | b_zero, 1.0, score)
        score = jnp.where(a_zero & b_zero, 0.0, score)
        return score
    raise ValueError(f"unknown metric {metric}")


# ---------------------------------------------------------------------------
# DuckDB-compatible scalar functions (elementwise over row-aligned pairs).
# These are what projections in the SQL layer evaluate; the index metrics
# above are their order-preserving counterparts.
# ---------------------------------------------------------------------------


def array_distance(a: jax.Array, b: jax.Array) -> jax.Array:
    """Euclidean distance (with sqrt), row-aligned [.., D] -> [..]."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    d = a - b
    return jnp.sqrt(jnp.sum(d * d, axis=-1))


def array_inner_product(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.sum(a.astype(jnp.float32) * b.astype(jnp.float32), axis=-1)


def array_negative_inner_product(a: jax.Array, b: jax.Array) -> jax.Array:
    return -array_inner_product(a, b)


def array_cosine_similarity(a: jax.Array, b: jax.Array) -> jax.Array:
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    dot = jnp.sum(a * b, axis=-1)
    denom = jnp.sqrt(jnp.sum(a * a, axis=-1) * jnp.sum(b * b, axis=-1))
    return dot / jnp.maximum(denom, _EPS)


def array_cosine_distance(a: jax.Array, b: jax.Array) -> jax.Array:
    return 1.0 - array_cosine_similarity(a, b)


def array_value(*args) -> jax.Array:
    """DuckDB array_value(a, b, ...): stack scalars/columns into vectors."""
    arrs = [jnp.asarray(a, jnp.float32) for a in args]
    rank = max(a.ndim for a in arrs)
    if rank:
        n = next(a.shape[0] for a in arrs if a.ndim)
        arrs = [jnp.broadcast_to(a, (n,)) for a in arrs]
    return jnp.stack(arrs, axis=-1)


# Function name -> implementation, for the expression layer.
SCALAR_FUNCTIONS = {
    "array_distance": array_distance,
    "array_inner_product": array_inner_product,
    "array_negative_inner_product": array_negative_inner_product,
    "array_cosine_similarity": array_cosine_similarity,
    "array_cosine_distance": array_cosine_distance,
    "array_value": array_value,
}

# Metric-score -> SQL-function-value converters (for emitting the projected
# distance column directly from index scan scores without re-gathering).
def metric_score_to_function_value(score: jax.Array, metric: MetricKind) -> jax.Array:
    if metric == MetricKind.L2SQ:
        return jnp.sqrt(jnp.maximum(score, 0.0))  # array_distance
    if metric == MetricKind.COSINE:
        return score  # array_cosine_distance == cos metric score
    if metric == MetricKind.IP:
        return score - 1.0  # 1 - dot  ->  -dot
    raise ValueError(f"unknown metric {metric}")
