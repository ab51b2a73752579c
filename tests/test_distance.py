"""Unit tests for the distance kernel layer (ops/distance.py).

Differential against numpy references with the exact usearch / DuckDB
semantics (metric_ip 1-dot, metric_cos zero-norm cases, array_distance
with sqrt).
"""

import numpy as np
import pytest

from duckdb_vss_tpu.ops import distance as D
from duckdb_vss_tpu.utils.config import MetricKind


def np_scores(q, v, metric):
    dot = q @ v.T
    if metric == MetricKind.IP:
        return 1.0 - dot
    if metric == MetricKind.L2SQ:
        return ((q[:, None, :] - v[None, :, :]) ** 2).sum(-1)
    q2 = (q * q).sum(-1)[:, None]
    v2 = (v * v).sum(-1)[None, :]
    with np.errstate(invalid="ignore", divide="ignore"):
        cos = dot / np.sqrt(q2 * v2)
    out = 1.0 - cos
    qz, vz = q2 <= 0, v2 <= 0
    out = np.where(qz | vz, 1.0, out)
    out = np.where(qz & vz, 0.0, out)
    return out


@pytest.mark.parametrize("metric", list(MetricKind))
def test_score_matrix_matches_numpy(rng, metric):
    q = rng.normal(size=(16, 64)).astype(np.float32)
    v = rng.normal(size=(128, 64)).astype(np.float32)
    got = np.asarray(D.score_matrix(q, v, metric))
    want = np_scores(q, v, metric)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("metric", list(MetricKind))
def test_pair_scores_diagonal(rng, metric):
    a = rng.normal(size=(32, 48)).astype(np.float32)
    b = rng.normal(size=(32, 48)).astype(np.float32)
    got = np.asarray(D.pair_scores(a, b, metric))
    want = np.diagonal(np_scores(a, b, metric))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_cosine_zero_norm_handling():
    # usearch: both zero -> 0, one zero -> 1 (index_plugins.hpp:1002-1027)
    z = np.zeros((1, 8), np.float32)
    x = np.ones((1, 8), np.float32)
    assert np.asarray(D.score_matrix(z, z, MetricKind.COSINE))[0, 0] == 0.0
    assert np.asarray(D.score_matrix(z, x, MetricKind.COSINE))[0, 0] == 1.0
    assert np.asarray(D.score_matrix(x, z, MetricKind.COSINE))[0, 0] == 1.0


def test_scalar_functions_duckdb_semantics(rng):
    a = rng.normal(size=(8, 32)).astype(np.float32)
    b = rng.normal(size=(8, 32)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(D.array_distance(a, b)),
        np.sqrt(((a - b) ** 2).sum(-1)), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(D.array_negative_inner_product(a, b)),
        -(a * b).sum(-1), rtol=1e-5)
    cos = (a * b).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))
    np.testing.assert_allclose(
        np.asarray(D.array_cosine_distance(a, b)), 1.0 - cos, rtol=1e-4,
        atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(D.array_cosine_similarity(a, b)), cos, rtol=1e-4,
        atol=1e-5)


@pytest.mark.parametrize("metric", list(MetricKind))
def test_score_to_function_value(rng, metric):
    q = rng.normal(size=(4, 16)).astype(np.float32)
    v = rng.normal(size=(8, 16)).astype(np.float32)
    score = D.score_matrix(q, v, metric)
    got = np.asarray(D.metric_score_to_function_value(score, metric))
    fn = {
        MetricKind.L2SQ: D.array_distance,
        MetricKind.COSINE: D.array_cosine_distance,
        MetricKind.IP: D.array_negative_inner_product,
    }[metric]
    want = np.stack(
        [np.asarray(fn(np.repeat(qi[None], 8, 0), v)) for qi in q])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_exact_topk_small_matches_lax_topk(rng):
    """The two-level tournament selection must be EXACT — identical
    scores to lax.top_k on adversarial inputs (duplicates, clustered
    bins, all-equal rows)."""
    import jax.numpy as jnp
    from jax import lax as _lax

    from duckdb_vss_tpu.ops.topk import exact_topk_small

    for b, n, k in ((64, 1024, 10), (16, 128, 5), (8, 2048, 32)):
        s = rng.normal(size=(b, n)).astype(np.float32)
        # adversarial rows: duplicates inside one bin, constants, and a
        # row where the global top-k all land in a single bin
        s[0] = 1.0
        s[1, :] = np.arange(n)[::-1]
        s[2, 5:15] = -100.0  # ten best all in bin 0
        if b > 3:
            s[3, ::128] = -50.0  # one best per bin
        got_s, got_i = exact_topk_small(jnp.asarray(s), k)
        neg, want_i = _lax.top_k(jnp.asarray(-s), k)
        np.testing.assert_allclose(np.asarray(got_s), -np.asarray(neg),
                                   rtol=0, atol=0)
        # ids must point at elements with those exact scores
        picked = np.take_along_axis(s, np.asarray(got_i), axis=1)
        np.testing.assert_allclose(picked, np.asarray(got_s), rtol=0,
                                   atol=0)
        # no duplicate ids per row
        ii = np.asarray(got_i)
        assert all(len(set(r.tolist())) == k for r in ii)
