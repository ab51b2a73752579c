"""Config-5 shape validation on the virtual 8-device mesh: a d=96
sharded build + merged search at small n (the '8-way dryrun at the
Deep10M shape'; the full-scale single-chip run is benchmarks/deep10m.py)."""

import numpy as np

from duckdb_vss_tpu import HNSWConfig
from duckdb_vss_tpu.parallel.sharded import ShardedHNSWIndex, make_mesh


def test_deep_shape_8way(rng):
    mesh = make_mesh(n_shards=8)
    n, d, k = 2048, 96, 10
    centers = rng.normal(size=(32, d)).astype(np.float32)
    vecs = (centers[rng.integers(0, 32, n)]
            + 0.25 * rng.normal(size=(n, d)).astype(np.float32))
    keys = np.arange(n, dtype=np.int64)
    q = (centers[rng.integers(0, 32, 64)]
         + 0.25 * rng.normal(size=(64, d)).astype(np.float32))
    v2 = (vecs * vecs).sum(1)
    gt = np.argsort(v2[None, :] - 2.0 * (q @ vecs.T), 1)[:, :k]

    idx = ShardedHNSWIndex(d, HNSWConfig(), mesh,
                           capacity_per_shard=1024, build_batch=64)
    idx.add(vecs, keys)
    _, got = idx.search(q, k, ef=48)
    rec = sum(len(set(a) & set(b))
              for a, b in zip(got.tolist(), gt.tolist())) / gt.size
    assert rec > 0.85, rec
