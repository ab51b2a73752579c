"""Multi-controller worker for tests/test_multiprocess.py.

Runs the FULL ShardedHNSWIndex lifecycle (SPMD bulk build, search with
recall check, incremental insert, delete, compact, save/load round
trip) as ONE process of a real `jax.distributed` group over CPU
devices. Every process executes identical host code (multi-controller
SPMD: host metadata — keys, placement, free lists — is replicated;
device data is sharded); at the end each process writes its results to
a file so the parent test can assert cross-process lockstep.

The reference is single-process (SURVEY §2.4); this exercises the
BASELINE config-5 multi-host claim with >=2 real processes, which the
round-4 verdict flagged as the one untested distributed path.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=K \
  python multiproc_worker.py <pid> <nproc> <port> <outdir>
"""

import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")  # sitecustomize forces axon


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    outdir = sys.argv[4]
    jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=nproc,
                               process_id=pid)
    assert jax.process_count() == nproc

    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from duckdb_vss_tpu.parallel.sharded import (
        ShardedHNSWIndex, make_mesh)
    from duckdb_vss_tpu.utils.config import HNSWConfig

    mesh = make_mesh()  # one shard per global device, n_q=1
    s = mesh.shape["shard"]
    assert not all(d.process_index == pid for d in mesh.devices.flat), \
        "mesh must span processes"

    rng = np.random.default_rng(42)  # identical stream on every process
    n, d, k = 8192, 32, 10
    v = rng.normal(size=(n, d)).astype(np.float32)
    keys = np.arange(n, dtype=np.int64)
    res = {}

    idx = ShardedHNSWIndex(d, HNSWConfig(), mesh,
                           capacity_per_shard=2 * n // s,
                           build_batch=256)
    idx.add(v, keys)  # >= 4096 rows into empty graphs -> SPMD bulk path

    # self-recall + true recall vs host brute force
    q = v[:256] + 1e-3 * rng.normal(size=(256, d)).astype(np.float32)
    v2 = (v * v).sum(1)
    gt = np.argsort(v2[None, :] - 2.0 * (q @ v.T), 1)[:, :k]
    scores, got = idx.search(q, k, ef=48)
    res["bulk_recall"] = float(np.mean(
        [len(set(a) & set(b)) / k for a, b in zip(got.tolist(),
                                                  gt.tolist())]))
    res["bulk_self"] = float((got[:, 0] == np.arange(256)).mean())

    # incremental insert into the built graphs
    extra = rng.normal(size=(128, d)).astype(np.float32)
    ek = np.arange(100_000, 100_128)
    idx.add(extra, ek)
    _, got_e = idx.search(extra[:64], 1, ef=64)
    res["insert_found"] = float((got_e[:, 0] >= 100_000).mean())

    # delete + tombstone filtering
    idx.remove(keys[:64])
    _, got_d = idx.search(v[:64], 5, ef=64)
    res["deleted_leaked"] = int(
        len(set(got_d.ravel().tolist()) & set(range(64))))

    # compact, then the same queries must still resolve
    idx.compact()
    _, got_c = idx.search(q, k, ef=48)
    res["post_compact_recall"] = float(np.mean(
        [len(set(a) & set(b)) / k for a, b in zip(got_c.tolist(),
                                                  gt.tolist())]))

    # save -> load -> exact search parity
    path = os.path.join(outdir, "mp_index.vss")
    idx.save(path)
    idx2 = ShardedHNSWIndex.load(path, mesh)
    s1, g1 = idx.search(q[:64], k, ef=48)
    s2, g2 = idx2.search(q[:64], k, ef=48)
    res["roundtrip_ids_equal"] = bool((g1 == g2).all())
    res["roundtrip_scores_equal"] = bool(
        np.allclose(s1, s2, rtol=0, atol=0))
    res["count"] = len(idx)
    res["n_shards"] = s
    res["process_count"] = jax.process_count()
    # full result digest for cross-process lockstep assertion
    res["digest"] = int(np.uint64(np.abs(g1).sum()) % np.uint64(1 << 31))

    with open(os.path.join(outdir, f"result_p{pid}.json"), "w") as f:
        json.dump(res, f)
    print(f"[p{pid}] {json.dumps(res)}", flush=True)
    assert res["bulk_recall"] >= 0.90, res
    assert res["bulk_self"] >= 0.95, res
    assert res["insert_found"] >= 0.9, res
    assert res["deleted_leaked"] == 0, res
    assert res["post_compact_recall"] >= 0.90, res
    assert res["roundtrip_ids_equal"] and res["roundtrip_scores_equal"], res
    print(f"[p{pid}] MULTIPROC OK", flush=True)


if __name__ == "__main__":
    main()
