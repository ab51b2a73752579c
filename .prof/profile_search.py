"""Profile 1M search: phase split + knob sweep. Saves index to .prof/idx1m."""
import os, sys, time, json
sys.path.insert(0, "/root/repo")
import numpy as np
import jax

from duckdb_vss_tpu import HNSWConfig
from duckdb_vss_tpu.models.hnsw import HNSWIndex

N = int(os.environ.get("PROF_N", 1_000_000))
D = 128
NQ = 2048
rng = np.random.default_rng(11)

def make_data(n, d, n_centers=4096, sigma=0.25, chunk=200_000):
    centers = rng.normal(size=(n_centers, d)).astype(np.float32)
    out = np.empty((n, d), np.float32)
    for off in range(0, n, chunk):
        m = min(chunk, n - off)
        asg = rng.integers(0, n_centers, m)
        out[off:off+m] = centers[asg] + sigma*rng.normal(size=(m,d)).astype(np.float32)
    return out

V = make_data(N, D)
Q = make_data(NQ, D)

idx_path = "/root/repo/.prof/idx1m"
t0 = time.time()
idx = HNSWIndex(D, HNSWConfig(), capacity=N)
from duckdb_vss_tpu.utils import persist
if os.path.exists(idx_path + ".vss"):
    idx = persist.load_index(idx_path + ".vss")
    print("loaded index in", time.time()-t0, flush=True)
else:
    idx.add(V, np.arange(N))
    print("built index in", time.time()-t0, flush=True)
    persist.save_index(idx, idx_path + ".vss")
    print("saved", flush=True)

# ground truth on a subset
NGT = 512
gt_d = None
gtq = Q[:NGT]
d2 = np.empty((NGT, N), np.float32)
for off in range(0, N, 100_000):
    blk = V[off:off+100_000]
    d2[:, off:off+blk.shape[0]] = ((gtq[:,None,:]-blk[None,:,:])**2).sum(-1)
gt = np.argsort(d2, axis=1)[:, :10]
del d2

def bench(tag, **kw):
    # warm
    s, keys = idx.search(Q, 10, **kw)
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        s, keys = idx.search(Q, 10, **kw)
    dt = (time.time()-t0)/reps
    rec = np.mean([len(set(keys[i,:10].tolist()) & set(gt[i].tolist()))/10
                   for i in range(NGT)])
    print(f"{tag:50s} qps={NQ/dt:9.0f} recall@10={rec:.4f} t={dt*1e3:7.1f}ms", flush=True)
    return NQ/dt, rec

bench("default ef16 expand4 chunk1024", ef=16)
bench("ef16 expand4 chunk2048", ef=16, chunk=2048)
bench("ef16 expand8 chunk2048", ef=16, expand=8, chunk=2048)
bench("ef16 expand4 chunk2048 scan", ef=16, chunk=2048, loop="scan")
bench("ef12 expand4 chunk2048", ef=12, chunk=2048)
bench("ef16 expand4 n_seeds4 chunk2048", ef=16, n_seeds=4, chunk=2048)
bench("ef24 expand4 chunk2048", ef=24, chunk=2048)
bench("ef16 expand16 maxsteps8 chunk2048", ef=16, expand=16, max_steps=8, chunk=2048)
