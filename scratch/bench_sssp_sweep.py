"""Sweep the SSSP incremental-sync capacity on weighted RMAT graphs.

sync_cape=0 reproduces the round-3 dense behavior (full payload sort
every dense round); m/8 was the first round-4 guess (measured LOSS on
weighted graphs); m/32 and m/64 probe the crossover.
"""

import os
import sys

import numpy as np
import jax

d = os.path.expanduser("~/.cache/mini_tpu_jax")
os.makedirs(d, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", d)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from mini_tpu.graph import rmat, GraphSlice
from mini_tpu.algorithms import sssp
from mini_tpu.utils.timing import time_fn

scales = [int(a) for a in sys.argv[1:]] or [16, 19]
for scale in scales:
    hg = rmat(scale, edge_factor=16, seed=0, undirected=True,
              weighted=True)
    gs = GraphSlice.from_host(hg)
    src = int(np.argmax(hg.out_degrees))
    for div, label in ((0, "off(r3)"), (8, "m/8"), (32, "m/32"),
                       (64, "m/64")):
        cap = 0 if div == 0 else max(4096, gs.m_pad // div)
        res = sssp(gs, src, sync_cape=cap)
        res.dists.block_until_ready()
        np.asarray(res.dists[:1])
        reached = np.isfinite(np.asarray(res.dists))[: hg.n]
        edges = float(hg.out_degrees[reached].sum())
        t = time_fn(lambda: sssp(gs, src, sync_cape=cap), warmup=1,
                    repeat=3)
        print(
            f"s{scale} sync={label:8s}: {t.min_s*1e3:7.1f} ms "
            f"{edges/t.min_s/1e6:6.1f} MTEPS "
            f"({int(res.num_iterations)} rounds, "
            f"{int(res.num_sparse_iterations)} sparse)",
            flush=True,
        )

# bfs_batch via the library API (now includes predecessor reconstruction)
from mini_tpu.algorithms import bfs, bfs_batch

hg = rmat(16, edge_factor=16, seed=0, undirected=True, weighted=True)
gs = GraphSlice.from_host(hg)
srcs_np = np.argsort(hg.out_degrees)[-8:].astype(np.int32)
edges_r = 0.0
for s_i in srcs_np:
    lab = np.asarray(bfs(gs, int(s_i)).labels)[: hg.n]
    edges_r += float(hg.out_degrees[lab >= 0].sum())
import jax.numpy as jnp
srcs_d = jnp.asarray(srcs_np)
r = bfs_batch(gs, srcs_d)
r.labels.block_until_ready(); np.asarray(r.labels[0, :1])
t = time_fn(lambda: bfs_batch(gs, srcs_d), warmup=1, repeat=3)
print(f"bfs_batch(8) library API: {t.min_s/8*1e3:.1f} ms/src, "
      f"{edges_r/t.min_s/1e6:.1f} MTEPS amortized (incl preds)",
      flush=True)
