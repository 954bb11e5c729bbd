"""Round-5: what does ONE traversal round cost on a high-diameter graph?

grid 724 SSSP rounds measure ~7-10 ms each (bench_sssp_delta) — ~10x the
op-level cost model (sparse tier ops are O(n + cap)).  Isolate the
per-round fixed term by timing max_iter=K for increasing K and
differencing.  Also isolates which phase via variants: full step vs
tier-select-only.
"""
import os, sys, time
import numpy as np
import jax, jax.numpy as jnp

d = os.path.expanduser("~/.cache/mini_tpu_jax")
os.makedirs(d, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", d)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from mini_tpu.graph import grid2d, GraphSlice
from mini_tpu.algorithms import sssp
from mini_tpu.utils.timing import time_fn

SIDE = int(sys.argv[1]) if len(sys.argv) > 1 else 724
hg = grid2d(SIDE, SIDE, seed=0, weighted=True)
gs = GraphSlice.from_host(hg)
print(f"grid {SIDE}: n={hg.n} m={hg.m} n_pad={gs.n_pad} m_pad={gs.m_pad}",
      flush=True)

prev_t, prev_k = 0.0, 0
for K in (100, 300, 500):
    r = sssp(gs, 0, max_iter=K, with_preds=False)
    r.dists.block_until_ready(); np.asarray(r.dists[:1])
    t = time_fn(lambda: sssp(gs, 0, max_iter=K, with_preds=False),
                warmup=1, repeat=2)
    dt = (t.min_s - prev_t) / (K - prev_k)
    print(f"max_iter={K}: {t.min_s*1e3:9.1f} ms  "
          f"({int(r.num_iterations)} it, {int(r.num_sparse_iterations)} "
          f"sparse)  marginal {dt*1e3:.2f} ms/round", flush=True)
    prev_t, prev_k = t.min_s, K
