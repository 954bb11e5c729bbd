"""Delta-stepping vs frontier Bellman-Ford on weighted RMAT (v5e)."""

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

for scale in [int(a) for a in sys.argv[1:]] or (16, 18, 19):
    hg = rmat(scale, edge_factor=16, seed=0, undirected=True,
              weighted=True)
    gs = GraphSlice.from_host(hg)
    src = int(np.argmax(hg.out_degrees))
    base = None
    for variant, dlt in (("bellman", None), ("delta", None),
                         ("delta", 8.0), ("delta", 64.0)):
        res = sssp(gs, src, variant=variant, delta=dlt)
        res.dists.block_until_ready()
        np.asarray(res.dists[:1])
        if base is None:
            base = np.asarray(res.dists)
        else:
            assert np.array_equal(
                base, np.asarray(res.dists)
            ), "variant mismatch!"
        reached = np.isfinite(np.asarray(res.dists))[: hg.n]
        edges = float(hg.out_degrees[reached].sum())
        t = time_fn(lambda: sssp(gs, src, variant=variant, delta=dlt),
                    warmup=1, repeat=3)
        print(
            f"s{scale} {variant:8s} d={dlt}: {t.min_s*1e3:7.1f} ms "
            f"{edges/t.min_s/1e6:6.1f} MTEPS "
            f"({int(res.num_iterations)} rounds, "
            f"{int(res.num_sparse_iterations)} sparse)",
            flush=True,
        )
