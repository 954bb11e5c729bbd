"""Delta-stepping vs frontier Bellman-Ford across graph families (v5e).

Round 5 (VERDICT #2): the variant was kept for high-diameter weighted
graphs; this sweep measures it on that target family — weighted grid2d
and delaunay at ~2M/8M edges (hundreds of Bellman rounds) — alongside
the uniform-weight RMAT family where it measurably loses, sweeping the
bucket width around the mean-edge-weight default.

Usage: python scratch/bench_sssp_delta.py [family scale]...
  families: rmat (scale = log2 n, ef16), grid (scale = side, n=side^2),
  delaunay (scale = log2 points).  Default: the round-5 record set.
"""

import os
import sys

import numpy as np
import jax

d = os.path.expanduser("~/.cache/mini_tpu_jax")
os.makedirs(d, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", d)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from mini_tpu.graph import rmat, grid2d, delaunay, GraphSlice
from mini_tpu.algorithms import sssp
from mini_tpu.algorithms.sssp import _default_delta, _auto_variant
from mini_tpu.utils.timing import time_fn


def load(family: str, scale: int):
    if family == "rmat":
        return rmat(scale, edge_factor=16, seed=0, undirected=True,
                    weighted=True)
    if family == "grid":
        return grid2d(scale, scale, seed=0, weighted=True)
    if family == "delaunay":
        return delaunay(scale, seed=0, weighted=True)
    raise SystemExit(f"unknown family {family}")


args = sys.argv[1:]
jobs = []
while args:
    jobs.append((args[0], int(args[1])))
    args = args[2:]
if not jobs:
    # ~2M and ~8M edge instances per family
    jobs = [("grid", 724), ("grid", 1448), ("delaunay", 18),
            ("delaunay", 20), ("rmat", 16)]

for family, scale in jobs:
    hg = load(family, scale)
    gs = GraphSlice.from_host(hg)
    src = int(np.argmax(hg.out_degrees))
    d0 = _default_delta(gs)
    print(f"## {family} s={scale}: n={hg.n} m={hg.m} "
          f"mean_deg={hg.m/hg.n:.1f} default_delta={d0:.3f} "
          f"auto={_auto_variant(gs)}", flush=True)
    base = None
    runs = [("bellman", None)]
    runs += [("delta", d0 * f) for f in (0.25, 1.0, 4.0, 16.0)]
    for variant, dlt in runs:
        res = sssp(gs, src, variant=variant, delta=dlt,
                   with_preds=False)
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
        t = time_fn(lambda: sssp(gs, src, variant=variant, delta=dlt,
                                 with_preds=False),
                    warmup=1, repeat=3)
        dls = "None" if dlt is None else f"{dlt:.2f}"
        print(
            f"{family} s{scale} {variant:8s} d={dls:>7s}: "
            f"{t.min_s*1e3:8.1f} ms {edges/t.min_s/1e6:6.1f} MTEPS "
            f"({int(res.num_iterations)} rounds, "
            f"{int(res.num_sparse_iterations)} sparse)",
            flush=True,
        )
