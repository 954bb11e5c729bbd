"""Weak-scaling harness: edges/s for distributed SpMM and BFS at 1..D
shards (BASELINE.json north_star: >=80% weak-scaling efficiency on edges/s
from 1 to N hosts).

On real multi-chip hardware this measures ICI scaling; in this environment
it runs on virtual CPU devices (mechanism + numbers recorded for the
harness, not hardware claims).  Usage:

    JAX_PLATFORMS=cpu python bench_scaling.py [max_devices] [scale]
"""

from __future__ import annotations

import json
import sys



def _enable_compile_cache():
    """Persistent compilation cache: remote compiles cost minutes; cached
    executables survive across runs on this machine."""
    import os

    import jax

    d = os.environ.get(
        "MINI_TPU_JAX_CACHE", os.path.expanduser("~/.cache/mini_tpu_jax")
    )
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

def main():
    _enable_compile_cache()
    import os

    import jax

    # the axon sitecustomize exports JAX_PLATFORMS=axon; this harness needs
    # a multi-device mesh, so force the CPU backend via config unless the
    # caller explicitly wants real devices
    if os.environ.get("MINI_TPU_SCALING_BACKEND", "cpu") == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from mini_tpu.graph import rmat
    from mini_tpu.parallel import partition_graph, shard_to_mesh, dist_spmm
    from mini_tpu.utils.timing import time_fn

    max_d = int(sys.argv[1]) if len(sys.argv) > 1 else len(jax.devices())
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    F = 64
    results = {"backend": jax.default_backend(), "F": F}
    rows = []
    base_rate = None
    for d in [x for x in (1, 2, 4, 8) if x <= max_d]:
        # weak scaling: problem grows with d (constant work per shard)
        hg = rmat(scale, edge_factor=8 * d, seed=0, undirected=True)
        mesh = Mesh(np.array(jax.devices()[:d]), ("graph",))
        pg = partition_graph(hg, d)
        shards = shard_to_mesh(pg, mesh)
        rng = np.random.RandomState(0)
        x = jnp.asarray(
            rng.rand(pg.num_shards, pg.n_loc, F).astype(np.float32)
        )
        x = jax.device_put(x, NamedSharding(mesh, P("graph")))
        t = time_fn(lambda: dist_spmm(pg, shards, x, mesh), warmup=1,
                    repeat=3)
        rate = hg.m / t.min_s
        if base_rate is None:
            base_rate = rate / d * 1  # per-shard baseline at d=1
        eff = rate / (base_rate * d)
        rows.append(
            {
                "devices": d,
                "m": hg.m,
                "time_ms": t.min_s * 1e3,
                "edges_per_s": rate,
                "weak_scaling_eff": eff,
            }
        )
        print(
            f"d={d} m={hg.m} {t.min_s*1e3:.2f} ms "
            f"{rate:.3e} edges/s eff={eff:.2f}",
            file=sys.stderr,
            flush=True,
        )
    results["spmm_weak_scaling"] = rows
    with open("BENCH_SCALING.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({"metric": "spmm_weak_scaling_eff",
                      "value": rows[-1]["weak_scaling_eff"],
                      "unit": "fraction",
                      "devices": rows[-1]["devices"]}))


if __name__ == "__main__":
    main()
