"""Weak-scaling harness: edges/s for distributed SpMM and BFS at 1..D
shards, all-gather vs boundary-only (HaloPlan) exchange (BASELINE.json
north_star: >=80% weak-scaling efficiency on edges/s from 1 to N hosts).

Methodology notes (read before quoting the numbers):

* Weak scaling grows the GRAPH with the shard count — rmat scale
  ``base + log2(d)`` at constant edge factor — so per-shard vertex/edge
  work is constant and the boundary fraction stays realistic (the earlier
  harness grew edge DENSITY on a fixed vertex set, which made every
  vertex a boundary vertex and the padding skew dominate).
* All timed programs are built ONCE per configuration (make_* factories)
  so repeats measure the program, not retracing.
* On this host the "devices" are XLA virtual CPU devices over
  ``nproc`` physical cores (2 here): collectives and shard-skew effects
  are real, but total compute is oversubscribed, so wall-clock
  efficiency at d > nproc is BOUNDED ABOVE by ~nproc/d regardless of the
  communication design (8x the work on the same two cores).  The round-2
  harness's "0.64 @ 8" was retracing overhead masquerading as scaling —
  with build-once programs the measured 0.10-0.18 @ 8 is exactly the
  oversubscription ceiling.  The honest, hardware-independent signals
  reported here are (a) the per-round wire-traffic columns (rows
  exchanged per device — halo vs all-gather) and (b) ``projected_ici_eff``:
  t_local / (t_local + t_comm) with t_local from the measured single-chip
  TPU SpMM rate and t_comm = halo bytes / ICI_GBPS, assumptions inline.

    JAX_PLATFORMS=cpu python bench_scaling.py [max_devices] [base_scale]
"""

from __future__ import annotations

import json
import sys


def _enable_compile_cache():
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

    if os.environ.get("MINI_TPU_SCALING_BACKEND", "cpu") == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from mini_tpu.graph import rmat
    from mini_tpu.parallel import (
        partition_graph,
        shard_to_mesh,
        build_halo_plan,
        make_dist_bfs,
        make_dist_spmm,
        make_halo_spmm,
    )
    from mini_tpu.utils.timing import time_fn

    max_d = int(sys.argv[1]) if len(sys.argv) > 1 else len(jax.devices())
    base_scale = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    F = 64
    results = {
        "backend": jax.default_backend(),
        "F": F,
        "physical_cores": os.cpu_count(),
        "rows": [],
    }
    base_rate: dict = {}

    for d in [x for x in (1, 2, 4, 8) if x <= max_d]:
        scale = base_scale + int(np.log2(d))
        hg = rmat(scale, edge_factor=16, seed=0, undirected=True)
        mesh = Mesh(np.array(jax.devices()[:d]), ("graph",))
        pg = partition_graph(hg, d)
        shards = shard_to_mesh(pg, mesh)
        plan = build_halo_plan(pg)
        rng = np.random.RandomState(0)
        x = jnp.asarray(
            rng.rand(pg.num_shards, pg.n_loc, F).astype(np.float32)
        )
        x = jax.device_put(x, NamedSharding(mesh, P("graph")))
        src = int(np.argmax(hg.out_degrees))

        # per-device rows exchanged per round (the hardware-independent
        # scaling signal): all-gather moves every remote shard's n_loc;
        # the halo exchange moves the (padded) boundary slabs
        wire = {
            "allgather_rows_per_dev": (d - 1) * pg.n_loc,
            "halo_rows_per_dev": (d - 1) * plan.halo_width,
            "boundary_rows_real": int(plan.boundary_rows),
        }
        # projected ICI weak-scaling efficiency for the halo SpMM on real
        # TPU v5e chips: t_local from the measured single-chip in-loop
        # SpMM rate (BENCH_SPMM.json, banded bf16 ~5.1 ns/edge @ F=128,
        # linear in F), t_comm = halo slab bytes over one ICI direction
        # at 45 GB/s effective.  Stated model, not a measurement.
        ns_per_edge = 5.1 * (F / 128)
        t_local_s = pg.m_loc * ns_per_edge * 1e-9
        t_comm_s = wire["halo_rows_per_dev"] * F * 4 / 45e9
        wire["projected_ici_eff"] = t_local_s / (t_local_s + t_comm_s)

        variants = [
            ("spmm_allgather",
             (lambda c: (lambda: c(shards, x)))(
                 make_dist_spmm(pg, mesh))),
            ("spmm_halo",
             (lambda c: (lambda: c(shards, x)))(
                 make_halo_spmm(pg, plan, mesh))),
            ("spmm_halo_overlap",
             (lambda c: (lambda: c(shards, x)))(
                 make_halo_spmm(pg, plan, mesh, overlap=True))),
            ("bfs_allgather",
             (lambda c: (lambda: c(shards, src)))(
                 make_dist_bfs(pg, mesh))),
            ("bfs_halo",
             (lambda c: (lambda: c(shards, src)))(
                 make_dist_bfs(pg, mesh, plan=plan))),
        ]
        for name, fn in variants:
            t = time_fn(fn, warmup=2, repeat=3)
            rate = hg.m / t.min_s
            if d == 1:
                base_rate[name] = rate
            eff = rate / (base_rate[name] * d)
            row = {
                "variant": name,
                "devices": d,
                "scale": scale,
                "m": hg.m,
                "time_ms": t.min_s * 1e3,
                "edges_per_s": rate,
                "weak_scaling_eff": eff,
                **wire,
            }
            results["rows"].append(row)
            print(
                f"d={d} {name}: {t.min_s*1e3:.2f} ms eff={eff:.2f} "
                f"(halo {wire['halo_rows_per_dev']} vs ag "
                f"{wire['allgather_rows_per_dev']} rows/dev)",
                file=sys.stderr, flush=True,
            )
            with open("BENCH_SCALING.json", "w") as f:
                json.dump(results, f, indent=2)

    last = [r for r in results["rows"] if r["devices"] == max(
        r2["devices"] for r2 in results["rows"])]
    best = max(last, key=lambda r: r["weak_scaling_eff"])
    print(json.dumps({
        "metric": "weak_scaling_eff",
        "value": round(best["weak_scaling_eff"], 3),
        "unit": "fraction",
        "devices": best["devices"],
        "variant": best["variant"],
    }))


if __name__ == "__main__":
    main()
