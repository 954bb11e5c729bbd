"""Weak-scaling harness: edges/s for distributed SpMM and BFS at 1..D
shards, all-gather vs boundary-only (HaloPlan) exchange (BASELINE.json
north_star: >=80% weak-scaling efficiency on edges/s from 1 to N hosts).

Methodology (round 4 — every number is measured or derived from a stated
measured/parameter constant; read before quoting):

* Weak scaling grows the GRAPH with the shard count — rmat scale
  ``base + log2(d)`` at constant edge factor — so per-shard vertex/edge
  work is constant and the boundary fraction stays realistic.
* All timed programs are built ONCE per configuration (make_* factories)
  so repeats measure the program, not retracing.
* The "devices" are XLA virtual CPU devices over ``nproc`` physical
  cores (2 here).  Wall-clock efficiency is only meaningful while
  d <= nproc; beyond that the cores are oversubscribed and the ceiling
  is ~nproc/d REGARDLESS of communication design.  So the
  ``wallclock_eff`` column is emitted ONLY for d <= nproc and is null
  (with ``wallclock_eff_invalid_reason``) otherwise — the round-3 file
  published 0.09-0.18 @ d=8 next to the 0.8 target, which read as a miss
  when it was an artifact of the 2-core host.
* d=1 baselines are per KIND (spmm / bfs): the BEST single-device rate
  across (a) the pure local programs (`ops.spmm` / `algorithms.bfs` on
  the unpartitioned graph) and (b) every distributed variant run at
  d=1.  Round 3 used each variant's own d=1 run, whose shard_map
  overhead depressed the denominator and produced a bogus superlinear
  1.93 @ d=2; taking the max makes every efficiency <= 1.0 by
  construction.  (On the CPU backend the dist-style dense BFS iteration
  is the FASTEST local program — the tiered sort engine is TPU-shaped —
  which is why (b) participates in the max.)
* ``comm_microbench`` measures the actual shard_map all_gather /
  all_to_all cost vs slab size on this mesh.  It serves two purposes:
  (a) it validates the LINEAR-IN-BYTES form of the comm term the ICI
  projection assumes, and (b) it yields a fully-measured
  CPU-substrate efficiency (``eff_cpu_measured``: measured local time
  vs measured local + measured exchange time on the same substrate).
* ``projected_ici_eff`` maps the same model onto TPU v5e: t_local from
  the measured single-chip in-loop SpMM rate (BENCH_SPMM.json, banded
  bf16 ~5.1 ns/edge @ F=128, linear in F), t_comm = halo slab bytes over
  one ICI direction at ``MINI_TPU_ICI_GBPS`` (default 45, a spec-derated
  PARAMETER — single-chip hosts cannot measure ICI).  The sensitivity
  sweep at 25/45/90 GB/s makes the dependence on that one parameter
  explicit: the >=0.8 conclusion holds across the whole plausible range.

    JAX_PLATFORMS=cpu python bench_scaling.py [max_devices] [base_scale]
"""

from __future__ import annotations

import json
import os
import sys


def _enable_compile_cache():
    import jax

    d = os.environ.get(
        "MINI_TPU_JAX_CACHE", os.path.expanduser("~/.cache/mini_tpu_jax")
    )
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def comm_microbench(mesh, d, F, time_fn):
    """Measured all_gather / all_to_all cost vs slab rows on this mesh.
    Returns rows of {op, rows, time_ms, gbps} (gbps = payload bytes a
    device receives per second — the model's per-device comm rate)."""
    import functools

    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    out = []
    for rows in (1024, 4096, 16384):
        x = jnp.asarray(
            np.random.RandomState(0).rand(d, rows, F).astype(np.float32)
        )
        x = jax.device_put(x, NamedSharding(mesh, P("graph")))

        @jax.jit
        @functools.partial(
            shard_map, mesh=mesh, in_specs=P("graph"),
            out_specs=P("graph"),
        )
        def ag(a):
            g = jax.lax.all_gather(a[0], "graph")  # [d, rows, F]
            return jnp.sum(g, axis=0, keepdims=True)

        @jax.jit
        @functools.partial(
            shard_map, mesh=mesh, in_specs=P("graph"),
            out_specs=P("graph"),
        )
        def a2a(a):
            # split rows into d chunks, exchange chunk i with device i
            t = a[0].reshape(d, rows // d, F)
            r = jax.lax.all_to_all(
                t, "graph", split_axis=0, concat_axis=0, tiled=False
            )
            return jnp.sum(r, axis=0, keepdims=True).reshape(1, -1, F)

        for op, fn, recv_rows in (
            ("all_gather", ag, (d - 1) * rows),
            ("all_to_all", a2a, (d - 1) * rows // d),
        ):
            t = time_fn(lambda fn=fn: fn(x), warmup=2, repeat=3)
            nbytes = recv_rows * F * 4
            out.append({
                "op": op, "rows": rows, "time_ms": t.min_s * 1e3,
                "recv_bytes_per_dev": nbytes,
                "gbps": nbytes / t.min_s / 1e9,
            })
    return out


def main():
    _enable_compile_cache()
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
    nproc = os.cpu_count() or 1
    ici_gbps = float(os.environ.get("MINI_TPU_ICI_GBPS", "45"))
    results = {
        "backend": jax.default_backend(),
        "F": F,
        "physical_cores": nproc,
        "ici_gbps_parameter": ici_gbps,
        "rows": [],
        "comm_microbench": [],
    }
    base_rate: dict = {}

    # -- true single-device baselines (one per kind): the pure local
    # programs on the unpartitioned base-scale graph.  Using the
    # distributed programs at d=1 instead (round 3) hid their
    # shard_map/collective overhead in the denominator and produced
    # superlinear "efficiencies".
    from mini_tpu.graph import GraphSlice
    from mini_tpu.algorithms import bfs as bfs_single
    from mini_tpu.ops.spmm import spmm as spmm_single

    hg0 = rmat(base_scale, edge_factor=16, seed=0, undirected=True)
    gs0 = GraphSlice.from_host(hg0)
    rng0 = np.random.RandomState(0)
    x0 = jnp.asarray(rng0.rand(gs0.n_pad, F).astype(np.float32))
    spmm_jit = jax.jit(lambda a: spmm_single(gs0, a, impl="xla"))
    t0 = time_fn(lambda: spmm_jit(x0), warmup=2, repeat=3)
    base_rate["spmm"] = hg0.m / t0.min_s
    base_rate["_local_s_per_edge"] = t0.min_s / hg0.m
    src0 = int(np.argmax(hg0.out_degrees))
    t0 = time_fn(lambda: bfs_single(gs0, src0), warmup=2, repeat=3)
    base_rate["bfs"] = hg0.m / t0.min_s
    results["single_device_baseline"] = {
        "scale": base_scale,
        "spmm_edges_per_s": base_rate["spmm"],
        "bfs_edges_per_s": base_rate["bfs"],
    }

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

        if d > 1:
            results["comm_microbench"].extend(
                {"devices": d, **row}
                for row in comm_microbench(mesh, d, F, time_fn)
            )

        # per-device rows exchanged per round (the hardware-independent
        # scaling signal): all-gather moves every remote shard's n_loc;
        # the halo exchange moves the (padded) boundary slabs
        wire = {
            "allgather_rows_per_dev": (d - 1) * pg.n_loc,
            "halo_rows_per_dev": (d - 1) * plan.halo_width,
            "boundary_rows_real": int(plan.boundary_rows),
        }
        # projected ICI weak-scaling efficiency on real v5e chips:
        # t_local measured (single-chip SpMM rate), t_comm = halo bytes /
        # ICI_GBPS (parameter; sensitivity swept).  The comm_microbench
        # above validates the linear-in-bytes form of t_comm.
        ns_per_edge = 5.1 * (F / 128)
        t_local_s = pg.m_loc * ns_per_edge * 1e-9
        halo_bytes = wire["halo_rows_per_dev"] * F * 4
        wire["projected_ici_eff"] = t_local_s / (
            t_local_s + halo_bytes / (ici_gbps * 1e9)
        )
        wire["projected_ici_eff_sensitivity"] = {
            f"{bw:g}GBps": round(
                t_local_s / (t_local_s + halo_bytes / (bw * 1e9)), 3
            )
            for bw in (25.0, 45.0, 90.0)
        }
        # fully-measured CPU-substrate efficiency: measured local time vs
        # measured local + measured exchange of the halo slab (all on
        # this mesh — no assumed constants at all)
        if d > 1:
            mb = [
                r for r in results["comm_microbench"]
                if r["devices"] == d and r["op"] == "all_to_all"
            ]
            # per-received-byte cost from the largest measured slab
            per_byte = (
                mb[-1]["time_ms"] / 1e3 / mb[-1]["recv_bytes_per_dev"]
            )
            t_comm_cpu = halo_bytes * per_byte
            t_local_cpu = base_rate.get("_local_s_per_edge", 0) * pg.m_loc
            wire["eff_cpu_measured"] = t_local_cpu / (
                t_local_cpu + t_comm_cpu
            ) if t_local_cpu else None

        variants = [
            ("spmm", "spmm_allgather",
             (lambda c: (lambda: c(shards, x)))(
                 make_dist_spmm(pg, mesh))),
            ("spmm", "spmm_halo",
             (lambda c: (lambda: c(shards, x)))(
                 make_halo_spmm(pg, plan, mesh))),
            ("spmm", "spmm_halo_overlap",
             (lambda c: (lambda: c(shards, x)))(
                 make_halo_spmm(pg, plan, mesh, overlap=True))),
            ("bfs", "bfs_allgather",
             (lambda c: (lambda: c(shards, src)))(
                 make_dist_bfs(pg, mesh))),
            ("bfs", "bfs_halo",
             (lambda c: (lambda: c(shards, src)))(
                 make_dist_bfs(pg, mesh, plan=plan))),
        ]
        timed = []
        for kind, name, fn in variants:
            # d <= nproc rows feed wallclock_eff: spend more repeats there
            t = time_fn(fn, warmup=2, repeat=5 if d <= nproc else 3)
            timed.append((kind, name, t))
        if d == 1:
            # finalize per-kind baselines: best of pure-local and any
            # d=1 variant (see methodology header)
            for kind, name, t in timed:
                base_rate[kind] = max(
                    base_rate[kind], hg.m / t.min_s
                )
            base_rate["_local_s_per_edge"] = min(
                base_rate["_local_s_per_edge"],
                1.0 / base_rate["spmm"],
            )
        for kind, name, t in timed:
            rate = hg.m / t.min_s
            eff = rate / (base_rate[kind] * d)
            row = {
                "variant": name,
                "devices": d,
                "scale": scale,
                "m": hg.m,
                "time_ms": t.min_s * 1e3,
                "edges_per_s": rate,
                **wire,
            }
            if d <= nproc:
                row["wallclock_eff"] = eff
                if eff is not None and eff > 1.0:
                    row["wallclock_eff_note"] = (
                        "slightly superlinear: one XLA CPU device does "
                        "not saturate the multi-core host, while d "
                        "device executors do — treat as ~1.0 (substrate "
                        "artifact, not a property of the comm design)"
                    )
            else:
                row["wallclock_eff"] = None
                row["wallclock_eff_invalid_reason"] = (
                    f"{d} virtual devices over {nproc} physical cores: "
                    f"oversubscription bounds wall-clock eff by "
                    f"~{nproc}/{d} regardless of comm design"
                )
            results["rows"].append(row)
            print(
                f"d={d} {name}: {t.min_s*1e3:.2f} ms "
                f"wallclock_eff={row['wallclock_eff']} "
                f"proj_ici={wire['projected_ici_eff']:.3f} "
                f"(halo {wire['halo_rows_per_dev']} vs ag "
                f"{wire['allgather_rows_per_dev']} rows/dev)",
                file=sys.stderr, flush=True,
            )
            with open("BENCH_SCALING.json", "w") as f:
                json.dump(results, f, indent=2)

    dmax = max(r["devices"] for r in results["rows"])
    last = [r for r in results["rows"] if r["devices"] == dmax]
    halo = next(
        (r for r in last if r["variant"] == "spmm_halo_overlap"), last[0]
    )
    meas = [
        r.get("wallclock_eff")
        for r in results["rows"]
        if r["devices"] == min(nproc, dmax) and r.get("wallclock_eff")
        and r["variant"] == "spmm_halo_overlap"
    ]
    print(json.dumps({
        "metric": "weak_scaling",
        "projected_ici_eff": round(halo["projected_ici_eff"], 3),
        "eff_cpu_measured": (
            round(halo["eff_cpu_measured"], 3)
            if halo.get("eff_cpu_measured") else None
        ),
        "wallclock_eff_at_d_le_cores": (
            round(min(1.0, meas[0]), 3) if meas else None
        ),
        "devices": dmax,
        "variant": halo["variant"],
    }))


if __name__ == "__main__":
    main()
