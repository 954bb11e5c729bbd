"""Op-level ms breakdown of one BFS iteration and one banded SpMM
(round 4, VERDICT #7) — writes TRACE_SUMMARY.md, the committed profile
artifact a future round can diff.

Method: wall-basis phase programs at scale 18 (default), minus the
measured empty-program dispatch floor.  Scale 18 is deliberate: at s16
every BFS phase reads as the ~26 ms floor, and the in-loop protocol is
unavailable here — a 16-iteration fori_loop around the sort-heavy phase
programs never finishes compiling on the remote Mosaic service
(>25 min, measured 2026-08-20).  At s18 the phases are 8-45 ms and
dominate the ~2 ms floor noise.  Phases nest, so deltas between rows
isolate stages.  The `jax.named_scope` annotations on the same ops
(`advance.*`, `engine.*`, `spmm.band_gather_*`, `spmm.banded_kernel`,
`gat.band_attn_*`) carry these labels into real xprof traces:
`python bench.py --trace` captures one into ./traces/ for TensorBoard.

    PYTHONPATH=/root/repo:/root/.axon_site python bench_trace.py [scale]
"""

from __future__ import annotations

import os
import sys


def main():
    import jax

    cache = os.path.expanduser("~/.cache/mini_tpu_jax")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np
    import jax.numpy as jnp

    from mini_tpu.graph import rmat, GraphSlice
    from mini_tpu.algorithms.bfs import bfs_cpu
    from mini_tpu.ops.engine import (
        src_bits_to_csc, dst_vals_to_csc, reduce_csc_by_dst,
    )
    from mini_tpu.ops.spmm import spmm
    from mini_tpu.utils.timing import time_fn

    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    hg = rmat(scale, edge_factor=16, seed=0, undirected=True)
    gs = GraphSlice.from_host(hg)
    src = int(np.argmax(hg.out_degrees))

    # mid-traversal state: the depth-2 frontier of the real BFS
    labels_np = bfs_cpu(hg, src)
    lab = np.full(gs.n_pad, -1, np.int32)
    lab[: hg.n] = labels_np
    labels = jnp.asarray(lab)
    frontier = jnp.asarray(lab == 2)

    rng = np.random.RandomState(0)
    F = 128
    x32 = jnp.asarray(rng.rand(gs.n_pad, F).astype(np.float32))
    x16 = x32.astype(jnp.bfloat16)

    rows = []

    def phase(name, fn_of_flag):
        """fn_of_flag(0) -> array; wall basis, repeat 5, min."""
        j = jax.jit(lambda: jnp.sum(
            fn_of_flag(jnp.int32(0))).astype(jnp.float32))
        np.asarray(j())
        t = time_fn(lambda: j(), warmup=1, repeat=5)
        per = t.min_s * 1e3
        rows.append((name, per))
        print(f"{name:46s} {per:9.2f} ms wall", flush=True)
        return per

    floor = phase("dispatch floor (empty jit)",
                  lambda flag: jnp.zeros(()) + flag)

    # ---- one dense BFS iteration, cumulative phases --------------------
    # flag perturbs the labels (runtime-zero), forcing re-execution
    def p_member(flag):
        return src_bits_to_csc(gs, frontier ^ (flag > 0))

    def p_unvisited(flag):
        m = src_bits_to_csc(gs, frontier ^ (flag > 0))
        unv = dst_vals_to_csc(
            gs, (labels + flag == -1).astype(jnp.int32)
        )
        return m & (unv > 0) & gs.edge_mask_csc

    def p_reduce(flag):
        act = p_unvisited(flag)
        return reduce_csc_by_dst(gs, act, "or")

    def p_full_iter(flag):
        nxt = p_reduce(flag)
        return jnp.where(nxt, jnp.int32(3), labels)

    phase("bfs: frontier bit->csc (expand+sort)", p_member)
    phase("bfs: + unvisited expand & mask", p_unvisited)
    phase("bfs: + or-reduce to next frontier", p_reduce)
    phase("bfs: + label stamp (full iteration)", p_full_iter)

    # ---- one banded SpMM, phase split ---------------------------------
    from mini_tpu.graph.banded import get_layout
    from mini_tpu.ops.spmm import _gather_bands

    layout = get_layout(gs, "pull", row_bytes=F * 4)

    def gathers(x):
        def fn(flag):
            xs = x + x.dtype.type(1e-7) * flag
            return sum(
                jnp.sum(g.astype(jnp.float32))
                for g in _gather_bands(xs, layout, "split")
            )
        return fn

    phase("spmm f32: band gathers only", gathers(x32))
    phase("spmm f32 split: full (gather+kernel)",
          lambda flag: spmm(gs, x32 + 1e-7 * flag, impl="banded"))
    phase("spmm bf16: band gathers only", gathers(x16))
    phase("spmm bf16: full (gather+kernel)",
          lambda flag: spmm(
              gs, x16 + jnp.bfloat16(1e-7) * flag, impl="banded"))

    with open("TRACE_SUMMARY.md", "w") as f:
        f.write(
            "# Trace summary — op-level ms breakdown "
            f"(TPU v5e, rmat{scale}, F={F})\n\n"
            "Produced by `bench_trace.py` (wall-basis phases minus the "
            "measured dispatch floor; see its docstring for why the "
            "in-loop protocol is unavailable for these sort-heavy "
            "programs).  BFS rows are CUMULATIVE: subtract adjacent "
            "rows for per-stage cost.  The same stage names appear as "
            "`jax.named_scope` annotations in xprof traces captured "
            "with `python bench.py --trace`.\n\n"
            "| phase | wall ms | minus floor |\n|---|---|---|\n"
        )
        for name, ms in rows:
            f.write(
                f"| {name} | {ms:.2f} | {max(0.0, ms - floor):.2f} |\n"
            )
        f.write(
            "\nReading: dispatch latency OVERLAPS device compute on the "
            "tunnel, so wall ~= max(floor, compute) + fetch — rows at "
            "the floor only UPPER-BOUND their phase (~<30 ms; e.g. a "
            "full dense BFS iteration), while compute-dominated rows "
            "(the SpMM ones) are direct reads: kernel cost = full - "
            "gathers-only.\n"
        )
    print("wrote TRACE_SUMMARY.md", flush=True)


if __name__ == "__main__":
    main()
