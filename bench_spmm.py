"""SpMM benchmark protocol: per-impl x per-dtype, measured IN-LOOP.

    python bench_spmm.py [scale ...]        # default: 16 18

One JSON object per (scale, impl, dtype) row -> BENCH_SPMM.json.

PROTOCOL (this resolves the round-2 benchmark-record contradiction):

* **in-loop per-op ms** — the op runs ITERS times inside ONE jitted
  ``fori_loop`` with a data dependency between iterations (each iteration
  consumes the previous output); reported ms = total / ITERS.  This
  excludes the ~25 ms axon dispatch latency AND denies XLA any cross-call
  overlap of independent work, so it predicts the per-layer cost inside a
  model.  All SpMM numbers in BASELINE.md use this protocol from round 3
  on.
* The retired round-1 figure "9.7 ms f32 (one op, in-program)" was a
  SINGLE dispatched call — wall time absorbed overlap with unrelated work
  and amortized nothing; the round-2 commit's "28.9 ms in-loop" was this
  protocol on the same impl.  Both were real measurements of different
  things; only the in-loop number is comparable across impls.

Roofline accounting, stated basis:

* ``bytes_min`` = m_pad*F*itemsize + n_pad*F*4 — the algorithmic minimum
  (every edge's source row crosses HBM once; output written once).  The
  same basis for every impl, so ``sol_frac`` = bytes_min / time / HBM_BW
  compares impls honestly; the actual pipeline moves more (gather
  write + kernel re-read), reported as ``bytes_pipe``.
"""

from __future__ import annotations

import json
import sys

import numpy as np

HBM_GBPS = 819.0  # TPU v5e HBM bandwidth
ITERS = 10
F = 128


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
    import jax
    import jax.numpy as jnp

    from mini_tpu.graph import rmat, GraphSlice
    from mini_tpu.ops.spmm import spmm
    from mini_tpu.utils.timing import time_fn

    scales = [int(a) for a in sys.argv[1:]] or [16, 18]
    results = {"device": str(jax.devices()[0]), "F": F, "iters": ITERS,
               "protocol": "in-loop fori_loop, data-dependent iterations",
               "rows": []}

    variants = [
        # (label, impl, precision, dtype)
        ("xla_f32", "xla", "auto", jnp.float32),
        ("onehot_f32", "pallas_onehot", "auto", jnp.float32),
        ("banded_f32_split", "banded", "split", jnp.float32),
        ("banded_f32_highest", "banded", "highest", jnp.float32),
        ("banded_f32_fast", "banded", "fast", jnp.float32),
        ("banded_bf16", "banded", "auto", jnp.bfloat16),
    ]

    for scale in scales:
        hg = rmat(scale, edge_factor=16, seed=0, undirected=True,
                  weighted=True)
        gs = GraphSlice.from_host(hg)
        rng = np.random.RandomState(0)
        x32 = jnp.asarray(rng.rand(gs.n_pad, F).astype(np.float32) - 0.5)
        print(f"# scale {scale}: n={hg.n} m={hg.m} m_pad={gs.m_pad}",
              file=sys.stderr, flush=True)

        for label, impl, precision, dtype in variants:
            x0 = x32.astype(dtype)

            def step(acc, impl=impl, precision=precision, dtype=dtype):
                out = spmm(gs, acc, direction="pull", impl=impl,
                           precision=precision)
                # rescale keeps magnitudes bounded across iterations while
                # preserving the data dependency
                return (out * jnp.float32(2e-4)).astype(dtype)

            run = jax.jit(
                lambda x0, step=step: jax.lax.fori_loop(
                    0, ITERS, lambda i, a: step(a), x0
                )
            )
            try:
                t = time_fn(lambda: run(x0), warmup=1, repeat=3)
            except Exception as exc:
                results["rows"].append(
                    {"scale": scale, "impl": label,
                     "error": repr(exc)[:200]}
                )
                print(f"# {label}: FAILED {exc!r}", file=sys.stderr,
                      flush=True)
                continue
            per_op_s = t.min_s / ITERS
            item = np.dtype(
                np.float32 if dtype == jnp.float32 else np.uint16
            ).itemsize
            bytes_min = gs.m_pad * F * item + gs.n_pad * F * 4
            bytes_pipe = 3 * gs.m_pad * F * item + gs.n_pad * F * 4
            row = {
                "scale": scale,
                "impl": label,
                "per_op_ms": per_op_s * 1e3,
                "min_traffic_gbps": bytes_min / per_op_s / 1e9,
                "sol_frac_min_traffic": bytes_min / per_op_s / 1e9
                / HBM_GBPS,
                "pipe_traffic_gbps": bytes_pipe / per_op_s / 1e9,
            }
            results["rows"].append(row)
            print(f"# {label} @ {scale}: {per_op_s*1e3:.2f} ms  "
                  f"sol={row['sol_frac_min_traffic']:.2f}",
                  file=sys.stderr, flush=True)
            with open("BENCH_SPMM.json", "w") as f:
                json.dump(results, f, indent=2)

    best = min(
        (r for r in results["rows"] if "per_op_ms" in r),
        key=lambda r: r["per_op_ms"],
    )
    print(json.dumps({"metric": "spmm_best_per_op_ms",
                      "value": round(best["per_op_ms"], 2),
                      "unit": "ms", "impl": best["impl"],
                      "scale": best["scale"]}))


if __name__ == "__main__":
    main()
