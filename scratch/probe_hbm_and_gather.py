"""Round-3b probes (TPU v5e):

1. HBM streaming ceiling, re-measured carefully.  STATUS.md records
   163-237 GB/s "realized" vs the 819 GB/s spec sheet -- if that number
   was depressed by dispatch overhead or small working sets, every
   roofline claim in BASELINE.md is calibrated against a wrong ceiling.
   Protocol: ops looped inside ONE jitted fori_loop (no per-iter
   dispatch), working sets 64 MB - 512 MB, traffic counted as
   read+write bytes actually touched.

2. In-kernel dynamic row gather (`table[idx, :]` inside a Pallas TPU
   kernel).  CLAUDE.md: crashed the remote Mosaic compiler at useful
   sizes -- re-test before building on it (it gates gather fusion, the
   last 2x of SpMM traffic).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from mini_tpu.utils.timing import time_fn


def bw_row(name, fn, nbytes, iters):
    t = time_fn(fn, warmup=1, repeat=3)
    gbps = nbytes * iters / t.min_s / 1e9
    print(f"{name:32s} {t.min_s*1e3:8.2f} ms  {gbps:7.1f} GB/s", flush=True)
    return gbps


def hbm_stream():
    print("== HBM streaming ==", flush=True)
    for mb in (64, 256, 512):
        n = mb * 1024 * 1024 // 4
        x = jnp.arange(n, dtype=jnp.float32).reshape(-1, 1024)
        ITERS = 8

        # read + write: a = a * c + 1  (touches 2*size per iter)
        run = jax.jit(lambda a: jax.lax.fori_loop(
            0, ITERS, lambda i, a: a * jnp.float32(1.000001) + 1.0, a))
        np.asarray(run(x)[0, 0])  # compile + fetch
        bw_row(f"axpy {mb}MB (r+w)", lambda: run(x),
               2 * x.size * 4, ITERS)

        # read-only reduce: s += sum(a)  (touches 1*size per iter)
        red = jax.jit(lambda a: jax.lax.fori_loop(
            0, ITERS, lambda i, s: s + jnp.sum(a * jnp.float32(i)), 0.0))
        np.asarray(red(x))
        bw_row(f"reduce {mb}MB (r)", lambda: red(x), x.size * 4, ITERS)


def dyn_gather():
    print("== in-kernel dynamic row gather ==", flush=True)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    for W, C, F in ((512, 512, 128), (2048, 2048, 128), (8192, 8192, 128), (2048, 512, 128)):
        def kernel(idx_ref, tab_ref, out_ref):
            idx_full = jnp.broadcast_to(idx_ref[:], out_ref.shape)
            out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_full, axis=0)

        tab = jnp.arange(W * F, dtype=jnp.float32).reshape(W, F)
        idx = jnp.asarray(
            np.random.RandomState(0).randint(0, W, size=(C, 1)), jnp.int32)
        try:
            t0 = time.perf_counter()
            out = pl.pallas_call(
                kernel,
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((C, F), jnp.float32),
            )(idx, tab)
            got = np.asarray(out)
            compile_s = time.perf_counter() - t0
            ok = np.array_equal(got, np.asarray(tab)[np.asarray(idx)])
            # in-loop timing: 64 gathers per dispatch
            run = jax.jit(lambda i0: jax.lax.fori_loop(
                0, 64,
                lambda it, acc: acc + pl.pallas_call(
                    kernel,
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                              pl.BlockSpec(memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((C, F), jnp.float32),
                )((idx + it) % W, tab),
                jnp.zeros((C, F), jnp.float32)))
            np.asarray(run(idx)[0, 0])
            t = time_fn(lambda: run(idx), warmup=1, repeat=3)
            ns_per_row = t.min_s / 64 / C * 1e9
            print(f"W={W:5d} C={C} F={F}: ok={ok} compile={compile_s:.1f}s"
                  f"  {t.min_s/64*1e6:8.1f} us/gather"
                  f"  {ns_per_row:6.1f} ns/row", flush=True)
        except Exception as exc:
            print(f"W={W:5d} C={C} F={F}: FAILED {repr(exc)[:300]}",
                  flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    if "gather" in sys.argv:
        dyn_gather()
    else:
        hbm_stream()
