"""HBM ceiling, round 2: amortize the ~25 ms tunnel dispatch floor with
64 in-loop iterations, and measure XLA's random ROW-gather rate at the
band-table sizes the SpMM pipeline actually uses."""

import numpy as np
import jax
import jax.numpy as jnp

from mini_tpu.utils.timing import time_fn


def row(name, fn, nbytes, iters):
    t = time_fn(fn, warmup=1, repeat=3)
    gbps = nbytes * iters / t.min_s / 1e9
    print(f"{name:44s} {t.min_s*1e3:9.2f} ms  {gbps:7.1f} GB/s",
          flush=True)


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    ITERS = 64
    n = 512 * 1024 * 1024 // 4
    x = jnp.ones((n // 1024, 1024), jnp.float32)
    run = jax.jit(lambda a: jax.lax.fori_loop(
        0, ITERS, lambda i, a: a * jnp.float32(1.000001) + 1.0, a))
    np.asarray(run(x)[0, 0])
    row("axpy 512MB x64 (r+w)", lambda: run(x), 2 * x.size * 4, ITERS)

    red = jax.jit(lambda a: jax.lax.fori_loop(
        0, ITERS, lambda i, s: s + jnp.sum(a * jnp.float32(i)), 0.0))
    np.asarray(red(x))
    row("reduce 512MB x64 (r)", lambda: red(x), x.size * 4, ITERS)

    # random row gather: idx stream -> take(table, idx) at SpMM shapes
    # table_rows x F, gathering M rows.  bytes counted as M rows read +
    # M rows written (the table read is amortized/elided for small tables).
    M = 2 * 1024 * 1024
    rng = np.random.RandomState(0)
    for table_rows, F, dt in (
        (8192, 128, jnp.float32),
        (32768, 128, jnp.float32),
        (65536, 128, jnp.float32),
        (32768, 128, jnp.bfloat16),
        (65536, 128, jnp.bfloat16),
        (65536, 256, jnp.bfloat16),
    ):
        tab = jnp.ones((table_rows, F), dt)
        idx = jnp.asarray(rng.randint(0, table_rows, M), jnp.int32)
        G_ITERS = 8

        def g(tab, idx):
            def body(i, acc):
                out = jnp.take(tab, (idx + i) & (table_rows - 1), axis=0,
                               fill_value=0)
                # consume the WHOLE gathered array so no simplifier pass
                # can fold slice-of-gather into a 1-row gather (ADVICE r3)
                return acc + jnp.sum(out.astype(jnp.float32), axis=0)
            return jax.lax.fori_loop(0, G_ITERS, body,
                                     jnp.zeros((F,), jnp.float32))

        gj = jax.jit(g)
        np.asarray(gj(tab, idx)[0])
        item = np.dtype(dt).itemsize
        nbytes = M * F * item * 2  # rows read + rows written
        row(f"gather M=2M from [{table_rows},{F}] {np.dtype(dt).name}",
            lambda: gj(tab, idx), nbytes, G_ITERS)


if __name__ == "__main__":
    main()
