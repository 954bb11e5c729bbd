"""Round-5: isolate the sparse-round floor — A/B compact_frontier
formulations at high-diameter scale (n~524k)."""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

d = os.path.expanduser("~/.cache/mini_tpu_jax")
os.makedirs(d, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", d)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 524288
CAPV = int(sys.argv[2]) if len(sys.argv) > 2 else 32768
ITERS = 50
rng = np.random.RandomState(0)
mask_np = np.zeros(N, bool)
mask_np[rng.choice(N, 2000, replace=False)] = True  # wave-sized frontier
mask0 = jnp.asarray(mask_np)


def compact_scatter(mask):
    positions = jnp.cumsum(mask.astype(jnp.int32)) - 1
    count = jnp.sum(mask.astype(jnp.int32))
    slot = jnp.where(mask & (positions < CAPV), positions, CAPV)
    out = jnp.zeros(CAPV + 1, jnp.int32)
    out = out.at[slot].max(jnp.arange(N, dtype=jnp.int32), mode="drop")
    return out[:CAPV], jnp.minimum(count, CAPV)


def compact_topk(mask):
    count = jnp.sum(mask.astype(jnp.int32))
    vals = jnp.where(
        mask, jnp.int32(N) - jnp.arange(N, dtype=jnp.int32), jnp.int32(0)
    )
    top, _ = jax.lax.top_k(vals, CAPV)
    idx = jnp.where(top > 0, jnp.int32(N) - top, 0)
    return idx, jnp.minimum(count, CAPV)


def compact_sort(mask):
    count = jnp.sum(mask.astype(jnp.int32))
    key = jnp.where(
        mask,
        jnp.arange(N, dtype=jnp.int32),
        jnp.int32(N) + jnp.arange(N, dtype=jnp.int32),
    )
    srt = jax.lax.sort(key)[:CAPV]
    idx = jnp.where(srt < N, srt - 0, 0)
    idx = jnp.where(srt < N, srt, 0)
    return idx, jnp.minimum(count, CAPV)


fns = {
    "scatter": compact_scatter,
    "topk": compact_topk,
    "sort": compact_sort,
}
for name, fn in fns.items():
    try:
        idx, cnt = jax.jit(fn)(mask0)
        got = np.sort(np.asarray(idx)[: int(cnt)])
        exp = np.sort(np.flatnonzero(mask_np)[:CAPV])
        ok = np.array_equal(got, exp)

        def loop(mask, fn=fn):
            def body(i, carry):
                m, acc = carry
                idx, cnt = fn(m)
                acc = acc + idx[0] + cnt
                m = m ^ (jnp.zeros_like(m).at[0].set(acc < -1))
                return (m, acc)

            return jax.lax.fori_loop(
                0, ITERS, body, (mask, jnp.int32(0))
            )[1]

        run = jax.jit(loop)
        np.asarray(run(mask0))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(mask0))
            best = min(best, time.perf_counter() - t0)
        print(
            f"{name}: correct={ok} {best/ITERS*1e3:.3f} ms/op "
            f"({best/ITERS/N*1e9:.2f} ns/elem)",
            flush=True,
        )
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL {repr(e)[:200]}", flush=True)
