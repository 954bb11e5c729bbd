"""Minimal repro of the XLA TPU algebraic-simplifier sort-merge cycle
crash (round 5): two same-key sorts where the second depends on the
first.  Tests which workaround prevents the crash."""
import os, sys, time
import numpy as np
import jax, jax.numpy as jnp

d = os.path.expanduser("~/.cache/mini_tpu_jax")
os.makedirs(d, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", d)

M = 1 << 17
rng = np.random.RandomState(0)
rank_np = rng.permutation(M).astype(np.int32)
x_np = rng.rand(M).astype(np.float32)

MODE = sys.argv[1] if len(sys.argv) > 1 else "plain"

def srt(key, val):
    return jax.lax.sort((key, val), num_keys=1)[1]

def f(x, rank):
    if MODE == "plain":
        a = srt(rank, x)
        b = srt(rank, a * 2.0)
    elif MODE == "keybar":
        a = srt(jax.lax.optimization_barrier(rank), x)
        b = srt(jax.lax.optimization_barrier(rank), a * 2.0)
    elif MODE == "valbar":
        a = srt(rank, jax.lax.optimization_barrier(x))
        b = srt(rank, jax.lax.optimization_barrier(a * 2.0))
    elif MODE == "shift":
        a = srt(rank, x)
        b = srt(rank + jnp.int32(1), a * 2.0)
    elif MODE == "tracedshift":
        z = jax.lax.optimization_barrier(jnp.int32(0))
        a = srt(rank + z, x)
        z2 = jax.lax.optimization_barrier(jnp.int32(0))
        b = srt(rank + z2, a * 2.0)
    return jnp.sum(b)

t0 = time.perf_counter()
try:
    out = jax.jit(f)(jnp.asarray(x_np), jnp.asarray(rank_np))
    v = float(out)
    exp = float((x_np * 2.0)[np.argsort(rank_np, kind="stable")][np.argsort(rank_np, kind="stable")].sum())
    # note: srt applies out[rank[i]]=in[i] i.e. in[argsort(rank)]
    print(f"{MODE}: OK {time.perf_counter()-t0:.1f}s val={v:.4f} exp={exp:.4f}")
except Exception as e:
    print(f"{MODE}: FAIL {time.perf_counter()-t0:.1f}s {repr(e)[:200]}")
