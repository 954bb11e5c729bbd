"""Round-5 A/B: cross-band DMA prefetch in banded_segment_sum
(VERDICT #8).  In-loop banded SpMM at a given scale, prefetch on vs off."""
import os, sys, functools, time
import numpy as np
import jax, jax.numpy as jnp

d = os.path.expanduser("~/.cache/mini_tpu_jax")
os.makedirs(d, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", d)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from mini_tpu.graph import rmat, GraphSlice
import mini_tpu.ops.pallas.spmm_banded as sb
from mini_tpu.ops.spmm import spmm
from mini_tpu.utils.timing import time_fn

SCALE = int(sys.argv[1]) if len(sys.argv) > 1 else 16
DTYPE = jnp.bfloat16 if (len(sys.argv) <= 2 or sys.argv[2] == "bf16") \
    else jnp.float32
F = 128
ITERS = 10

hg = rmat(SCALE, edge_factor=16, seed=0, undirected=True, weighted=True)
gs = GraphSlice.from_host(hg)
rng = np.random.RandomState(0)
x = jnp.asarray(rng.rand(gs.n_pad, F).astype(np.float32)).astype(DTYPE)
print(f"scale={SCALE} dtype={DTYPE.__name__} m={hg.m}", flush=True)

orig = sb.banded_segment_sum
base = None
for label, pf in (("prefetch_on", True), ("prefetch_off", False)):
    sb.banded_segment_sum = functools.partial(
        orig, cross_band_prefetch=pf
    )
    prec = "auto" if DTYPE == jnp.bfloat16 else "split"

    def step(a):
        out = spmm(gs, a, direction="pull", impl="banded", precision=prec)
        return (out * jnp.float32(2e-4)).astype(DTYPE)

    run = jax.jit(lambda x0: jax.lax.fori_loop(
        0, ITERS, lambda i, a: step(a), x0))
    out = np.asarray(run(x))
    if base is None:
        base = out
    else:
        if not np.allclose(base.astype(np.float32), out.astype(np.float32),
                           rtol=1e-2, atol=1e-2):
            print("MISMATCH between prefetch modes!", flush=True)
    t = time_fn(lambda: run(x), warmup=1, repeat=3)
    per = t.min_s / ITERS
    print(f"{label}: {per*1e3:.3f} ms/op "
          f"({per/hg.m*1e9:.2f} ns/edge)", flush=True)
sb.banded_segment_sum = orig
