"""Quick GAT A/B on TPU: round-3 softmax path vs round-4 fused path."""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

d = os.environ.get("MINI_TPU_JAX_CACHE",
                   os.path.expanduser("~/.cache/mini_tpu_jax"))
os.makedirs(d, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", d)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from mini_tpu.graph import rmat, GraphSlice
from mini_tpu.models.gat import gat_init, gat_forward
from mini_tpu.utils.timing import time_fn

SCALE = int(sys.argv[1]) if len(sys.argv) > 1 else 16
F = 128

print("backend:", jax.default_backend(), flush=True)
hg = rmat(SCALE, edge_factor=16, seed=0, undirected=True)
gs = GraphSlice.from_host(hg)
rng = np.random.RandomState(0)
x = jnp.asarray(rng.rand(gs.n_pad, F).astype(np.float32) * 0.1)
params = gat_init(jax.random.PRNGKey(1), [F, 32, 32], heads=2)

for attn in ("auto", "softmax"):
    for name, mdt in (("f32", None), ("bf16", jnp.bfloat16)):
        fwd = jax.jit(lambda p, xx, mdt=mdt, attn=attn: gat_forward(
            p, gs, xx, message_dtype=mdt, attn=attn))
        out = fwd(params, x)
        out.block_until_ready()
        np.asarray(out[0, :1])
        t = time_fn(lambda: fwd(params, x), warmup=2, repeat=6)
        print(f"gat {attn:8s} {name:5s}: {t.min_s*1e3:8.2f} ms wall",
              flush=True)

