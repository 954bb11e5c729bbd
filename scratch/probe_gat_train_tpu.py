"""Round-5 probe: GAT train step compilability on TPU after the engine
custom-VJP rewrite (sort-free backward)."""
import os, sys, time
import numpy as np

def enable_cache():
    import jax
    d = os.path.expanduser("~/.cache/mini_tpu_jax")
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

enable_cache()
import jax
import jax.numpy as jnp
from mini_tpu.graph import rmat, GraphSlice
from mini_tpu.models.gat import gat_init, gat_init_opt, gat_train_step, gat_forward
from mini_tpu.utils.timing import time_fn

SCALE = int(sys.argv[1]) if len(sys.argv) > 1 else 10
ATTN = sys.argv[2] if len(sys.argv) > 2 else "auto"
MDT = jnp.bfloat16 if (len(sys.argv) > 3 and sys.argv[3] == "bf16") else None
print("backend:", jax.default_backend(), "scale:", SCALE, "attn:", ATTN,
      "mdt:", MDT, flush=True)
hg = rmat(SCALE, edge_factor=16, seed=0, undirected=True, weighted=True)
gs = GraphSlice.from_host(hg)
F = 128
params = gat_init(jax.random.PRNGKey(2), [F, 32, 32], heads=2)
opt = gat_init_opt(params)
rng = np.random.RandomState(0)
x = jnp.asarray(rng.rand(gs.n_pad, F).astype(np.float32) * 0.1)
lab = jnp.asarray(rng.randint(0, 32, gs.n_pad))
msk = jnp.arange(gs.n_pad) < hg.n

t0 = time.perf_counter()
p1, o1, loss = gat_train_step(params, opt, gs, x, (lab, msk), 1e-2, 0.2, MDT, ATTN)
l0 = float(loss)
print(f"compile+first: {time.perf_counter()-t0:.1f}s loss={l0:.4f}", flush=True)
state = {"p": p1, "o": o1}
def timed():
    p, o, l = gat_train_step(state["p"], state["o"], gs, x, (lab, msk), 1e-2, 0.2, MDT, ATTN)
    state["p"], state["o"] = p, o
    return l
t = time_fn(timed, warmup=1, repeat=3)
print(f"train step wall: {t.min_s*1e3:.2f} ms", flush=True)
# forward for the ratio (params was donated by the first train call —
# use the live state)
fwd = jax.jit(lambda p, xx: gat_forward(p, gs, xx, message_dtype=MDT))
np.asarray(fwd(state["p"], x))
tf = time_fn(lambda: fwd(state["p"], x), warmup=1, repeat=3)
print(f"fwd wall: {tf.min_s*1e3:.2f} ms ratio={t.min_s/tf.min_s:.2f}", flush=True)
