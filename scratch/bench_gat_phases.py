"""Phase-level GAT timing: where do the milliseconds actually go?"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

d = os.path.expanduser("~/.cache/mini_tpu_jax")
os.makedirs(d, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", d)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from mini_tpu.graph import rmat, GraphSlice
from mini_tpu.models.gat import gat_init
from mini_tpu.ops.engine import (
    src_vals_to_csc, dst_vals_to_csc, reduce_csc_by_dst,
)
from mini_tpu.models.gat import segment_softmax_by_dst
from mini_tpu.ops.spmm import spmm
from mini_tpu.utils.timing import time_fn

SCALE = int(sys.argv[1]) if len(sys.argv) > 1 else 16
F = 128
hg = rmat(SCALE, edge_factor=16, seed=0, undirected=True)
gs = GraphSlice.from_host(hg)
rng = np.random.RandomState(0)
x = jnp.asarray(rng.rand(gs.n_pad, F).astype(np.float32) * 0.1)
params = gat_init(jax.random.PRNGKey(1), [F, 32, 32], heads=2)
layer = params[0]
H = 2

def proj(xx):
    hws = [jnp.dot(xx, layer["w"][hd],
                   preferred_element_type=jnp.float32) for hd in range(H)]
    s_src = [hws[hd] @ layer["a_src"][hd] for hd in range(H)]
    s_dst = [hws[hd] @ layer["a_dst"][hd] for hd in range(H)]
    return hws, s_src, s_dst

def esrc_phase(xx):
    hws, s_src, s_dst = proj(xx)
    return src_vals_to_csc(gs, *s_src)

def alpha_fused(xx):
    hws, s_src, s_dst = proj(xx)
    e_src = src_vals_to_csc(gs, *s_src)
    mask = gs.edge_mask_csc
    ws = []
    for hd in range(H):
        ed = dst_vals_to_csc(gs, s_dst[hd])
        e = jax.nn.leaky_relu(e_src[hd] + ed, 0.2)
        bound = jax.nn.leaky_relu(jnp.max(s_src[hd]) + ed, 0.2)
        ws.append(jnp.where(mask, jnp.exp(e - bound), 0.0))
    return jnp.stack(ws, axis=-1)

def alpha_softmax(xx):
    hws, s_src, s_dst = proj(xx)
    e_src = src_vals_to_csc(gs, *s_src)
    outs = []
    for hd in range(H):
        eh = e_src[hd] + dst_vals_to_csc(gs, s_dst[hd])
        eh = jax.nn.leaky_relu(eh, 0.2)
        outs.append(segment_softmax_by_dst(gs, eh))
    return jnp.stack(outs, axis=-1)

def spmm_phase(xx, attn_fn):
    hws, s_src, s_dst = proj(xx)
    al = attn_fn(xx)
    hws_p = [jnp.pad(hw, ((0, 0), (0, 32))) for hw in hws]
    hw_cat = jnp.concatenate(hws_p, axis=-1)
    hw_cat = hw_cat.at[:, jnp.arange(H) * 64 + 32].set(1.0)
    return spmm(gs, hw_cat, direction="pull", weights=al, heads=H)

cases = [
    ("proj only", lambda xx: proj(xx)[0][0]),
    ("e_src (expand+sort)", esrc_phase),
    ("alpha fused", alpha_fused),
    ("alpha softmax", alpha_softmax),
    ("alpha fused + spmm", lambda xx: spmm_phase(xx, alpha_fused)),
    ("alpha softmax + spmm", lambda xx: spmm_phase(xx, alpha_softmax)),
]
for name, fn in cases:
    j = jax.jit(lambda xx, fn=fn: sum(
        jnp.sum(l) for l in jax.tree_util.tree_leaves(fn(xx))))
    v = j(x); v.block_until_ready(); np.asarray(v)
    t = time_fn(lambda: j(x), warmup=1, repeat=5)
    print(f"{name:28s} {t.min_s*1e3:8.2f} ms", flush=True)
