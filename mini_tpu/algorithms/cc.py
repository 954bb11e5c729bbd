"""Connected components (beyond the reference's primitive set — standard in
full Gunrock; built from the same engine ops).

Min-label propagation with pointer jumping: per round every vertex takes the
minimum label among itself and its in/out neighbors, then compresses chains
with label[label] hops (n-sized gathers are cheap; only per-EDGE gathers are
banned from hot paths).  Converges in O(log n) rounds on connected
components.  For directed graphs this computes WEAKLY connected components
(both edge directions propagate).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from mini_tpu.graph.csr import GraphSlice, HostGraph
from mini_tpu.ops.engine import (
    src_vals_to_csc,
    dst_vals_to_csr,
    reduce_csc_by_dst,
    reduce_csr_by_src,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CCResult:
    components: jnp.ndarray  # int32[n_pad]: min vertex id in the component
    num_components: jnp.ndarray  # int32 (over real vertices)
    num_iterations: jnp.ndarray


@functools.partial(jax.jit, static_argnums=(1,))
def _cc_impl(g: GraphSlice, max_iter: int):
    n_pad = g.n_pad
    labels0 = jnp.arange(n_pad, dtype=jnp.int32)

    def step(state):
        labels, _, it = state
        lab_src = src_vals_to_csc(g, labels)
        nb_in = reduce_csc_by_dst(
            g, jnp.where(g.edge_mask_csc, lab_src, jnp.iinfo(jnp.int32).max),
            "min",
        )
        lab_dst = dst_vals_to_csr(g, labels)
        nb_out = reduce_csr_by_src(
            g, jnp.where(g.edge_mask, lab_dst, jnp.iinfo(jnp.int32).max),
            "min",
        )
        new = jnp.minimum(labels, jnp.minimum(nb_in, nb_out))
        new = new[new]  # pointer jumping (n-sized gather)
        new = new[new]
        changed = jnp.any(new != labels)
        return new, changed, it + 1

    def cond(state):
        _, changed, it = state
        return changed & (it < max_iter)

    labels, _, it = jax.lax.while_loop(
        cond, step, (labels0, jnp.bool_(True), jnp.int32(0))
    )
    real = jnp.arange(n_pad) < g.n
    num = jnp.sum((labels == jnp.arange(n_pad)) & real)
    return CCResult(labels, num, it)


def connected_components(
    g: GraphSlice, max_iter: int | None = None
) -> CCResult:
    if max_iter is None:
        max_iter = max(32, int(np.ceil(np.log2(max(g.n, 2)))) + 8)
    return _cc_impl(g, int(max_iter))


def cc_cpu(hg: HostGraph) -> np.ndarray:
    """Union-find oracle; component id = min vertex id."""
    parent = np.arange(hg.n)

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for u, v in zip(hg.csr_srcs, hg.csr_dsts):
        ru, rv = find(int(u)), find(int(v))
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return np.array([find(v) for v in range(hg.n)], dtype=np.int32)
