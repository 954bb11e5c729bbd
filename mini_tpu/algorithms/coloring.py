"""Jones-Plassmann-style hash graph coloring.

Reference recipe (`/root/reference/gunrock/src/coloring/coloring_enactor.hxx:41-97`):
per iteration, two neighborhood reductions compute the max and min neighbor
hash among *uncolored* vertices (colored neighbors contribute the reduction
identity, `coloring/coloring_functor.hxx:40-65`); the filter colors strict
local minima with ``2*iter+1`` and strict local maxima with ``2*iter+2``
(`coloring/coloring_functor.hxx:11-29`); hashes are re-randomized each round
(`coloring/coloring_problem.hxx:53-57`).

TPU re-design: both reductions are masked segment min/max over one edge
sweep; hashes come from `jax.random` with a per-iteration folded key (the
reference uses curand `fill_random`); the loop is a `lax.while_loop`.
Properness is guaranteed: adjacent uncolored vertices cannot both be strict
local extrema of the same kind, and min-priority breaks min/max ties.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from mini_tpu.graph.csr import GraphSlice, HostGraph
from mini_tpu.ops.engine import dst_vals_to_csr, reduce_csr_by_src


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ColoringResult:
    colors: jnp.ndarray  # int32[n_pad]; >0 once assigned
    num_iterations: jnp.ndarray


@functools.partial(jax.jit, static_argnums=(2, 3))
def _coloring_impl(g: GraphSlice, key, prime: int, max_iter: int):
    n_pad = g.n_pad
    real = jnp.arange(n_pad) < g.n
    INT_MIN = jnp.iinfo(jnp.int32).min
    INT_MAX = jnp.iinfo(jnp.int32).max

    colors0 = jnp.zeros(n_pad, jnp.int32)

    def step(state):
        colors, it = state
        hashs = jax.random.randint(
            jax.random.fold_in(key, it), (n_pad,), 0, prime, jnp.int32
        )
        uncolored = (colors == 0) & real
        # neighbor extrema over out-edges, counting only uncolored
        # neighbors.  One expansion + one single-payload sort: the
        # uncolored bit packs into the hash (hash*2+unc, hash < 2^30),
        # both extrema derive from the same permuted array.
        packed = jnp.where(uncolored, hashs * 2 + 1, hashs * 2)
        packed_e = dst_vals_to_csr(g, packed)
        unc_e = (packed_e & 1) == 1
        hash_e = packed_e >> 1
        nb_max = reduce_csr_by_src(
            g, jnp.where(unc_e, hash_e, INT_MIN), "max"
        )
        nb_min = reduce_csr_by_src(
            g, jnp.where(unc_e, hash_e, INT_MAX), "min"
        )
        is_min = uncolored & (hashs < nb_min)
        is_max = uncolored & (hashs > nb_max) & ~is_min
        colors = jnp.where(is_min, 2 * it + 1, colors)
        colors = jnp.where(is_max, 2 * it + 2, colors)
        return colors, it + 1

    def cond(state):
        colors, it = state
        return jnp.any((colors == 0) & real) & (it < max_iter)

    colors, it = jax.lax.while_loop(cond, step, (colors0, jnp.int32(0)))
    return ColoringResult(colors, it)


def coloring(
    g: GraphSlice,
    prime: int = 1000003,
    max_iter: int | None = None,
    seed: int = 0,
) -> ColoringResult:
    if max_iter is None:
        max_iter = max(2 * g.n, 64)
    return _coloring_impl(
        g, jax.random.PRNGKey(seed), int(prime), int(max_iter)
    )


def validate_coloring(colors: np.ndarray, hg: HostGraph) -> bool:
    """Oracle check (absent in the reference, which only displays colors —
    `tests/coloring/test_coloring.cu:44`): every vertex colored, no two
    adjacent vertices (excluding self-loops) share a color."""
    if (colors[: hg.n] <= 0).any():
        return False
    s, d = hg.csr_srcs, hg.csr_dsts
    off_diag = s != d
    return not np.any(colors[s[off_diag]] == colors[d[off_diag]])
