"""Multi-chip execution: `shard_map` over a `jax.sharding.Mesh`.

The communication backend is XLA collectives over ICI/DCN — `all_gather` /
`psum` / `all_to_all` inside `shard_map` — not an external comm library
(SURVEY.md §5).  The pattern for every operator: per-dst state and edges are
shard-local (see `partition.py`), so the only cross-chip traffic is

* the frontier bitmap (BFS/SSSP: n bits, all-gathered per iteration), or
* the feature slab (SpMM/GCN: rows of H needed for remote sources).

v1 exchanges the full slab with `all_gather`; the boundary-only all-to-all
overlap is the planned optimization (BASELINE.json north_star).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mini_tpu.parallel.partition import PartitionedGraph
from mini_tpu.ops.segment import segment_reduce


def make_mesh(num_devices: int | None = None, axis: str = "graph") -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (axis,))


def make_mesh_2level(
    num_slices: int,
    per_slice: int | None = None,
    axes: tuple[str, str] = ("dcn", "ici"),
) -> Mesh:
    """(DCN, ICI) 2-level mesh: ``num_slices`` pod slices of ``per_slice``
    chips.  Consecutive device blocks form a slice, so the fast axis is
    intra-slice — collectives over ``axes[1]`` ride ICI, over ``axes[0]``
    cross slices on DCN.  Graph shards flatten as
    ``slice_idx * per_slice + chip_idx`` (``P(axes)`` block order)."""
    devices = jax.devices()
    if per_slice is None:
        per_slice = len(devices) // num_slices
    devices = devices[: num_slices * per_slice]
    return Mesh(
        np.array(devices).reshape(num_slices, per_slice), axes
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DeviceShards:
    """Device-side shard arrays; leading axis sharded over the mesh."""

    col_offsets: jnp.ndarray
    csc_srcs: jnp.ndarray
    csc_dsts_local: jnp.ndarray
    csc_weights: jnp.ndarray
    edge_mask: jnp.ndarray
    in_degrees: jnp.ndarray
    out_degrees: jnp.ndarray


def shard_to_mesh(
    pg: PartitionedGraph, mesh: Mesh, axis="graph"
) -> DeviceShards:
    """``axis`` may be one mesh axis name or a ("dcn", "ici") pair — the
    leading shard dim then spans both (flat id = dcn_idx * D_ici + ici)."""
    spec = NamedSharding(
        mesh, P(axis if isinstance(axis, str) else tuple(axis))
    )

    def put(a):
        return jax.device_put(jnp.asarray(a), spec)

    return DeviceShards(
        col_offsets=put(pg.col_offsets),
        csc_srcs=put(pg.csc_srcs),
        csc_dsts_local=put(pg.csc_dsts_local),
        csc_weights=put(pg.csc_weights),
        edge_mask=put(pg.edge_mask),
        in_degrees=put(pg.in_degrees),
        out_degrees=put(pg.out_degrees),
    )


def dist_bfs(
    pg: PartitionedGraph,
    shards: DeviceShards,
    src: int,
    mesh: Mesh,
    axis: str = "graph",
    max_iter: int | None = None,
):
    """Distributed BFS: labels sharded by dst range; per iteration each shard
    reduces its local in-edges and the new frontier is all-gathered (the
    frontier is the only wire traffic)."""
    n_pad, n_loc = pg.n_pad, pg.n_loc
    if max_iter is None:
        max_iter = n_pad

    def local_step(g: DeviceShards, labels_loc, frontier, it):
        # g.* have the leading shard axis stripped by shard_map
        esrc, edst = g.csc_srcs[0], g.csc_dsts_local[0]
        emask = g.edge_mask[0]
        unvisited_loc = labels_loc[0] == -1
        active = frontier[esrc] & unvisited_loc[edst] & emask
        new_vis = segment_reduce(active, edst, n_loc, "or")
        new_pred = segment_reduce(
            esrc, edst, n_loc, "min", mask=active
        ).astype(jnp.int32)
        labels = jnp.where(new_vis, it + 1, labels_loc[0])
        frontier_next = jax.lax.all_gather(
            new_vis, axis, tiled=True
        )  # [n_pad] replicated
        return labels[None], new_pred[None], frontier_next

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            jax.tree_util.tree_map(lambda _: P(axis), shards),
            P(axis),
            P(axis),
            P(None),
        ),
        out_specs=(P(axis), P(axis)),
    )
    def run(g, labels_loc, preds_loc, frontier0):
        # the replicated frontier input is unvarying; the loop carries a
        # device-computed (varying) frontier — align the vma types up front
        frontier0 = jax.lax.pcast(frontier0, axis, to="varying")

        def body(state):
            labels, preds, frontier, it = state
            new_labels, new_preds, frontier_next = local_step(
                g, labels, frontier, it
            )
            preds = jnp.where(new_labels != labels, new_preds, preds)
            return new_labels, preds, frontier_next, it + 1

        def cond(state):
            _, _, frontier, it = state
            return jnp.any(frontier) & (it < max_iter)

        labels, preds, _, it = jax.lax.while_loop(
            cond, body, (labels_loc, preds_loc, frontier0, jnp.int32(0))
        )
        return labels, preds

    labels0 = jnp.full((pg.num_shards, n_loc), -1, jnp.int32)
    labels0 = labels0.at[src // n_loc, src % n_loc].set(0)
    preds0 = jnp.full((pg.num_shards, n_loc), -1, jnp.int32)
    frontier0 = jnp.zeros(n_pad, jnp.bool_).at[src].set(True)
    spec = NamedSharding(mesh, P(axis))
    labels0 = jax.device_put(labels0, spec)
    preds0 = jax.device_put(preds0, spec)
    frontier0 = jax.device_put(frontier0, NamedSharding(mesh, P()))
    labels, preds = jax.jit(run)(shards, labels0, preds0, frontier0)
    return labels.reshape(-1), preds.reshape(-1)


def dist_sssp(
    pg: PartitionedGraph,
    shards: DeviceShards,
    src: int,
    mesh: Mesh,
    axis: str = "graph",
    max_iter: int | None = None,
):
    """Distributed Bellman-Ford: distances sharded by dst range; per
    iteration each shard relaxes its local in-edges against the
    all-gathered frontier distances (f32 segmented min — deterministic and
    bitwise-equal to the single-chip path)."""
    n_pad, n_loc = pg.n_pad, pg.n_loc
    if max_iter is None:
        max_iter = n_pad
    inf = jnp.float32(jnp.inf)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(None)),
        out_specs=P(axis),
    )
    def run(g, dist_loc, dist_masked0):
        esrc = g.csc_srcs[0]
        edst = g.csc_dsts_local[0]
        ew = g.csc_weights[0]
        emask = g.edge_mask[0]
        dist_masked0 = jax.lax.pcast(dist_masked0, axis, to="varying")

        def body(state):
            dist, dist_masked_full, it = state
            cand = jnp.where(emask, dist_masked_full[esrc] + ew, inf)
            best = segment_reduce(cand, edst, n_loc, "min")
            improved = best < dist
            dist = jnp.minimum(dist, best)
            masked = jnp.where(improved, dist, inf)
            full = jax.lax.all_gather(masked, axis, tiled=True)
            return dist, full, it + 1

        def cond(state):
            _, full, it = state
            return jnp.any(jnp.isfinite(full)) & (it < max_iter)

        dist, _, _ = jax.lax.while_loop(
            cond, body, (dist_loc[0], dist_masked0, jnp.int32(0))
        )
        return dist[None]

    dist0 = jnp.full((pg.num_shards, n_loc), inf, jnp.float32)
    dist0 = dist0.at[src // n_loc, src % n_loc].set(0.0)
    masked0 = jnp.full(n_pad, inf, jnp.float32).at[src].set(0.0)
    spec = NamedSharding(mesh, P(axis))
    dist0 = jax.device_put(dist0, spec)
    masked0 = jax.device_put(masked0, NamedSharding(mesh, P()))
    return jax.jit(run)(shards, dist0, masked0).reshape(-1)


def dist_spmm(
    pg: PartitionedGraph,
    shards: DeviceShards,
    x: jnp.ndarray,  # [D, n_loc, F] sharded on axis 0
    mesh: Mesh,
    axis: str = "graph",
    weights: jnp.ndarray | None = None,  # [D, m_loc] sharded, CSC order
) -> jnp.ndarray:
    """Distributed pull-SpMM: all-gather the feature slab, local gather +
    segment-sum into the owned dst rows.  Returns [D, n_loc, F] sharded."""
    n_loc = pg.n_loc

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            jax.tree_util.tree_map(lambda _: P(axis), shards),
            P(axis),
            P(axis) if weights is not None else P(),
        ),
        out_specs=P(axis),
    )
    def run(g, x_loc, w):
        x_full = jax.lax.all_gather(x_loc[0], axis, tiled=True)  # [n_pad, F]
        esrc, edst = g.csc_srcs[0], g.csc_dsts_local[0]
        ew = (g.csc_weights[0] if weights is None else w[0])
        msgs = x_full[esrc] * ew[:, None]
        out = segment_reduce(
            msgs, edst, n_loc, "sum", mask=g.edge_mask[0][:, None]
        )
        return out[None]

    w_arg = weights if weights is not None else jnp.zeros((1,))
    return jax.jit(run)(shards, x, w_arg)


def dist_pagerank(
    pg: PartitionedGraph,
    shards: DeviceShards,
    mesh: Mesh,
    axis: str = "graph",
    damping: float = 0.85,
    tol_rel: float = 0.001,
    max_iter: int = 100,
):
    """Distributed standard PageRank: ranks sharded by dst range; per
    iteration each shard sums in-neighbor contributions locally after one
    all-gather of the (rank/out_degree) contribution vector — the direct
    distribution of the single-chip ``algorithms/pagerank.py`` standard
    variant (same update, same freeze-on-convergence semantics)."""
    n_pad, n_loc, n = pg.n_pad, pg.n_loc, pg.n
    D = pg.num_shards
    inv_n = 1.0 / n

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P()),
    )
    def run(g, ranks_loc, real_loc):
        esrc, edst = g.csc_srcs[0], g.csc_dsts_local[0]
        emask = g.edge_mask[0]
        out_deg = g.out_degrees[0].astype(jnp.float32)
        real = real_loc[0]

        def body(state):
            ranks, active, it = state
            contrib = jnp.where(out_deg > 0, ranks / out_deg, 0.0)
            contrib_full = jax.lax.all_gather(contrib, axis, tiled=True)
            reduced = segment_reduce(
                jnp.where(emask, contrib_full[esrc], 0.0), edst, n_loc,
                "sum",
            )
            dangling = jax.lax.psum(
                jnp.sum(jnp.where(real & (out_deg == 0), ranks, 0.0)),
                axis,
            )
            new = (1.0 - damping) * inv_n + damping * (
                reduced + dangling * inv_n
            )
            new = jnp.where(real, new, 0.0)
            new = jnp.where(active, new, ranks)
            moved = jnp.abs(new - ranks) > tol_rel * jnp.abs(ranks)
            return new, active & moved & real, it + 1

        def cond(state):
            _, active, it = state
            return (
                jax.lax.psum(jnp.sum(active.astype(jnp.int32)), axis) > 0
            ) & (it < max_iter)

        ranks0 = jnp.where(real, jnp.float32(inv_n), 0.0)
        ranks, _, it = jax.lax.while_loop(
            cond, body, (ranks0, real, jnp.int32(0))
        )
        return ranks[None], it

    real = (jnp.arange(n_pad) < n).reshape(D, n_loc)
    spec = NamedSharding(mesh, P(axis))
    ranks0 = jax.device_put(jnp.zeros((D, n_loc), jnp.float32), spec)
    real = jax.device_put(real, spec)
    ranks, it = jax.jit(run)(shards, ranks0, real)
    return ranks.reshape(-1), it


def dist_cc(
    pg: PartitionedGraph,
    shards: DeviceShards,
    mesh: Mesh,
    axis: str = "graph",
    max_iter: int | None = None,
):
    """Distributed connected components (weakly connected for directed
    input): min-label propagation over in-edges with the label vector
    all-gathered per round.  Converges to the same fixpoint as the
    single-chip ``algorithms/cc.py`` (min vertex id per component)."""
    n_pad, n_loc, n = pg.n_pad, pg.n_loc, pg.n
    D = pg.num_shards
    if max_iter is None:
        max_iter = n_pad

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=(P(axis), P()),
    )
    def run(g, labels_loc):
        esrc, edst = g.csc_srcs[0], g.csc_dsts_local[0]
        emask = g.edge_mask[0]
        big = jnp.int32(jnp.iinfo(jnp.int32).max)

        def body(state):
            labels, _, it = state
            full = jax.lax.all_gather(labels, axis, tiled=True)
            nb_min = segment_reduce(
                jnp.where(emask, full[esrc], big), edst, n_loc, "min"
            )
            new = jnp.minimum(labels, nb_min)
            changed = jax.lax.psum(
                jnp.sum((new != labels).astype(jnp.int32)), axis
            )
            return new, changed, it + 1

        def cond(state):
            _, changed, it = state
            return (changed > 0) & (it < max_iter)

        labels, _, it = jax.lax.while_loop(
            cond, body, (labels_loc[0], jnp.int32(1), jnp.int32(0))
        )
        return labels[None], it

    shard_id = jnp.arange(D, dtype=jnp.int32)[:, None]
    labels0 = shard_id * n_loc + jnp.arange(n_loc, dtype=jnp.int32)[None, :]
    spec = NamedSharding(mesh, P(axis))
    labels0 = jax.device_put(labels0, spec)
    labels, it = jax.jit(run)(shards, labels0)
    return labels.reshape(-1), it
