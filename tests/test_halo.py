"""Boundary halo-exchange SpMM: must match the all-gather path and the
dense oracle, while moving only the boundary rows."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from mini_tpu.graph import erdos_renyi, from_edges
from mini_tpu.parallel import partition_graph, make_mesh, shard_to_mesh
from mini_tpu.parallel.distributed import dist_spmm
from mini_tpu.parallel.halo import build_halo_plan, halo_spmm

NDEV = len(jax.devices())
pytestmark = pytest.mark.skipif(NDEV < 2, reason="needs multiple devices")


def _setup(hg):
    mesh = make_mesh(NDEV)
    pg = partition_graph(hg, NDEV)
    shards = shard_to_mesh(pg, mesh)
    plan = build_halo_plan(pg)
    rng = np.random.RandomState(0)
    F = 8
    x = rng.rand(pg.num_shards, pg.n_loc, F).astype(np.float32)
    xs = jax.device_put(
        jnp.asarray(x), NamedSharding(mesh, P("graph"))
    )
    return mesh, pg, shards, plan, x, xs


def test_halo_matches_allgather_random():
    hg = erdos_renyi(400, 3000, seed=31, undirected=True, weighted=True)
    mesh, pg, shards, plan, x, xs = _setup(hg)
    ref = np.asarray(dist_spmm(pg, shards, xs, mesh))
    got = np.asarray(halo_spmm(pg, shards, plan, xs, mesh))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_halo_is_boundary_only_on_block_graph():
    """A graph with few cross-shard edges must produce a small halo."""
    # ring of blocks: vertices i..i+49 densely connected, one edge between
    # consecutive blocks
    n_blocks, bs = 8, 50
    srcs, dsts = [], []
    rng = np.random.RandomState(1)
    for b in range(n_blocks):
        base = b * bs
        for _ in range(300):
            u, v = rng.randint(0, bs, 2)
            if u != v:
                srcs.append(base + u)
                dsts.append(base + v)
        srcs.append(base)
        dsts.append(((b + 1) % n_blocks) * bs)
    hg = from_edges(
        np.array(srcs), np.array(dsts), num_nodes=n_blocks * bs,
        make_undirected=True,
    )
    mesh, pg, shards, plan, x, xs = _setup(hg)
    ref = np.asarray(dist_spmm(pg, shards, xs, mesh))
    got = np.asarray(halo_spmm(pg, shards, plan, xs, mesh))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
    # the halo must move far fewer rows than the all-gather path
    # (all_gather: every shard receives all n_pad rows; block boundaries
    # drift against the range partition, so allow the misalignment band)
    allgather_rows = pg.num_shards * pg.n_pad
    assert plan.boundary_rows < 0.15 * allgather_rows, (
        plan.boundary_rows,
        allgather_rows,
    )
    assert plan.halo_width <= 64


def test_halo_overlap_matches_allgather():
    """Split-edge (own/halo) overlapped aggregation == all-gather path."""
    hg = erdos_renyi(400, 3000, seed=31, undirected=True, weighted=True)
    mesh, pg, shards, plan, x, xs = _setup(hg)
    ref = np.asarray(dist_spmm(pg, shards, xs, mesh))
    got = np.asarray(halo_spmm(pg, shards, plan, xs, mesh, overlap=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.skipif(NDEV < 4, reason="needs >= 4 devices for a 2D mesh")
@pytest.mark.parametrize("overlap", [False, True])
def test_halo_2level_mesh_matches(overlap):
    """Hierarchical (dcn, ici) exchange == flat exchange == all-gather."""
    from mini_tpu.parallel.distributed import make_mesh_2level

    hg = erdos_renyi(400, 3000, seed=13, undirected=True, weighted=True)
    flat_mesh, pg, shards, plan, x, xs = _setup(hg)
    ref = np.asarray(dist_spmm(pg, shards, xs, flat_mesh))

    mesh2 = make_mesh_2level(2, NDEV // 2)
    from mini_tpu.parallel import shard_to_mesh as stm

    axes = ("dcn", "ici")
    shards2 = stm(pg, mesh2, axis=axes)
    xs2 = jax.device_put(
        jnp.asarray(x), NamedSharding(mesh2, P(axes))
    )
    got = np.asarray(
        halo_spmm(pg, shards2, plan, xs2, mesh2, axis=axes,
                  overlap=overlap)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
