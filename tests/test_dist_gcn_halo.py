"""Distributed GCN with boundary halo exchange must produce the same losses
as the all-gather exchange."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from mini_tpu.graph import erdos_renyi
from mini_tpu.models.gcn import gcn_init
from mini_tpu.parallel import partition_graph, make_mesh, shard_to_mesh
from mini_tpu.parallel.gcn import dist_gcn_train
from mini_tpu.parallel.halo import build_halo_plan

NDEV = len(jax.devices())
pytestmark = pytest.mark.skipif(NDEV < 2, reason="needs multiple devices")


def test_halo_gcn_matches_allgather_gcn():
    hg = erdos_renyi(240, 2000, seed=41, undirected=True)
    mesh = make_mesh(NDEV)
    pg = partition_graph(hg, NDEV)
    shards = shard_to_mesh(pg, mesh)
    plan = build_halo_plan(pg)
    rng = np.random.RandomState(0)
    F, C = 8, 3
    row = NamedSharding(mesh, P("graph"))
    x = jax.device_put(
        jnp.asarray(
            rng.rand(pg.num_shards, pg.n_loc, F).astype(np.float32)
        ),
        row,
    )
    labels = jax.device_put(
        jnp.asarray(
            rng.randint(0, C, (pg.num_shards, pg.n_loc)).astype(np.int32)
        ),
        row,
    )
    mask = jax.device_put(
        jnp.asarray(
            (np.arange(pg.n_pad) < hg.n).reshape(pg.num_shards, pg.n_loc)
        ),
        row,
    )
    params = gcn_init(jax.random.PRNGKey(0), [F, 16, C])
    _, losses_ag = dist_gcn_train(
        pg, shards, mesh, params, x, labels, mask, steps=3, lr=0.1
    )
    _, losses_halo = dist_gcn_train(
        pg, shards, mesh, params, x, labels, mask, steps=3, lr=0.1,
        halo_plan=plan,
    )
    np.testing.assert_allclose(losses_halo, losses_ag, rtol=1e-5)


def _gcn_setup(mesh, axes, hg, seed=0):
    pg = partition_graph(hg, int(np.prod([mesh.shape[a] for a in (
        axes if isinstance(axes, tuple) else (axes,))])))
    shards = shard_to_mesh(pg, mesh, axis=axes)
    plan = build_halo_plan(pg)
    rng = np.random.RandomState(seed)
    F, C = 8, 3
    row = NamedSharding(
        mesh, P(axes if isinstance(axes, str) else tuple(axes))
    )
    x = jax.device_put(
        jnp.asarray(
            rng.rand(pg.num_shards, pg.n_loc, F).astype(np.float32)
        ),
        row,
    )
    labels = jax.device_put(
        jnp.asarray(
            rng.randint(0, C, (pg.num_shards, pg.n_loc)).astype(np.int32)
        ),
        row,
    )
    mask = jax.device_put(
        jnp.asarray(
            (np.arange(pg.n_pad) < hg.n).reshape(pg.num_shards, pg.n_loc)
        ),
        row,
    )
    params = gcn_init(jax.random.PRNGKey(0), [F, 16, C])
    return pg, shards, plan, x, labels, mask, params


def test_halo_gcn_overlap_matches_allgather_gcn():
    hg = erdos_renyi(240, 2000, seed=41, undirected=True)
    mesh = make_mesh(NDEV)
    pg, shards, plan, x, labels, mask, params = _gcn_setup(
        mesh, "graph", hg
    )
    _, losses_ag = dist_gcn_train(
        pg, shards, mesh, params, x, labels, mask, steps=3, lr=0.1
    )
    _, losses_ov = dist_gcn_train(
        pg, shards, mesh, params, x, labels, mask, steps=3, lr=0.1,
        halo_plan=plan, overlap=True,
    )
    np.testing.assert_allclose(losses_ov, losses_ag, rtol=1e-5)


@pytest.mark.skipif(NDEV < 4, reason="needs >= 4 devices for a 2D mesh")
def test_halo_gcn_2level_mesh_matches():
    """GCN training on a (dcn, ici) 2-level mesh with hierarchical halo
    exchange reproduces the flat-mesh all-gather losses."""
    from mini_tpu.parallel.distributed import make_mesh_2level

    hg = erdos_renyi(240, 2000, seed=43, undirected=True)
    flat = make_mesh(NDEV)
    pg, shards, plan, x, labels, mask, params = _gcn_setup(
        flat, "graph", hg
    )
    _, losses_ag = dist_gcn_train(
        pg, shards, flat, params, x, labels, mask, steps=3, lr=0.1
    )

    mesh2 = make_mesh_2level(2, NDEV // 2)
    axes = ("dcn", "ici")
    pg2, shards2, plan2, x2, labels2, mask2, params2 = _gcn_setup(
        mesh2, axes, hg
    )
    _, losses_h = dist_gcn_train(
        pg2, shards2, mesh2, params2, x2, labels2, mask2, steps=3,
        lr=0.1, axis=axes, halo_plan=plan2, overlap=True,
    )
    np.testing.assert_allclose(losses_h, losses_ag, rtol=1e-5)
