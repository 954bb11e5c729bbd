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
