"""Distributed GCN training: loss decreases and forward matches the
single-chip model on the 8-device virtual mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from mini_tpu.graph import erdos_renyi, GraphSlice
from mini_tpu.models.gcn import gcn_normalize, gcn_init, gcn_forward
from mini_tpu.parallel import partition_graph, make_mesh, shard_to_mesh
from mini_tpu.parallel.gcn import dist_gcn_train, dist_gcn_train_step_fn, gcn_norm_arrays

NDEV = len(jax.devices())
pytestmark = pytest.mark.skipif(NDEV < 2, reason="needs multiple devices")


@pytest.fixture(scope="module")
def setup():
    hg = erdos_renyi(300, 2500, seed=21, undirected=True)
    mesh = make_mesh(NDEV)
    pg = partition_graph(hg, NDEV)
    shards = shard_to_mesh(pg, mesh)
    return hg, mesh, pg, shards


def test_dist_gcn_loss_decreases(setup):
    hg, mesh, pg, shards = setup
    rng = np.random.RandomState(0)
    F, C = 16, 4
    x = rng.rand(pg.n_pad, F).astype(np.float32)
    x[hg.n:] = 0
    labels = rng.randint(0, C, pg.n_pad).astype(np.int32)
    mask = np.arange(pg.n_pad) < hg.n
    row = NamedSharding(mesh, P("graph"))
    xs = jax.device_put(
        jnp.asarray(x.reshape(pg.num_shards, pg.n_loc, F)), row
    )
    ls = jax.device_put(
        jnp.asarray(labels.reshape(pg.num_shards, pg.n_loc)), row
    )
    ms = jax.device_put(
        jnp.asarray(mask.reshape(pg.num_shards, pg.n_loc)), row
    )
    params = gcn_init(jax.random.PRNGKey(0), [F, 32, C])
    # teacher labels for a learnable signal
    gs = GraphSlice.from_host(hg, n_multiple=pg.n_pad, m_multiple=1024)
    teacher = gcn_init(jax.random.PRNGKey(7), [F, 32, C])
    norm = gcn_normalize(gs)
    xg = np.zeros((gs.n_pad, F), np.float32)
    xg[: pg.n_pad] = x[: min(pg.n_pad, gs.n_pad)]
    tl = np.asarray(
        jnp.argmax(gcn_forward(teacher, gs, norm, jnp.asarray(xg)), -1)
    )
    labels2 = np.zeros(pg.n_pad, np.int32)
    labels2[: min(pg.n_pad, gs.n_pad)] = tl[: min(pg.n_pad, gs.n_pad)]
    ls = jax.device_put(
        jnp.asarray(labels2.reshape(pg.num_shards, pg.n_loc)), row
    )
    params, losses = dist_gcn_train(
        pg, shards, mesh, params, xs, ls, ms, steps=25, lr=0.3
    )
    assert losses[-1] < losses[0] * 0.8, losses


def test_dist_gcn_forward_matches_single_chip(setup):
    """One forward step (via a 0-lr train step's loss) must agree with the
    single-chip GCN loss on identical params/inputs."""
    hg, mesh, pg, shards = setup
    rng = np.random.RandomState(1)
    F, C = 8, 3
    x = rng.rand(pg.n_pad, F).astype(np.float32)
    x[hg.n:] = 0
    labels = rng.randint(0, C, pg.n_pad).astype(np.int32)
    mask = np.arange(pg.n_pad) < hg.n
    params = gcn_init(jax.random.PRNGKey(3), [F, 16, C])

    row = NamedSharding(mesh, P("graph"))
    xs = jax.device_put(
        jnp.asarray(x.reshape(pg.num_shards, pg.n_loc, F)), row
    )
    ls = jax.device_put(
        jnp.asarray(labels.reshape(pg.num_shards, pg.n_loc)), row
    )
    ms = jax.device_put(
        jnp.asarray(mask.reshape(pg.num_shards, pg.n_loc)), row
    )
    _, losses = dist_gcn_train(
        pg, shards, mesh, params, xs, ls, ms, steps=1, lr=0.0
    )

    # single-chip loss with the same padded size
    gs = GraphSlice.from_host(hg, n_multiple=pg.n_pad, m_multiple=1024)
    assert gs.n_pad == pg.n_pad
    from mini_tpu.models.gcn import gcn_loss

    norm = gcn_normalize(gs)
    ref = float(
        gcn_loss(
            params,
            gs,
            norm,
            jnp.asarray(x),
            jnp.asarray(labels),
            jnp.asarray(mask),
        )
    )
    assert abs(losses[0] - ref) < 1e-4, (losses[0], ref)
