"""Property tests (SURVEY.md §4: operators vs dense references on small
random graphs, multiple seeds, directed and undirected)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mini_tpu.graph import erdos_renyi, GraphSlice
from mini_tpu.ops import Frontier, advance, neighborhood_reduce
from mini_tpu.algorithms import (
    bfs,
    bfs_cpu,
    sssp,
    sssp_cpu,
    kcore,
    kcore_cpu,
    connected_components,
    cc_cpu,
)


def dense_bool_adj(hg):
    a = np.zeros((hg.n, hg.n), dtype=bool)
    a[hg.csr_srcs, hg.csr_dsts] = True
    return a


CASES = [
    dict(n=37, m=120, seed=101, undirected=False),
    dict(n=64, m=400, seed=102, undirected=True),
    dict(n=97, m=150, seed=103, undirected=False),  # sparse, many isolates
    dict(n=16, m=200, seed=104, undirected=True),  # dense multigraph
]


@pytest.mark.parametrize("case", CASES)
def test_advance_is_masked_boolean_spmv(case):
    hg = erdos_renyi(case["n"], case["m"], seed=case["seed"],
                     undirected=case["undirected"])
    gs = GraphSlice.from_host(hg)
    a = dense_bool_adj(hg)
    rng = np.random.RandomState(case["seed"])
    for _ in range(3):
        mask = rng.rand(gs.n_pad) < 0.3
        mask[hg.n:] = False
        nxt, _, _ = advance(gs, Frontier(jnp.asarray(mask)))
        expected = (mask[: hg.n] @ a) > 0
        np.testing.assert_array_equal(
            np.asarray(nxt.mask)[: hg.n], expected
        )


@pytest.mark.parametrize("case", CASES)
def test_neighborhood_sum_is_spmv(case):
    hg = erdos_renyi(case["n"], case["m"], seed=case["seed"],
                     undirected=case["undirected"])
    gs = GraphSlice.from_host(hg)
    rng = np.random.RandomState(case["seed"] + 1)
    vals = rng.rand(gs.n_pad).astype(np.float32)
    v = jnp.asarray(vals)
    out = neighborhood_reduce(
        gs, Frontier.full(gs.n_pad, hg.n), lambda e: v[e.src], op="sum",
        direction="pull",
    )
    mult = np.zeros((hg.n, hg.n))
    np.add.at(mult, (hg.csr_srcs, hg.csr_dsts), 1.0)
    expected = mult.T @ vals[: hg.n]
    np.testing.assert_allclose(
        np.asarray(out)[: hg.n], expected, rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("case", CASES)
def test_bfs_sssp_kcore_cc_vs_oracles(case):
    hg = erdos_renyi(case["n"], case["m"], seed=case["seed"],
                     undirected=case["undirected"], weighted=True)
    gs = GraphSlice.from_host(hg)
    src = case["seed"] % hg.n
    np.testing.assert_array_equal(
        np.asarray(bfs(gs, src).labels)[: hg.n], bfs_cpu(hg, src)
    )
    np.testing.assert_array_equal(
        np.asarray(sssp(gs, src).dists)[: hg.n], sssp_cpu(hg, src)[0]
    )
    cores, largest = kcore_cpu(hg)
    res = kcore(gs, variant="mini")
    np.testing.assert_array_equal(
        np.asarray(res.num_cores)[: hg.n], cores
    )
    assert int(res.largest_k_core) == largest
    np.testing.assert_array_equal(
        np.asarray(connected_components(gs).components)[: hg.n],
        cc_cpu(hg),
    )
