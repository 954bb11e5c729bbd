"""Pallas segment-sum SpMM kernel in interpreter mode (runs on the CPU
suite; compiled-mode numbers are validated on TPU via bench.py/BENCH logs).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mini_tpu.graph import erdos_renyi, GraphSlice
from mini_tpu.ops.pallas.spmm_kernel import (
    spmm_pallas,
    segment_sum_pallas,
    EDGE_CHUNK,
)
from mini_tpu.ops.spmm import spmm


@pytest.fixture(scope="module")
def setup():
    hg = erdos_renyi(300, 4000, seed=0, undirected=True, weighted=True)
    gs = GraphSlice.from_host(hg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(gs.n_pad, 128).astype(np.float32))
    return hg, gs, x


def test_spmm_pallas_interpret_matches_xla(setup):
    hg, gs, x = setup
    ref = spmm(gs, x, direction="pull", impl="xla")
    out = spmm_pallas(
        gs.col_offsets,
        gs.csc_srcs,
        gs.csc_weights,
        x,
        seg_ids=gs.csc_dsts,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4
    )


def test_spmm_pallas_bf16_messages(setup):
    hg, gs, x = setup
    ref = spmm(gs, x, direction="pull", impl="xla")
    out = spmm_pallas(
        gs.col_offsets,
        gs.csc_srcs,
        gs.csc_weights,
        x.astype(jnp.bfloat16),
        seg_ids=gs.csc_dsts,
        interpret=True,
    )
    assert out.dtype == jnp.float32  # f32 accumulation
    rel = np.abs(np.asarray(out) - np.asarray(ref)) / (
        np.abs(np.asarray(ref)) + 1.0
    )
    assert rel.max() < 2e-2, rel.max()


def test_segment_sum_pallas_empty_and_hub_segments():
    """Boundary shapes: empty rows, a hub spanning many chunks, and the
    ghost-edge tail."""
    n_pad, F = 256, 128
    hub_edges = 3 * EDGE_CHUNK + 17
    m_pad = ((hub_edges + 5) + 127) // 128 * 128
    dsts = np.full(m_pad, n_pad - 1, np.int32)  # pad tail at ghost
    dsts[:hub_edges] = 7  # hub vertex
    dsts[hub_edges : hub_edges + 5] = 9
    offsets = np.zeros(n_pad + 1, np.int32)
    for v in range(1, n_pad + 1):
        offsets[v] = np.searchsorted(dsts, v, side="left")
    offsets[-1] = m_pad
    rng = np.random.RandomState(1)
    msgs = rng.rand(m_pad, F).astype(np.float32)
    msgs[hub_edges + 5 :] = 0.0
    out = segment_sum_pallas(
        jnp.asarray(offsets), jnp.asarray(dsts), jnp.asarray(msgs),
        interpret=True,
    )
    got = np.asarray(out)
    np.testing.assert_allclose(
        got[7], msgs[:hub_edges].sum(0), rtol=1e-5
    )
    np.testing.assert_allclose(
        got[9], msgs[hub_edges : hub_edges + 5].sum(0), rtol=1e-5
    )
    assert np.all(got[:7] == 0) and np.all(got[10 : n_pad - 1] == 0)
