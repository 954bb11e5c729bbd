"""Static banded edge layout for the fast SpMM gather path.

Measured on TPU v5e (2026-08-19, scratch/bench_gather*.py): an XLA gather
of 2M rows x 128 lanes costs ~24 ms (~10 ns/row) when the table exceeds
on-chip capacity, but ~6.8 ms when the table is <= ~16 MB — and the fast
path also holds when the big table is SLICED inside the jit, as long as
each gather's index array only addresses one slice.  So the pull-SpMM
message gather (`msgs[e] = w[e] * x[srcs[e]]`, the TPU re-expression of
moderngpu's `transform_lbs` feeding `lbs_segreduce`,
`/root/reference/gunrock/src/neighborhood.hxx:27-58`) is restructured as a
*banded* gather:

* vertices are cut into K bands of ``band_rows`` rows each, sized so one
  band of features stays under the fast-path table limit;
* edges (in CSC order: sorted by dst, contiguous segments) are statically
  re-grouped by the band of their SOURCE, preserving the (dst, src) sort
  within each band;
* at run time the SpMM does K fast gathers (one per band slice of x) and
  the Pallas segment-sum kernel folds the K dst-sorted message streams
  into one output, using per-band offset staircases (no per-edge dst
  array at all).

Everything here is host-side NumPy, computed once per graph and cached by
the GraphSlice fingerprint; the device arrays enter jitted programs as
constants.
"""

from __future__ import annotations

import dataclasses
from collections import OrderedDict
from typing import Optional

import numpy as np

ROW_TILE = 128  # output rows per kernel grid step
EDGE_CHUNK = 512  # edges per kernel DMA/matmul chunk
FAST_TABLE_BYTES = 16 * 1024 * 1024  # measured fast-gather table ceiling


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass
class BandedLayout:
    """One direction's banded edge layout (host arrays; see module doc).

    ``pull`` layouts band by source vertex over CSC order (segments = dst);
    ``push`` layouts band by destination over CSR order (segments = src).
    """

    direction: str  # "pull" | "push"
    band_rows: int
    n_pad: int
    m_pad: int  # original (unbanded) padded edge count
    # per band (lists of length K):
    ids: list  # np.int32[mk_pad] — band-local gather indices
    weights: list  # np.float32[mk_pad] — graph edge weights, banded order
    lens: list  # int: un-padded edge count per band
    # kernel metadata:
    bounds: np.ndarray  # int32[K, n_tiles+1] — per-band tile edge bounds
    offs2d: np.ndarray  # int32[K, n_tiles, ROW_TILE] — per-dst offsets
    # CSC/CSR position -> flat banded position (for dynamic per-edge
    # values riding the layout via one static-rank sort):
    banded_rank: np.ndarray  # int32[m_pad]
    eids: list  # np.int32[mk_pad] — original edge id per banded slot
    # per-band segment offsets over ALL n_pad segments (offsets[k][v] =
    # first slot of dst v's edges within band k's stream) — lets per-dst
    # values EXPAND directly into banded order (GAT's banded-native
    # attention), skipping the permute sort entirely:
    offsets: Optional[list] = None  # np.int32[n_pad+1] per band
    valid: Optional[list] = None  # np.bool_[mk_pad] — real (non-ghost) edges
    w_binary: bool = False  # all graph edge weights in {0, 1}: a bf16
    # multiply is then exact, enabling the split-before-gather fast path
    edge_chunk: int = EDGE_CHUNK  # per-band stream padding multiple; the
    # kernels' DMA/matmul chunk size must match it

    # device-array cache (filled lazily)
    _dev: Optional[dict] = None

    @property
    def K(self) -> int:
        return len(self.ids)

    @property
    def n_tiles(self) -> int:
        return self.n_pad // ROW_TILE

    @property
    def total_padded(self) -> int:
        return int(sum(len(i) for i in self.ids))

    def dev(self) -> dict:
        """jnp versions of the layout arrays (cached).

        Conversion is forced EAGER (``ensure_compile_time_eval``): the
        first call may happen inside a jit trace, and a cached tracer
        would leak into every later trace of the same layout."""
        if self._dev is None:
            import jax
            import jax.numpy as jnp

            inv = np.empty_like(self.banded_rank)
            inv[self.banded_rank] = np.arange(
                self.banded_rank.shape[0], dtype=self.banded_rank.dtype
            )
            with jax.ensure_compile_time_eval():
                self._dev = dict(
                    ids=[jnp.asarray(i) for i in self.ids],
                    weights=[jnp.asarray(w) for w in self.weights],
                    bounds=jnp.asarray(self.bounds),
                    # kernel-facing layout [n_tiles, K, ROW_TILE]: the
                    # kernels consume one tile's offsets per grid step as
                    # an auto-pipelined VMEM block
                    offs2d=jnp.asarray(
                        np.ascontiguousarray(
                            self.offs2d.transpose(1, 0, 2)
                        )
                    ),
                    banded_rank=jnp.asarray(self.banded_rank),
                    inv_rank=jnp.asarray(inv),
                    offsets=[
                        jnp.asarray(o) for o in (self.offsets or [])
                    ],
                    valid=[jnp.asarray(v) for v in (self.valid or [])],
                )
        return self._dev

    def _split_bands(self, flat):
        out, pos = [], 0
        for i in self.ids:
            out.append(flat[pos: pos + len(i)])
            pos += len(i)
        return out

    def permute_to_bands(self, edge_vals):
        """Reorder per-edge values (in this layout's base order: CSC for
        pull, CSR for push) into the banded order, returning the list of
        per-band arrays.  One static-rank ``lax.sort`` — jit-safe; the VJP
        is the inverse fixed perm (another sort), NOT lax.sort's
        scatter-based transpose (~8 ns/elem — the banned hot-path pattern).
        """
        return list(_perm_fns(self)[0](edge_vals))

    def permute_to_bands_multi(self, *cols):
        """H per-edge columns through ONE multi-payload sort (payloads add
        ~25% each vs a full sort per column); returns K arrays [mk, H].
        Like :meth:`permute_to_bands`, the VJP is the inverse fixed perm,
        not lax.sort's scatter transpose."""
        if len(cols) == 1:
            bands = self.permute_to_bands(cols[0])
            return [b[:, None] for b in bands]
        return list(_perm_multi_fn(self, len(cols))(*cols))

    def permute_from_bands(self, band_vals):
        """Inverse of :meth:`permute_to_bands`: per-band arrays (or the
        flat banded stream) back to the base edge order, length m_pad."""
        import jax.numpy as jnp

        if not isinstance(band_vals, jnp.ndarray):
            band_vals = jnp.concatenate(list(band_vals))
        return _perm_fns(self)[1](band_vals)


_PERM_CACHE: OrderedDict = OrderedDict()  # id(layout) -> (to, from) fns


def _perm_fns(layout: BandedLayout):
    """(to_bands, from_flat) custom_vjp pair for this layout: each is one
    static-rank sort, and each is the other's VJP (a fixed permutation's
    transpose is its inverse)."""
    key = id(layout)
    if key in _PERM_CACHE:
        return _PERM_CACHE[key]
    import jax
    import jax.numpy as jnp

    from mini_tpu.ops.permute import apply_fixed_perm

    total = layout.total_padded
    m_pad = layout.m_pad

    def _to_flat(v):
        padded = jnp.concatenate(
            [v, jnp.zeros(total - v.shape[0], v.dtype)]
        )
        return apply_fixed_perm(layout.dev()["banded_rank"], padded)

    def _from_flat(flat):
        return apply_fixed_perm(layout.dev()["inv_rank"], flat)[:m_pad]

    @jax.custom_vjp
    def to_bands(v):
        return tuple(layout._split_bands(_to_flat(v)))

    def to_fwd(v):
        return to_bands(v), v.shape[0]

    def to_bwd(m_in, ct):
        flat = jnp.concatenate([jnp.asarray(c) for c in ct])
        return (_from_flat(flat)[:m_in],)

    to_bands.defvjp(to_fwd, to_bwd)

    @jax.custom_vjp
    def from_flat(flat):
        return _from_flat(flat)

    def from_fwd(flat):
        return from_flat(flat), None

    def from_bwd(_, ct):
        return (_to_flat(ct),)

    from_flat.defvjp(from_fwd, from_bwd)

    _PERM_CACHE[key] = (to_bands, from_flat)
    _PERM_CACHE.move_to_end(key)
    while len(_PERM_CACHE) > 32:
        _PERM_CACHE.popitem(last=False)
    return _PERM_CACHE[key]


def _perm_multi_fn(layout: BandedLayout, H: int):
    """custom_vjp: H columns -> K [mk, H] banded stacks via ONE sort; the
    VJP runs the inverse perm on the H cotangent columns (one sort)."""
    key = (id(layout), "multi", H)
    if key in _PERM_CACHE:
        return _PERM_CACHE[key]
    import jax
    import jax.numpy as jnp

    from mini_tpu.ops.permute import apply_fixed_perm

    total = layout.total_padded
    m_pad = layout.m_pad

    def _pad(c):
        return jnp.concatenate(
            [c, jnp.zeros(total - c.shape[0], c.dtype)]
        )

    @jax.custom_vjp
    def to_bands(*cols):
        flats = apply_fixed_perm(
            layout.dev()["banded_rank"], *[_pad(c) for c in cols]
        )
        return tuple(
            jnp.stack(
                [layout._split_bands(f)[k] for f in flats], axis=1
            )
            for k in range(layout.K)
        )

    def fwd(*cols):
        return to_bands(*cols), cols[0].shape[0]

    def bwd(m_in, ct):
        # ct: K tuples of [mk, H]; re-flatten per column, inverse-perm all
        # H columns with one sort
        flat_cols = [
            jnp.concatenate([jnp.asarray(c)[:, h] for c in ct])
            for h in range(H)
        ]
        outs = apply_fixed_perm(layout.dev()["inv_rank"], *flat_cols)
        if H == 1:
            outs = (outs,)
        return tuple(o[:m_pad][:m_in] for o in outs)

    to_bands.defvjp(fwd, bwd)
    _PERM_CACHE[key] = to_bands
    _PERM_CACHE.move_to_end(key)
    while len(_PERM_CACHE) > 32:
        _PERM_CACHE.popitem(last=False)
    return to_bands


def build_banded_layout(
    offsets: np.ndarray,  # int[n_pad+1] segment offsets (CSC for pull)
    gather_ids: np.ndarray,  # int32[m_pad] source-of-message per edge
    weights: np.ndarray,  # float32[m_pad]
    edge_valid: np.ndarray,  # bool[m_pad] — False for ghost/pad edges
    band_rows: int,
    direction: str,
    edge_chunk: int = EDGE_CHUNK,
) -> BandedLayout:
    """Group edges by gather-id band, preserving segment order within each
    band.  Pad/ghost edges keep weight 0 and id 0 so they are no-ops."""
    n_pad = offsets.shape[0] - 1
    m_pad = gather_ids.shape[0]
    assert n_pad % ROW_TILE == 0
    band_rows = min(_round_up(band_rows, ROW_TILE), n_pad)
    K = (n_pad + band_rows - 1) // band_rows

    offsets = offsets.astype(np.int64)
    gid = gather_ids.astype(np.int64)
    # segment id of every edge (offsets are for contiguous sorted segments)
    seg = np.repeat(np.arange(n_pad), np.diff(offsets))
    band = gid // band_rows
    band = np.where(edge_valid, band, K - 1)  # pad edges -> last band

    ids, w_b, lens, eids = [], [], [], []
    band_offsets, band_valid = [], []
    bounds = np.zeros((K, n_pad // ROW_TILE + 1), np.int32)
    offs2d = np.zeros((K, n_pad // ROW_TILE, ROW_TILE), np.int32)
    banded_rank = np.empty(m_pad, np.int64)
    flat_base = 0
    for k in range(K):
        sel = band == k  # CSC order is (dst, src)-sorted; filtering keeps it
        idx = np.nonzero(sel)[0]
        mk = int(idx.shape[0])
        mk_pad = max(_round_up(mk, edge_chunk), edge_chunk)
        local = (gid[idx] - k * band_rows).astype(np.int32)
        local = np.where(edge_valid[idx], local, 0).astype(np.int32)
        wk = np.where(edge_valid[idx], weights[idx], 0.0).astype(np.float32)
        pad = mk_pad - mk
        ids.append(np.concatenate([local, np.zeros(pad, np.int32)]))
        w_b.append(np.concatenate([wk, np.zeros(pad, np.float32)]))
        eids.append(
            np.concatenate([idx.astype(np.int32),
                            np.zeros(pad, np.int32)])
        )
        band_valid.append(
            np.concatenate([edge_valid[idx], np.zeros(pad, bool)])
        )
        lens.append(mk)
        # per-dst offsets within this band's stream
        cnt = np.bincount(seg[idx], minlength=n_pad)
        offk = np.zeros(n_pad + 1, np.int64)
        np.cumsum(cnt, out=offk[1:])
        bounds[k] = offk[::ROW_TILE].astype(np.int32)
        offs2d[k] = offk[:n_pad].reshape(-1, ROW_TILE).astype(np.int32)
        band_offsets.append(offk.astype(np.int32))
        banded_rank[idx] = flat_base + np.arange(mk)
        flat_base += mk_pad

    # pad slots of the rank map: point unused CSC positions nowhere —
    # there are none (every m_pad position got a band); padding slots in
    # the FLAT banded stream are the ranks not assigned, which
    # apply_fixed_perm fills from the zero-padded input tail.
    used = np.zeros(flat_base, bool)
    used[banded_rank] = True
    free = np.nonzero(~used)[0]
    # ranks for the (total_padded - m_pad) zero-fill tail entries
    banded_rank_full = np.concatenate([banded_rank, free]).astype(np.int32)

    return BandedLayout(
        direction=direction,
        band_rows=band_rows,
        n_pad=n_pad,
        m_pad=m_pad,
        ids=ids,
        weights=w_b,
        lens=lens,
        bounds=bounds,
        offs2d=offs2d,
        banded_rank=banded_rank_full,
        eids=eids,
        offsets=band_offsets,
        valid=band_valid,
        w_binary=bool(
            np.all((weights == 0.0) | (weights == 1.0))
        ),
        edge_chunk=edge_chunk,
    )


# ---------------------------------------------------------------------------
# Per-graph cache, keyed by the GraphSlice fingerprint (a static meta field
# stamped at from_host time, so it survives jit retracing).  Both caches are
# LRU-bounded so long-lived processes loading many graphs don't grow host
# memory without bound (each layout holds ~3x the graph's edge bytes).

MAX_HOST_GRAPHS = 8
MAX_LAYOUTS = 16

_HOST_CACHE: OrderedDict = OrderedDict()  # fingerprint -> host arrays
_LAYOUT_CACHE: OrderedDict = OrderedDict()  # (fp, dir, rows, chunk) -> layout


def _lru_touch(cache: OrderedDict, key, limit: int):
    cache.move_to_end(key)
    while len(cache) > limit:
        cache.popitem(last=False)


def register_host_graph(fingerprint: str, host_arrays: dict) -> None:
    """Called by GraphSlice.from_host with the padded host-side arrays
    needed to build layouts later (col/row offsets, srcs/dsts, weights,
    edge masks)."""
    _HOST_CACHE[fingerprint] = host_arrays
    _lru_touch(_HOST_CACHE, fingerprint, MAX_HOST_GRAPHS)
    # layouts of evicted graphs are keyed by fingerprint prefix — drop them
    live = set(_HOST_CACHE)
    for k in [k for k in _LAYOUT_CACHE if k[0] not in live]:
        del _LAYOUT_CACHE[k]


_COMPOSITE_CACHE: OrderedDict = OrderedDict()  # layout-pair -> jnp rank


def get_pull_to_push_rank(g, pull: "BandedLayout", push: "BandedLayout"):
    """Composite static rank: flat pull-band slot -> flat push-band slot
    of the SAME edge (round 5).

    Collapses the GAT native backward's band->CSC->CSR->band sort chain
    (4 salted multi-payload sorts) into ONE: pull slot -> csc position
    (pull.banded_rank inverse) -> csr position (host csr_to_csc_rank
    inverse) -> push slot (push.banded_rank), composed host-side once
    per layout pair.  Pad slots map bijectively onto push pad slots, so
    zero-padded pull streams emerge as zero-padded push streams.

    Returns an int32 device array of length ``max(total_pull,
    total_push)``; apply to inputs padded to that length and slice the
    result to ``push.total_padded``.  None when the host arrays for
    this graph are unknown."""
    fp = getattr(g, "fingerprint", None)
    if fp is None or fp not in _HOST_CACHE:
        return None
    h = _HOST_CACHE[fp]
    if "csr_to_csc_rank" not in h:
        return None
    key = (
        fp, "p2p", pull.band_rows, pull.edge_chunk,
        push.band_rows, push.edge_chunk,
    )
    if key in _COMPOSITE_CACHE:
        _lru_touch(_COMPOSITE_CACHE, key, 16)
        return _COMPOSITE_CACHE[key]
    import jax
    import jax.numpy as jnp

    m_pad = pull.m_pad
    assert push.m_pad == m_pad
    csr_to_csc = np.asarray(h["csr_to_csc_rank"], np.int64)
    n_total = max(pull.total_padded, push.total_padded)
    comp = np.full(n_total, -1, np.int64)
    pull_rank = np.asarray(pull.banded_rank, np.int64)
    push_rank = np.asarray(push.banded_rank, np.int64)
    # csr edge i: lives at pull slot pull_rank[csr_to_csc[i]] and push
    # slot push_rank[i]
    comp[pull_rank[:m_pad][csr_to_csc]] = push_rank[:m_pad]
    used = np.zeros(n_total, bool)
    used[push_rank[:m_pad]] = True
    free = np.nonzero(~used)[0]
    hole = comp < 0
    comp[hole] = free  # both are exactly the n_total - m_pad pad slots
    with jax.ensure_compile_time_eval():
        arr = jnp.asarray(comp.astype(np.int32))
    _COMPOSITE_CACHE[key] = arr
    _lru_touch(_COMPOSITE_CACHE, key, 16)
    return arr


def get_layout(
    g, direction: str = "pull", row_bytes: int = 512,
    edge_chunk: int = EDGE_CHUNK,
) -> Optional[BandedLayout]:
    """Banded layout for a GraphSlice, or None when the host data for this
    graph is unknown (e.g. a GraphSlice reconstructed from raw arrays).

    ``row_bytes`` = bytes per gathered feature row (F * itemsize); the band
    height is chosen so one band's table stays under the measured
    fast-gather ceiling.
    """
    fp = getattr(g, "fingerprint", None)
    if fp is None or fp not in _HOST_CACHE:
        return None
    if g.n_pad % ROW_TILE != 0:  # oddly padded slices: no banded layout
        return None
    band_rows = max(ROW_TILE, FAST_TABLE_BYTES // max(row_bytes, 1))
    band_rows = min(_round_up(band_rows, ROW_TILE), g.n_pad)
    key = (fp, direction, band_rows, edge_chunk)
    if key not in _LAYOUT_CACHE:
        h = _HOST_CACHE[fp]
        if direction == "pull":
            _LAYOUT_CACHE[key] = build_banded_layout(
                h["col_offsets"], h["csc_srcs"], h["csc_weights"],
                h["edge_mask"], band_rows, "pull", edge_chunk=edge_chunk,
            )
        elif direction == "push":
            _LAYOUT_CACHE[key] = build_banded_layout(
                h["row_offsets"], h["csr_dsts"], h["csr_weights"],
                h["edge_mask"], band_rows, "push", edge_chunk=edge_chunk,
            )
        else:
            raise ValueError(f"unknown direction {direction!r}")
    _lru_touch(_LAYOUT_CACHE, key, MAX_LAYOUTS)
    return _LAYOUT_CACHE[key]
