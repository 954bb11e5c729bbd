"""Boundary (halo) feature exchange — the all-to-all refinement of the
all-gather slab exchange (BASELINE.json north_star: "exchanging boundary
frontier/feature slabs all-to-all over ICI ... overlapped with local
segmented aggregation").

Host side (once per graph): for every shard pair (owner t -> consumer s),
the set of t's rows that s's in-edges read is static.  We precompute

* ``send_idx[t, s, H]``: local row ids shard t sends to shard s (padded),
* ``src_slot[s, m_loc]``: for each of s's edges, the position of its source
  row in s's receive buffer (halo slabs, t-major) or in s's own rows.

Device side per SpMM: each shard gathers its send rows, one
``all_to_all`` moves the halo slabs, and the local segmented aggregation
reads from [halo | own] — total wire traffic is the boundary set, not the
full feature matrix.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mini_tpu.parallel.partition import PartitionedGraph
from mini_tpu.parallel.distributed import DeviceShards
from mini_tpu.ops.segment import segment_reduce
from mini_tpu.graph.csr import _round_up


@dataclasses.dataclass
class HaloPlan:
    """Host-side exchange plan; arrays stack on the shard axis."""

    halo_width: int  # H: max rows any shard sends to any other
    send_idx: np.ndarray  # int32[D, D, H]: [sender t, receiver s, slot]
    send_mask: np.ndarray  # bool[D, D, H]
    src_slot: np.ndarray  # int32[D, m_loc]: buffer position per edge
    boundary_rows: int  # total real (unpadded) halo rows


def build_halo_plan(pg: PartitionedGraph, h_multiple: int = 8) -> HaloPlan:
    D, n_loc, m_loc = pg.num_shards, pg.n_loc, pg.m_loc
    needed: list[list[np.ndarray]] = []  # needed[s][t] = t's local rows
    total_boundary = 0
    for s in range(D):
        em = pg.edge_mask[s]
        srcs = np.unique(pg.csc_srcs[s][em])
        per_owner = []
        for t in range(D):
            if t == s:
                per_owner.append(np.zeros(0, np.int32))
                continue
            rows = srcs[(srcs >= t * n_loc) & (srcs < (t + 1) * n_loc)]
            per_owner.append((rows - t * n_loc).astype(np.int32))
            total_boundary += len(rows)
        needed.append(per_owner)

    H = max(
        (len(needed[s][t]) for s in range(D) for t in range(D)), default=0
    )
    H = _round_up(max(H, 1), h_multiple)

    send_idx = np.zeros((D, D, H), np.int32)
    send_mask = np.zeros((D, D, H), bool)
    # position lookup: for consumer s, owner t, global src -> halo slot
    src_slot = np.zeros((D, m_loc), np.int32)
    for s in range(D):
        for t in range(D):
            rows = needed[s][t]
            send_idx[t, s, : len(rows)] = rows
            send_mask[t, s, : len(rows)] = True
        # map each edge's source to its buffer position:
        # halo slabs are t-major: slot = t * H + rank(row in needed[s][t]);
        # own rows sit after the halo: D * H + local_row
        em = pg.edge_mask[s]
        gsrc = pg.csc_srcs[s]
        owner = np.clip(gsrc // n_loc, 0, D - 1)
        slot = np.zeros(m_loc, np.int64)
        own = owner == s
        slot[own] = D * H + (gsrc[own] - s * n_loc)
        for t in range(D):
            if t == s:
                continue
            sel = (owner == t) & em
            if not sel.any():
                continue
            ranks = np.searchsorted(needed[s][t], gsrc[sel] - t * n_loc)
            slot[sel] = t * H + ranks
        slot[~em] = D * H  # ghost edges read own row 0 (weight 0 anyway)
        src_slot[s] = slot.astype(np.int32)
    return HaloPlan(
        halo_width=H,
        send_idx=send_idx,
        send_mask=send_mask,
        src_slot=src_slot,
        boundary_rows=total_boundary,
    )


def halo_spmm(
    pg: PartitionedGraph,
    shards: DeviceShards,
    plan: HaloPlan,
    x: jnp.ndarray,  # [D, n_loc, F] sharded on axis 0
    mesh: Mesh,
    axis: str = "graph",
) -> jnp.ndarray:
    """Pull-SpMM with boundary-only all-to-all exchange."""
    n_loc = pg.n_loc
    D = pg.num_shards
    H = plan.halo_width

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
    )
    def run(send_idx, src_slot, x_loc, csc_w, edst, emask):
        xs = x_loc[0]  # [n_loc, F]
        # rows this shard sends to every other shard: [D, H, F]
        out_rows = xs[send_idx[0].reshape(-1)].reshape(D, H, -1)
        # all_to_all: slab d goes to shard d; received[d] = slab FROM d
        halo = jax.lax.all_to_all(
            out_rows, axis, split_axis=0, concat_axis=0, tiled=True
        )  # [D, H, F] with slab t from shard t (t-major)
        buf = jnp.concatenate(
            [halo.reshape(D * H, -1), xs], axis=0
        )  # [D*H + n_loc, F]
        msgs = buf[src_slot[0]] * csc_w[0][:, None]
        out = segment_reduce(
            msgs, edst[0], n_loc, "sum", mask=emask[0][:, None]
        )
        return out[None]

    put = NamedSharding(mesh, P(axis))
    return jax.jit(run)(
        jax.device_put(jnp.asarray(plan.send_idx), put),
        jax.device_put(jnp.asarray(plan.src_slot), put),
        x,
        shards.csc_weights,
        shards.csc_dsts_local,
        shards.edge_mask,
    )
