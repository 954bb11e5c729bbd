"""Benchmark timing utilities (the reference's ad-hoc ``test_timer_t``,
`/root/reference/gunrock/tests/test_utils.hxx:168-191`, upgraded with warmup,
repetition statistics, and MTEPS reporting — which the reference lacks)."""

from __future__ import annotations

import dataclasses
import time
from typing import Callable

import numpy as np


def _tree_leaves(x):
    import jax

    return jax.tree_util.tree_leaves(x)


@dataclasses.dataclass
class Timing:
    mean_s: float
    min_s: float
    std_s: float
    runs: int

    def mteps(self, edges_traversed: float) -> float:
        """Millions of traversed edges per second (graph-framework standard
        metric; min time = peak rate)."""
        return edges_traversed / self.min_s / 1e6


def time_fn(
    fn: Callable[[], object],
    warmup: int = 2,
    repeat: int = 5,
    block: Callable[[object], None] | None = None,
) -> Timing:
    """Time ``fn`` with device-sync via ``block`` (jax.block_until_ready)."""
    if block is None:
        import jax

        block = jax.block_until_ready
    for i in range(warmup):
        out = block(fn())
        if i == 0:
            # under remote-tunnel backends (axon) compilation is async and
            # block_until_ready can return before it finishes; a real fetch
            # of one element forces full completion before timing starts
            leaves = [
                l for l in _tree_leaves(out) if hasattr(l, "__array__")
            ]
            if leaves:
                np.asarray(leaves[0].ravel()[:1])
    samples = []
    for _ in range(repeat):
        t0 = time.perf_counter()
        block(fn())
        samples.append(time.perf_counter() - t0)
    a = np.array(samples)
    return Timing(
        mean_s=float(a.mean()),
        min_s=float(a.min()),
        std_s=float(a.std()),
        runs=repeat,
    )


class wall_timer:
    """Context-manager wall clock."""

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.t0
        return False
