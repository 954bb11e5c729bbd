"""Round-5 probe (VERDICT #3): VMEM-resident butterfly stages vs the
lax.sort fixed-permutation floor (~2.5 ns/elem in-loop).

A Benes network realizes any fixed permutation of m=2^k elements in
2k-1 butterfly stages (stage stride s: element i exchanges with i^s when
its switch bit says so).  XLA's per-stage lowering costs ~5 memory
passes (round-3 Benes record, BASELINE.md) — 43 stages = 9.8 ms @ 2M,
a wash with the sort.  The open question: a Pallas kernel holding the
WHOLE array in VMEM (8 MB @ 2M f32, 16 MB/core budget) pays HBM once
and runs stages at VMEM/VPU speed.  This probe measures per-stage cost
with RANDOM switch masks (cost is mask-independent; 32 stages pack into
one uint32 bitplane word per element) and checks kernel mechanics vs a
NumPy oracle.  Kill criteria (VERDICT): extrapolated full-network cost
>= 0.8x sort -> retire next to the Benes record; < 0.5x -> productionize
under apply_fixed_perm.

Usage: python scratch/probe_butterfly.py [log2_m] [n_stages]
"""

import functools
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

d = os.path.expanduser("~/.cache/mini_tpu_jax")
os.makedirs(d, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", d)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOGM = int(sys.argv[1]) if len(sys.argv) > 1 else 21
NSTAGES = int(sys.argv[2]) if len(sys.argv) > 2 else 8
M = 1 << LOGM
LANES = 128
ROWS = M // LANES

# stage strides: mix lane-level (<128) and row-level (>=128) like a real
# Benes schedule (descending then ascending)
ALL_STRIDES = [1 << j for j in range(LOGM - 1, -1, -1)] + [
    1 << j for j in range(1, LOGM)
]
STRIDES = ALL_STRIDES[:NSTAGES]


def kernel(x_ref, mask_ref, out_ref):
    x = x_ref[:]  # [ROWS, LANES] f32 in VMEM
    mw = mask_ref[:]  # [ROWS, LANES] int32 bitplanes (bit j = stage j)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 0)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1)
    for j, s in enumerate(STRIDES):
        swap = ((mw >> j) & 1) == 1
        if s < LANES:
            # lane-level exchange: partner lane = lane ^ s via two rolls
            # (pltpu.roll needs non-negative shifts; -s == size - s)
            left = pltpu.roll(x, LANES - s, 1)
            right = pltpu.roll(x, s, 1)
            partner = jnp.where((lane_ids & s) == 0, left, right)
        else:
            r = s // LANES
            up = pltpu.roll(x, ROWS - r, 0)
            down = pltpu.roll(x, r, 0)
            partner = jnp.where((row_ids & r) == 0, up, down)
        x = jnp.where(swap, partner, x)
    out_ref[:] = x


@jax.jit
def run(x, mask):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, mask)


def oracle(x, mask):
    x = x.copy()
    idx = np.arange(M)
    for j, s in enumerate(STRIDES):
        swap = ((mask >> j) & 1) == 1
        partner = x[idx ^ s]
        x = np.where(swap.reshape(-1), partner, x)
        # keep pairs consistent: both sides of a pair carry the same bit
    return x


def main():
    print(f"backend={jax.default_backend()} m=2^{LOGM} "
          f"stages={NSTAGES} strides={STRIDES[:6]}...", flush=True)
    rng = np.random.RandomState(0)
    x_np = rng.rand(M).astype(np.float32)
    # pair-consistent random switch bits: bit for pair p at stage j
    mask_np = np.zeros(M, np.int32)
    idx = np.arange(M)
    for j, s in enumerate(STRIDES):
        bits = rng.randint(0, 2, M).astype(np.int32)
        low = idx & ~s  # pair representative
        pair_bits = bits[low]  # both elements read the rep's bit
        mask_np |= pair_bits << j

    x = jnp.asarray(x_np.reshape(ROWS, LANES))
    mask = jnp.asarray(mask_np.reshape(ROWS, LANES))

    t0 = time.perf_counter()
    out = np.asarray(run(x, mask))
    print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    exp = oracle(x_np, mask_np).reshape(ROWS, LANES)
    ok = np.array_equal(out, exp)
    print(f"mechanics correct: {ok}", flush=True)
    if not ok:
        bad = np.argwhere(out != exp)
        print("first mismatches:", bad[:5], flush=True)

    # in-loop timing: R chained applications inside one jit
    R = 32

    @jax.jit
    def loop(x, mask):
        return jax.lax.fori_loop(
            0, R, lambda i, a: run(a, mask), x
        )

    np.asarray(loop(x, mask))  # compile
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(loop(x, mask))
        best = min(best, time.perf_counter() - t0)
    per_call = best / R
    per_stage = per_call / NSTAGES
    full = per_stage * (2 * LOGM - 1)
    print(
        f"per-call {per_call*1e3:.3f} ms  per-stage {per_stage*1e3:.4f} ms"
        f"  ({per_stage/M*1e9:.3f} ns/elem/stage)", flush=True)
    print(
        f"extrapolated full Benes ({2*LOGM-1} stages): {full*1e3:.2f} ms"
        f"  vs sort floor ~{2.5*M/1e6:.1f} ms "
        f"(ratio {full/(2.5e-9*M):.2f})", flush=True)


if __name__ == "__main__":
    main()
