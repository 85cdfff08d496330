"""Per-DMA cost of dynamic-row HBM->VMEM copies (round 5, VERDICT #2).

measure_texspan.py killed the windowed-DMA texel scheme (sorted-block spans
are 2-5M texels; no VMEM window covers that).  The one remaining in-kernel
mechanism is a DMA loop over each block's *unique atlas rows* (~5-20K rows
per 131072-lane bounce).  This measures what K back-to-back dynamic-row
DMAs cost inside one kernel, double-buffered (start row i+1 before waiting
on row i), so the per-DMA floor can be compared against the 0.92 ms full
HLO gather it would have to beat.

Timing per CLAUDE.md: varied inputs per rep (the tunnel memoizes
identical-buffer executions); two-point slope over K removes launch floors.

Run:  python -m experiments.measure_dma_rows
"""
from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
T_ROWS = 1 << 17  # 16M texels -> full-atlas scale


def dma_kernel(k_steps, rows_ref, tab_ref, out_ref, scratch, sem0, sem1):
    """Double-buffered: start row i+1's copy into the other slot before
    waiting on row i, so DMA issue overlaps DMA completion."""

    def copy(i, slot):
        sem = sem0 if slot == 0 else sem1
        return pltpu.make_async_copy(
            tab_ref.at[pl.ds(rows_ref[0, i], 1)],
            scratch.at[pl.ds(slot, 1)], sem,
        )

    copy(0, 0).start()

    def body(i, acc):
        cur0 = jax.lax.rem(i, 2) == 0
        nxt = i + 1

        @pl.when((nxt < k_steps) & cur0)
        def _():
            copy(nxt, 1).start()

        @pl.when((nxt < k_steps) & ~cur0)
        def _():
            copy(nxt, 0).start()

        @pl.when(cur0)
        def _():
            copy(i, 0).wait()

        @pl.when(~cur0)
        def _():
            copy(i, 1).wait()

        row = jnp.where(cur0, scratch[pl.ds(0, 1)], scratch[pl.ds(1, 1)])
        return acc + row

    out_ref[:] = jax.lax.fori_loop(
        0, k_steps, body, jnp.zeros((1, LANES), jnp.float32)
    )


def run(k_steps, rows, table):
    return pl.pallas_call(
        partial(dma_kernel, k_steps),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )(rows, table)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(7)
    table = jnp.asarray(rng.random((T_ROWS, LANES), np.float32))

    for K in (256, 2048):
        # correctness once per K
        rows = rng.integers(0, T_ROWS, (1, K)).astype(np.int32)
        got = np.asarray(run(K, jnp.asarray(rows), table))
        want = np.asarray(table)[rows[0]].sum(0, keepdims=True)
        err = np.abs(got - want).max() / max(1.0, np.abs(want).max())
        print(f"K={K}: rel err {err:.2e}", flush=True)

    # timing: varied rows per rep; slope between K=256 and K=2048
    med = {}
    for K in (256, 2048):
        ts = []
        for rep in range(6):
            rows = jnp.asarray(
                rng.integers(0, T_ROWS, (1, K)).astype(np.int32))
            t0 = time.time()
            run(K, rows, table).block_until_ready()
            ts.append(time.time() - t0)
        ts = sorted(ts)[1:-1]
        med[K] = float(np.mean(ts))
        print(f"K={K}: mean-of-mid {med[K]*1e3:.3f} ms  (all: "
              f"{[round(t*1e3, 2) for t in ts]})", flush=True)
    per_dma_ns = (med[2048] - med[256]) / (2048 - 256) * 1e9
    print(f"slope: {per_dma_ns:.0f} ns per dynamic-row DMA "
          f"(cf. HLO gather ~7 ns/lane, 0.92 ms per 131072-lane bounce; "
          f"a 5-20K-row DMA loop would cost "
          f"{5000*per_dma_ns/1e6:.1f}-{20000*per_dma_ns/1e6:.1f} ms)",
          flush=True)
