"""Probe: which per-lane dynamic-indexing primitives does this Mosaic
toolchain compile? (round 5, VERDICT #2 — the atlas-gather DMA attack)

Each probe is tiny and independent; a failure prints the exception class
and first line.  Run on the real TPU:  python -m experiments.probe_gather
"""
from __future__ import annotations

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import functools
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name):
    def deco(fn):
        def run():
            try:
                got, want = fn()
                ok = np.allclose(np.asarray(got), want)
                print(f"PROBE {name}: {'OK' if ok else 'WRONG RESULT'}"
                      + ("" if ok else f" got {np.asarray(got)[:4]} want {want[:4]}"),
                      flush=True)
            except Exception as e:
                first = str(e).splitlines()[0][:300] if str(e) else repr(e)[:300]
                print(f"PROBE {name}: FAIL {type(e).__name__}: {first}", flush=True)
        return run
    return deco


ROWS, LANES = 8, 128


@probe("vmem_gather_flat_table")
def p1():
    """table[(idx)] per-lane gather from a VMEM-resident flat table."""
    T = 512
    table = jnp.arange(T, dtype=jnp.float32) * 2.0
    idx = jnp.tile(jnp.arange(LANES, dtype=jnp.int32)[None, :] * 3, (ROWS, 1)) % T

    def k(tab_ref, idx_ref, out_ref):
        out_ref[:] = tab_ref[:][idx_ref[:]]

    out = pl.pallas_call(
        k,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.float32),
    )(table, idx)
    want = np.asarray(np.tile(np.arange(LANES)[None, :] * 3, (ROWS, 1)) % T) * 2.0
    return out, want


@probe("take_along_axis_lane_shuffle")
def p2():
    """Per-lane shuffle within the lane dim: take_along_axis(v, idx, -1)."""
    v = jnp.tile(jnp.arange(LANES, dtype=jnp.float32)[None, :] * 5, (ROWS, 1))
    idx = jnp.tile((jnp.arange(LANES, dtype=jnp.int32) * 7)[None, :] % LANES, (ROWS, 1))

    def k(v_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(v_ref[:], idx_ref[:], axis=-1)

    out = pl.pallas_call(
        k,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.float32),
    )(v, idx)
    want = (np.arange(LANES) * 7 % LANES * 5.0)[None, :].repeat(ROWS, 0)
    return out, want


@probe("take_along_axis_sublane")
def p3():
    """Per-lane row pick within sublanes: take_along_axis(v, idx, 0)."""
    v = (jnp.arange(ROWS, dtype=jnp.float32)[:, None]
         + jnp.zeros((1, LANES), jnp.float32))
    idx = jnp.tile((jnp.arange(LANES, dtype=jnp.int32) % ROWS)[None, :], (1, 1))

    def k(v_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(v_ref[:], idx_ref[:], axis=0)

    out = pl.pallas_call(
        k,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, LANES), jnp.float32),
    )(v, idx)
    want = (np.arange(LANES) % ROWS).astype(np.float32)[None, :]
    return out, want


@probe("hbm_dyn_row_copy_loop")
def p4():
    """fori_loop of dynamic-row HBM->VMEM copies (known-good per round 4;
    re-proved here in the exact loop form the texel scheme needs)."""
    T = 64
    table = jnp.arange(T * LANES, dtype=jnp.float32).reshape(T, LANES)
    rows = jnp.array([[3, 7, 1, 0, 5, 2, 9, 11]], jnp.int32)  # (1, 8) SMEM

    def k(rows_ref, tab_ref, out_ref, scratch, sem):
        def body(i, _):
            r = rows_ref[0, i]
            cp = pltpu.make_async_copy(tab_ref.at[pl.ds(r, 1)],
                                       scratch.at[pl.ds(i, 1)], sem)
            cp.start()
            cp.wait()
            return 0

        jax.lax.fori_loop(0, 8, body, 0)
        out_ref[:] = scratch[:]

    out = pl.pallas_call(
        k,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, LANES), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )(rows, table)
    want = np.arange(T * LANES, dtype=np.float32).reshape(T, LANES)[
        [3, 7, 1, 0, 5, 2, 9, 11]]
    return out, want


@probe("vmem_dynamic_row_scalar_loop")
def p5():
    """Per-sublane dynamic row read from VMEM: v[dyn, :] inside fori."""
    T = 64
    table = jnp.arange(T * LANES, dtype=jnp.float32).reshape(T, LANES)
    rows = jnp.array([[3, 7, 1, 0, 5, 2, 9, 11]], jnp.int32)

    def k(rows_ref, tab_ref, out_ref):
        def body(i, _):
            r = rows_ref[0, i]
            out_ref[pl.ds(i, 1)] = tab_ref[pl.ds(r, 1)]
            return 0

        jax.lax.fori_loop(0, 8, body, 0)

    out = pl.pallas_call(
        k,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.float32),
    )(rows, table)
    want = np.arange(T * LANES, dtype=np.float32).reshape(T, LANES)[
        [3, 7, 1, 0, 5, 2, 9, 11]]
    return out, want


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    for p in (p1, p2, p3, p4, p5):
        p()
    print("probes done", flush=True)
