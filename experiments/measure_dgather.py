"""Probe tpu.dynamic_gather (Pallas take_along_axis) shapes + throughput.

The Mosaic lowering (jax 0.9.0, _gather_lowering_rule) accepts
jnp.take_along_axis(x, idx, axis=0|1) when x, idx, out all share one 2D
shape and mode is promise_in_bounds.  Semantics:
  axis=0: out[i, j] = x[idx[i, j], j]   (gather along sublanes)
  axis=1: out[i, j] = x[i, idx[i, j]]   (gather along lanes)

Question: which shapes lower, and what is the per-element cost vs the flat
~7 ns/element HLO gather (experiments/measure_tex3.py)?  A fast dim-0
gather on a (R, 128) table replicated across lanes would give per-lane
table lookups *inside* existing megakernels (no extra pallas_call, no
fusion break).

Run serialized on the TPU (single-client tunnel).
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(reps: int, axis: int, x_ref, idx_ref, o_ref):
    x = x_ref[:]
    idx = idx_ref[:]
    n = x.shape[axis]

    def body(_, carry):
        val, cur = carry
        g = jnp.take_along_axis(x, cur, axis=axis, mode="promise_in_bounds")
        # data-dependent next index so reps can't be collapsed
        nxt = (cur + g.astype(jnp.int32)) % n
        return val + g, nxt

    val, _ = jax.lax.fori_loop(0, reps, body, (jnp.zeros_like(x), idx))
    o_ref[:] = val


def run(shape, axis, reps, interpret=False):
    @jax.jit
    def go(x, idx):
        return pl.pallas_call(
            functools.partial(_kernel, reps, axis),
            out_shape=jax.ShapeDtypeStruct(shape, jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(x, idx)

    rng = np.random.default_rng(0)
    n = shape[axis]
    x = jnp.asarray(rng.integers(0, 7, size=shape), jnp.int32)
    idx = jnp.asarray(rng.integers(0, n, size=shape), jnp.int32)
    out = go(x, idx)
    out.block_until_ready()
    return go, x, out


def ref_result(shape, axis, reps):
    rng = np.random.default_rng(0)
    n = shape[axis]
    x = np.asarray(rng.integers(0, 7, size=shape), np.int32)
    idx = np.asarray(rng.integers(0, n, size=shape), np.int32)
    val = np.zeros_like(x)
    cur = idx
    for _ in range(reps):
        g = np.take_along_axis(x, cur, axis=axis)
        cur = (cur + g) % n
        val = val + g
    return val


def main():
    shapes = [
        ((8, 128), 1),
        ((8, 128), 0),
        ((256, 128), 0),
        ((1024, 128), 0),
        ((4096, 128), 0),
        ((8, 2048), 1),
        ((256, 2048), 1),
        ((1024, 512), 0),
    ]
    for shape, axis in shapes:
        label = f"{shape} axis={axis}"
        try:
            go, x, out = run(shape, axis, reps=2)
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")[0][:140]
            print(f"{label}: LOWERING FAIL: {msg}")
            continue
        ref = ref_result(shape, axis, reps=2)
        ok = np.array_equal(np.asarray(out), ref)
        # two-point slope: reps=4 vs reps=36, fresh inputs per call
        ts = {}
        for reps in (4, 36):
            gor, xx, _ = run(shape, axis, reps=reps)
            rng = np.random.default_rng(reps)
            n = shape[axis]
            idx2 = jnp.asarray(rng.integers(0, n, size=shape), jnp.int32)
            x2 = jnp.asarray(rng.integers(0, 7, size=shape), jnp.int32)
            t0 = time.perf_counter()
            gor(x2, idx2).block_until_ready()
            ts[reps] = time.perf_counter() - t0
        per_gather = (ts[36] - ts[4]) / 32.0
        n_el = shape[0] * shape[1]
        print(
            f"{label}: exact={ok} per_gather={per_gather*1e6:.1f} us "
            f"({per_gather/n_el*1e9:.3f} ns/el)  raw {ts[4]*1e3:.1f}/{ts[36]*1e3:.1f} ms"
        )


if __name__ == "__main__":
    main()
