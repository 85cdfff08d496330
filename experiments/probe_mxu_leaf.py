"""Mosaic lowering probe for the MXU leaf-intersection design.

Checks, inside one Pallas TPU kernel at the BVH walk's shapes:
  1. jax.lax.dot_general((16,128), (16,1024)) contracting axis 0 -> (128,1024)
  2. slicing (16,1024) quantity rows out of the (128,1024) result
  3. jnp.any / jnp.min over axis 0 of (16,1024) -> (1,1024)
  4. reshape (1,1024) -> (8,128) and (8,128) -> (1,1024)  [relayouts]
  5. dynamic lane-slice of a (16, G*128) VMEM operand at a 128-aligned
     traced offset (pl.ds)

Prints PASS/FAIL per item; numerical check against numpy on item 1.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python experiments/probe_mxu_leaf.py
"""
from __future__ import annotations

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

G = 8  # leaf groups in the probe table


def try_case(name, fn):
    try:
        out = fn()
        print(f"PASS {name}: {out}", flush=True)
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"FAIL {name}: {type(e).__name__}: {msg}", flush=True)
        return False


rng = np.random.default_rng(0)
P = rng.normal(size=(16, G * 128)).astype(np.float32)
F = rng.normal(size=(16, 1024)).astype(np.float32)


def k_dot(p_ref, f_ref, o_ref):
    ps = p_ref[:, pl.ds(2 * 128, 128)]          # static group 2
    out = jax.lax.dot_general(
        ps, f_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (128, 1024)
    det = out[0:16, :]
    o_ref[:] = det


def run_dot():
    out = pl.pallas_call(
        k_dot,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, 1024), jnp.float32),
    )(P, F)
    ref = (P[:, 2 * 128 : 2 * 128 + 128].T @ F)[0:16]
    err = float(np.max(np.abs(np.asarray(out) - ref)))
    scale = float(np.max(np.abs(ref)))
    return f"max abs err {err:.3e} (scale {scale:.1f})"


def k_dyn(idx_ref, p_ref, f_ref, o_ref):
    g = idx_ref[0]
    ps = p_ref[:, pl.ds(g * 128, 128)]
    out = jax.lax.dot_general(
        ps, f_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    o_ref[:] = out[16:32, :]


def run_dyn():
    out = pl.pallas_call(
        k_dyn,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, 1024), jnp.float32),
    )(jnp.array([3], jnp.int32), P, F)
    ref = (P[:, 3 * 128 : 4 * 128].T @ F)[16:32]
    err = float(np.max(np.abs(np.asarray(out) - ref)))
    return f"max abs err {err:.3e}"


def k_red(f_ref, o_any, o_min):
    x = f_ref[:]
    o_any[:] = jnp.any(x > 0.0, axis=0, keepdims=True).astype(jnp.float32)
    o_min[:] = jnp.min(x, axis=0, keepdims=True)


def run_red():
    a, m = pl.pallas_call(
        k_red,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((1, 1024), jnp.float32)] * 2,
    )(F)
    ok = np.allclose(np.asarray(m), F.min(axis=0, keepdims=True))
    return f"min match {ok}"


def k_narrow(f_ref, o_ref):
    x = jnp.min(f_ref[:], axis=0, keepdims=True)  # (1, 1024)
    o_ref[:] = x.reshape(8, 128)


def run_narrow():
    out = pl.pallas_call(
        k_narrow,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(F)
    ok = np.allclose(np.asarray(out), F.min(axis=0).reshape(8, 128))
    return f"reshape (1,1024)->(8,128) match {ok}"


def k_widen(x_ref, o_ref):
    o_ref[:] = x_ref[:].reshape(1, 1024)


def run_widen():
    x = rng.normal(size=(8, 128)).astype(np.float32)
    out = pl.pallas_call(
        k_widen,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1024), jnp.float32),
    )(x)
    ok = np.allclose(np.asarray(out), x.reshape(1, 1024))
    return f"reshape (8,128)->(1,1024) match {ok}"


def k_bcast(n_ref, f_ref, o_ref):
    lim = n_ref[:]  # (1, 1024)
    o_ref[:] = f_ref[:] * lim  # broadcast (1,1024) over (16,1024)


def run_bcast():
    lim = rng.normal(size=(1, 1024)).astype(np.float32)
    out = pl.pallas_call(
        k_bcast,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, 1024), jnp.float32),
    )(lim, F)
    ok = np.allclose(np.asarray(out), F * lim)
    return f"broadcast match {ok}"


try_case("dot_general (16,128)x(16,1024) static slice", run_dot)
try_case("dot_general dynamic 128-aligned lane slice", run_dyn)
try_case("axis-0 any/min (16,1024)->(1,1024)", run_red)
try_case("reshape (1,1024)->(8,128)", run_narrow)
try_case("reshape (8,128)->(1,1024)", run_widen)
try_case("broadcast (1,1024) over (16,1024)", run_bcast)
print("done", flush=True)
