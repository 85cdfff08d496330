"""Split one regen iteration's cost: megakernel bounce vs texture resolve.

Two-point slope on the real TPU (CLAUDE.md: repeat-execution timings lie, so
every call varies an input).
"""
from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import path_tracing__ray_tracer_tpu as ptrt
from path_tracing__ray_tracer_tpu.compiler import compile_scene
from path_tracing__ray_tracer_tpu.models import path_tracer as pt
from path_tracing__ray_tracer_tpu.ops.v3 import V3

b = ptrt.CustomSceneBuilder()
scene = b.build_scene()
cs = compile_scene(scene, texture_budget=256)
N = 131072

bounce_fn, resolve_fn = pt._make_bounce_and_resolve(cs, N)

rng = np.random.default_rng(0)
o = V3(*[jnp.asarray(rng.uniform(-0.1, 0.1, N).astype(np.float32)) for _ in range(3)])
dn = rng.normal(size=(N, 3)).astype(np.float32)
dn /= np.linalg.norm(dn, axis=1, keepdims=True)
d = V3(*[jnp.asarray(dn[:, i]) for i in range(3)])
thr = V3.full(1.0, (N,))
key = jnp.arange(N, dtype=jnp.uint32)
depth = jnp.zeros((N,), jnp.int32)


def slope(fn, k_lo=2, k_hi=12):
    """jit fn(k) runs the body k times inside one dispatch; slope removes
    dispatch/sync floors."""
    f = jax.jit(fn, static_argnums=0)
    for k in (k_lo, k_hi):
        f(k, jnp.uint32(123)).block_until_ready()  # compile both
    ts = {}
    for k in (k_lo, k_hi):
        t0 = time.time()
        f(k, jnp.uint32(7)).block_until_ready()
        ts[k] = time.time() - t0
    return (ts[k_hi] - ts[k_lo]) / (k_hi - k_lo)


def bounce_body(k, salt):
    def step(i, acc):
        out = bounce_fn(o, d, thr, key + salt + i.astype(jnp.uint32), depth)
        return acc + out.w_nee.sum() + out.new_org.x.sum()
    return jax.lax.fori_loop(0, k, step, jnp.float32(0.0))


def full_body(k, salt):
    def step(i, acc):
        out = bounce_fn(o, d, thr, key + salt + i.astype(jnp.uint32), depth)
        base = resolve_fn(out)
        return acc + (base * out.w_nee).x.sum() + out.new_org.x.sum()
    return jax.lax.fori_loop(0, k, step, jnp.float32(0.0))


def resolve_only_body(k, salt):
    out0 = bounce_fn(o, d, thr, key + salt, depth)

    def step(i, acc):
        out = out0._replace(u=out0.u + i.astype(jnp.float32) * 1e-6)
        base = resolve_fn(out)
        return acc + base.x.sum()
    return jax.lax.fori_loop(0, k, step, jnp.float32(0.0))


tb = slope(bounce_body)
tf = slope(full_body)
tr = slope(resolve_only_body)
print(f"bounce only:   {tb*1e3:.2f} ms / {N} lanes")
print(f"bounce+resolve:{tf*1e3:.2f} ms  (delta {1e3*(tf-tb):.2f} ms)")
print(f"resolve only:  {tr*1e3:.2f} ms")
