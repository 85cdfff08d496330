"""Device->host transfer cost through the tunnel: the config-5 chunks
compute in 8 s but the render takes 66 s -- is the gap the 16x (131072,3)
f32 chunk-sum transfers?

Usage: python -m experiments.measure_d2h
"""
from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

N = 131072


@jax.jit
def make(seed):
    k = jax.random.fold_in(jax.random.PRNGKey(0), seed)
    return jax.random.uniform(k, (N, 3), jnp.float32)


# warm
x = make(jnp.int32(0))
jax.block_until_ready(x)
_ = np.asarray(x)
print("warm", flush=True)

for rep in range(3):
    x = make(jnp.int32(rep + 1))
    s = float(x.sum())  # compute done, 4-byte fetch
    t0 = time.time()
    arr = np.asarray(x)
    dt = time.time() - t0
    mb = arr.nbytes / 1e6
    print(f"f32 ({N},3): {dt*1e3:.0f} ms for {mb:.2f} MB = {mb/dt:.2f} MB/s",
          flush=True)

# u8 comparison
@jax.jit
def make8(seed):
    k = jax.random.fold_in(jax.random.PRNGKey(1), seed)
    return (jax.random.uniform(k, (N, 3)) * 255).astype(jnp.uint8)

y = make8(jnp.int32(0)); jax.block_until_ready(y); _ = np.asarray(y)
for rep in range(2):
    y = make8(jnp.int32(rep + 1))
    _ = float(y.sum())
    t0 = time.time()
    arr = np.asarray(y)
    dt = time.time() - t0
    mb = arr.nbytes / 1e6
    print(f"u8  ({N},3): {dt*1e3:.0f} ms for {mb:.2f} MB = {mb/dt:.2f} MB/s",
          flush=True)

# pipelining: dispatch 4 fresh computes, then fetch all
xs = [make(jnp.int32(10 + i)) for i in range(4)]
for x in xs:
    jax.block_until_ready(x)
t0 = time.time()
arrs = [np.asarray(x) for x in xs]
dt = time.time() - t0
print(f"4x f32 fetch back-to-back: {dt:.2f} s total", flush=True)
print("done", flush=True)
