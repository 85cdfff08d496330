"""Does splitting one big gather into several independent ones pipeline?"""
from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = 131072
SZ = 262144

rng = np.random.default_rng(0)
idx0 = jnp.asarray(rng.integers(0, 1 << 30, N).astype(np.int32))
table = jnp.asarray(rng.integers(0, 1 << 30, SZ).astype(np.int32))


def slope(fn, k_lo=2, k_hi=16):
    f = jax.jit(fn, static_argnums=0)
    for k in (k_lo, k_hi):
        f(k, jnp.uint32(123)).block_until_ready()
    ts = {}
    for k in (k_lo, k_hi):
        t0 = time.time()
        f(k, jnp.uint32(7)).block_until_ready()
        ts[k] = time.time() - t0
    return (ts[k_hi] - ts[k_lo]) / (k_hi - k_lo)


for parts in (1, 2, 4, 8):
    w = N // parts

    def body(k, salt, parts=parts, w=w):
        def step(i, acc):
            ix = jnp.abs(idx0 + i.astype(jnp.int32) + salt.astype(jnp.int32)) % SZ
            tot = jnp.int32(0)
            for p in range(parts):
                tot = tot + jnp.take(table, ix[p * w:(p + 1) * w]).sum()
            return acc + tot
        return jax.lax.fori_loop(0, k, step, jnp.int32(0))

    t = slope(body)
    print(f"parts={parts}: {t*1e3:7.3f} ms ({t/N*1e9:.2f} ns/el)", flush=True)

# 2-D index shape: does (rows, 128) layout change the lowering?
idx2 = idx0.reshape(-1, 128)


def body2d(k, salt):
    def step(i, acc):
        ix = jnp.abs(idx2 + i.astype(jnp.int32) + salt.astype(jnp.int32)) % SZ
        return acc + jnp.take(table, ix).sum()
    return jax.lax.fori_loop(0, k, step, jnp.int32(0))


t = slope(body2d)
print(f"2-D idx:  {t*1e3:7.3f} ms ({t/N*1e9:.2f} ns/el)", flush=True)

# one-hot MXU contraction for a small table shard (4096): matmul instead of
# gather — dense but rides the MXU
SMALL = 4096
tsmall = jnp.asarray(rng.integers(0, 1 << 20, SMALL).astype(np.float32))


def body_onehot(k, salt):
    def step(i, acc):
        ix = jnp.abs(idx0 + i.astype(jnp.int32) + salt.astype(jnp.int32)) % SMALL
        oh = jax.nn.one_hot(ix, SMALL, dtype=jnp.bfloat16)
        v = oh @ tsmall.astype(jnp.bfloat16)
        return acc + v.astype(jnp.float32).sum()
    return jax.lax.fori_loop(0, k, step, jnp.float32(0.0))


t = slope(body_onehot, k_lo=2, k_hi=6)
print(f"one-hot 4096: {t*1e3:7.3f} ms ({t/N*1e9:.2f} ns/el)", flush=True)
