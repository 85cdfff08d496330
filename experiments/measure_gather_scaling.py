"""Atlas-gather cost vs table size (two-point slope, varied indices)."""
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


rng = np.random.default_rng(0)
idx0 = jnp.asarray(rng.integers(0, 1 << 30, N).astype(np.int32))

for table_sz in (4096, 16384, 65536, 262144, 1048576):
    table = jnp.asarray(rng.integers(0, 1 << 30, table_sz).astype(np.int32))

    def body(k, salt, table=table, sz=table_sz):
        def step(i, acc):
            ix = jnp.abs(idx0 + i.astype(jnp.int32) + salt.astype(jnp.int32)) % sz
            return acc + jnp.take(table, ix).sum()
        return jax.lax.fori_loop(0, k, step, jnp.int32(0))

    t = slope(body)
    print(f"table={table_sz:>8}: {t*1e3:7.3f} ms / {N} gathers "
          f"({t/N*1e9:.2f} ns/el)", flush=True)
