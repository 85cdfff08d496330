"""Per-dispatch floor: N separate jit calls vs one lax.map-batched call.

Informs ROADMAP #3 (small renders are floor-bound): if one call computing
K chunks is much cheaper than K calls, a batched multi-chunk driver pays off.

RESULT (2026-08-17): inconclusive on this tunnel — repeat-execution
memoization and unreliable block_until_ready (CLAUDE.md) collapse both
variants to ~0.1 ms on the second trial even with varied salts.  The
~30 ms/dispatch floor was established with full varied-input renders;
any batched-dispatch claim must be validated the same way (e.g. config 2
end-to-end with a lax.map chunk driver), not with this microbenchmark.
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

N = 131072  # lanes per "chunk"
K = 8       # chunks

x = jnp.asarray(np.random.default_rng(0).normal(size=(N,)).astype(np.float32))


def work(v, salt):
    # ~50 vector ops on 131K lanes — a stand-in for a small chunk's compute
    def step(i, a):
        return a * 1.000001 + jnp.sin(a + salt) * 0.001
    return jax.lax.fori_loop(0, 50, step, v).sum()


one = jax.jit(work)
batched = jax.jit(lambda v, salts: jax.lax.map(lambda s: work(v, s), salts))

salts = jnp.arange(K, dtype=jnp.float32)
one(x, jnp.float32(0.0)).block_until_ready()
batched(x, salts).block_until_ready()

for trial in range(2):
    t0 = time.time()
    for k in range(K):
        r = one(x, jnp.float32(100.0 + trial * K + k))
    r.block_until_ready()
    t_sep = time.time() - t0

    t0 = time.time()
    batched(x, salts + 1000.0 + trial).block_until_ready()
    t_bat = time.time() - t0
    print(f"trial {trial}: {K} separate calls {t_sep*1e3:.1f} ms "
          f"({t_sep/K*1e3:.1f} ms/call) | one lax.map call {t_bat*1e3:.1f} ms "
          f"({t_bat/K*1e3:.1f} ms/chunk)", flush=True)
