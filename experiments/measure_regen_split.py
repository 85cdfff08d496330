"""Regen-iteration overhead split (round 3): what do the one-hot (NS, N)
accumulate and the roll-unshuffle cost next to the bounce + gather?

Usage: PYTHONPATH=/root/.axon_site:/root/repo python experiments/measure_regen_split.py
"""
from __future__ import annotations

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from experiments.measure_bvh2 import scan_slope

N = 131072
rng = np.random.default_rng(0)
cx = jnp.asarray(rng.random(N, np.float32))
cy = jnp.asarray(rng.random(N, np.float32))
cz = jnp.asarray(rng.random(N, np.float32))
items = jnp.asarray(rng.integers(0, 8, N, dtype=np.int32))

for NS in (8, 16, 64):
    acc0 = tuple(jnp.zeros((NS, N), jnp.float32) for _ in range(3))
    item_rows = jax.lax.broadcasted_iota(jnp.int32, (NS, N), 0)

    def body(i, NS=NS, acc0=acc0, item_rows=item_rows):
        item = jnp.remainder(items + i, NS)
        hit = item_rows == item[None, :]
        acc = tuple(
            a + jnp.where(hit, c[None, :], 0.0)
            for a, c in zip(acc0, (cx + i.astype(jnp.float32), cy, cz))
        )
        return sum(a.sum() for a in acc)

    t = scan_slope(body)
    print(f"one-hot accumulate NS={NS:3d}: {t*1e3:.3f} ms/iter", flush=True)

    def roll_body(i, NS=NS):
        accx = cx + i.astype(jnp.float32)
        out = accx
        for s in range(1, NS):
            out = out + jnp.roll(accx, (s * 81025) % N)
        return out.sum()

    t = scan_slope(roll_body)
    print(f"roll unshuffle ({NS} rows, 1ch): {t*1e3:.3f} ms (per chunk, x3 ch)",
          flush=True)
