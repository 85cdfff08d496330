"""Does a host->device transfer overlap with executions on the tunnel?

Decides the atlas pre-warm design (ROADMAP 5 / VERDICT r2 item 8): if an
async ``jnp.asarray`` upload streams while other executables run, the
benchmark matrix can prime config 1's full-res atlas during the other
configs; if the tunnel serializes, only byte-reduction helps.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python experiments/measure_overlap.py
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

rng = np.random.default_rng(7)
base = jnp.asarray(rng.random((1024, 1024), np.float32))


@jax.jit
def small(x):
    return (base * x + x).sum()


# warmup: first-in-process execution cost + compile
small(jnp.float32(1.0)).block_until_ready()
t0 = time.time()
for i in range(5):
    small(jnp.float32(2.0 + i)).block_until_ready()
per_exec = (time.time() - t0) / 5
print(f"small exec: {per_exec*1e3:.0f} ms each", flush=True)

# baseline transfer rate (8 MB, unique bytes so the tunnel cannot dedupe)
blob = rng.integers(0, 2**31, size=2 * 1024 * 1024, dtype=np.int32)
t0 = time.time()
dev = jnp.asarray(blob)
dev.block_until_ready()
rate = 8.0 / (time.time() - t0)
print(f"transfer: 8 MB in {8.0/rate:.1f} s = {rate:.2f} MB/s", flush=True)

# overlap: start another unique 8 MB upload, immediately run 20 executions
blob2 = rng.integers(0, 2**31, size=2 * 1024 * 1024, dtype=np.int32)
t0 = time.time()
dev2 = jnp.asarray(blob2)
t_issue = time.time() - t0
execs = []
for i in range(20):
    t1 = time.time()
    small(jnp.float32(100.0 + i)).block_until_ready()
    execs.append(time.time() - t1)
t_execs = time.time() - t0 - t_issue
dev2.block_until_ready()
t_total = time.time() - t0
print(f"issue {t_issue:.2f} s | 20 execs in {t_execs:.1f} s "
      f"(median {sorted(execs)[10]*1e3:.0f} ms) | residual wait "
      f"{t_total - t_issue - t_execs:.1f} s | total {t_total:.1f} s",
      flush=True)
print("overlap works" if t_total < 8.0 / rate + 20 * per_exec * 0.8
      else "tunnel serializes", flush=True)
