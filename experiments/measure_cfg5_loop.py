"""Attribute config-5 chunk time to regeneration-loop iterations: run the
real `_path_chunk` (config-5 shapes) with the iteration probe on, time varied
executions, and derive the TRUE in-context cost per full-width bounce
iteration — the microbenchmarked bounce (measure_cfg5_iter) misses the loop
body's regen/fold/select overhead and any fusion differences inside
lax.while_loop.

Usage: python -m experiments.measure_cfg5_loop
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

from path_tracing__ray_tracer_tpu.compiler import compile_scene, pack_camera
from path_tracing__ray_tracer_tpu.models import path_tracer as pt
from path_tracing__ray_tracer_tpu.scene_builders.mesh_scene_builder import (
    MeshSceneBuilder,
)

pt._PROBE_ITERS = True

b = MeshSceneBuilder(grid=3, subdivisions=3)
scene = b.build_scene()
cs = compile_scene(scene, use_bvh=True)
cam12 = pack_camera(b.create_camera(1920 / 1080))

N = 131072
NS = 8
DEPTH = 12

from functools import partial


@partial(jax.jit, static_argnames=())
def chunk(pix0, seed, s0):
    return pt._regen_chunk(
        cs, cam12, pix0, seed, s0,
        n_pix=N, width=1920, height=1080, n_samples=NS, max_depth=DEPTH,
        jitter="independent", shadow_tmax="light",
    )


# warmup (compile + first-in-process executable shipping)
out = chunk(jnp.int32(0), jnp.uint32(9), jnp.int32(0))
jax.block_until_ready(out)
print("warm", flush=True)

for rep in range(3):
    t0 = time.time()
    out, it1, it2 = chunk(jnp.int32(rep * N), jnp.uint32(rep), jnp.int32(0))
    s = float(out.x.sum())  # forces the transfer
    i1, i2 = int(it1), int(it2)
    dt = time.time() - t0
    # phase-2 iterations run at tail width (2048 of 131072 lanes): charge
    # them pro-rata when deriving the full-width per-iteration cost
    eff = i1 + i2 * (2048 / N)
    print(
        f"rep{rep}: {dt:.2f} s, phase1 {i1} iters, phase2 {i2} iters, "
        f"eff {eff:.1f} -> {dt / eff * 1e3:.1f} ms/full-width-iter "
        f"(checksum {s:.1f})",
        flush=True,
    )
print("done", flush=True)
