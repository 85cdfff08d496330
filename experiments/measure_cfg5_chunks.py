"""Per-chunk cost across the whole config-5 frame: the regen-loop probe
showed three low-offset chunks at ~0.5 s each, but the full render measures
~66 s over 16 chunks — find where the time actually goes.

Usage: python -m experiments.measure_cfg5_chunks
"""
from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

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


@jax.jit
def chunk(pix0, seed, s0):
    return pt._regen_chunk(
        cs, cam12, pix0, seed, s0,
        n_pix=N, width=1920, height=1080, n_samples=NS, max_depth=12,
        jitter="independent", shadow_tmax="light",
    )


out = chunk(jnp.int32(0), jnp.uint32(9), jnp.int32(0))
jax.block_until_ready(out)
print("warm", flush=True)

total = 0.0
for k in range(16):
    t0 = time.time()
    out, it1, it2 = chunk(jnp.int32(k * N), jnp.uint32(0), jnp.int32(0))
    s = float(out.x.sum())
    dt = time.time() - t0
    total += dt
    print(f"chunk {k:2d}: {dt:6.2f} s  it1 {int(it1):3d}  it2 {int(it2):3d}"
          f"  (sum {s:.0f})", flush=True)
print(f"total {total:.2f} s", flush=True)
