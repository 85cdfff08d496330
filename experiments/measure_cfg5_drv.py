"""Isolate the config-5 render's 58 s of non-compute overhead: time
(a) the real `_path_chunk` (cs passed as pytree ARG, like render_sums does),
(b) render_sums end-to-end, (c) render() end-to-end.

Usage: python -m experiments.measure_cfg5_drv
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

import path_tracing__ray_tracer_tpu as ptrt
from path_tracing__ray_tracer_tpu.compiler import pack_camera
from path_tracing__ray_tracer_tpu.models import path_tracer as pt
from path_tracing__ray_tracer_tpu.scene_builders.mesh_scene_builder import (
    MeshSceneBuilder,
)

b = MeshSceneBuilder(grid=3, subdivisions=3)
scene = b.build_scene()
camera = b.create_camera(1920 / 1080)
settings = ptrt.RenderSettings(width=1920, height=1080, samples_per_pixel=8,
                               max_depth=12)
r = ptrt.RendererFactory.create(
    "tpu_path_raytracer", sample_group=8, chunk_rays=1 << 20,
    shadow_tmax="light", compile_overrides={"use_bvh": True},
)
cs = r.compiled(scene)
cam12 = pack_camera(camera)
N = 131072

kw = dict(n_pix=N, width=1920, height=1080, n_samples=8, max_depth=12,
          jitter="independent", shadow_tmax="light", lod_depth=0)

# warm the real _path_chunk executable
out = pt._path_chunk(cs, cam12, jnp.int32(0), jnp.uint32(9), jnp.int32(0), **kw)
jax.block_until_ready(out.to_array())
print("warm", flush=True)

# (a) manual loop over the REAL arg-passing chunk fn
t0 = time.time()
pend = []
for k in range(16):
    out = pt._path_chunk(cs, cam12, jnp.int32(k * N), jnp.uint32(0),
                         jnp.int32(0), **kw)
    pend.append(out.to_array())
tot = 0.0
for p in pend:
    tot += float(np.asarray(p).sum())
print(f"(a) 16x _path_chunk(cs as arg): {time.time()-t0:.2f} s "
      f"(sum {tot:.0f})", flush=True)

# (b) render_sums (the driver)
r.seed = 0
t0 = time.time()
sums = r.render_sums(scene, camera, settings)
print(f"(b) render_sums: {time.time()-t0:.2f} s", flush=True)

# (c) full render()
t0 = time.time()
img = r.render(scene, camera, settings)
print(f"(c) render(): {time.time()-t0:.2f} s", flush=True)
print("done", flush=True)
