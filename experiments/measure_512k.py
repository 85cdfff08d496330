"""512K-triangle paged-tier boundary measurement (round 5, VERDICT #7).

25 icospheres at 5 subdivisions = 512,000 triangles — ~4x the config-6
scene and past the round-4 capability ceiling (the 110K default cut would
need >64 pages; ``pack_paged`` escalates its budget toward the 235K-float
per-launch ceiling, landing at 50 pages).  One steady number shows the
two-level tier holds near its ceiling instead of declining to the O(N)
sweep.

Run:  python -m experiments.measure_512k [--spp 8]
"""
from __future__ import annotations

import argparse
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import path_tracing__ray_tracer_tpu as ptrt
from path_tracing__ray_tracer_tpu.scene_builders.mesh_scene_builder import (
    MeshSceneBuilder,
)

parser = argparse.ArgumentParser()
parser.add_argument("--spp", type=int, default=8)
args = parser.parse_args()

mb = MeshSceneBuilder(grid=5, subdivisions=5)
scene = mb.build_scene()
cam = mb.create_camera(1920 / 1080)
W, H, DEPTH = 1920, 1080, 12
SPP = args.spp

t0 = time.time()
warm = ptrt.RendererFactory.create("tpu_raytracer")
b0 = ptrt.CustomSceneBuilder()
warm.render(b0.build_scene(), b0.create_camera(1.0),
            ptrt.RenderSettings(128, 128, 1, 2))
print(f"process warm: {time.time() - t0:.1f} s", flush=True)

r = ptrt.RendererFactory.create(
    "tpu_path_raytracer", sample_group=min(64, SPP), chunk_rays=1 << 23,
    shadow_tmax="light", compile_overrides={"use_bvh": True})
cs = r.compiled(scene)
pg = cs.bvh.paged
assert pg is not None, "512K scene must page"
print(f"tris {cs.n_triangles} pages {pg.n_pages} "
      f"TC {int(pg.page_tree.shape[1])} SC {int(pg.page_slot.shape[1])}",
      flush=True)

settings = ptrt.RenderSettings(W, H, SPP, DEPTH)
rays = W * H * SPP * DEPTH
t0 = time.time()
r.render(scene, cam, settings)
print(f"warmup {time.time() - t0:.1f} s", flush=True)
times = []
for rep in (1, 2):
    r.seed = rep * 3
    t0 = time.time()
    r.render(scene, cam, settings)
    times.append(time.time() - t0)
print(f"steady {[round(t, 2) for t in times]} s -> "
      f"best {rays / min(times) / 1e6:.1f} Mrays/s", flush=True)
