"""Cost of the reference-quirk NEE occlusion bound on BVH scenes (round 5,
VERDICT #4).

Every published mesh number uses ``shadow_tmax="light"`` (occlusion walk
bounded at the sampled light point — the physically-correct deviation),
while the faithful default everywhere else is the reference quirk
``t_max = 1e6`` (occluders *beyond* the light still shadow,
``/root/reference/renderers/cuda_path_tracer.py:275-277``).  This measures
config 5 (11.5K-tri mesh, 1920x1080, depth 12) both ways so the price of
the faithful default on BVH scenes is on record.

Run:  python -m experiments.measure_shadow_tmax [--spp 32]
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
parser.add_argument("--spp", type=int, default=32)
args = parser.parse_args()

mb = MeshSceneBuilder(grid=3, subdivisions=3)
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

settings = ptrt.RenderSettings(W, H, SPP, DEPTH)
rays = W * H * SPP * DEPTH
for mode in ("light", "reference"):
    r = ptrt.RendererFactory.create(
        "tpu_path_raytracer", sample_group=min(128, SPP), chunk_rays=1 << 24,
        shadow_tmax=mode, compile_overrides={"use_bvh": True})
    t0 = time.time()
    r.render(scene, cam, settings)
    print(f"shadow_tmax={mode}: warmup {time.time() - t0:.1f} s", flush=True)
    times = []
    for rep in (1, 2):
        r.seed = rep * 5
        t0 = time.time()
        r.render(scene, cam, settings)
        times.append(time.time() - t0)
    print(f"shadow_tmax={mode}: steady {[round(t, 2) for t in times]} s -> "
          f"best {rays / min(times) / 1e6:.1f} Mrays/s", flush=True)
print("shadow ab done", flush=True)
