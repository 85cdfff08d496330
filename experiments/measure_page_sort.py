"""A/B the round-5 paged phase-2 lane schedule on the 128K-tri scene.

Variants (module flags, re-traced via jax.clear_caches between them):
  base   — round-4 behavior (no sort, no cull, no skip)
  skip   — cond launch skip only
  full   — page-major sort + XLA root cull + cond skip (round-5 default)

Same harness as measure_page_budget.py (16 spp steady, varied seeds).
Run:  python -m experiments.measure_page_sort [--spp 16]
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
from path_tracing__ray_tracer_tpu.ops.pallas import bvh_paged_pallas as bpp
from path_tracing__ray_tracer_tpu.scene_builders.mesh_scene_builder import (
    MeshSceneBuilder,
)

parser = argparse.ArgumentParser()
parser.add_argument("--spp", type=int, default=16)
parser.add_argument("--variants", default="base,skip,full")
args = parser.parse_args()

VARIANTS = {
    # (PAGE_SORT, PAGE_CULL, PAGE_COND_SKIP, PAGE_PLAN)
    "base": (False, False, False, False),
    "skip": (False, False, True, False),
    "cull": (False, True, True, False),
    "full": (True, True, True, False),
    "sort": (True, False, True, False),
    "plan": (True, True, True, True),
}

mb = MeshSceneBuilder(grid=5, subdivisions=4)
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
for name in args.variants.split(","):
    (bpp.PAGE_SORT, bpp.PAGE_CULL, bpp.PAGE_COND_SKIP,
     bpp.PAGE_PLAN) = VARIANTS[name]
    jax.clear_caches()
    r = ptrt.RendererFactory.create(
        "tpu_path_raytracer", sample_group=min(64, SPP), chunk_rays=1 << 23,
        shadow_tmax="light", compile_overrides={"use_bvh": True})
    t0 = time.time()
    r.render(scene, cam, settings)
    print(f"{name}: warmup {time.time() - t0:.1f} s", flush=True)
    times = []
    for rep in (1, 2):
        r.seed = rep * 3
        t0 = time.time()
        r.render(scene, cam, settings)
        times.append(time.time() - t0)
    print(f"{name}: steady {[round(t, 2) for t in times]} s -> "
          f"best {rays / min(times) / 1e6:.1f} Mrays/s", flush=True)
print("ab done", flush=True)
