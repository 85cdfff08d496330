"""Page-budget sweep for the two-level traversal (config 6, 128K tris).

Bigger pages → fewer pages → fewer per-iteration page launches and less
root-re-entry redundancy, but a bigger SMEM operand per launch (cap: top +
page + ps ≤ bvh_pallas.SMEM_BLOB_LIMIT).  Each budget rebuilds the scene's
paged blobs (fresh Mosaic compiles per page shape — warm cache helps only
across reps of the same budget).

Usage: python -m experiments.measure_page_budget [--budgets 60000,100000,200000]
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
from path_tracing__ray_tracer_tpu.ops.pallas import bvh_paged_pallas
from path_tracing__ray_tracer_tpu.scene_builders.mesh_scene_builder import (
    MeshSceneBuilder,
)

parser = argparse.ArgumentParser()
parser.add_argument("--budgets", default="200000,100000,60000")
parser.add_argument("--spp", type=int, default=16)
args = parser.parse_args()

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

for budget in (int(b) for b in args.budgets.split(",")):
    bvh_paged_pallas.PAGE_BUDGET_FLOATS = budget
    r = ptrt.RendererFactory.create(
        "tpu_path_raytracer", sample_group=min(64, SPP), chunk_rays=1 << 23,
        shadow_tmax="light", compile_overrides={"use_bvh": True})
    cs = r.compiled(scene)
    pg = cs.bvh.paged
    if pg is None:
        print(f"budget {budget}: paging declined", flush=True)
        continue
    print(f"budget {budget}: pages {pg.n_pages} "
          f"TC {pg.page_tree.shape[1]} SC {pg.page_slot.shape[1]} "
          f"top {pg.top_tree.shape[1]}+{pg.top_slot.shape[1]}", flush=True)
    settings = ptrt.RenderSettings(W, H, SPP, DEPTH)
    t0 = time.time()
    r.render(scene, cam, settings)
    print(f"budget {budget}: warmup {time.time() - t0:.1f} s", flush=True)
    times = []
    for rep in (1, 2):
        r.seed = rep * 3
        t0 = time.time()
        r.render(scene, cam, settings)
        times.append(time.time() - t0)
    rays = W * H * SPP * DEPTH
    print(f"budget {budget}: steady {[round(t, 2) for t in times]} s -> "
          f"best {rays / min(times) / 1e6:.1f} Mrays/s", flush=True)
print("sweep done", flush=True)
