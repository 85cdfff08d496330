"""Round-4 measurement batch (one process, serialized TPU use).

1. tiny warm render (absorbs the first-in-process executable-shipping cost)
2. `_TAIL_DIV` re-tune at the group-128 bench config (ROADMAP §3: the
   phase-2 cutover was tuned at group 64; re-check at the shipped knee)
3. Whitted-on-BVH end-to-end at the VERDICT-prescribed spec:
   tpu_texture_raytracer, mesh scene, 1920×1080×25 spp, depth 16
4. Oracle (cpu_raytracer parity) at its depth clamp (12) at the FULL
   default chunk width on the axon backend — VERDICT #5 / ADVICE round-2

Usage: python -m experiments.measure_r4_batch [--skip 2,3,4]
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
from path_tracing__ray_tracer_tpu.models import path_tracer as pt

parser = argparse.ArgumentParser()
parser.add_argument("--skip", default="")
args = parser.parse_args()
skip = {int(s) for s in args.skip.split(",") if s}

cornell = ptrt.CustomSceneBuilder()
scene_c = cornell.build_scene()
cam_c = cornell.create_camera(1.0)

t0 = time.time()
warm = ptrt.RendererFactory.create("tpu_raytracer")
warm.render(scene_c, cam_c, ptrt.RenderSettings(128, 128, 1, 2))
print(f"process warm: {time.time() - t0:.1f} s", flush=True)

# ---- 2. tail-divisor sweep at the headline config ---------------------------
if 2 not in skip:
    W = H = 1024
    SPP, DEPTH = 128, 8
    for rep in (1, 2):
        for div in (32, 64, 128, 256):
            pt._TAIL_DIV = div
            r = ptrt.RendererFactory.create(
                "tpu_path_raytracer", texture_budget=0, sample_group=128,
                chunk_rays=1 << 24, seed=rep * 7 + div,
            )
            settings = ptrt.RenderSettings(W, H, SPP, DEPTH)
            t0 = time.time()
            r.render_sums(scene_c, cam_c, settings, sample_offset=0,
                          n_samples=SPP)
            el = time.time() - t0
            mrays = W * H * SPP * DEPTH / el / 1e6
            tag = "warm+run" if rep == 1 else "steady"
            print(f"tail_div {div} rep{rep} ({tag}): {el:.2f} s -> "
                  f"{mrays:.1f} Mrays/s", flush=True)
    pt._TAIL_DIV = 64

# ---- 3. Whitted on the 11.5K-tri BVH mesh, full VERDICT spec ----------------
if 3 not in skip:
    from path_tracing__ray_tracer_tpu.scene_builders.mesh_scene_builder import (
        MeshSceneBuilder,
    )

    mb = MeshSceneBuilder(grid=3, subdivisions=3)
    scene_m = mb.build_scene()
    cam_m = mb.create_camera(1920 / 1080)
    r = ptrt.RendererFactory.create(
        "tpu_texture_raytracer", compile_overrides={"use_bvh": True})
    settings = ptrt.RenderSettings(1920, 1080, 25, 16)
    t0 = time.time()
    r.render(scene_m, cam_m, settings)
    print(f"whitted mesh 25spp warmup: {time.time() - t0:.1f} s", flush=True)
    for rep in (1, 2):
        r.seed = rep
        t0 = time.time()
        r.render(scene_m, cam_m, settings)
        el = time.time() - t0
        # grid sampler: effective spp floor(sqrt(25))^2 = 25
        mrays = 1920 * 1080 * 25 * 16 / el / 1e6
        print(f"whitted mesh 25spp steady rep{rep}: {el:.2f} s "
              f"({mrays:.1f} Mrays/s by the spp*depth formula)", flush=True)

# ---- 4. oracle at depth clamp, full default chunk width ---------------------
if 4 not in skip:
    r = ptrt.RendererFactory.create("cpu_raytracer")
    settings = ptrt.RenderSettings(256, 256, 1, 12)
    t0 = time.time()
    r.render(scene_c, cam_c, settings)
    print(f"oracle d12 256x256 warmup: {time.time() - t0:.1f} s", flush=True)
    r.seed = 3
    t0 = time.time()
    r.render(scene_c, cam_c, settings)
    print(f"oracle d12 256x256 steady: {time.time() - t0:.2f} s", flush=True)

print("batch done", flush=True)
