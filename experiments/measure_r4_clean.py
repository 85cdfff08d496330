"""Round-4 CLEAN measurement pass (run with NOTHING else on the host:
the earlier r4 batch ran concurrently with the CPU test suite and host
contention halved apparent throughput — the dispatch loop is host-driven).

1. Cornell headline at the bench config (3 steady batches, budget 0)
2. config 5 (11.5K-tri mesh) steady ×2 — split-any fused bounce default
3. config 6 (128K-tri mesh_big, PAGED traversal) steady ×2
4. Whitted-on-BVH mesh at the VERDICT spec (1920×1080×25spp×d16) ×2
5. config 3 at scale 0.5 (512²×128spp×d8) ×3 — out of the noise floor

Usage: python -m experiments.measure_r4_clean [--skip 1,2,...]
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


def steady(tag, make, settings, scene, cam, reps=2, rays=None):
    r = make()
    t0 = time.time()
    r.render(scene, cam, settings)
    print(f"{tag}: warmup {time.time() - t0:.1f} s", flush=True)
    times = []
    for rep in range(reps):
        r.seed = 11 + rep
        t0 = time.time()
        r.render(scene, cam, settings)
        times.append(time.time() - t0)
    if rays is None:
        rays = (settings.width * settings.height
                * settings.samples_per_pixel * settings.max_depth)
    best = min(times)
    print(f"{tag}: steady {[round(t, 2) for t in times]} s -> best "
          f"{rays / best / 1e6:.1f} Mrays/s", flush=True)


if 1 not in skip:
    W = H = 1024
    SPP, DEPTH = 128, 8
    r = ptrt.RendererFactory.create(
        "tpu_path_raytracer", texture_budget=0, sample_group=128,
        chunk_rays=1 << 24)
    s = ptrt.RenderSettings(W, H, SPP, DEPTH)
    t0 = time.time()
    r.render_sums(scene_c, cam_c, s, sample_offset=0, n_samples=SPP)
    print(f"headline: warmup {time.time() - t0:.1f} s", flush=True)
    for rep in (1, 2, 3):
        t0 = time.time()
        r.render_sums(scene_c, cam_c, s, sample_offset=rep * 128,
                      n_samples=SPP)
        el = time.time() - t0
        print(f"headline batch{rep}: {el:.3f} s -> "
              f"{W * H * SPP * DEPTH / el / 1e6:.1f} Mrays/s", flush=True)

if 2 not in skip:
    mb = MeshSceneBuilder(grid=3, subdivisions=3)
    steady(
        "config5 64spp d12",
        lambda: ptrt.RendererFactory.create(
            "tpu_path_raytracer", sample_group=64, chunk_rays=1 << 23,
            shadow_tmax="light", compile_overrides={"use_bvh": True}),
        ptrt.RenderSettings(1920, 1080, 64, 12),
        mb.build_scene(), mb.create_camera(1920 / 1080),
    )

if 3 not in skip:
    mbig = MeshSceneBuilder(grid=5, subdivisions=4)
    steady(
        "config6 mesh_big 128K tris 64spp d12",
        lambda: ptrt.RendererFactory.create(
            "tpu_path_raytracer", sample_group=64, chunk_rays=1 << 23,
            shadow_tmax="light", compile_overrides={"use_bvh": True}),
        ptrt.RenderSettings(1920, 1080, 64, 12),
        mbig.build_scene(), mbig.create_camera(1920 / 1080),
    )

if 4 not in skip:
    mb = MeshSceneBuilder(grid=3, subdivisions=3)
    steady(
        "whitted mesh 25spp d16",
        lambda: ptrt.RendererFactory.create(
            "tpu_texture_raytracer", compile_overrides={"use_bvh": True}),
        ptrt.RenderSettings(1920, 1080, 25, 16),
        mb.build_scene(), mb.create_camera(1920 / 1080),
    )

if 5 not in skip:
    steady(
        "config3 512x512 128spp d8",
        lambda: ptrt.RendererFactory.create("tpu_texture_raytracer"),
        ptrt.RenderSettings(512, 512, 128, 8),
        scene_c, cornell.create_camera(1.0),
        reps=3,
    )

print("clean pass done", flush=True)
