"""A/B the two multi-chunk render paths under the measured ~0.35 s
per-dispatch tunnel overhead:

* ``_render_device_u8`` (device-resident sums): donation-chained dispatches
  — the tunnel cannot issue a dependent execution until the previous one
  resolves, so per-dispatch overhead serializes;
* ``render_sums`` (independent async dispatches + host finalize): overhead
  overlaps compute; pays the f32 sums transfer + finalize round trip.

Config 5 (16 chunks x 1 group) and the Cornell 1024-spp hero
(8 chunks x 16 groups) on both paths, one process.

Usage: python -m experiments.measure_dsums_ab
"""
from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np

import path_tracing__ray_tracer_tpu as ptrt
from path_tracing__ray_tracer_tpu.models import wavefront as wf
from path_tracing__ray_tracer_tpu.scene_builders.mesh_scene_builder import (
    MeshSceneBuilder,
)

mb = MeshSceneBuilder(grid=3, subdivisions=3)
mesh_scene = mb.build_scene()
mesh_cam = mb.create_camera(1920 / 1080)
cb = ptrt.CustomSceneBuilder()
cornell = cb.build_scene()
ccam = cb.create_camera(1.0)

t0 = time.time()
warm = ptrt.RendererFactory.create(
    "tpu_path_raytracer", sample_group=2, chunk_rays=1 << 14,
    shadow_tmax="light", compile_overrides={"use_bvh": True},
)
warm.render(mesh_scene, mesh_cam, ptrt.RenderSettings(64, 64, 2, 3))
print(f"process warm: {time.time() - t0:.1f} s", flush=True)

real_dsums = wf.WavefrontRenderer._render_device_u8


def run(label, scene, cam, settings, disable_dsums, seed, **kw):
    if disable_dsums:
        wf.WavefrontRenderer._render_device_u8 = lambda self, *a: None
    try:
        r = ptrt.RendererFactory.create("tpu_path_raytracer", **kw)
        r.seed = seed + 1
        t0 = time.time()
        r.render(scene, cam, settings)
        wu = time.time() - t0
        r.seed = seed
        t0 = time.time()
        img = r.render(scene, cam, settings)
        dt = time.time() - t0
        rays = settings.width * settings.height * settings.samples_per_pixel \
            * settings.max_depth
        print(f"{label}: steady {dt:.1f} s ({rays / dt / 1e6:.2f} Mrays/s), "
              f"warmup {wu:.1f} s, mean={np.asarray(img).mean():.3f}",
              flush=True)
        return np.asarray(img)
    finally:
        wf.WavefrontRenderer._render_device_u8 = real_dsums


s5 = ptrt.RenderSettings(width=1920, height=1080, samples_per_pixel=64,
                         max_depth=12)
kw5 = dict(sample_group=64, chunk_rays=1 << 23, shadow_tmax="light",
           compile_overrides={"use_bvh": True})
a5 = run("cfg5 device_sums ", mesh_scene, mesh_cam, s5, False, 0, **kw5)
b5 = run("cfg5 render_sums ", mesh_scene, mesh_cam, s5, True, 0, **kw5)
print(f"cfg5 images equal: {np.array_equal(a5, b5)}", flush=True)

hs = ptrt.RenderSettings(width=1024, height=1024, samples_per_pixel=1024,
                         max_depth=8)
ah = run("hero device_sums ", cornell, ccam, hs, False, 0)
bh = run("hero render_sums ", cornell, ccam, hs, True, 0)
print(f"hero images equal: {np.array_equal(ah, bh)}", flush=True)
print("done", flush=True)
