"""End-to-end config-5 A/B for the MXU leaf walks.

Renders the mesh/BVH stress config (1920x1080, spp scaled, depth 12) with
the scalar and the MXU leaf paths, interleaved A/B/A/B with varied seeds.
``jax.clear_caches()`` between variants forces a retrace so the module
flag is re-read (persistent compile cache keeps recompiles cheap).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python experiments/measure_mxu_e2e.py
"""
from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("PTRT_LOG_LEVEL", "WARNING")

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import path_tracing__ray_tracer_tpu as ptrt
from path_tracing__ray_tracer_tpu.ops.pallas import bvh_pallas as bp
from path_tracing__ray_tracer_tpu.scene_builders.mesh_scene_builder import (
    MeshSceneBuilder,
)

W, H, SPP, DEPTH = 1920, 1080, 8, 12  # spp = 64/8 (scale 0.125)

b = MeshSceneBuilder(grid=3, subdivisions=3)
scene = b.build_scene()
cam = b.create_camera(W / H)

r = ptrt.RendererFactory.create(
    "tpu_path_raytracer",
    sample_group=64, chunk_rays=1 << 23, shadow_tmax="light",
    compile_overrides={"use_bvh": True},
)


def render(seed):
    settings = ptrt.RenderSettings(W, H, SPP, DEPTH)
    r.seed = int(seed)
    t0 = time.time()
    img = r.render(scene, cam, settings)
    dt = time.time() - t0
    return dt, np.asarray(img).astype(np.float64).mean()


def run_variant(mxu, seed):
    bp.BVH_MXU_LEAF = mxu
    jax.clear_caches()
    warm = render(seed)  # compile + first varied render
    meas = render(seed + 1)
    tag = "mxu" if mxu else "scalar"
    rays = W * H * SPP * DEPTH
    print(f"{tag}: warm {warm[0]:.1f}s, steady {meas[0]:.1f}s = "
          f"{rays/meas[0]/1e6:.1f} Mrays/s (mean {meas[1]:.3f})", flush=True)
    return meas


# checksum parity on a small frame first
bp.BVH_MXU_LEAF = False
settings_s = ptrt.RenderSettings(512, 288, 2, 6)
r.seed = 7
img_a = np.asarray(r.render(scene, cam, settings_s))
bp.BVH_MXU_LEAF = True
jax.clear_caches()
img_b = np.asarray(r.render(scene, cam, settings_s))
diff = np.abs(img_a.astype(np.int32) - img_b.astype(np.int32))
print(f"small-frame parity: max u8 diff {diff.max()}, "
      f"mean {diff.mean():.5f}", flush=True)

run_variant(False, 100)
run_variant(True, 200)
run_variant(False, 300)
run_variant(True, 400)
print("done", flush=True)
