"""Isolate where deferred-texture mode's slowdown comes from (round 3).

measure_defer.py found defer64 at 91.4 Mrays/s vs 219.9 exact — a 2.4x LOSS
where piecewise estimates predicted ~parity.  Triangulate with three
variants on the bench config (1024^2, d8, group 64, texture_budget 256):

  exact        — baseline (no mip)
  defer4       — mip_budget=4 (rows=1): MXU mip kernel cost ~zero,
                 so this measures the defer *machinery* alone
                 (7 accumulators, extra carry state, selects, final fold)
  defer64_hlo  — mip_budget=64 with the MXU kernel disabled (HLO gather on
                 the mip): replaces the MXU cost with the known-flat 0.92 ms
  defer64      — the full mode as measured before (confirm in-process)

If defer4 ~ exact        -> the MXU kernel at R=224 is the problem.
If defer4 ~ defer64 ~ 91 -> the machinery is the problem.
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import path_tracing__ray_tracer_tpu as ptrt
from path_tracing__ray_tracer_tpu.ops.pallas import texture_pallas as tp

builder = ptrt.CustomSceneBuilder()
scene = builder.build_scene()

t0 = time.time()
warm = ptrt.RendererFactory.create("tpu_raytracer")
warm.render(scene, builder.create_camera(1.0), ptrt.RenderSettings(128, 128, 1, 2))
print(f"warmup {time.time()-t0:.1f}s", flush=True)

W = H = 1024
DEPTH = 8
GROUP = 64
settings = ptrt.RenderSettings(W, H, GROUP, DEPTH)
cam = builder.create_camera(W / H)

VARIANTS = (
    ("exact", {}, False),
    ("defer4", {"mip_budget": 4}, False),
    ("defer64_hlo", {"mip_budget": 64}, True),
    ("defer64", {"mip_budget": 64}, False),
)

for label, extra, disable_kernel in VARIANTS:
    tp.MIP_DISABLE_KERNEL = disable_kernel
    r = ptrt.RendererFactory.create(
        "tpu_path_raytracer", sample_group=GROUP, chunk_rays=1 << 23,
        texture_budget=256, **extra,
    )
    r.render_sums(scene, cam, settings, sample_offset=0, n_samples=GROUP)  # compile
    t0 = time.time()
    for bi in (1, 2):
        r.render_sums(scene, cam, settings, sample_offset=bi * GROUP,
                      n_samples=GROUP)
    el = time.time() - t0
    mrays = W * H * 2 * GROUP * DEPTH / el / 1e6
    print(f"{label}: {el:.2f}s for 2x{GROUP}spp -> {mrays:.1f} Mrays/s",
          flush=True)
tp.MIP_DISABLE_KERNEL = False
print("done", flush=True)
