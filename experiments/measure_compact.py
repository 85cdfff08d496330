"""Measure the compacted texture gather (ops/texture.TEX_COMPACT) at the
honest bench config (Cornell 1024^2, depth 8, group 64, budget 0).

The textured-hit fraction on this scene is 12-21% of lanes
(measure_texfrac.py) while the full-width HLO atlas gather costs a flat
~7 ns/lane (~0.92 ms of a ~1.8 ms regen iteration) -- compaction gathers
only a static N/DIV prefix after a stable sort.  Variants: OFF (baseline),
DIV=4, DIV=8.  `_path_chunk.clear_cache()` forces a retrace when the module
flag changes.

Run: PYTHONPATH=/root/.axon_site:/root/repo python experiments/measure_compact.py
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import path_tracing__ray_tracer_tpu as ptrt
from path_tracing__ray_tracer_tpu.models import path_tracer as pt
from path_tracing__ray_tracer_tpu.ops import texture as tex

W = H = 1024
DEPTH = 8
GROUP = 64

b = ptrt.CustomSceneBuilder()
scene = b.build_scene()
cam = b.create_camera(1.0)

t0 = time.time()
warm = ptrt.RendererFactory.create("tpu_raytracer")
warm.render(scene, cam, ptrt.RenderSettings(128, 128, 1, 2))
print(f"warmup {time.time()-t0:.1f}s", flush=True)

settings = ptrt.RenderSettings(W, H, GROUP, DEPTH)
for label, on, div in (("off", False, 4), ("div4", True, 4), ("div8", True, 8),
                       ("off2", False, 4)):
    tex.TEX_COMPACT = on
    tex.TEX_COMPACT_DIV = div
    pt._path_chunk.clear_cache()
    r = ptrt.RendererFactory.create(
        "tpu_path_raytracer", sample_group=GROUP, chunk_rays=1 << 23,
        texture_budget=0,
    )
    t0 = time.time()
    r.render_sums(scene, cam, settings, sample_offset=0, n_samples=GROUP)
    print(f"{label}: warm group {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    for k in (1, 2):
        r.render_sums(scene, cam, settings, sample_offset=k * GROUP,
                      n_samples=GROUP)
    el = time.time() - t0
    mr = W * H * 2 * GROUP * DEPTH / el / 1e6
    print(f"{label}: steady {el:.2f}s for 2x{GROUP}spp -> {mr:.1f} Mrays/s",
          flush=True)
print("done", flush=True)
