"""Fused in-kernel regeneration (_PIPE_REGEN) A/B at the honest bench config
(1024², depth 8, group 64, texture budget 0 — the reference-exact atlas).

Protocol per CLAUDE.md: warm one group, then time 2 further groups with
distinct sample offsets (the tunnel memoizes identical buffers).
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import path_tracing__ray_tracer_tpu as ptrt
from path_tracing__ray_tracer_tpu.models import path_tracer as pt

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
for pipe in (False, True, False, True):
    pt._PIPE_REGEN = pipe
    r = ptrt.RendererFactory.create(
        "tpu_path_raytracer", sample_group=GROUP, chunk_rays=1 << 23,
        texture_budget=0,
    )
    t0 = time.time()
    r.render_sums(scene, cam, settings, sample_offset=0, n_samples=GROUP)
    print(f"pipe={pipe}: warm group {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    for k in (1, 2):
        r.render_sums(scene, cam, settings, sample_offset=k * GROUP,
                      n_samples=GROUP)
    el = time.time() - t0
    mr = W * H * 2 * GROUP * DEPTH / el / 1e6
    print(f"pipe={pipe}: steady {el:.2f}s for 2x{GROUP}spp -> {mr:.1f} Mrays/s",
          flush=True)
print("done", flush=True)
