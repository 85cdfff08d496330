"""Texture-LOD measurement: bench-config steady throughput at
texture_lod=256 with lod_depth 1 and 2, plus RMSE vs the exact budget-0
render at 1024²×128 spp (the VERDICT #2 gate)."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
import path_tracing__ray_tracer_tpu as ptrt

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
for ld in (2, 1):
    r = ptrt.RendererFactory.create(
        "tpu_path_raytracer", sample_group=GROUP, chunk_rays=1 << 23,
        texture_lod=256, texture_lod_depth=ld,
    )
    t0 = time.time()
    r.render_sums(scene, cam, settings, sample_offset=0, n_samples=GROUP)
    print(f"lod_depth={ld}: warm group {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    for k in (1, 2):
        r.render_sums(scene, cam, settings, sample_offset=k * GROUP, n_samples=GROUP)
    el = time.time() - t0
    mr = W * H * 2 * GROUP * DEPTH / el / 1e6
    print(f"lod_depth={ld}: steady {el:.2f}s for 2x{GROUP}spp -> {mr:.1f} Mrays/s",
          flush=True)

# ---- RMSE gate: 1024² x 128 spp, lod(256, d2) and lod(256, d1) vs exact ----
rs = ptrt.RenderSettings(W, H, 128, DEPTH)


def render_png(renderer):
    img = renderer.render(scene, cam, rs)
    return np.asarray(img).astype(np.float64)


exact = ptrt.RendererFactory.create("tpu_path_raytracer", sample_group=32,
                                    chunk_rays=1 << 23, seed=0)
t0 = time.time(); img0 = render_png(exact)
print(f"exact 128spp render {time.time()-t0:.1f}s", flush=True)
for ld in (2, 1):
    r = ptrt.RendererFactory.create(
        "tpu_path_raytracer", sample_group=32, chunk_rays=1 << 23, seed=0,
        texture_lod=256, texture_lod_depth=ld,
    )
    t0 = time.time(); img = render_png(r)
    rmse = float(np.sqrt(((img - img0) ** 2).mean()))
    mx = float(np.abs(img - img0).max())
    print(f"RMSE(lod256 d{ld}, exact) = {rmse:.4f}/255 max={mx:.0f} "
          f"({time.time()-t0:.1f}s)", flush=True)
print("done", flush=True)
