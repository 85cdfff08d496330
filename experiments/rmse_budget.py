"""VERDICT #4: RMSE gate for the bench texture_budget=256 headline.

Renders the bench-config scene (1024^2, d8) at 128 spp with budget 256 vs
budget 0 (full-res atlas) and reports the u8 RMSE between them.  Same seed,
same sampler: the ONLY difference is atlas resolution.
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
import path_tracing__ray_tracer_tpu as ptrt

b = ptrt.CustomSceneBuilder(); scene = b.build_scene()
t0 = time.time()
warm = ptrt.RendererFactory.create("tpu_raytracer")
warm.render(scene, b.create_camera(1.0), ptrt.RenderSettings(128, 128, 1, 2))
print(f"warmup {time.time()-t0:.1f}s", flush=True)

W = H = 1024
SPP = 128
s = ptrt.RenderSettings(W, H, SPP, 8)
cam = b.create_camera(1.0)
imgs = {}
for budget in (256, 0):
    r = ptrt.RendererFactory.create("tpu_path_raytracer", sample_group=32,
                                    texture_budget=budget)
    t0 = time.time()
    img = r.render(scene, cam, s)
    print(f"budget={budget}: {time.time()-t0:.1f}s", flush=True)
    imgs[budget] = np.asarray(img, dtype=np.float32)
d = imgs[256] - imgs[0]
rmse = float(np.sqrt((d * d).mean()))
print(f"RMSE(budget256, budget0) = {rmse:.4f}/255  max={np.abs(d).max():.0f}", flush=True)
print("done", flush=True)
