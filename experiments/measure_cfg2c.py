"""Steady-state fused render() timing for config 2 (render twice, time 2nd+3rd)."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import path_tracing__ray_tracer_tpu as ptrt

b = ptrt.CustomSceneBuilder(); scene = b.build_scene()
t0 = time.time()
warm = ptrt.RendererFactory.create("tpu_raytracer")
warm.render(scene, b.create_camera(1.0), ptrt.RenderSettings(128, 128, 1, 2))
print(f"warmup {time.time()-t0:.1f}s", flush=True)

cam = b.create_camera(1.0)
s = ptrt.RenderSettings(512, 512, 8, 4)
r = ptrt.RendererFactory.create("tpu_path_raytracer", texture_budget=256)
r.seed = 1; r.render(scene, cam, s)  # compile fused executable
for seed in (2, 3):
    r.seed = seed
    t0 = time.time(); r.render(scene, cam, s); el = time.time() - t0
    print(f"fused render seed={seed}: {el*1000:.0f} ms -> "
          f"{512*512*8*4/el/1e6:.1f} Mrays/s", flush=True)
# whitted config-3-style render for comparison (256^2 tiny + 512^2)
s3 = ptrt.RenderSettings(512, 512, 32, 8)
r3 = ptrt.RendererFactory.create("tpu_texture_raytracer")
r3.seed = 1; r3.render(scene, cam, s3)
for seed in (2, 3):
    r3.seed = seed
    t0 = time.time(); r3.render(scene, cam, s3); el = time.time() - t0
    print(f"fused whitted 512x512x32: {el*1000:.0f} ms -> "
          f"{512*512*32*8/el/1e6:.1f} Mrays/s", flush=True)
print("done", flush=True)
