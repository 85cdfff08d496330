"""Config-2 anatomy: where do 410 ms go at 512^2 x 8spp d4?

Two-point slope over n_samples isolates per-sample compute from fixed
dispatch cost; a render_sums-only timing removes finalize/quantize/PNG.
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import path_tracing__ray_tracer_tpu as ptrt

b = ptrt.CustomSceneBuilder()
scene = b.build_scene()
t0 = time.time()
warm = ptrt.RendererFactory.create("tpu_raytracer")
warm.render(scene, b.create_camera(1.0), ptrt.RenderSettings(128, 128, 1, 2))
print(f"warmup {time.time()-t0:.1f}s", flush=True)

W = H = 512
D = 4
cam = b.create_camera(1.0)
r = ptrt.RendererFactory.create("tpu_path_raytracer", texture_budget=256)

for ns in (8, 32):
    s = ptrt.RenderSettings(W, H, ns, D)
    r.render_sums(scene, cam, s, sample_offset=0, n_samples=ns)  # compile
    t0 = time.time()
    for k in (1, 2):
        r.render_sums(scene, cam, s, sample_offset=k * ns, n_samples=ns)
    el = (time.time() - t0) / 2
    print(f"render_sums ns={ns}: {el*1000:.0f} ms -> "
          f"{W*H*ns*D/el/1e6:.1f} Mrays/s", flush=True)

# full render() including finalize/quantize for comparison
s = ptrt.RenderSettings(W, H, 8, D)
r.seed = 3
t0 = time.time(); r.render(scene, cam, s); el = time.time() - t0
print(f"full render ns=8: {el*1000:.0f} ms", flush=True)
print("done", flush=True)
