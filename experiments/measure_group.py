"""sample_group sweep at fixed chunk_rays for the bench headline.

Total (NS, N) accumulator traffic scales with NS (per-iter cost ~ NS*N*B,
iters ~ NS*L, chunks ~ P*S/(N*NS) => total ~ NS*L*P*S*B), while gather and
bounce compute are NS-invariant.  Smaller groups => less accumulate, more
dispatches (absorbed by lax.map batching down to the floor).
"""
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

W = H = 1024
DEPTH = 8
settings = ptrt.RenderSettings(W, H, 64, DEPTH)
cam = b.create_camera(1.0)
for group in (64, 32, 16, 8):
    r = ptrt.RendererFactory.create(
        "tpu_path_raytracer", sample_group=group, chunk_rays=1 << 23,
        texture_budget=256)
    r.render_sums(scene, cam, settings, sample_offset=0, n_samples=64)
    t0 = time.time()
    for bi in (1, 2):
        r.render_sums(scene, cam, settings, sample_offset=bi * 64, n_samples=64)
    el = time.time() - t0
    print(f"group={group:2d}: {el:.2f}s for 2x64spp -> "
          f"{W*H*2*64*DEPTH/el/1e6:.1f} Mrays/s", flush=True)
print("done", flush=True)
