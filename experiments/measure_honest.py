"""Honest-headline chain: steady bench-config path-trace throughput at
texture budgets 0 / 512 / 256, plus config-5 mesh end-to-end with the
rows=8 BVH4 traversal.  One TPU process, serialized.  Timing protocol:
warm each executable with one group, then time 2 further groups with
distinct sample offsets (never repeat identical buffers — tunnel memoizes).
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
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
for budget in (0, 512, 256):
    r = ptrt.RendererFactory.create(
        "tpu_path_raytracer", sample_group=GROUP, chunk_rays=1 << 23,
        texture_budget=budget,
    )
    t0 = time.time()
    r.render_sums(scene, cam, settings, sample_offset=0, n_samples=GROUP)
    print(f"budget={budget}: warm group {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    for k in (1, 2):
        r.render_sums(scene, cam, settings, sample_offset=k * GROUP, n_samples=GROUP)
    el = time.time() - t0
    mr = W * H * 2 * GROUP * DEPTH / el / 1e6
    print(f"budget={budget}: steady {el:.2f}s for 2x{GROUP}spp -> {mr:.1f} Mrays/s",
          flush=True)

# config-5 mesh end-to-end at --scale 0.125 (matches BENCHMARKS.md round-2 row)
import subprocess  # noqa: E402  (separate process keeps BVH state clean)
print("config5 starting", flush=True)
env = dict(os.environ)
env["PYTHONPATH"] = "/root/.axon_site:/root/repo"
p = subprocess.run(
    ["python", "/root/repo/benchmarks.py", "--configs", "5", "--scale", "0.125"],
    capture_output=True, text=True, env=env, timeout=3000,
)
print(p.stdout, flush=True)
print(p.stderr[-2000:], flush=True)
print("done", flush=True)
