"""Round-3 hero chain: bench.py trial (honest config), chunk_rays sweep at
the bench config, then the full 1024²×1024 spp budget-0 hero render
(measured, PNG refreshed in examples/)."""
import os, subprocess, time
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

# chunk_rays sweep at the honest bench config
settings = ptrt.RenderSettings(W, H, GROUP, DEPTH)
for cr in (23, 24):
    r = ptrt.RendererFactory.create(
        "tpu_path_raytracer", sample_group=GROUP, chunk_rays=1 << cr,
    )
    t0 = time.time()
    r.render_sums(scene, cam, settings, sample_offset=0, n_samples=GROUP)
    print(f"chunk_rays=1<<{cr}: warm group {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    for k in (1, 2):
        r.render_sums(scene, cam, settings, sample_offset=k * GROUP, n_samples=GROUP)
    el = time.time() - t0
    print(f"chunk_rays=1<<{cr}: steady {el:.2f}s -> "
          f"{W*H*2*GROUP*DEPTH/el/1e6:.1f} Mrays/s", flush=True)

# hero render: 1024 spp, budget 0 (honest), one-shot measured
hero = ptrt.RendererFactory.create(
    "tpu_path_raytracer", sample_group=GROUP, chunk_rays=1 << 23, seed=0,
)
hs = ptrt.RenderSettings(W, H, 1024, DEPTH)
t0 = time.time()
img = hero.render(scene, cam, hs)
el = time.time() - t0
print(f"hero 1024x1024x1024spp budget0: {el:.1f}s "
      f"({W*H*1024*DEPTH/el/1e6:.1f} Mrays/s)", flush=True)
img.save("/root/repo/examples/cornell_pathtraced_1024x1024_1024spp.png")
print("hero saved", flush=True)

# bench.py trial in a fresh process (the driver contract)
env = dict(os.environ)
env["PYTHONPATH"] = "/root/.axon_site:/root/repo"
p = subprocess.run(["python", "/root/repo/bench.py"], capture_output=True,
                   text=True, env=env, timeout=3000)
print("bench stdout:", p.stdout, flush=True)
print("bench stderr tail:", p.stderr[-800:], flush=True)
print("done", flush=True)
