"""Confirm the depth-12 oracle executable runs on the REAL TPU backend at
its clamped chunk width (ADVICE round 2: the 2^13-1 = 8191 sequential
segment evaluations in one fori_loop executable were only exercised under
the CPU tests).  Renders small frames at CLI-default depth 16 (clamped to
12) and at depth 8 for a cost comparison.

Usage: python -m experiments.measure_oracle_depth
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
import path_tracing__ray_tracer_tpu as ptrt

b = ptrt.CustomSceneBuilder()
scene = b.build_scene()
cam = b.create_camera(4 / 3)

t0 = time.time()
warm = ptrt.RendererFactory.create("tpu_raytracer")
warm.render(scene, cam, ptrt.RenderSettings(128, 96, 1, 2))
print(f"process warm {time.time()-t0:.1f}s", flush=True)

for depth in (8, 16):  # 16 clamps to ORACLE_MAX_DEPTH=12
    r = ptrt.RendererFactory.create("cpu_raytracer")
    s = ptrt.RenderSettings(width=64, height=48, samples_per_pixel=1,
                            max_depth=depth)
    t0 = time.time()
    img = r.render(scene, cam, s)
    wu = time.time() - t0
    t0 = time.time()
    img = r.render(scene, cam, s)
    el = time.time() - t0
    print(f"oracle d{depth}: warm {wu:.1f}s steady {el:.2f}s "
          f"mean={np.asarray(img).mean():.2f}", flush=True)
print("done", flush=True)
