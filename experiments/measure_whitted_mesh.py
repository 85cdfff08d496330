"""Whitted renderer on the BVH mesh scene, end-to-end (ROADMAP §5): the
shared scene_hit/scene_hit_any already route through the Pallas BVH walks;
this confirms the Whitted path composes with them at mesh scale and records
a throughput number.  1920x1080, 4 spp (grid sampler -> 4 effective), d6.
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
import path_tracing__ray_tracer_tpu as ptrt
from path_tracing__ray_tracer_tpu.scene_builders.mesh_scene_builder import (
    MeshSceneBuilder,
)

b = MeshSceneBuilder(grid=3, subdivisions=3)
scene = b.build_scene()
cam = b.create_camera(1920 / 1080)

t0 = time.time()
warm = ptrt.RendererFactory.create("tpu_raytracer")
warm.render(ptrt.CustomSceneBuilder().build_scene(),
            ptrt.CustomSceneBuilder().create_camera(1.0),
            ptrt.RenderSettings(128, 128, 1, 2))
print(f"warmup {time.time()-t0:.1f}s", flush=True)

W, H, SPP, D = 1920, 1080, 4, 6
r = ptrt.RendererFactory.create(
    "tpu_texture_raytracer", chunk_rays=1 << 20,
    compile_overrides={"use_bvh": True},
)
settings = ptrt.RenderSettings(W, H, SPP, D)
t0 = time.time()
img = r.render(scene, cam, settings)
print(f"whitted mesh: warm render {time.time()-t0:.1f}s "
      f"mean={np.asarray(img).mean():.2f}", flush=True)
img.save("/tmp/whitted_mesh.png")
t0 = time.time()
img2 = r.render(scene, cam, settings)
el = time.time() - t0
print(f"whitted mesh: steady {el:.2f}s -> "
      f"{W*H*SPP*D/el/1e6:.1f} Mrays/s (ray formula spp*depth)", flush=True)
print("done", flush=True)
