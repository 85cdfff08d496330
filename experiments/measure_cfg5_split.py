"""Attribute config-5 steady time: normal vs shadow-disabled vs
closest-only.  Monkeypatching scene_hit_any to constant-False removes the
NEE any-walk (wrong image, right timing); that isolates its share."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
import path_tracing__ray_tracer_tpu as ptrt
from path_tracing__ray_tracer_tpu.models import path_tracer as pt
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

settings = ptrt.RenderSettings(1920, 1080, 8, 12)

real_any = pt.scene_hit_any


def fake_any(cs, o, d, t_min, limit):
    return jnp.zeros_like(o.x, dtype=bool)


for label, patch in (("normal", real_any), ("no-shadow", fake_any)):
    pt.scene_hit_any = patch
    r = ptrt.RendererFactory.create(
        "tpu_path_raytracer", sample_group=8, chunk_rays=1 << 20,
        shadow_tmax="light", compile_overrides={"use_bvh": True},
    )
    r.seed = 1
    t0 = time.time()
    r.render_sums(scene, cam, settings, sample_offset=0, n_samples=8)
    print(f"{label}: warm {time.time()-t0:.1f}s", flush=True)
    r.seed = 2
    t0 = time.time()
    r.render_sums(scene, cam, settings, sample_offset=8, n_samples=8)
    el = time.time() - t0
    print(f"{label}: steady {el:.2f}s for 8spp "
          f"-> {1920*1080*8*12/el/1e6:.1f} Mrays/s", flush=True)
pt.scene_hit_any = real_any
print("done", flush=True)
