"""Config-5 attribution round 2: stub out scene_hit (closest walk) as well,
leaving only shading + regen + accumulate.  Wrong image, right timing."""
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

real_hit = pt.scene_hit
real_any = pt.scene_hit_any


def fake_any(cs, o, d, t_min, limit):
    return jnp.zeros_like(o.x, dtype=bool)


def fake_hit(cs, o, d, t_min, t_max):
    # plausible constant hit record: everything hits a horizontal plane 5
    # units along the ray (keeps shading/regen arithmetic realistic)
    n = o.x.shape
    from path_tracing__ray_tracer_tpu.ops.intersect import SceneHit
    from path_tracing__ray_tracer_tpu.ops.v3 import V3
    t = jnp.full(n, 5.0)
    hit = (o.x + d.x) < 1e9  # always True but data-dependent (not folded)
    point = V3(o.x + d.x * t, o.y + d.y * t, o.z + d.z * t)
    normal = V3(jnp.zeros(n), jnp.ones(n), jnp.zeros(n))
    return SceneHit(hit=hit, t=t, point=point, normal=normal,
                    u=jnp.zeros(n), v=jnp.zeros(n),
                    prim=jnp.zeros(n, jnp.int32))


variants = (
    ("no-shadow", real_hit, fake_any),
    ("no-trace", fake_hit, fake_any),
)
for label, hit_fn, any_fn in variants:
    pt.scene_hit = hit_fn
    pt.scene_hit_any = any_fn
    pt._path_chunk.clear_cache()
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
pt.scene_hit = real_hit
pt.scene_hit_any = real_any
print("done", flush=True)
