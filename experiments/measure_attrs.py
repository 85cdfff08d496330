"""TPU exactness + cost check for the closest-attrs BVH walk: (t, i) must
bit-match the plain BVH4 kernel on hardware, the emitted normal must
bit-match the stored triangles.normal gather, and the scan-slope cost of
scene_hit with attrs should be visibly below the round-3 gather baseline
(~75 ns/lane of post-kernel gathers — BENCHMARKS.md).
"""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from path_tracing__ray_tracer_tpu.compiler import compile_scene
from path_tracing__ray_tracer_tpu.models import path_tracer as pt
from path_tracing__ray_tracer_tpu.ops.pallas import bvh_pallas as bp
from path_tracing__ray_tracer_tpu.ops.v3 import V3
from path_tracing__ray_tracer_tpu.scene_builders.mesh_scene_builder import (
    MeshSceneBuilder,
)
from experiments.measure_bvh2 import scan_slope

b = MeshSceneBuilder(grid=3, subdivisions=3)
scene = b.build_scene()
cs = compile_scene(scene, use_bvh=True)
N = 131072

rng = np.random.default_rng(7)
o_np = rng.uniform(-10, 10, (N, 3)).astype(np.float32)
d_np = rng.normal(size=(N, 3)).astype(np.float32)
d_np /= np.linalg.norm(d_np, axis=1, keepdims=True)
o = V3.from_array(o_np)
d = V3.from_array(d_np)

# --- exactness on hardware ------------------------------------------------
bt_a, bi_a, u_a, v_a, n_a = jax.jit(
    lambda oo, dd: bp.bvh_closest_attrs_pallas(cs.bvh, oo, dd, 1e-3, 1e6)
)(o, d)
bt, bi = jax.jit(
    lambda oo, dd: bp.bvh_closest_pallas(cs.bvh, oo, dd, 1e-3, 1e6)
)(o, d)
t_match = float((np.asarray(bt_a) == np.asarray(bt)).mean())
i_match = float((np.asarray(bi_a) == np.asarray(bi)).mean())
print(f"attrs vs plain: t match {t_match:.4f}, i match {i_match:.4f}", flush=True)

hit = np.asarray(bi_a) >= 0
ti = np.clip(np.asarray(bi_a), 0, cs.n_triangles - 1)
stored = cs.triangles.normal.take(jnp.asarray(ti))
n_match = min(
    float((np.asarray(getattr(n_a, c))[hit] ==
           np.asarray(getattr(stored, c))[hit]).mean())
    for c in ("x", "y", "z")
)
print(f"stored-normal bit-match on hits ({hit.mean():.2f} hit rate): "
      f"{n_match:.4f}", flush=True)

# --- scene_hit cost with the attrs path (scan slope) ------------------------
def vary(i):
    return V3(o.x + (i.astype(jnp.float32) + 1.0) * 1e-5, o.y, o.z)


def hit_full(i):
    h = pt.scene_hit(cs, vary(i), d, 1e-3, 1e6)
    return h.t.sum() + h.normal.x.sum() + h.u.sum()


t_hit = scan_slope(hit_full)
print(f"scene_hit (attrs path): {t_hit*1e3:.2f} ms "
      f"({t_hit/N*1e9:.1f} ns/lane)", flush=True)
print("done", flush=True)
