"""TPU exactness + cost of the fused whole-scene BVH kernels (BVH_SCENE):

1. scene_hit fused vs split must agree bit-exactly on hardware (same
   winner/t/normal/uv — the invariant the interpret tests check with float
   tolerance is expected to be exact on the real toolchain, like the other
   Pallas-vs-XLA pairs);
2. scene_hit_any fused vs split likewise;
3. scan-slope cost of scene_hit and scene_hit_any fused vs split — the
   fused path should shave the measured ~2.5 ms/131K-lane of XLA ps-sweep +
   combine + epilogue glue (BENCHMARKS.md round 3).
"""
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from path_tracing__ray_tracer_tpu.compiler import compile_scene
from path_tracing__ray_tracer_tpu.ops import intersect
from path_tracing__ray_tracer_tpu.ops.pallas import bvh_pallas as bp
from path_tracing__ray_tracer_tpu.ops.v3 import V3
from path_tracing__ray_tracer_tpu.scene_builders.mesh_scene_builder import (
    MeshSceneBuilder,
)
from experiments.measure_bvh2 import scan_slope

b = MeshSceneBuilder(grid=3, subdivisions=3)
scene = b.build_scene()
cs = compile_scene(scene, use_bvh=True)
assert bp._scene_fused_ok(cs), "fused gate must be on for the mesh scene"
N = 131072

rng = np.random.default_rng(11)
o_np = rng.uniform(-10, 10, (N, 3)).astype(np.float32)
d_np = rng.normal(size=(N, 3)).astype(np.float32)
d_np /= np.linalg.norm(d_np, axis=1, keepdims=True)
o = V3.from_array(o_np)
d = V3.from_array(d_np)

# --- closest exactness on hardware ------------------------------------------
hit_f = jax.jit(lambda oo, dd: intersect.scene_hit(cs, oo, dd, 1e-3, 1e6))(o, d)
bp.BVH_SCENE = False
hit_s = jax.jit(lambda oo, dd: intersect.scene_hit(cs, oo, dd, 1e-3, 1e6))(o, d)
bp.BVH_SCENE = True
for name in ("prim", "t", "u", "v"):
    m = float((np.asarray(getattr(hit_f, name))
               == np.asarray(getattr(hit_s, name))).mean())
    print(f"closest {name} match: {m:.6f}", flush=True)
for c in ("x", "y", "z"):
    m = float((np.asarray(getattr(hit_f.normal, c))
               == np.asarray(getattr(hit_s.normal, c))).mean())
    print(f"closest n{c} match: {m:.6f}", flush=True)

# --- any exactness with mixed limits (incl. parked lanes) --------------------
lim = rng.uniform(0.5, 30, N).astype(np.float32)
lim[::7] = -1.0
lim_j = jnp.asarray(lim)
occ_f = jax.jit(lambda oo, dd, ll: intersect.scene_hit_any(cs, oo, dd, 1e-3, ll))(o, d, lim_j)
bp.BVH_SCENE = False
occ_s = jax.jit(lambda oo, dd, ll: intersect.scene_hit_any(cs, oo, dd, 1e-3, ll))(o, d, lim_j)
bp.BVH_SCENE = True
print(f"any match: {float((np.asarray(occ_f) == np.asarray(occ_s)).mean()):.6f}",
      flush=True)

# --- scan-slope costs ---------------------------------------------------------
def vary(i):
    return V3(o.x + (i.astype(jnp.float32) + 1.0) * 1e-5, o.y, o.z)


def hit_fn(i):
    h = intersect.scene_hit(cs, vary(i), d, 1e-3, 1e6)
    return h.t.sum() + h.normal.x.sum() + h.u.sum()


def any_fn(i):
    return intersect.scene_hit_any(cs, vary(i), d, 1e-3, lim_j).sum()


for label, flag in (("fused", True), ("split", False)):
    bp.BVH_SCENE = flag
    t_hit = scan_slope(hit_fn)
    t_any = scan_slope(any_fn)
    print(f"{label}: scene_hit {t_hit*1e3:.2f} ms ({t_hit/N*1e9:.1f} ns/lane), "
          f"scene_hit_any {t_any*1e3:.2f} ms ({t_any/N*1e9:.1f} ns/lane)",
          flush=True)
bp.BVH_SCENE = True
print("done", flush=True)
