"""Per-component cost of ONE mesh-scene bounce iteration at 131072 lanes
(two-point scan slope): full _bounce_xla, scene_hit alone, shading alone
(stubbed hit), and the (NS, N) one-hot accumulate fold."""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
import path_tracing__ray_tracer_tpu as ptrt
from path_tracing__ray_tracer_tpu.compiler import compile_scene
from path_tracing__ray_tracer_tpu.models import path_tracer as pt
from path_tracing__ray_tracer_tpu.ops.v3 import V3
from path_tracing__ray_tracer_tpu.scene_builders.mesh_scene_builder import (
    MeshSceneBuilder,
)
from experiments.measure_bvh2 import scan_slope

b = MeshSceneBuilder(grid=3, subdivisions=3)
scene = b.build_scene()
cs = compile_scene(scene, use_bvh=True)
N = 131072

rng = np.random.default_rng(3)
o_np = rng.uniform(-10, 10, (N, 3)).astype(np.float32)
d_np = rng.normal(size=(N, 3)).astype(np.float32)
d_np /= np.linalg.norm(d_np, axis=1, keepdims=True)
o = V3.from_array(o_np)
d = V3.from_array(d_np)
thr = V3.full(0.7, (N,))
key = jnp.arange(N, dtype=jnp.uint32)
depth = jnp.zeros((N,), jnp.int32)


def vary(i):
    return V3(o.x + (i.astype(jnp.float32) + 1.0) * 1e-5, o.y, o.z)


def full_bounce(i):
    out = pt._bounce_xla(cs, vary(i), d, thr, key, depth, shadow_tmax="light")
    return out.w_nee.sum() + out.new_dir.x.sum() + out.t_thr.sum()


def hit_only(i):
    h = pt.scene_hit(cs, vary(i), d, 1e-3, 1e6)
    return h.t.sum() + h.normal.x.sum()


real_hit, real_any = pt.scene_hit, pt.scene_hit_any


def fake_hit(cs_, o_, d_, t_min, t_max):
    n = o_.x.shape
    from path_tracing__ray_tracer_tpu.ops.intersect import SceneHit
    t = jnp.full(n, 5.0)
    return SceneHit(hit=(o_.x + d_.x) < 1e9, t=t,
                    point=V3(o_.x + d_.x * t, o_.y + d_.y * t, o_.z + d_.z * t),
                    normal=V3(jnp.zeros(n), jnp.ones(n), jnp.zeros(n)),
                    u=jnp.zeros(n), v=jnp.zeros(n),
                    prim=jnp.zeros(n, jnp.int32))


def fake_any(cs_, o_, d_, t_min, limit):
    return jnp.zeros_like(o_.x, dtype=bool)


NS = 8
acc = tuple(jnp.zeros((NS, N), jnp.float32) for _ in range(3))
item_rows = jax.lax.broadcasted_iota(jnp.int32, (NS, N), 0)
item = jnp.zeros((N,), jnp.int32)


def fold(i):
    c = vary(i).x
    hit_row = item_rows == item[None, :]
    out = tuple(a + jnp.where(hit_row, c[None, :], 0.0) for a in acc)
    return sum(x.sum() for x in out)


t_full = scan_slope(full_bounce)
t_hit = scan_slope(hit_only)
pt.scene_hit, pt.scene_hit_any = fake_hit, fake_any
t_shade = scan_slope(full_bounce)
pt.scene_hit, pt.scene_hit_any = real_hit, real_any
t_fold = scan_slope(fold)
for name, t in (("full bounce", t_full), ("scene_hit only", t_hit),
                ("shade only (stub hit+any)", t_shade),
                ("one-hot fold (3ch)", t_fold)):
    print(f"{name}: {t*1e3:.2f} ms ({t/N*1e9:.1f} ns/lane)", flush=True)
print("done", flush=True)
