"""TRAV_ROWS=4 probe: the round-3 sweep (measure_bvh9) tried 8/16/32 and the
trend favored narrower blocks under BVH4 (better per-block coherence beats
reduction amortization); 4 rows (512 lanes) was never measured.  Kernel-level
incoherent closest/any at rows 4 vs 8, then config-5 end-to-end at the
winner if rows 4 takes the kernels by >=5%.

Usage: python -m experiments.measure_rows4
"""
from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

import path_tracing__ray_tracer_tpu as ptrt
from path_tracing__ray_tracer_tpu.ops import bvh as bvh_mod
from path_tracing__ray_tracer_tpu.ops.pallas import bvh_pallas as bp
from path_tracing__ray_tracer_tpu.ops.v3 import V3
from path_tracing__ray_tracer_tpu.scene_builders.mesh_scene_builder import (
    MeshSceneBuilder,
)
from experiments.measure_bvh2 import scan_slope

b = MeshSceneBuilder()
scene = b.build_scene()
cam = b.create_camera(1920 / 1080)
tris = [o for o in scene.objects if type(o).__name__ == "Triangle"]
v0 = np.array([[t.v0.x, t.v0.y, t.v0.z] for t in tris], np.float32)
v1 = np.array([[t.v1.x, t.v1.y, t.v1.z] for t in tris], np.float32)
v2 = np.array([[t.v2.x, t.v2.y, t.v2.z] for t in tris], np.float32)
tri_min = np.minimum(np.minimum(v0, v1), v2)
tri_max = np.maximum(np.maximum(v0, v1), v2)
arrs = bvh_mod.build_bvh(tri_min, tri_max, leaf_size=16, use_native=False)
bvh = bvh_mod.to_device(arrs, v0=v0, v1=v1, v2=v2)

n = 131072
rng = np.random.default_rng(1)
centers = np.array([[dx * 9.0, dy * 9.0, 0.0]
                    for dx in (-1, 0, 1) for dy in (-1, 0, 1)], np.float32)
ci = rng.integers(0, 9, n)
nrm = rng.normal(size=(n, 3)).astype(np.float32)
nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
borg = centers[ci] + nrm * 3.0
u1, u2 = rng.random(n, np.float32), rng.random(n, np.float32)
r = np.sqrt(u1)
phi = 2 * np.pi * u2
a = np.where(np.abs(nrm[:, 2:3]) < 0.9, [[0, 0, 1]], [[1, 0, 0]]).astype(np.float32)
t1 = np.cross(nrm, a); t1 /= np.linalg.norm(t1, axis=1, keepdims=True)
t2 = np.cross(nrm, t1)
bdir = (t1 * (r * np.cos(phi))[:, None] + t2 * (r * np.sin(phi))[:, None]
        + nrm * np.sqrt(1 - u1)[:, None]).astype(np.float32)
bdir /= np.linalg.norm(bdir, axis=1, keepdims=True)
o_inc = V3(*[jnp.asarray(borg[:, i]) for i in range(3)])
d_inc = V3(*[jnp.asarray(bdir[:, i]) for i in range(3)])
lim = jnp.full((n,), 25.0, jnp.float32)

# process warm: one small kernel-level run
bp.TRAV_ROWS = 8
_warm = bp.bvh_closest_pallas(bvh, o_inc, d_inc, 1e-3, 1e6)
jax.block_until_ready(_warm[0])
print("warm done", flush=True)

results = {}
for rows in (4, 8):
    bp.TRAV_ROWS = rows

    def closest(i):
        eps = (i.astype(jnp.float32) + 1.0) * 1e-5
        bt, bi = bp.bvh_closest_pallas(
            bvh, V3(o_inc.x + eps, o_inc.y, o_inc.z), d_inc, 1e-3, 1e6)
        return bt.sum() + bi.sum()

    def anyf(i):
        eps = (i.astype(jnp.float32) + 1.0) * 1e-5
        occ = bp.bvh_any_pallas(
            bvh, V3(o_inc.x + eps, o_inc.y, o_inc.z), d_inc, 1e-3, lim)
        return occ.sum().astype(jnp.float32)

    ti = scan_slope(closest)
    ai = scan_slope(anyf)
    results[rows] = (n / ti / 1e6, n / ai / 1e6)
    print(f"rows={rows}: closest {n/ti/1e6:.1f} Mrays/s | any {n/ai/1e6:.1f}",
          flush=True)

if results[4][0] >= results[8][0] * 1.05:
    bp.TRAV_ROWS = 4
    mesh_scene = MeshSceneBuilder(grid=3, subdivisions=3).build_scene()
    s5 = ptrt.RenderSettings(width=1920, height=1080,
                             samples_per_pixel=64, max_depth=12)
    r = ptrt.RendererFactory.create(
        "tpu_path_raytracer", sample_group=64, chunk_rays=1 << 23,
        shadow_tmax="light", compile_overrides={"use_bvh": True},
    )
    r.seed = 1
    t0 = time.time(); r.render(mesh_scene, cam, s5); wu = time.time() - t0
    r.seed = 0
    t0 = time.time(); r.render(mesh_scene, cam, s5); dt = time.time() - t0
    rays = 1920 * 1080 * 64 * 12
    print(f"e2e rows4: steady {dt:.1f} s ({rays/dt/1e6:.2f} Mrays/s), "
          f"warmup {wu:.1f} s", flush=True)
else:
    print("rows 4 does not beat 8 by 5%; keeping 8", flush=True)
print("done", flush=True)
