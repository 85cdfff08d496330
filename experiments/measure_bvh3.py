"""TRAV_ROWS sweep of the production (internally sorted) BVH kernels."""
from __future__ import annotations

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from path_tracing__ray_tracer_tpu.compiler import compile_scene
from path_tracing__ray_tracer_tpu.ops.pallas import bvh_pallas as bp
from path_tracing__ray_tracer_tpu.ops.v3 import V3
from path_tracing__ray_tracer_tpu.scene_builders.mesh_scene_builder import (
    MeshSceneBuilder,
)
from experiments.measure_bvh2 import scan_slope

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

b = MeshSceneBuilder()
scene = b.build_scene()
cs = compile_scene(scene)
bvh = cs.bvh
n = 131072
rng = np.random.default_rng(1)

# hemisphere-distributed bounce rays off 9 virtual surface points
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
o = V3(*[jnp.asarray(borg[:, i]) for i in range(3)])
d = V3(*[jnp.asarray(bdir[:, i]) for i in range(3)])


def vary(i):
    eps = (i.astype(jnp.float32) + 1.0) * 1e-5
    return V3(o.x + eps, o.y, o.z), d


import sys

rows_list = tuple(int(r) for r in sys.argv[1].split(",")) if len(sys.argv) > 1 else (16, 32, 64)
for rows in rows_list:
    def closest_body(i, rows=rows):
        oo, dd = vary(i)
        bt, bi = bp.bvh_closest_pallas(bvh, oo, dd, 1e-3, 1e6)
        return bt.sum() + bi.sum()

    def any_body(i, rows=rows):
        oo, dd = vary(i)
        f = bp.bvh_any_pallas(bvh, oo, dd, 1e-3, 25.0)
        return f.sum()

    saved = bp.TRAV_ROWS
    bp.TRAV_ROWS = rows
    tc = scan_slope(closest_body)
    ta = scan_slope(any_body)
    bp.TRAV_ROWS = saved
    print(f"rows={rows}: closest {tc*1e3:.2f} ms = {n/tc/1e6:.1f} Mrays/s"
          f" | any {ta*1e3:.2f} ms = {n/ta/1e6:.1f} Mrays/s")
