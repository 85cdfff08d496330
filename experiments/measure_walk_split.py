"""Split the BVH4 walk cost: pops+control vs leaf intersection work.

Times bvh_closest_pallas / bvh_any_pallas on the standard incoherent
mesh-scene ray set, then retimes with ``_leaf_tris`` stubbed to a no-op
(carry passthrough) — traversal then visits MORE nodes (no best_t
shrinkage culls), so the stubbed time is an UPPER bound on pop cost and
the difference a LOWER bound on leaf cost.  A third variant keeps leaf
visits but stubs only the per-slot update maths to a constant-miss
(window tests still run) to separate SMEM-broadcast+MT cost from the
select chain.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python experiments/measure_walk_split.py
"""
from __future__ import annotations

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from path_tracing__ray_tracer_tpu.ops import bvh as bvh_mod
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

real_leaf_tris = bp._leaf_tris


def stub_leaf_tris(slot_ref, base, leaf_size, ox, oy, oz, dx, dy, dz,
                   t_min, upd):
    return upd(None, jnp.zeros(ox.shape, bool), jnp.full(ox.shape, 1e30),
               jnp.zeros(ox.shape), jnp.zeros(ox.shape), jnp.zeros(ox.shape),
               (jnp.zeros(ox.shape), jnp.zeros(ox.shape), jnp.zeros(ox.shape)))


def missy_leaf_tris(slot_ref, base, leaf_size, ox, oy, oz, dx, dy, dz,
                    t_min, upd):
    """Full per-slot MT maths, but the window never wins (t forced huge):
    keeps SMEM broadcasts + arithmetic, removes best/attr select chains
    downstream (they fold to no-ops only per-lane — the selects still
    execute, so this mainly removes best_t culling feedback)."""
    def upd2(carry2, win, t, gid, u, v, n3):
        return upd(carry2, win & False, t, gid, u, v, n3)
    return real_leaf_tris(slot_ref, base, leaf_size, ox, oy, oz,
                          dx, dy, dz, t_min, upd2)


def closest(i):
    eps = (i.astype(jnp.float32) + 1.0) * 1e-5
    bt, bi = bp.bvh_closest_pallas(
        bvh, V3(o_inc.x + eps, o_inc.y, o_inc.z), d_inc, 1e-3, 1e30)
    return bt.sum() + bi.sum().astype(jnp.float32)


def anyf(i):
    eps = (i.astype(jnp.float32) + 1.0) * 1e-5
    occ = bp.bvh_any_pallas(
        bvh, V3(o_inc.x + eps, o_inc.y, o_inc.z), d_inc, 1e-3, lim)
    return occ.sum().astype(jnp.float32)


def run(tag):
    jax.clear_caches()
    tc = scan_slope(closest)
    ta = scan_slope(anyf)
    print(f"{tag}: closest {tc*1e3:.2f} ms ({n/tc/1e6:.1f} Mrays/s), "
          f"any {ta*1e3:.2f} ms ({n/ta/1e6:.1f} Mrays/s)", flush=True)
    return tc, ta


run("full walk     ")
bp._leaf_tris = stub_leaf_tris
run("leaf stubbed  ")
bp._leaf_tris = missy_leaf_tris
run("leaf never-hit")
bp._leaf_tris = real_leaf_tris
print("done", flush=True)
