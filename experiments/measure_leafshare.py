"""Attribute BVH4 walk time to pops vs leaf triangle tests.

The post-select-chain config-5 iteration is almost entirely the two BVH
walks (BENCHMARKS.md).  Per the host walk simulator an incoherent
4096-lane block does ~145 pops and ~225 leaf visits; each leaf visit runs
16 sequential Möller–Trumbore slot tests (~45 VPU ops each) while a pop is
4 slab tests + 2 packed reductions.  Which one dominates decides the next
lever (MXU leaf evaluation vs cheaper pops).

Method: monkeypatch ``_leaf_tris`` to test only the first k slots of each
leaf (k = 16 is the true kernel).  Time(k) is ~linear in k with slope =
per-slot cost x visits; smaller k weakens best_t culling (more pops), so
the slope slightly UNDERestimates the leaf share — a lower bound.

Also re-sweeps the cheap sort-key knobs under the current regime:
_MORTON_BITS 4/5/6 and BVH_SUBKEY_DEPTH 1/2.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python experiments/measure_leafshare.py
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

_ORIG_LEAF = bp._leaf_tris


def patched_leaf(k):
    def f(slot_ref, base_i, leaf_size, *args, **kw):
        return _ORIG_LEAF(slot_ref, base_i, min(k, leaf_size), *args, **kw)
    return f


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


def report(tag):
    ti = scan_slope(closest)
    ai = scan_slope(anyf)
    print(f"{tag}: closest {ti*1e3:.2f} ms = {n/ti/1e6:.1f} Mrays/s"
          f" | any {ai*1e3:.2f} ms = {n/ai/1e6:.1f} Mrays/s", flush=True)
    return ti, ai


print("== leaf-slot count sweep (k=16 is the true kernel) ==", flush=True)
base = report("k=16 (baseline)")
times = {16: base}
for k in (8, 4, 1):
    bp._leaf_tris = patched_leaf(k)
    times[k] = report(f"k={k:2d}")
bp._leaf_tris = _ORIG_LEAF

# linear fit time(k) = c0 + slope*k over the measured points
for name, idx in (("closest", 0), ("any", 1)):
    ks = np.array(sorted(times), np.float64)
    ts = np.array([times[int(k)][idx] for k in ks])
    slope, c0 = np.polyfit(ks, ts, 1)
    leaf16 = slope * 16.0
    print(f"{name}: pops+overhead ~{c0*1e3:.2f} ms, leaf(16 slots) "
          f"~{leaf16*1e3:.2f} ms = {100*leaf16/(c0+leaf16):.0f}% of walk",
          flush=True)

print("== morton bits sweep ==", flush=True)
for bits in (4, 5, 6):
    bp._MORTON_BITS = bits
    report(f"morton={bits}")
bp._MORTON_BITS = 4

print("== subtree-key depth ==", flush=True)
bp.BVH_SUBKEY_DEPTH = 2
report("subkey_depth=2")
bp.BVH_SUBKEY_DEPTH = 1
print("done", flush=True)
