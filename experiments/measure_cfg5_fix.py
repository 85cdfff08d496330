"""Round-3 config-5 follow-up: measure the untextured-scene resolve gate
(skip the dummy-atlas gather) and sample-group variants.

Order (one process, serialized TPU use):
1. tiny warm render (absorbs the 100-500 s first-in-process cost)
2. in-context loop probe (same shapes as measure_cfg5_loop) — ms per
   full-width regeneration iteration after the fix (round-3 record: 15.7)
3. machinery-only probe (stubbed scene_hit/scene_hit_any) — bounds the
   non-walk share of an iteration
4. config-5 end-to-end steady at group 8 / chunk 1<<20 (current setting)
5. config-5 end-to-end steady at group 16 / chunk 1<<21 (halves dispatch
   count and phase-2 overhangs; same lane width)

Usage: python -m experiments.measure_cfg5_fix
"""
from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

import path_tracing__ray_tracer_tpu as ptrt
from path_tracing__ray_tracer_tpu.compiler import compile_scene, pack_camera
from path_tracing__ray_tracer_tpu.models import path_tracer as pt
from path_tracing__ray_tracer_tpu.ops.v3 import V3
from path_tracing__ray_tracer_tpu.scene_builders.mesh_scene_builder import (
    MeshSceneBuilder,
)

b = MeshSceneBuilder(grid=3, subdivisions=3)
scene = b.build_scene()
camera = b.create_camera(1920 / 1080)

# ---- 1. warm the process ---------------------------------------------------
t0 = time.time()
warm = ptrt.RendererFactory.create(
    "tpu_path_raytracer", sample_group=2, chunk_rays=1 << 14,
    shadow_tmax="light", compile_overrides={"use_bvh": True},
)
warm.render(scene, camera, ptrt.RenderSettings(
    width=64, height=64, samples_per_pixel=2, max_depth=3))
print(f"process warm: {time.time() - t0:.1f} s", flush=True)

# ---- 2. in-context loop probe ---------------------------------------------
pt._PROBE_ITERS = True
cs = compile_scene(scene, use_bvh=True)
cam12 = pack_camera(camera)
N, NS, DEPTH = 131072, 8, 12


@jax.jit
def chunk(pix0, seed, s0):
    return pt._regen_chunk(
        cs, cam12, pix0, seed, s0,
        n_pix=N, width=1920, height=1080, n_samples=NS, max_depth=DEPTH,
        jitter="independent", shadow_tmax="light",
    )


out = chunk(jnp.int32(0), jnp.uint32(9), jnp.int32(0))
jax.block_until_ready(out)
print("probe warm", flush=True)
for rep in range(3):
    t0 = time.time()
    out, it1, it2 = chunk(jnp.int32(rep * N), jnp.uint32(rep), jnp.int32(0))
    s = float(out.x.sum())
    i1, i2 = int(it1), int(it2)
    dt = time.time() - t0
    eff = i1 + i2 * (2048 / N)
    print(
        f"loop rep{rep}: {dt:.2f} s, {i1}+{i2} iters, eff {eff:.1f} -> "
        f"{dt / eff * 1e3:.1f} ms/full-width-iter (checksum {s:.1f})",
        flush=True,
    )

# ---- 3. machinery-only probe (stub walks) ----------------------------------
real_hit, real_any = pt.scene_hit, pt.scene_hit_any


def fake_hit(cs_, o_, d_, t_min, t_max):
    from path_tracing__ray_tracer_tpu.ops.intersect import SceneHit
    n = o_.x.shape
    t = jnp.full(n, 5.0)
    return SceneHit(hit=(o_.x + d_.x) < 1e9, t=t,
                    point=V3(o_.x + d_.x * t, o_.y + d_.y * t, o_.z + d_.z * t),
                    normal=V3(jnp.zeros(n), jnp.ones(n), jnp.zeros(n)),
                    u=jnp.zeros(n), v=jnp.zeros(n),
                    prim=jnp.zeros(n, jnp.int32))


def fake_any(cs_, o_, d_, t_min, limit):
    return jnp.zeros_like(o_.x, dtype=bool)


pt.scene_hit, pt.scene_hit_any = fake_hit, fake_any


@jax.jit
def chunk_stub(pix0, seed, s0):
    return pt._regen_chunk(
        cs, cam12, pix0, seed, s0,
        n_pix=N, width=1920, height=1080, n_samples=NS, max_depth=DEPTH,
        jitter="independent", shadow_tmax="light",
    )


out = chunk_stub(jnp.int32(0), jnp.uint32(9), jnp.int32(0))
jax.block_until_ready(out)
for rep in range(3):
    t0 = time.time()
    out, it1, it2 = chunk_stub(jnp.int32(rep * N), jnp.uint32(rep + 5), jnp.int32(0))
    s = float(out.x.sum())
    i1, i2 = int(it1), int(it2)
    dt = time.time() - t0
    eff = i1 + i2 * (2048 / N)
    print(
        f"stub rep{rep}: {dt:.2f} s, {i1}+{i2} iters, eff {eff:.1f} -> "
        f"{dt / eff * 1e3:.2f} ms/full-width-iter (machinery+glue only)",
        flush=True,
    )
pt.scene_hit, pt.scene_hit_any = real_hit, real_any
pt._PROBE_ITERS = False

# ---- 4/5. end-to-end config 5 variants -------------------------------------
settings = ptrt.RenderSettings(width=1920, height=1080,
                               samples_per_pixel=64, max_depth=12)
for label, group, chunk_rays in (
    ("group8/chunk1<<20", 8, 1 << 20),
    ("group16/chunk1<<21", 16, 1 << 21),
):
    r = ptrt.RendererFactory.create(
        "tpu_path_raytracer", sample_group=group, chunk_rays=chunk_rays,
        shadow_tmax="light", compile_overrides={"use_bvh": True},
    )
    r.seed = 1
    t0 = time.time()
    r.render(scene, camera, settings)
    wu = time.time() - t0
    r.seed = 0
    t0 = time.time()
    r.render(scene, camera, settings)
    dt = time.time() - t0
    rays = 1920 * 1080 * 64 * 12
    print(
        f"e2e {label}: steady {dt:.1f} s ({rays / dt / 1e6:.2f} Mrays/s), "
        f"warmup {wu:.1f} s",
        flush=True,
    )
print("done", flush=True)
