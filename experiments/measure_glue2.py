"""Config-5 glue split, round 3: size the ``gather_material`` share of the
~3.4 ms/iteration machinery (BENCHMARKS.md post-fix split) by A/B-ing the
in-context loop probe against a constant-material stub.

The stub perturbs path dynamics (all-diffuse paths scatter differently than
the real mix), so the ms/full-width-iteration delta is indicative, not exact
— good enough to decide whether an in-kernel material select is worth
building.  A second variant stubs ``pick_light`` (constant light sample) to
size the NEE-pick share; iteration counts are printed so dynamics drift is
visible.

Usage: python -m experiments.measure_glue2
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

t0 = time.time()
warm = ptrt.RendererFactory.create(
    "tpu_path_raytracer", sample_group=2, chunk_rays=1 << 14,
    shadow_tmax="light", compile_overrides={"use_bvh": True},
)
warm.render(scene, camera, ptrt.RenderSettings(
    width=64, height=64, samples_per_pixel=2, max_depth=3))
print(f"process warm: {time.time() - t0:.1f} s", flush=True)

pt._PROBE_ITERS = True
cs = compile_scene(scene, use_bvh=True)
cam12 = pack_camera(camera)
N, NS, DEPTH = 131072, 8, 12

real_gather = pt.resolve_material
real_pick = pt.pick_light


def stub_gather(cs_, prim_idx):
    one = jnp.ones_like(prim_idx, jnp.float32)
    zero = jnp.zeros_like(one)
    return (V3(one * 0.7, one * 0.6, one * 0.5), one * 0.8, zero, zero,
            zero, one, zero, jnp.zeros_like(prim_idx) - 1)


def stub_pick(cs_, point, r):
    one = jnp.ones_like(r)
    inv = jnp.float32(0.5773502692)
    return V3(one * inv, one * inv, one * inv), one * 3.0, one


def run_variant(name):
    @jax.jit
    def chunk(pix0, seed, s0):
        return pt._regen_chunk(
            cs, cam12, pix0, seed, s0,
            n_pix=N, width=1920, height=1080, n_samples=NS, max_depth=DEPTH,
            jitter="independent", shadow_tmax="light",
        )

    out = chunk(jnp.int32(0), jnp.uint32(9), jnp.int32(0))
    jax.block_until_ready(out)
    for rep in range(3):
        t0 = time.time()
        out, it1, it2 = chunk(jnp.int32((rep + 1) * N), jnp.uint32(rep), jnp.int32(0))
        s = float(out.x.sum())
        i1, i2 = int(it1), int(it2)
        dt = time.time() - t0
        eff = i1 + i2 * (2048 / N)
        print(
            f"{name} rep{rep}: {dt:.2f} s, {i1}+{i2} iters, eff {eff:.1f} -> "
            f"{dt / eff * 1e3:.2f} ms/full-width-iter (checksum {s:.1f})",
            flush=True,
        )


run_variant("baseline")
pt.resolve_material = stub_gather
run_variant("stub-mat")
pt.resolve_material = real_gather
pt.pick_light = stub_pick
run_variant("stub-pick")
pt.pick_light = real_pick
pt.resolve_material = stub_gather
pt.pick_light = stub_pick
run_variant("stub-both")
pt.resolve_material = real_gather
pt.pick_light = real_pick
print("done", flush=True)
