"""Headline (Cornell bench config) regeneration-loop decomposition + tail
sweep.  The bench config is 1024^2, depth 8, group 64, chunk 1<<23, budget 0
(bench.py) -> chunks of N=131072 lanes, NS=64 samples.

Order (one process):
1. process warm (small Cornell path render)
2. in-context loop probe: ms per full-width iteration at bench shapes
3. stub probes: (a) fake bounce + real texture resolve, (b) fake bounce +
   fake resolve -> splits iteration time into megakernel / gather / machinery
4. _TAIL_DIV sweep (64 current, 16, 256) on the real bench-shaped render

Usage: python -m experiments.measure_hl_probe
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

builder = ptrt.CustomSceneBuilder()
scene = builder.build_scene()
camera = builder.create_camera(1.0)

# ---- 1. warm ---------------------------------------------------------------
t0 = time.time()
warm = ptrt.RendererFactory.create("tpu_path_raytracer", sample_group=2,
                                   chunk_rays=1 << 14)
warm.render(scene, camera, ptrt.RenderSettings(
    width=64, height=64, samples_per_pixel=2, max_depth=3))
print(f"process warm: {time.time() - t0:.1f} s", flush=True)

# ---- 2. loop probe at bench shapes ----------------------------------------
pt._PROBE_ITERS = True
cs = compile_scene(scene, gpu_parity=True, texture_budget=0)
cam12 = pack_camera(camera)
N, NS, DEPTH = 131072, 64, 8
TAILW = 2048  # max(1024, N // 64) rounded up


@jax.jit
def chunk(pix0, seed, s0):
    return pt._regen_chunk(
        cs, cam12, pix0, seed, s0,
        n_pix=N, width=1024, height=1024, n_samples=NS, max_depth=DEPTH,
        jitter="independent",
    )


out = chunk(jnp.int32(0), jnp.uint32(9), jnp.int32(0))
jax.block_until_ready(out)
print("probe warm", flush=True)
for rep in range(3):
    t0 = time.time()
    out, it1, it2 = chunk(jnp.int32((rep % 8) * N), jnp.uint32(rep), jnp.int32(0))
    s = float(out.x.sum())
    i1, i2 = int(it1), int(it2)
    dt = time.time() - t0
    eff = i1 + i2 * (TAILW / N)
    print(
        f"loop rep{rep}: {dt:.2f} s, {i1}+{i2} iters, eff {eff:.1f} -> "
        f"{dt / eff * 1e3:.2f} ms/full-width-iter (checksum {s:.1f})",
        flush=True,
    )

# ---- 3. stub probes --------------------------------------------------------
from path_tracing__ray_tracer_tpu.ops.pallas.bounce_pallas import BounceOut

real_mbr = pt._make_bounce_and_resolve
real_resolve = pt.resolve_base_color


def fake_mbr(cs_, width_hint, shadow_tmax="reference"):
    _bf, resolve_fn = real_mbr(cs_, width_hint, shadow_tmax)

    def bounce_fn(o, d, thr, key, depth):
        n = o.x.shape
        h = (jnp.abs(o.x * 7919.0)).astype(jnp.int32)
        hit = (h % 3) != 0  # ~2/3 continue: mean path ~3 like Cornell
        return BounceOut(
            hit=hit,
            killed=jnp.zeros(n, bool),
            w_sky=jnp.where(hit, 0.0, 0.1),
            w_nee=jnp.full(n, 0.3),
            rr_scale=jnp.ones(n),
            s_thr=jnp.zeros(n),
            t_thr=jnp.full(n, 0.7),
            new_org=o + d,
            new_dir=V3(d.y, d.z, d.x),
            u=jnp.full(n, 0.3),
            v=jnp.full(n, 0.4),
            tex_id=jnp.where(o.y > 0, 3.0, -1.0),
            mat_color=V3(thr.x, thr.y, thr.z),
        )

    return bounce_fn, resolve_fn


pt._make_bounce_and_resolve = fake_mbr


@jax.jit
def chunk_stub_a(pix0, seed, s0):
    return pt._regen_chunk(
        cs, cam12, pix0, seed, s0,
        n_pix=N, width=1024, height=1024, n_samples=NS, max_depth=DEPTH,
        jitter="independent",
    )


out = chunk_stub_a(jnp.int32(0), jnp.uint32(9), jnp.int32(0))
jax.block_until_ready(out)
for rep in range(3):
    t0 = time.time()
    out, it1, it2 = chunk_stub_a(jnp.int32((rep % 8) * N), jnp.uint32(rep + 5),
                                 jnp.int32(0))
    s = float(out.x.sum())
    i1, i2 = int(it1), int(it2)
    dt = time.time() - t0
    eff = i1 + i2 * (TAILW / N)
    print(
        f"stubA rep{rep} (machinery+gather): {dt:.2f} s, {i1}+{i2} iters, "
        f"eff {eff:.1f} -> {dt / eff * 1e3:.2f} ms/full-width-iter",
        flush=True,
    )

pt.resolve_base_color = (
    lambda cs_, mat_color, has_tex, tex_id, u, v: mat_color
)


@jax.jit
def chunk_stub_b(pix0, seed, s0):
    return pt._regen_chunk(
        cs, cam12, pix0, seed, s0,
        n_pix=N, width=1024, height=1024, n_samples=NS, max_depth=DEPTH,
        jitter="independent",
    )


out = chunk_stub_b(jnp.int32(0), jnp.uint32(9), jnp.int32(0))
jax.block_until_ready(out)
for rep in range(3):
    t0 = time.time()
    out, it1, it2 = chunk_stub_b(jnp.int32((rep % 8) * N), jnp.uint32(rep + 11),
                                 jnp.int32(0))
    s = float(out.x.sum())
    i1, i2 = int(it1), int(it2)
    dt = time.time() - t0
    eff = i1 + i2 * (TAILW / N)
    print(
        f"stubB rep{rep} (machinery only): {dt:.2f} s, {i1}+{i2} iters, "
        f"eff {eff:.1f} -> {dt / eff * 1e3:.2f} ms/full-width-iter",
        flush=True,
    )

pt._make_bounce_and_resolve = real_mbr
pt.resolve_base_color = real_resolve
pt._PROBE_ITERS = False

# ---- 4. tail-div sweep on the real bench config ----------------------------
settings = ptrt.RenderSettings(width=1024, height=1024,
                               samples_per_pixel=64, max_depth=8)
for div in (64, 16, 256):
    pt._TAIL_DIV = div
    pt._path_chunk.clear_cache()
    r = ptrt.RendererFactory.create("tpu_path_raytracer", sample_group=64,
                                    chunk_rays=1 << 23, texture_budget=0)
    r.render_sums(scene, camera, settings, sample_offset=0, n_samples=64)  # compile
    t0 = time.time()
    for bnum in (1, 2):
        r.render_sums(scene, camera, settings, sample_offset=bnum * 64,
                      n_samples=64)
    dt = time.time() - t0
    rays = 1024 * 1024 * 128 * 8
    print(f"tail N//{div}: {dt:.2f} s / 128 spp -> {rays / dt / 1e6:.1f} Mrays/s",
          flush=True)
pt._TAIL_DIV = 64
print("done", flush=True)
