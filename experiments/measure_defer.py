"""TPU verification + A/B for deferred-texture mode (round 3).

1. MXU mip kernel vs HLO gather — must be bit-exact (bf16 3-channel tables).
2. Defer equivalence with mip == atlas at depth 6 (the round-3 packed-f32 bug
   only surfaced at depth >= 3 — glass/secondary textured paths).
3. Headline A/B: bench.py config (1024^2, d8, group 64, texture_budget 256)
   with and without mip_budget=64.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

import path_tracing__ray_tracer_tpu as ptrt
from path_tracing__ray_tracer_tpu.models.path_tracer import _path_chunk
from path_tracing__ray_tracer_tpu.ops.pallas import texture_pallas as tp

builder = ptrt.CustomSceneBuilder()
scene = builder.build_scene()

# ---- warmup: absorb first-execution process cost ---------------------------
t0 = time.time()
warm = ptrt.RendererFactory.create("tpu_raytracer")
warm.render(scene, builder.create_camera(1.0), ptrt.RenderSettings(128, 128, 1, 2))
print(f"warmup {time.time()-t0:.1f}s", flush=True)

# ---- 1. kernel exactness on TPU -------------------------------------------
cs64 = ptrt.compile_scene(scene, texture_budget=64, mip_budget=64)
tables = tp.pack_mip_table(cs64)
n_tex = int(cs64.mip_atlas.shape[0])
rng = np.random.default_rng(3)
idx = jnp.asarray(rng.integers(0, n_tex, size=131072), jnp.int32)
got = tp.mip_gather_rgb(cs64, tables, idx)  # n % 1024 == 0 -> MXU kernel
want_t = cs64.mip_atlas[idx]
# f32 throughout: the kernel multiplies an f32 channel value by f32(1/255);
# a float64 reference here would flag every element (round-3 lesson)
want = [np.float32((np.asarray(want_t) >> s) & 0xFF) * np.float32(1.0 / 255.0)
        for s in (0, 8, 16)]
bad = sum(int((np.asarray(c) != w).sum())
          for c, w in zip((got.x, got.y, got.z), want))
print(f"kernel exactness: bad={bad} / {3*131072}", flush=True)

# ---- 2. defer equivalence, mip == atlas, depth 6 ---------------------------
cs_ex = ptrt.compile_scene(scene, texture_budget=64)
cam12 = ptrt.pack_camera(builder.create_camera(4.0 / 3.0))
kw = dict(n_pix=4096, width=64, height=64, n_samples=4, max_depth=6,
          jitter="independent")


def img(cs):
    o = _path_chunk(cs, cam12, jnp.int32(0), jnp.uint32(7), jnp.int32(0), **kw)
    return np.stack([np.asarray(o.x), np.asarray(o.y), np.asarray(o.z)], -1)


a, b = img(cs_ex), img(cs64)
d = np.abs(a - b)
print(f"defer equiv: frac>{1e-3}={float((d > 1e-3).mean()):.5f} "
      f"max={d.max():.4f} mean={d.mean():.2e}", flush=True)

# ---- 3. headline A/B -------------------------------------------------------
W = H = 1024
DEPTH = 8
GROUP = 64
settings = ptrt.RenderSettings(W, H, GROUP, DEPTH)
cam = builder.create_camera(W / H)

for label, extra in (("exact", {}), ("defer64", {"mip_budget": 64})):
    r = ptrt.RendererFactory.create(
        "tpu_path_raytracer", sample_group=GROUP, chunk_rays=1 << 23,
        texture_budget=256, **extra,
    )
    r.render_sums(scene, cam, settings, sample_offset=0, n_samples=GROUP)  # compile
    t0 = time.time()
    for bi in (1, 2):
        r.render_sums(scene, cam, settings, sample_offset=bi * GROUP,
                      n_samples=GROUP)
    el = time.time() - t0
    mrays = W * H * 2 * GROUP * DEPTH / el / 1e6
    print(f"{label}: {el:.2f}s for 2x{GROUP}spp -> {mrays:.1f} Mrays/s", flush=True)
print("done", flush=True)
