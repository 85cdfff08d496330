"""Round-4: whole-bounce BVH megakernel A/B on the config-5 mesh benchmark.

A = fused bounce (bounce_bvh_pallas, round-4 default): closest walk + NEE +
    shadow walk + scatter in ONE launch, one coherence sort per bounce.
B = round-3 split path: fused scene closest kernel + fused scene any kernel
    with XLA glue between (two sorts, two launches, lane-state roundtrips).

Same process, serialized; B flips ``BVH_BOUNCE`` off and clears jit caches
(the module-level ``_path_chunk`` jit would otherwise not retrace).  Steady
renders use varied seeds/sample offsets (the tunnel memoizes identical
buffers).

Usage: python -m experiments.measure_bounce_bvh [--scale 0.125]
"""
from __future__ import annotations

import argparse
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import path_tracing__ray_tracer_tpu as ptrt
from path_tracing__ray_tracer_tpu.ops.pallas import bounce_bvh_pallas
from path_tracing__ray_tracer_tpu.scene_builders.mesh_scene_builder import (
    MeshSceneBuilder,
)

parser = argparse.ArgumentParser()
parser.add_argument("--scale", type=float, default=0.125)
parser.add_argument("--reps", type=int, default=2)
args = parser.parse_args()

b = MeshSceneBuilder(grid=3, subdivisions=3)
scene = b.build_scene()
camera = b.create_camera(1920 / 1080)
W, H, DEPTH = 1920, 1080, 12
SPP = max(1, int(512 * args.scale))

t0 = time.time()
warm = ptrt.RendererFactory.create(
    "tpu_path_raytracer", sample_group=2, chunk_rays=1 << 14,
    shadow_tmax="light", compile_overrides={"use_bvh": True},
)
warm.render(scene, camera, ptrt.RenderSettings(64, 64, 2, 3))
print(f"process warm: {time.time() - t0:.1f} s", flush=True)


def run(tag: str, seed: int):
    r = ptrt.RendererFactory.create(
        "tpu_path_raytracer", sample_group=64, chunk_rays=1 << 23,
        shadow_tmax="light", seed=seed,
        compile_overrides={"use_bvh": True},
    )
    settings = ptrt.RenderSettings(W, H, SPP, DEPTH)
    t0 = time.time()
    r.render(scene, camera, settings)
    warmup = time.time() - t0
    times = []
    for rep in range(args.reps):
        r.seed = seed + 1 + rep
        t0 = time.time()
        r.render(scene, camera, settings)
        times.append(time.time() - t0)
    rays = W * H * SPP * DEPTH
    best = min(times)
    print(
        f"{tag}: warmup {warmup:.1f} s, steady {[round(t, 2) for t in times]} s"
        f" -> best {rays / best / 1e6:.1f} Mrays/s",
        flush=True,
    )
    return best


best_on = run("A fused-bounce ON ", seed=10)

bounce_bvh_pallas.BVH_BOUNCE = False
jax.clear_caches()
best_off = run("B fused-bounce OFF", seed=20)

bounce_bvh_pallas.BVH_BOUNCE = True
jax.clear_caches()
best_on2 = run("A fused-bounce ON2", seed=30)

print(
    f"summary: ON {best_on:.2f}/{best_on2:.2f} s vs OFF {best_off:.2f} s"
    f" (ratio {best_off / min(best_on, best_on2):.2f}x)",
    flush=True,
)
