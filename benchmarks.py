"""The five BASELINE.json benchmark configurations, end to end.

``bench.py`` stays the driver's single-line contract; this script runs the
full matrix and prints one JSON line per config:

1. Cornell spheres-only Whitted (cpu_raytracer parity), 256², 1 spp
2. Cornell diffuse path trace, 512², 64 spp, depth 4
3. Textured Cornell (cuda_texture_renderer parity), 512², 256 spp
4. Glass + mirror caustics (hero config), 1024², 1024 spp, depth 8, RR
5. Triangle-mesh-heavy BVH stress, 1920×1080, 512 spp, wavefront depth 12

Usage:  python benchmarks.py [--configs 1,2,3] [--scale 0.25]
``--scale`` shrinks spp (not resolution) for quick runs.

Noise-floor handling (VERDICT round-4 #3): the tunnel imposes a ~30 ms
host-sync floor and ±2× noise on sub-second executions, so (a) each config
has a per-config ``scale floor`` that keeps its spp high enough to measure
(the global ``--scale`` never drives a row below it; the row's effective
``spp_scale`` is recorded), and (b) the steady phase repeats varied-seed
renders until ≥2.5 s of measured work accumulates (≤5 reps), reporting the
mean and the per-rep times.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)


def run_config(idx: int, scale: float) -> dict:
    import path_tracing__ray_tracer_tpu as ptrt
    from path_tracing__ray_tracer_tpu.scene_builders.mesh_scene_builder import (
        MeshSceneBuilder,
    )

    cornell = ptrt.CustomSceneBuilder()

    # per-config scale floors: the minimum spp fraction at which the steady
    # phase stays comfortably above the tunnel noise floor (measured round
    # 4: config 2 is ~1.2 s even at FULL spec, config 3 needs spp ≥ 128 —
    # its scale-0.5 run measured 1.83 s / 146.7 Mrays/s).  Sub-floor global
    # scales are clamped up and the effective scale is recorded per row.
    SCALE_FLOOR = {2: 1.0, 3: 0.5}
    scale = max(scale, SCALE_FLOOR.get(idx, 0.0))

    def spp(n):
        return max(1, int(n * scale))

    configs = {
        1: ("cpu_raytracer", cornell, dict(width=256, height=256,
                                           samples_per_pixel=1, max_depth=4), {}),
        2: ("tpu_path_raytracer", cornell, dict(width=512, height=512,
                                                samples_per_pixel=spp(64), max_depth=4),
            dict(texture_budget=256)),
        3: ("tpu_texture_raytracer", cornell, dict(width=512, height=512,
                                                   samples_per_pixel=spp(256),
                                                   max_depth=8), {}),
        # sample_group 128 / chunk 1<<24: the measured knee of the group
        # sweep (experiments/measure_group128.py / measure_group256.py —
        # 128 beats 64 by ~2.5%, 256 loses ~9%); same 131072-lane kernel.
        4: ("tpu_path_raytracer", cornell, dict(width=1024, height=1024,
                                                samples_per_pixel=spp(1024),
                                                max_depth=8),
            dict(texture_budget=256, sample_group=128, chunk_rays=1 << 24)),
        # mesh-heavy BVH stress: the block-synchronous Pallas traversal
        # (ops/pallas/bvh_pallas.py) walks the SAH tree from SMEM — the
        # gather-free replacement for the round-1 XLA walk that lost to
        # brute force.  Chunks kept moderate for the TPU watchdog.
        # shadow_tmax="light" bounds NEE occlusion at the light (this scene
        # is not a reference-parity target, so the physically-correct bound
        # ships).  Round-5 A/B (measure_shadow_tmax.py): the faithful 1e6
        # quirk bound is +15% FASTER here (more accepted any-hits -> earlier
        # exits); "light" is kept for the image and round 3/4 continuity.
        # sample_group 128 / chunk 1<<24: at full spec (512 spp) group 128
        # measured 152.2 s vs group 64's 161.9 s (+6.4%, round 4); at
        # scaled-down spp the group clamps and the lane-width cap
        # (wavefront._MAX_CHUNK_LANES) keeps the identical 131072-lane
        # kernel, so this is safe at every --scale.  Earlier group sweep
        # (round 3): steady 54.8/49.6/39.3/37.8 s at groups 8/16/32/64.
        5: ("tpu_path_raytracer", MeshSceneBuilder(grid=3, subdivisions=3),
            dict(width=1920, height=1080, samples_per_pixel=spp(512), max_depth=12),
            dict(sample_group=128, chunk_rays=1 << 24, shadow_tmax="light",
                 compile_overrides={"use_bvh": True})),
        # 5b (round 4): 128,000-triangle stress — 25 icospheres at 4
        # subdivisions.  Exercises the two-level PAGED traversal
        # (ops/pallas/bvh_paged_pallas.py): the tree no longer fits SMEM, so
        # subtree pages stream per-launch from HBM.  Run explicitly with
        # --configs 6; not part of the BASELINE.json five.
        6: ("tpu_path_raytracer", MeshSceneBuilder(grid=5, subdivisions=4),
            dict(width=1920, height=1080, samples_per_pixel=spp(512), max_depth=12),
            dict(sample_group=128, chunk_rays=1 << 24, shadow_tmax="light",
                 compile_overrides={"use_bvh": True})),
    }
    renderer_name, builder, cfg, kwargs = configs[idx]
    scene = builder.build_scene()
    camera = builder.create_camera(cfg["width"] / cfg["height"])
    settings = ptrt.RenderSettings(**cfg)
    renderer = ptrt.RendererFactory.create(renderer_name, **kwargs)

    # warmup run absorbs jit/Mosaic compiles; a different seed keeps the
    # measured run's device buffers distinct (the tunnel memoizes
    # identical-buffer executions — see CLAUDE.md)
    renderer.seed = 1
    t0 = time.time()
    renderer.render(scene, camera, settings)
    warmup = time.time() - t0

    # steady phase: varied-seed reps until >=2.5 s of measured work (<=5),
    # so sub-second configs are averaged out of the tunnel noise floor
    rep_seconds = []
    for rep in range(5):
        renderer.seed = rep * 7 + 2
        t0 = time.time()
        image = renderer.render(scene, camera, settings)
        rep_seconds.append(time.time() - t0)
        del image
        if sum(rep_seconds) >= 2.5:
            break
    elapsed = sum(rep_seconds) / len(rep_seconds)

    total_rays = cfg["width"] * cfg["height"] * cfg["samples_per_pixel"] * cfg["max_depth"]
    return {
        "config": idx,
        "renderer": renderer_name,
        "resolution": f"{cfg['width']}x{cfg['height']}",
        "spp": cfg["samples_per_pixel"],
        "spp_scale": scale,  # explicit: spp above is already scaled by this
        "max_depth": cfg["max_depth"],
        "seconds": round(elapsed, 2),
        "rep_seconds": [round(t, 2) for t in rep_seconds],
        "warmup_seconds": round(warmup, 2),
        "mrays_per_sec": round(total_rays / elapsed / 1e6, 2),
    }


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--configs", default="1,2,3,4,5")
    parser.add_argument("--scale", type=float, default=1.0)
    args = parser.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # Absorb the process-level first-execution cost (executable/artifact
    # shipping on the tunneled backend, 100-500 s regardless of workload —
    # CLAUDE.md) with one tiny render, reported as its own line so no
    # config's warmup_seconds carries it.  Measured round 3: raw tunnel
    # bandwidth is ~50 MB/s (experiments/measure_overlap.py), so the
    # round-2 attribution of config 1's 178.9 s warmup to atlas bytes was
    # wrong — it was this process cost.
    import path_tracing__ray_tracer_tpu as ptrt

    t0 = time.time()
    builder = ptrt.CustomSceneBuilder()
    warm = ptrt.RendererFactory.create("tpu_raytracer")
    warm.render(builder.build_scene(), builder.create_camera(1.0),
                ptrt.RenderSettings(128, 128, 1, 2))
    print(json.dumps({"process_warmup_seconds": round(time.time() - t0, 2)}),
          flush=True)

    for idx in (int(c) for c in args.configs.split(",")):
        result = run_config(idx, args.scale)
        print(json.dumps(result), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
