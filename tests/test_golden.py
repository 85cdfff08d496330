"""Golden-image regression tests.

Tiny fixed-seed renders are compared against goldens stored in
``tests/goldens/`` (committed as .npy).  Because the RNG is counter-based and
the physics branchless, renders are deterministic per backend; goldens are
generated on the CPU backend (the CI backend).  A tolerance of ±2/255 per
channel absorbs XLA version drift in float contraction order; structural
changes show up as large diffs.

Regenerate after an intentional change:  PTRT_REGEN_GOLDENS=1 pytest tests/test_golden.py
"""
import os
from pathlib import Path

import numpy as np
import pytest

import path_tracing__ray_tracer_tpu as ptrt

GOLDEN_DIR = Path(__file__).parent / "goldens"
REGEN = os.environ.get("PTRT_REGEN_GOLDENS") == "1"

CONFIGS = [
    ("whitted_tex", "tpu_texture_raytracer", dict(width=48, height=36, samples_per_pixel=4, max_depth=4)),
    ("whitted_basic", "tpu_raytracer", dict(width=48, height=36, samples_per_pixel=4, max_depth=3)),
    ("path", "tpu_path_raytracer", dict(width=48, height=36, samples_per_pixel=8, max_depth=4)),
    ("oracle", "cpu_raytracer", dict(width=48, height=36, samples_per_pixel=1, max_depth=3)),
]


@pytest.mark.parametrize("name,renderer,cfg", CONFIGS, ids=[c[0] for c in CONFIGS])
def test_golden(name, renderer, cfg, cornell):
    scene, cam = cornell
    r = ptrt.RendererFactory.create(renderer, seed=42)
    img = np.asarray(r.render(scene, cam, ptrt.RenderSettings(**cfg)))

    GOLDEN_DIR.mkdir(exist_ok=True)
    path = GOLDEN_DIR / f"{name}.npy"
    if REGEN or not path.exists():
        np.save(path, img)
        if REGEN:
            pytest.skip(f"golden regenerated: {path}")
        pytest.skip(f"golden created: {path}")

    golden = np.load(path)
    assert golden.shape == img.shape
    diff = np.abs(img.astype(np.int32) - golden.astype(np.int32))
    # per-pixel tolerance + small count of outliers (float contraction drift)
    assert float((diff > 2).mean()) < 0.01, (
        f"{name}: {(diff > 2).mean():.4f} of pixels differ by >2 "
        f"(max {diff.max()}); regenerate with PTRT_REGEN_GOLDENS=1 if intended"
    )
