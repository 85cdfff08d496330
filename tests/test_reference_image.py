"""RMSE comparison against the reference's published render.

``output_RayTracer.png`` (2000×1500) was produced by the reference's CLI
defaults: ``cuda_texture_raytracer``, 25 spp, depth 16 (``main.py:33-37``).
We render the same scene small with the parity renderer and compare against
the downsampled reference image.  Downsampling changes AA statistics and
JPEG-ish artifacts, so the bar is a coarse structural one — it catches wrong
geometry/colors/orientation, not sub-pixel shading drift.  Marked slow: run
with ``pytest -m slow``.
"""
import os

import numpy as np
import pytest

import path_tracing__ray_tracer_tpu as ptrt
from path_tracing__ray_tracer_tpu.utils.assets import reference_render_path

REF_IMAGE = reference_render_path()

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        REF_IMAGE is None or not os.path.exists(REF_IMAGE),
        reason="reference image absent",
    ),
]


def test_rmse_vs_reference_render(cornell):
    from PIL import Image

    w, h = 200, 150
    scene, _cam = cornell
    builder = ptrt.CustomSceneBuilder()
    cam = builder.create_camera(w / h)

    r = ptrt.RendererFactory.create("tpu_texture_raytracer")
    ours = np.asarray(
        r.render(scene, cam, ptrt.RenderSettings(w, h, 25, 16))
    ).astype(np.float64)

    ref = np.asarray(
        Image.open(REF_IMAGE).convert("RGB").resize((w, h), Image.BOX)
    ).astype(np.float64)

    rmse = float(np.sqrt(((ours - ref) ** 2).mean())) / 255.0
    # structural bar: wrong walls/orientation/materials push this over 0.2
    assert rmse < 0.08, f"RMSE vs reference render too high: {rmse:.4f}"
