"""Behavioral parity against the ACTUAL reference CPU renderer.

The reference's ``cpu_raytracer`` is pure Python (no CUDA/numba), so it runs
here directly from the read-only mount.  We build the same scene through both
APIs, pin sampling to pixel centers (monkeypatching the reference's
``random.random``; our renderer's ``jitter="center"``), and require per-pixel
agreement of the final uint8 images.
"""
import os
import sys

import numpy as np
import pytest

REFERENCE_ROOT = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE_ROOT, "renderers")),
    reason="reference mount not available",
)


def _build_scene(mod_core_math, mod_geometry, mod_material, mod_scene):
    """Build a textureless test scene through an arbitrary API surface
    (reference modules or ours — both expose the same constructors)."""
    Vec3 = mod_core_math.Vec3
    Material = mod_material.Material
    Plane, Sphere, Triangle = mod_geometry.Plane, mod_geometry.Sphere, mod_geometry.Triangle
    Scene = mod_scene.Scene

    scene = Scene()
    scene.add_object(
        Plane(Vec3(-10, -3, 10), Vec3(0, 1, 0), Vec3(20, 0, 0), Vec3(0, 0, -20),
              20.0, 20.0, Material(Vec3(0.9, 0.9, 0.9), diffuse=0.8, specular=0.1))
    )
    scene.add_object(
        Plane(Vec3(-10, -3, -10), Vec3(0, 0, 1), Vec3(20, 0, 0), Vec3(0, 20, 0),
              20.0, 20.0, Material(Vec3(0.9, 0.3, 0.5), diffuse=0.8, specular=0.1))
    )
    scene.add_object(
        Sphere(Vec3(-1.5, -2, -4), 1.0,
               Material(Vec3(0.9, 0.1, 0.1), diffuse=0.7, specular=0.5, reflective=0.2))
    )
    scene.add_object(
        Sphere(Vec3(1.5, -2, -4), 1.0,
               Material(Vec3(0.95, 0.95, 0.95), diffuse=0.1, specular=0.9,
                        reflective=0.1, refractive=0.85, ior=1.5))
    )
    scene.add_object(
        Triangle(Vec3(-2, -2.9, -2), Vec3(0, -2.9, -2), Vec3(-1, -1.2, -2.6),
                 material=Material(Vec3(0.1, 0.2, 0.9), diffuse=0.9, specular=0.3))
    )
    scene.add_light_sample(Vec3(0, 6, 0))
    scene.add_light_sample(Vec3(2, 6, 2))
    scene.light_color = Vec3(0.7, 0.7, 0.7)
    scene.ambient = Vec3(0.5, 0.5, 0.5)
    return scene


def _render_reference(width, height, spp, depth):
    import random

    sys.path.insert(0, REFERENCE_ROOT)
    try:
        import core.camera as ref_camera
        import core.geometry as ref_geometry
        import core.material as ref_material
        import core.math as ref_math
        import core.scene as ref_scene
        from renderers.cpu_renderer import CPURenderer

        scene = _build_scene(ref_math, ref_geometry, ref_material, ref_scene)
        camera = ref_camera.Camera(
            ref_math.Vec3(0, 0, 6), ref_math.Vec3(0, -1, 0), ref_math.Vec3(0, 1, 0),
            49.5, width / height,
        )
        settings = ref_scene.RenderSettings(
            width=width, height=height, samples_per_pixel=spp, max_depth=depth
        )
        orig_random = random.random
        random.random = lambda: 0.5  # pin jitter to pixel centers
        try:
            image = CPURenderer().render(scene, camera, settings)
        finally:
            random.random = orig_random
        return np.asarray(image)
    finally:
        sys.path.remove(REFERENCE_ROOT)
        # drop the reference's top-level modules so they cannot shadow anything
        for name in list(sys.modules):
            if name in ("core", "renderers", "main", "scene_builders") or name.startswith(
                ("core.", "renderers.", "scene_builders.")
            ):
                del sys.modules[name]


def _render_ours(width, height, spp, depth):
    import path_tracing__ray_tracer_tpu as ptrt
    from path_tracing__ray_tracer_tpu.core import camera, geometry, material
    from path_tracing__ray_tracer_tpu.core import math as our_math
    from path_tracing__ray_tracer_tpu.core import scene as our_scene

    scene = _build_scene(our_math, geometry, material, our_scene)
    cam = camera.Camera(
        our_math.Vec3(0, 0, 6), our_math.Vec3(0, -1, 0), our_math.Vec3(0, 1, 0),
        49.5, width / height,
    )
    renderer = ptrt.RendererFactory.create("cpu_raytracer", jitter="center")
    settings = ptrt.RenderSettings(
        width=width, height=height, samples_per_pixel=spp, max_depth=depth
    )
    return np.asarray(renderer.render(scene, cam, settings))


def test_matches_reference_cpu_renderer():
    w, h, spp, depth = 48, 36, 1, 3
    ref = _render_reference(w, h, spp, depth).astype(np.int32)
    ours = _render_ours(w, h, spp, depth).astype(np.int32)
    assert ref.shape == ours.shape

    diff = np.abs(ref - ours)
    rmse = float(np.sqrt((diff.astype(np.float64) ** 2).mean()))
    frac_big = float((diff > 3).mean())
    # float32-vs-float64 and quantization truncation allow ±1; geometric
    # near-ties may flip a handful of edge pixels
    assert rmse < 2.0, f"RMSE vs reference CPU renderer too high: {rmse}"
    assert frac_big < 0.02, f"too many pixels differ by >3: {frac_big}"
