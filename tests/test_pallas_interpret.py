"""Pallas kernels under the interpreter on CPU.

The fused kernels normally run only on TPU; these tests execute them in
Pallas interpret mode against the XLA reference implementations so CI
catches kernel/XLA divergence without TPU hardware.  Tiny shapes — the
interpreter is slow.
"""
import numpy as np
import pytest

import path_tracing__ray_tracer_tpu as ptrt
from path_tracing__ray_tracer_tpu.compiler import compile_scene, pack_camera
from path_tracing__ray_tracer_tpu.ops import intersect
from path_tracing__ray_tracer_tpu.ops.v3 import V3


@pytest.fixture
def interpreted_pallas(monkeypatch):
    from jax.experimental.pallas import tpu as pltpu

    monkeypatch.setattr(intersect, "USE_PALLAS", True)
    with pltpu.force_tpu_interpret_mode():
        yield


def _rays(n, seed):
    rng = np.random.default_rng(seed)
    ro = rng.uniform(-12, 12, (n, 3)).astype(np.float32)
    rd = rng.normal(size=(n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    return V3.from_array(ro), V3.from_array(rd)


def test_closest_hit_kernel_matches_xla(cornell, interpreted_pallas):
    scene, _ = cornell
    cs = compile_scene(scene)
    ro, rd = _rays(256, 3)

    hit_k = intersect.scene_hit(cs, ro, rd, 1e-3, 1e6)
    intersect.USE_PALLAS = False
    hit_x = intersect.scene_hit(cs, ro, rd, 1e-3, 1e6)

    np.testing.assert_array_equal(np.asarray(hit_k.hit), np.asarray(hit_x.hit))
    np.testing.assert_array_equal(np.asarray(hit_k.prim), np.asarray(hit_x.prim))
    np.testing.assert_allclose(np.asarray(hit_k.t), np.asarray(hit_x.t), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(hit_k.normal.to_array()), np.asarray(hit_x.normal.to_array()),
        atol=1e-5,
    )
    np.testing.assert_allclose(np.asarray(hit_k.u), np.asarray(hit_x.u), atol=1e-4)
    np.testing.assert_allclose(np.asarray(hit_k.v), np.asarray(hit_x.v), atol=1e-4)


def test_any_hit_kernel_matches_xla(cornell, interpreted_pallas):
    scene, _ = cornell
    cs = compile_scene(scene)
    ro, rd = _rays(256, 4)

    occ_k = np.asarray(intersect.scene_hit_any(cs, ro, rd, 1e-3, 25.0))
    intersect.USE_PALLAS = False
    occ_x = np.asarray(intersect.scene_hit_any(cs, ro, rd, 1e-3, 25.0))
    np.testing.assert_array_equal(occ_k, occ_x)


@pytest.mark.skip(
    reason="the whitted kernel runs 16 in-kernel shadow sweeps per bounce — "
    "minutes under the interpreter; bit-exactness vs XLA is verified on TPU "
    "hardware instead (max |diff| = 0.0 for both variants)"
)
def test_whitted_megakernel_matches_xla(cornell, interpreted_pallas):
    import jax.numpy as jnp

    from path_tracing__ray_tracer_tpu.models.whitted import (
        TEXTURE,
        whitted_radiance,
    )

    # tiny: the interpreter walks 16 in-kernel shadow sweeps per bounce
    scene, _ = cornell
    cs = compile_scene(scene)
    ro, rd = _rays(128, 9)

    rad_k = whitted_radiance(cs, ro, rd, 2, TEXTURE)
    intersect.USE_PALLAS = False
    rad_x = whitted_radiance(cs, ro, rd, 2, TEXTURE)
    np.testing.assert_allclose(
        np.asarray(rad_k.to_array()), np.asarray(rad_x.to_array()),
        rtol=1e-4, atol=1e-4,
    )


def test_bounce_megakernel_matches_xla(cornell, interpreted_pallas):
    from functools import partial

    import jax

    from path_tracing__ray_tracer_tpu.models.path_tracer import path_radiance
    from path_tracing__ray_tracer_tpu.ops import rng as prng

    scene, cam = cornell
    cs = compile_scene(scene)
    del cam
    builder = ptrt.CustomSceneBuilder()
    cam12 = pack_camera(builder.create_camera(1.0))
    del cam12

    n = 256
    ro, rd = _rays(n, 5)
    import jax.numpy as jnp

    key = prng.ray_key(jnp.uint32(0), jnp.arange(n), 0)

    rad_k = path_radiance(cs, ro, rd, key, max_depth=3)
    rad_k_light = path_radiance(cs, ro, rd, key, max_depth=3,
                                shadow_tmax="light")
    intersect.USE_PALLAS = False
    rad_x = path_radiance(cs, ro, rd, key, max_depth=3)
    rad_x_light = path_radiance(cs, ro, rd, key, max_depth=3,
                                shadow_tmax="light")

    a = np.asarray(rad_k.to_array())
    b = np.asarray(rad_x.to_array())
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)
    # shadow_tmax="light" must be honored by the megakernel too, and agree
    # with the XLA formulation
    np.testing.assert_allclose(
        np.asarray(rad_k_light.to_array()), np.asarray(rad_x_light.to_array()),
        rtol=1e-4, atol=1e-4,
    )
