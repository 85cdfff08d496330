"""Whole-bounce BVH megakernel vs the XLA bounce formulation.

Interpret mode on CPU (tiny shapes).  The megakernel runs the full bounce —
ps sweep + seeded BVH4 attrs walk, in-kernel packed-uid material resolve,
NEE light pick + occlusion walk, Russian roulette, scatter — in one launch;
the XLA path composes scene_hit / resolve_material / scene_hit_any /
_bounce_xla.  Agreement is FMA-level (the two compiled bodies may contract
differently), same tolerance as the Cornell megakernel test.
"""
import numpy as np
import pytest

import path_tracing__ray_tracer_tpu as ptrt
from path_tracing__ray_tracer_tpu.compiler import compile_scene
from path_tracing__ray_tracer_tpu.ops import intersect
from path_tracing__ray_tracer_tpu.ops.v3 import V3


@pytest.fixture
def interpreted_pallas(monkeypatch):
    from jax.experimental.pallas import tpu as pltpu

    monkeypatch.setattr(intersect, "USE_PALLAS", True)
    with pltpu.force_tpu_interpret_mode():
        yield


def _mixed_scene(n_tris=48, seed=3):
    """Triangle soup with several material classes + non-tri prims + lights,
    so the fused bounce exercises the uid select chain and every scatter
    branch (diffuse / mirror / glass)."""
    rng = np.random.default_rng(seed)
    scene = ptrt.Scene()
    mats = [
        ptrt.Material(ptrt.Vec3(0.8, 0.3, 0.2), diffuse=0.8, specular=0.1),
        ptrt.Material(ptrt.Vec3(0.2, 0.7, 0.3), diffuse=0.6, specular=0.2),
        ptrt.Material(ptrt.Vec3(0.9, 0.9, 0.9), diffuse=0.05, specular=0.9,
                      reflective=0.85),
        ptrt.Material(ptrt.Vec3(1.0, 1.0, 1.0), diffuse=0.1, specular=0.5,
                      refractive=0.9, ior=1.5),
    ]
    for k in range(n_tris):
        a = rng.uniform(-10, 10, 3)
        b = a + rng.uniform(-2.5, 2.5, 3)
        c = a + rng.uniform(-2.5, 2.5, 3)
        scene.add_object(ptrt.Triangle(ptrt.Vec3(*a), ptrt.Vec3(*b),
                                       ptrt.Vec3(*c),
                                       material=mats[k % len(mats)]))
    scene.add_object(ptrt.Sphere(ptrt.Vec3(0, -1, 0), 1.5, mats[2]))
    scene.add_object(
        ptrt.Plane(ptrt.Vec3(-15, -11, 15), ptrt.Vec3(0, 1, 0),
                   ptrt.Vec3(30, 0, 0), ptrt.Vec3(0, 0, -30), 30.0, 30.0,
                   mats[0])
    )
    for lx in (-4.0, 4.0):
        scene.add_light_sample(ptrt.Vec3(lx, 18, 2))
    return scene


def _rays(n, seed):
    rng = np.random.default_rng(seed)
    ro = rng.uniform(-12, 12, (n, 3)).astype(np.float32)
    rd = rng.normal(size=(n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    return V3.from_array(ro), V3.from_array(rd)


def test_bounce_bvh_gate_and_packing():
    cs = compile_scene(_mixed_scene(), use_bvh=True)
    from path_tracing__ray_tracer_tpu.ops.pallas.bounce_bvh_pallas import (
        bounce_bvh_ok,
    )
    from path_tracing__ray_tracer_tpu.ops.pallas.bvh_pallas import (
        _SLOT_F, GID_TRI_MASK, GID_UID_SHIFT, _packed,
    )

    assert cs.bvh is not None and _packed(cs.bvh)
    assert bounce_bvh_ok(cs)
    # slot gids decode to (uid, tri) consistent with the compiler's mat_uid
    gids = np.asarray(cs.bvh.slot_blob).reshape(-1, _SLOT_F)[:, 9]
    real = gids[gids >= 0].astype(np.int64)
    tri = real & GID_TRI_MASK
    uid = real >> int(np.log2(GID_UID_SHIFT))
    psq = cs.n_planes + cs.n_spheres + cs.n_quads
    mat_uid = np.asarray(cs.mat_uid)
    np.testing.assert_array_equal(uid, mat_uid[psq + tri])
    np.testing.assert_array_equal(np.sort(tri), np.arange(len(tri)))


def test_bounce_bvh_megakernel_matches_xla(interpreted_pallas):
    import jax.numpy as jnp

    from path_tracing__ray_tracer_tpu.models.path_tracer import path_radiance
    from path_tracing__ray_tracer_tpu.ops import rng as prng
    from path_tracing__ray_tracer_tpu.ops.intersect import _bvh_bounce_enabled

    scene = _mixed_scene()
    cs = compile_scene(scene, use_bvh=True)
    n = 256
    assert _bvh_bounce_enabled(cs, n), "fused bounce gate must fire"
    ro, rd = _rays(n, 11)
    key = prng.ray_key(jnp.uint32(0), jnp.arange(n), 0)

    rad_k = path_radiance(cs, ro, rd, key, max_depth=3)
    rad_k_light = path_radiance(cs, ro, rd, key, max_depth=3,
                                shadow_tmax="light")
    intersect.USE_PALLAS = False
    rad_x = path_radiance(cs, ro, rd, key, max_depth=3)
    rad_x_light = path_radiance(cs, ro, rd, key, max_depth=3,
                                shadow_tmax="light")

    np.testing.assert_allclose(
        np.asarray(rad_k.to_array()), np.asarray(rad_x.to_array()),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(rad_k_light.to_array()), np.asarray(rad_x_light.to_array()),
        rtol=1e-4, atol=1e-4,
    )


def test_bounce_bvh_fused_any_variant_matches(interpreted_pallas, monkeypatch):
    """The fully-fused occlusion variant (BVH_BOUNCE_SPLIT_ANY=False — the
    recorded 18%-slower negative) stays equivalence-covered."""
    import jax.numpy as jnp

    from path_tracing__ray_tracer_tpu.models.path_tracer import path_radiance
    from path_tracing__ray_tracer_tpu.ops import rng as prng
    from path_tracing__ray_tracer_tpu.ops.pallas import bounce_bvh_pallas

    monkeypatch.setattr(bounce_bvh_pallas, "BVH_BOUNCE_SPLIT_ANY", False)
    scene = _mixed_scene(n_tris=24, seed=4)
    cs = compile_scene(scene, use_bvh=True)
    n = 256
    ro, rd = _rays(n, 17)
    key = prng.ray_key(jnp.uint32(0), jnp.arange(n), 0)
    rad_k = path_radiance(cs, ro, rd, key, max_depth=2)
    intersect.USE_PALLAS = False
    rad_x = path_radiance(cs, ro, rd, key, max_depth=2)
    np.testing.assert_allclose(
        np.asarray(rad_k.to_array()), np.asarray(rad_x.to_array()),
        rtol=1e-4, atol=1e-4,
    )


def test_bounce_bvh_full_render_matches(interpreted_pallas, monkeypatch):
    """End-to-end: the regeneration-scheduler render through the fused
    bounce equals the XLA-bounce render (FMA-level)."""
    scene = _mixed_scene(n_tris=24, seed=5)
    cam = ptrt.Camera(ptrt.Vec3(0, 2, 28), ptrt.Vec3(0, 0, 0),
                      ptrt.Vec3(0, 1, 0), 45.0, 4.0 / 3.0)
    s = ptrt.RenderSettings(width=32, height=24, samples_per_pixel=2,
                            max_depth=3)

    def render():
        r = ptrt.RendererFactory.create(
            "tpu_path_raytracer", compile_overrides={"use_bvh": True})
        return np.asarray(
            r.render_sums(scene, cam, s), dtype=np.float64)

    a = render()
    intersect.USE_PALLAS = False
    b = render()
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)
