"""Ray generation vs the host camera; atlas sampling vs host Texture.sample."""
import jax.numpy as jnp
import numpy as np

from path_tracing__ray_tracer_tpu.compiler import (
    collect_texture_paths,
    compile_scene,
    pack_camera,
)
from path_tracing__ray_tracer_tpu.core import Camera, Texture, Vec3
from path_tracing__ray_tracer_tpu.ops.camera import generate_rays
from path_tracing__ray_tracer_tpu.ops.texture import sample_atlas


def test_generate_rays_matches_host():
    cam = Camera(Vec3(1, 2, 10), Vec3(0, 0, 0), Vec3(0, 1, 0), 49.5, 4 / 3)
    cam12 = pack_camera(cam)
    rng = np.random.default_rng(5)
    u = rng.uniform(0, 1, 64).astype(np.float32)
    v = rng.uniform(0, 1, 64).astype(np.float32)
    o, d = generate_rays(cam12, jnp.asarray(u), jnp.asarray(v))
    o_np, d_np = np.asarray(o.to_array()), np.asarray(d.to_array())
    for i in range(64):
        ray = cam.get_ray(float(u[i]), float(v[i]))
        np.testing.assert_allclose(o_np[i], ray.origin.to_np(), atol=1e-5)
        np.testing.assert_allclose(d_np[i], ray.direction.to_np(), rtol=1e-4, atol=1e-5)


def test_atlas_matches_host_texture(cornell):
    scene, _ = cornell
    cs = compile_scene(scene)
    paths = collect_texture_paths(scene)
    rng = np.random.default_rng(9)
    u = rng.uniform(0, 1, 50).astype(np.float32)
    v = rng.uniform(0, 1, 50).astype(np.float32)
    for tid, path in enumerate(paths):
        tex = Texture(path)
        got = np.asarray(
            sample_atlas(cs, jnp.full(50, tid, jnp.int32), jnp.asarray(u), jnp.asarray(v))
            .to_array()
        )
        for i in range(50):
            want = tex.sample(float(u[i]), float(v[i])).to_np()
            np.testing.assert_allclose(got[i], want, atol=1.5 / 255)


def test_atlas_negative_id_is_white(cornell):
    scene, _ = cornell
    cs = compile_scene(scene)
    got = np.asarray(
        sample_atlas(
            cs, jnp.full(4, -1, jnp.int32), jnp.zeros(4), jnp.zeros(4)
        ).to_array()
    )
    np.testing.assert_array_equal(got, 1.0)


def test_uv_clamped(cornell):
    scene, _ = cornell
    cs = compile_scene(scene)
    got = np.asarray(
        sample_atlas(
            cs,
            jnp.zeros(2, jnp.int32),
            jnp.asarray([-0.5, 1.5]),
            jnp.asarray([1.7, -0.3]),
        ).to_array()
    )
    assert np.isfinite(got).all() and (got >= 0).all() and (got <= 1).all()


def test_untextured_resolve_gate_matches_ungated():
    """``any_textured`` shape (0,) short-circuits resolve_base_color to the
    material color; forcing the gate off (None flag) must give the same
    answer, because ``has_tex`` is all-zero on an untextured scene."""
    from path_tracing__ray_tracer_tpu.core import Material, Scene, Sphere
    from path_tracing__ray_tracer_tpu.ops.intersect import gather_material
    from path_tracing__ray_tracer_tpu.ops.texture import resolve_base_color
    from path_tracing__ray_tracer_tpu.ops.v3 import V3

    scene = Scene()
    scene.add_object(Sphere(Vec3(0, 0, 0), 1.0,
                            Material(color=Vec3(0.2, 0.5, 0.8), diffuse=0.7)))
    cs = compile_scene(scene)
    assert cs.any_textured is not None and cs.any_textured.shape == (0,)

    rng = np.random.default_rng(3)
    n = 32
    prim = jnp.full(n, cs.n_planes, jnp.int32)  # sphere follows the padded planes
    mats = gather_material(cs.materials, prim)
    (mcolor, *_rest, has_tex, tex_id) = mats
    u = jnp.asarray(rng.uniform(0, 1, n).astype(np.float32))
    v = jnp.asarray(rng.uniform(0, 1, n).astype(np.float32))

    gated = resolve_base_color(cs, mcolor, has_tex, tex_id, u, v)
    ungated = resolve_base_color(
        cs._replace(any_textured=None), mcolor, has_tex, tex_id, u, v
    )
    np.testing.assert_array_equal(
        np.asarray(gated.to_array()), np.asarray(ungated.to_array())
    )
    np.testing.assert_allclose(np.asarray(gated.to_array()),
                               np.tile([0.2, 0.5, 0.8], (n, 1)), rtol=1e-6)


def test_compact_gather_matches_full(cornell, monkeypatch):
    """The compacted static-prefix gather (``TEX_COMPACT``) is bit-identical
    to the plain full-width gather — both below the prefix cap and in the
    overflow case where the lax.cond falls back to the full gather."""
    from path_tracing__ray_tracer_tpu.ops import texture as tex
    from path_tracing__ray_tracer_tpu.ops.v3 import V3

    scene, _ = cornell
    cs = compile_scene(scene)
    rng = np.random.default_rng(11)
    n = 1024
    u = jnp.asarray(rng.uniform(0, 1, n).astype(np.float32))
    v = jnp.asarray(rng.uniform(0, 1, n).astype(np.float32))
    mat = V3.full(0.25, (n,))

    for frac in (0.15, 0.60):  # below cap (DIV=4) and overflow -> fallback
        has = (rng.uniform(0, 1, n) < frac).astype(np.float32)
        tid = rng.integers(0, cs.n_textures, n).astype(np.int32)
        has_tex = jnp.asarray(has)
        tex_id = jnp.asarray(tid)

        monkeypatch.setattr(tex, "TEX_COMPACT", True)
        monkeypatch.setattr(tex, "_COMPACT_MIN_LANES", 0)
        compact = tex.resolve_base_color(cs, mat, has_tex, tex_id, u, v)
        monkeypatch.setattr(tex, "TEX_COMPACT", False)
        plain = tex.resolve_base_color(cs, mat, has_tex, tex_id, u, v)
        np.testing.assert_array_equal(
            np.asarray(compact.to_array()), np.asarray(plain.to_array())
        )
