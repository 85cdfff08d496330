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
