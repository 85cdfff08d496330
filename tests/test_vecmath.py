"""Unit tests: host Vec3 and device V3 math against closed forms and each other."""
import math

import jax.numpy as jnp
import numpy as np
import pytest

from path_tracing__ray_tracer_tpu.core.math import AABB, Ray, Vec3
from path_tracing__ray_tracer_tpu.ops.v3 import V3, refract


def rand_vecs(n, seed):
    rng = np.random.default_rng(seed)
    return rng.uniform(-3, 3, size=(n, 3)).astype(np.float32)


class TestVec3:
    def test_operators(self):
        a, b = Vec3(1, 2, 3), Vec3(4, -5, 6)
        assert (a + b).to_tuple() == (5, -3, 9)
        assert (a - b).to_tuple() == (-3, 7, -3)
        assert (a * 2).to_tuple() == (2, 4, 6)
        assert (2 * a).to_tuple() == (2, 4, 6)
        assert (a * b).to_tuple() == (4, -10, 18)  # Hadamard
        assert (a / 2).to_tuple() == (0.5, 1.0, 1.5)
        assert (-a).to_tuple() == (-1, -2, -3)

    def test_dot_cross(self):
        a, b = Vec3(1, 0, 0), Vec3(0, 1, 0)
        assert a.dot(b) == 0
        assert a.cross(b).to_tuple() == (0, 0, 1)
        assert b.cross(a).to_tuple() == (0, 0, -1)

    def test_normalize_zero(self):
        assert Vec3(0, 0, 0).normalize().to_tuple() == (0, 0, 0)

    def test_reflect(self):
        v = Vec3(1, -1, 0)
        r = v.reflect(Vec3(0, 1, 0))
        assert r.to_tuple() == (1, 1, 0)

    def test_refract_snell(self):
        # straight-on: no bending regardless of IOR
        ok, r = Vec3(0, -1, 0).refract(Vec3(0, 1, 0), 1.0 / 1.5)
        assert ok and abs(r.x) < 1e-6 and r.y < 0

        # 45° into glass: sin(theta_t) = sin(45°)/1.5
        inc = Vec3(1, -1, 0).normalize()
        ok, r = inc.refract(Vec3(0, 1, 0), 1.0 / 1.5)
        assert ok
        sin_t = abs(r.x) / r.length()
        assert abs(sin_t - math.sin(math.radians(45)) / 1.5) < 1e-6

    def test_total_internal_reflection(self):
        # grazing exit from glass → TIR
        inc = Vec3(1, -0.1, 0).normalize()
        ok, r = inc.refract(Vec3(0, 1, 0), 1.5)
        assert not ok and r is None

    def test_ray_normalizes(self):
        ray = Ray(Vec3(0, 0, 0), Vec3(0, 0, -10))
        assert abs(ray.direction.length() - 1.0) < 1e-12

    def test_aabb(self):
        box = AABB(Vec3(-1, -1, -1), Vec3(1, 1, 1))
        assert box.hit(Ray(Vec3(0, 0, 5), Vec3(0, 0, -1)), 1e-3, 1e9)
        assert not box.hit(Ray(Vec3(0, 0, 5), Vec3(0, 0, 1)), 1e-3, 1e9)
        assert not box.hit(Ray(Vec3(5, 0, 5), Vec3(0, 0, -1)), 1e-3, 1e9)
        merged = AABB.surrounding_box(box, AABB(Vec3(2, 2, 2), Vec3(3, 3, 3)))
        assert merged.min.to_tuple() == (-1, -1, -1)
        assert merged.max.to_tuple() == (3, 3, 3)


class TestV3:
    def test_matches_numpy(self):
        a_np, b_np = rand_vecs(64, 0), rand_vecs(64, 1)
        a, b = V3.from_array(a_np), V3.from_array(b_np)
        np.testing.assert_allclose(a.dot(b), np.sum(a_np * b_np, -1), rtol=1e-5)
        np.testing.assert_allclose(
            a.cross(b).to_array(), np.cross(a_np, b_np), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(a.norm(), np.linalg.norm(a_np, axis=-1), rtol=1e-5)
        unit = a.normalized()
        np.testing.assert_allclose(unit.norm(), 1.0, rtol=1e-5)

    def test_reflect_matches_host(self):
        v_np = rand_vecs(32, 2)
        n_np = rand_vecs(32, 3)
        n_np /= np.linalg.norm(n_np, axis=-1, keepdims=True)
        got = V3.from_array(v_np).reflect(V3.from_array(n_np)).to_array()
        for i in range(32):
            want = Vec3(*v_np[i]).reflect(Vec3(*n_np[i]))
            np.testing.assert_allclose(got[i], want.to_np(), rtol=1e-4, atol=1e-5)

    def test_refract_matches_host(self):
        rng = np.random.default_rng(4)
        v_np = rand_vecs(64, 5)
        v_np /= np.linalg.norm(v_np, axis=-1, keepdims=True)
        n_np = rand_vecs(64, 6)
        n_np /= np.linalg.norm(n_np, axis=-1, keepdims=True)
        # point normals against the incident vectors
        flip = np.sum(v_np * n_np, -1) > 0
        n_np[flip] *= -1
        eta = rng.uniform(0.5, 2.0, size=64).astype(np.float32)

        ok, out = refract(V3.from_array(v_np), V3.from_array(n_np), jnp.asarray(eta))
        out = out.to_array()
        for i in range(64):
            ok_host, r_host = Vec3(*v_np[i]).refract(Vec3(*n_np[i]), float(eta[i]))
            assert bool(ok[i]) == ok_host, i
            if ok_host:
                np.testing.assert_allclose(out[i], r_host.to_np(), rtol=1e-3, atol=1e-5)

    def test_luminance(self):
        c = V3.of(1.0, 1.0, 1.0)
        assert abs(float(c.luminance()) - 1.0) < 1e-6

    def test_where_and_take(self):
        a = V3.from_array(rand_vecs(8, 7))
        b = V3.from_array(rand_vecs(8, 8))
        mask = np.arange(8) % 2 == 0
        sel = V3.where(jnp.asarray(mask), a, b).to_array()
        np.testing.assert_array_equal(sel[0], a.to_array()[0])
        np.testing.assert_array_equal(sel[1], b.to_array()[1])
        idx = jnp.asarray([3, 3, 0])
        np.testing.assert_array_equal(a.take(idx).to_array()[0], a.to_array()[3])
