"""MXU leaf-intersection path (``BVH_MXU_LEAF``) vs the scalar slot tests.

The MXU path evaluates Möller–Trumbore's decision quantities as linear
forms of the ray features [d, o×d, o, 1] via one matmul per leaf visit
(``pack_leaf_mat`` / ``_leaf_any_mxu``).  The forms are algebraically
identical to the scalar chain but round differently, so rays within ~1e-6
of a triangle edge/plane boundary may flip — these tests use random ray
sets where that set is empty, and assert exact agreement.
"""
import numpy as np
import pytest

import path_tracing__ray_tracer_tpu as ptrt
from path_tracing__ray_tracer_tpu.compiler import compile_scene
from path_tracing__ray_tracer_tpu.ops import intersect
from path_tracing__ray_tracer_tpu.ops.pallas import bvh_pallas as bp
from path_tracing__ray_tracer_tpu.ops.v3 import V3


@pytest.fixture
def interpreted_pallas(monkeypatch):
    from jax.experimental.pallas import tpu as pltpu

    monkeypatch.setattr(intersect, "USE_PALLAS", True)
    with pltpu.force_tpu_interpret_mode():
        yield


def _soup_scene(n_tris, seed):
    rng = np.random.default_rng(seed)
    scene = ptrt.Scene()
    mat = ptrt.Material(ptrt.Vec3(0.7, 0.6, 0.5), diffuse=0.8)
    for _ in range(n_tris):
        a = rng.uniform(-10, 10, 3)
        b = a + rng.uniform(-2, 2, 3)
        c = a + rng.uniform(-2, 2, 3)
        scene.add_object(ptrt.Triangle(ptrt.Vec3(*a), ptrt.Vec3(*b),
                                       ptrt.Vec3(*c), material=mat))
    scene.add_object(ptrt.Sphere(ptrt.Vec3(0, 0, 0), 1.5, mat))
    scene.add_light_sample(ptrt.Vec3(0, 20, 0))
    return scene


def _rays(n, seed):
    rng = np.random.default_rng(seed)
    ro = rng.uniform(-12, 12, (n, 3)).astype(np.float32)
    rd = rng.normal(size=(n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    return V3.from_array(ro), V3.from_array(rd)


def test_pack_leaf_mat_reproduces_mt_numerators():
    """P-columns dotted with [d, m, o, 1] == the Möller–Trumbore numerators
    (f64 ground truth) for every real slot; padded slots give det == 0."""
    from path_tracing__ray_tracer_tpu.ops import bvh as bvh_mod

    rng = np.random.default_rng(3)
    T = 53
    v0 = rng.uniform(-8, 8, (T, 3)).astype(np.float32)
    v1 = v0 + rng.uniform(-2, 2, (T, 3)).astype(np.float32)
    v2 = v0 + rng.uniform(-2, 2, (T, 3)).astype(np.float32)
    tri_min = np.minimum(np.minimum(v0, v1), v2)
    tri_max = np.maximum(np.maximum(v0, v1), v2)
    arrs = bvh_mod.build_bvh(tri_min, tri_max, leaf_size=16, use_native=False)
    P = bp.pack_leaf_mat(arrs, v0, v1, v2)
    G = P.shape[1] // 128
    leaf_ids = np.where(arrs["is_leaf"])[0]
    assert G == len(leaf_ids)

    o = rng.uniform(-10, 10, 3)
    d = rng.normal(size=3)
    d /= np.linalg.norm(d)
    m = np.cross(o, d)
    f = np.concatenate([d, m, o, [1.0], np.zeros(6)]).astype(np.float64)
    out = P.astype(np.float64).T @ f  # (G*128,)

    e1 = (v1 - v0).astype(np.float64)
    e2 = (v2 - v0).astype(np.float64)
    h = np.cross(d, e2)
    det = np.einsum("ij,ij->i", e1, h)
    s = o - v0.astype(np.float64)
    un = np.einsum("ij,ij->i", s, h)
    q = np.cross(s, e1)
    vn = q @ d
    tn = np.einsum("ij,ij->i", e2, q)

    slots = arrs["slots"][leaf_ids]  # (G, 16)
    for g in range(G):
        col = out[g * 128 : (g + 1) * 128]
        for k in range(16):
            tri = slots[g, k]
            if tri < 0:
                assert col[0 * 16 + k] == 0.0  # det of padded slot
                continue
            scale = max(1.0, abs(det[tri]))
            assert abs(col[0 * 16 + k] - det[tri]) < 1e-4 * scale
            assert abs(col[1 * 16 + k] - un[tri]) < 1e-3 * max(1.0, abs(un[tri]))
            assert abs(col[2 * 16 + k] - vn[tri]) < 1e-3 * max(1.0, abs(vn[tri]))
            assert abs(col[3 * 16 + k] - tn[tri]) < 1e-3 * max(1.0, abs(tn[tri]))
            assert col[7 * 16 + k] == tri  # gid constant row


@pytest.mark.parametrize("limit", [18.0, 5.0])
def test_mxu_any_matches_scalar_scene(interpreted_pallas, monkeypatch, limit):
    """Whole-scene occlusion: MXU leaf visits vs scalar slot tests."""
    scene = _soup_scene(48, seed=21)
    cs = compile_scene(scene, use_bvh=True)
    assert cs.bvh is not None and cs.bvh.leaf_mat is not None
    ro, rd = _rays(512, 22)

    occ_scalar = np.asarray(intersect.scene_hit_any(cs, ro, rd, 1e-3, limit))
    monkeypatch.setattr(bp, "BVH_MXU_LEAF", True)
    occ_mxu = np.asarray(intersect.scene_hit_any(cs, ro, rd, 1e-3, limit))
    assert (occ_scalar == occ_mxu).mean() > 0.998
    np.testing.assert_array_equal(occ_scalar, occ_mxu)


def test_mxu_closest_matches_scalar_scene(interpreted_pallas, monkeypatch):
    """Whole-scene closest hit + attrs: MXU leaf visits vs scalar slot
    tests.  t/u/v are single-rounded (num/det) on the MXU path where the
    scalar path double-rounds (inv_det*num), so compare with f32-ulp
    tolerances; ids must agree except at exact-t ties."""
    scene = _soup_scene(48, seed=41)
    cs = compile_scene(scene, use_bvh=True)
    ro, rd = _rays(512, 42)

    hit_s = intersect.scene_hit(cs, ro, rd, 1e-3, 1e6)
    monkeypatch.setattr(bp, "BVH_MXU_LEAF", True)
    hit_m = intersect.scene_hit(cs, ro, rd, 1e-3, 1e6)

    np.testing.assert_array_equal(np.asarray(hit_s.hit), np.asarray(hit_m.hit))
    np.testing.assert_allclose(np.asarray(hit_s.t), np.asarray(hit_m.t),
                               rtol=1e-5, atol=1e-5)
    same = np.asarray(hit_s.prim) == np.asarray(hit_m.prim)
    assert same.mean() > 0.99
    h = np.asarray(hit_s.hit) & same
    for a, b in ((hit_s.u, hit_m.u), (hit_s.v, hit_m.v),
                 (hit_s.normal.x, hit_m.normal.x),
                 (hit_s.normal.y, hit_m.normal.y),
                 (hit_s.normal.z, hit_m.normal.z)):
        np.testing.assert_allclose(np.asarray(a)[h], np.asarray(b)[h],
                                   rtol=1e-4, atol=1e-4)


def test_mxu_closest_attrs_whole_tree(interpreted_pallas, monkeypatch):
    """Direct bvh_closest_attrs_pallas path (no ps seeding)."""
    scene = _soup_scene(40, seed=51)
    cs = compile_scene(scene, use_bvh=True)
    bvh = cs.bvh
    ro, rd = _rays(512, 52)

    bt_s, bi_s, bu_s, bv_s, n_s = bp.bvh_closest_attrs_pallas(
        bvh, ro, rd, 1e-3, 1e6)
    monkeypatch.setattr(bp, "BVH_MXU_LEAF", True)
    bt_m, bi_m, bu_m, bv_m, n_m = bp.bvh_closest_attrs_pallas(
        bvh, ro, rd, 1e-3, 1e6)

    np.testing.assert_allclose(np.asarray(bt_s), np.asarray(bt_m),
                               rtol=1e-5, atol=1e-5)
    same = np.asarray(bi_s) == np.asarray(bi_m)
    assert same.mean() > 0.99
    h = (np.asarray(bi_s) >= 0) & same
    np.testing.assert_allclose(np.asarray(bu_s)[h], np.asarray(bu_m)[h],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(bv_s)[h], np.asarray(bv_m)[h],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(n_s.x)[h], np.asarray(n_m.x)[h],
                               rtol=1e-5, atol=1e-5)


def test_mxu_any_whole_tree_and_dont_care(interpreted_pallas, monkeypatch):
    """Direct bvh_any_pallas path incl. don't-care (limit <= 0) lanes."""
    import jax.numpy as jnp

    scene = _soup_scene(40, seed=31)
    cs = compile_scene(scene, use_bvh=True)
    bvh = cs.bvh
    n = 512
    ro, rd = _rays(n, 32)
    rng = np.random.default_rng(33)
    lim = np.where(rng.random(n) < 0.3, -1.0,
                   rng.uniform(2.0, 25.0, n)).astype(np.float32)
    lim = jnp.asarray(lim)

    occ_scalar = np.asarray(bp.bvh_any_pallas(bvh, ro, rd, 1e-3, lim))
    monkeypatch.setattr(bp, "BVH_MXU_LEAF", True)
    occ_mxu = np.asarray(bp.bvh_any_pallas(bvh, ro, rd, 1e-3, lim))
    np.testing.assert_array_equal(occ_scalar, occ_mxu)
    # don't-care lanes report found (pre-parked) in both
    assert occ_mxu[np.asarray(lim) <= 0.0].all()
