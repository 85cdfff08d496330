"""Block-synchronous Pallas BVH traversal vs the XLA reference walk.

Runs the kernels in interpret mode on CPU (tiny shapes — the interpreter is
slow); on TPU the same code path is exercised by the mesh benchmark.
"""
import numpy as np
import pytest

import path_tracing__ray_tracer_tpu as ptrt
from path_tracing__ray_tracer_tpu.compiler import compile_scene
from path_tracing__ray_tracer_tpu.ops import intersect
from path_tracing__ray_tracer_tpu.ops.bvh import build_bvh as _ORIG_BUILD_BVH
from path_tracing__ray_tracer_tpu.ops.v3 import V3


@pytest.fixture
def interpreted_pallas(monkeypatch):
    from jax.experimental.pallas import tpu as pltpu

    monkeypatch.setattr(intersect, "USE_PALLAS", True)
    with pltpu.force_tpu_interpret_mode():
        yield


def _soup_scene(n_tris, seed):
    """Random triangle soup + a couple of non-triangle primitives."""
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


def test_pack_blobs_layout():
    from path_tracing__ray_tracer_tpu.ops import bvh as bvh_mod

    rng = np.random.default_rng(0)
    v0 = rng.uniform(-5, 5, (40, 3)).astype(np.float32)
    v1 = v0 + rng.uniform(-1, 1, (40, 3)).astype(np.float32)
    v2 = v0 + rng.uniform(-1, 1, (40, 3)).astype(np.float32)
    tri_min = np.minimum(np.minimum(v0, v1), v2)
    tri_max = np.maximum(np.maximum(v0, v1), v2)
    arrs = bvh_mod.build_bvh(tri_min, tri_max, use_native=False)
    from path_tracing__ray_tracer_tpu.ops.pallas.bvh_pallas import (
        _NODE_F, _SLOT_F, pack_blobs)

    tree, slot, depth = pack_blobs(arrs, v0, v1, v2)
    m, leaf_size = arrs["slots"].shape
    assert tree.shape == (1, _NODE_F * m)
    n_leaves = int(arrs["is_leaf"].sum())
    assert slot.shape == (1, _SLOT_F * n_leaves * leaf_size)
    # every real triangle id appears exactly once in the slot records
    gids = slot.reshape(-1, _SLOT_F)[:, 9]
    real = np.sort(gids[gids >= 0]).astype(int)
    np.testing.assert_array_equal(real, np.arange(40))
    # leaf nodes point at aligned slot bases
    tree2 = tree.reshape(-1, _NODE_F)
    bases = tree2[arrs["is_leaf"], 7]
    assert (bases >= 0).all() and (bases.astype(int) % leaf_size == 0).all()
    # inner nodes carry the ordering code -(1 + axis + 4*flip) ∈ [-8, -1]
    inner_codes = tree2[~arrs["is_leaf"], 7]
    assert ((inner_codes <= -1) & (inner_codes >= -8)).all()
    assert 1 <= depth <= m
    # DFS layout invariant the ordered walk relies on: right(i) = skip[i+1]
    inner_ids = np.where(~arrs["is_leaf"])[0]
    rights = arrs["skip"][inner_ids + 1]
    assert (rights > inner_ids + 1).all() and (rights < m).all()


def test_bvh_closest_kernel_matches_xla_walk(interpreted_pallas):
    scene = _soup_scene(48, seed=7)
    cs = compile_scene(scene, use_bvh=True)
    assert cs.bvh is not None and cs.bvh.tree_blob is not None
    ro, rd = _rays(256, 11)

    hit_k = intersect.scene_hit(cs, ro, rd, 1e-3, 1e6)
    intersect.USE_PALLAS = False
    hit_x = intersect.scene_hit(cs, ro, rd, 1e-3, 1e6)

    np.testing.assert_array_equal(np.asarray(hit_k.hit), np.asarray(hit_x.hit))
    np.testing.assert_allclose(np.asarray(hit_k.t), np.asarray(hit_x.t),
                               rtol=1e-5, atol=1e-5)
    # prim ids agree except possibly on exact-t ties: with BVH_ORDERED on
    # (the default) the front-to-back walk legitimately resolves ties in a
    # different visit order than the XLA skip-link walk (QUIRKS.md)
    same = np.asarray(hit_k.prim) == np.asarray(hit_x.prim)
    assert same.mean() > 0.99
    np.testing.assert_array_equal(np.asarray(hit_k.prim) < 0,
                                  np.asarray(hit_x.prim) < 0)


def test_bvh_any_kernel_matches_xla_walk(interpreted_pallas):
    scene = _soup_scene(48, seed=8)
    cs = compile_scene(scene, use_bvh=True)
    ro, rd = _rays(256, 12)

    occ_k = np.asarray(intersect.scene_hit_any(cs, ro, rd, 1e-3, 18.0))
    intersect.USE_PALLAS = False
    occ_x = np.asarray(intersect.scene_hit_any(cs, ro, rd, 1e-3, 18.0))
    np.testing.assert_array_equal(occ_k, occ_x)


def test_bvh_sorted_matches_unsorted(interpreted_pallas, monkeypatch):
    """The coherence sort changes block membership only: sorted and unsorted
    traversals must agree bit-exactly (per-lane math is per-lane exact)."""
    from path_tracing__ray_tracer_tpu.ops.pallas import bvh_pallas as bp

    scene = _soup_scene(48, seed=10)
    cs = compile_scene(scene, use_bvh=True)
    n = 4096
    ro, rd = _rays(n, 14)
    monkeypatch.setattr(bp, "TRAV_ROWS", 8)  # several blocks at n=4096
    monkeypatch.setattr(bp, "_SORT_MIN_ROWS", 2)
    monkeypatch.setattr(bp, "BVH_MULTIPASS", False)  # single-pass property

    assert bp._sort_enabled(n)
    bt_s, bi_s = bp.bvh_closest_pallas(cs.bvh, ro, rd, 1e-3, 1e6)
    monkeypatch.setattr(bp, "BVH_SORT", False)
    bt_u, bi_u = bp.bvh_closest_pallas(cs.bvh, ro, rd, 1e-3, 1e6)
    np.testing.assert_array_equal(np.asarray(bt_s), np.asarray(bt_u))
    np.testing.assert_array_equal(np.asarray(bi_s), np.asarray(bi_u))

    monkeypatch.setattr(bp, "BVH_SORT", True)
    lim = np.full(n, 18.0, np.float32)
    occ_s = np.asarray(bp.bvh_any_pallas(cs.bvh, ro, rd, 1e-3, lim))
    monkeypatch.setattr(bp, "BVH_SORT", False)
    occ_u = np.asarray(bp.bvh_any_pallas(cs.bvh, ro, rd, 1e-3, lim))
    np.testing.assert_array_equal(occ_s, occ_u)


def test_bvh_ordered_matches_skiplink(interpreted_pallas, monkeypatch):
    """The front-to-back stack walk and the stackless preorder walk must
    agree on hit/t everywhere (prim ids may differ only on exact-t ties)."""
    from path_tracing__ray_tracer_tpu.ops.pallas import bvh_pallas as bp

    monkeypatch.setattr(bp, "BVH_QUAD", False)  # pin to the BVH2 kernels
    scene = _soup_scene(64, seed=15)
    cs = compile_scene(scene, use_bvh=True)
    assert cs.bvh.depth_token is not None
    n = 512
    ro, rd = _rays(n, 16)

    assert bp._ordered_ok(cs.bvh)
    bt_o, bi_o = bp.bvh_closest_pallas(cs.bvh, ro, rd, 1e-3, 1e6)
    monkeypatch.setattr(bp, "BVH_ORDERED", False)
    bt_s, bi_s = bp.bvh_closest_pallas(cs.bvh, ro, rd, 1e-3, 1e6)

    np.testing.assert_allclose(np.asarray(bt_o), np.asarray(bt_s),
                               rtol=1e-6, atol=1e-6)
    same = np.asarray(bi_o) == np.asarray(bi_s)
    assert same.mean() > 0.99
    # misses must agree exactly
    np.testing.assert_array_equal(np.asarray(bi_o) < 0, np.asarray(bi_s) < 0)

    # occlusion is an existence test: ordered == skip-link exactly
    monkeypatch.setattr(bp, "BVH_ORDERED", True)
    lim = np.full(n, 14.0, np.float32)
    occ_o = np.asarray(bp.bvh_any_pallas(cs.bvh, ro, rd, 1e-3, lim))
    monkeypatch.setattr(bp, "BVH_ORDERED", False)
    occ_s = np.asarray(bp.bvh_any_pallas(cs.bvh, ro, rd, 1e-3, lim))
    np.testing.assert_array_equal(occ_o, occ_s)


def test_bvh_vs_brute_force_reference(interpreted_pallas):
    """The Pallas walk must agree with the no-BVH brute-force sweep (the
    independent oracle) on hits and t."""
    scene = _soup_scene(48, seed=9)
    cs_bvh = compile_scene(scene, use_bvh=True)
    cs_brute = compile_scene(scene, use_bvh=False)
    ro, rd = _rays(256, 13)

    hit_k = intersect.scene_hit(cs_bvh, ro, rd, 1e-3, 1e6)
    intersect.USE_PALLAS = False
    hit_b = intersect.scene_hit(cs_brute, ro, rd, 1e-3, 1e6)

    np.testing.assert_array_equal(np.asarray(hit_k.hit), np.asarray(hit_b.hit))
    np.testing.assert_allclose(np.asarray(hit_k.t), np.asarray(hit_b.t),
                               rtol=1e-5, atol=1e-5)
    # prim ids agree except possibly on exact-t ties (SAH visit order)
    same = np.asarray(hit_k.prim) == np.asarray(hit_b.prim)
    assert same.mean() > 0.99


def test_pack_blobs4_layout():
    """BVH4 collapse invariants: every BVH2 leaf's slot_base appears exactly
    once across quad child metas, every non-root BVH4 node is referenced by
    exactly one inner meta, and child boxes match the BVH2 node boxes."""
    from path_tracing__ray_tracer_tpu.ops import bvh as bvh_mod
    from path_tracing__ray_tracer_tpu.ops.pallas.bvh_pallas import (
        _NODE4_F, pack_blobs4)

    rng = np.random.default_rng(3)
    v0 = rng.uniform(-5, 5, (300, 3)).astype(np.float32)
    v1 = v0 + rng.uniform(-1, 1, (300, 3)).astype(np.float32)
    v2 = v0 + rng.uniform(-1, 1, (300, 3)).astype(np.float32)
    tri_min = np.minimum(np.minimum(v0, v1), v2)
    tri_max = np.maximum(np.maximum(v0, v1), v2)
    arrs = bvh_mod.build_bvh(tri_min, tri_max, use_native=False)
    quad, depth4 = pack_blobs4(arrs)
    assert quad is not None and depth4 >= 1
    recs = quad.reshape(-1, _NODE4_F)
    m4 = len(recs)

    leaf_size = arrs["slots"].shape[1]
    n_leaves = int(arrs["is_leaf"].sum())
    metas = recs[:, 24:28].reshape(-1)
    boxes = recs[:, :24].reshape(-1, 6)
    empties = (boxes[:, :3] == 3e38).all(axis=1)
    leaf_metas = metas[(metas >= 0) & ~empties]
    # every leaf appears exactly once (slot bases are rank*leaf_size)
    np.testing.assert_array_equal(
        np.sort(leaf_metas.astype(int)),
        np.arange(n_leaves) * leaf_size,
    )
    inner_metas = metas[(metas < -0.5) & ~empties]
    kids = np.sort((-inner_metas).astype(int) - 1)
    # every BVH4 node except the root is someone's child, exactly once
    np.testing.assert_array_equal(kids, np.arange(1, m4))
    # split codes in range
    assert ((recs[:, 28:31] >= 0) & (recs[:, 28:31] <= 7)).all()
    # non-empty child boxes are real BVH2 boxes
    lohi = np.concatenate([arrs["lo"], arrs["hi"]], axis=1)
    real = boxes[~empties]
    present = {tuple(r) for r in np.round(lohi.astype(np.float64), 5)}
    for r in np.round(real.astype(np.float64), 5):
        assert tuple(r) in present


def test_textured_tri_uv_through_attrs_walk(interpreted_pallas, tmp_path,
                                            monkeypatch):
    """End-to-end ``scene_hit`` wiring check for the attrs walk on TEXTURED
    triangles: the kernel-supplied barycentrics must interpolate the same
    (u, v) as the XLA gather recompute (same winner => same uv), and
    ``tri_uv_used`` must be shape (1,) so the uv gate is actually on."""
    from functools import partial

    import jax.numpy as jnp
    from PIL import Image

    from path_tracing__ray_tracer_tpu.ops import bvh as bvh_mod
    from path_tracing__ray_tracer_tpu.ops.pallas import bvh_pallas as bp

    # pin the fused scene path off so this test exercises the attrs walk it
    # is named for (the padded-dummy ps tables would otherwise engage the
    # fused kernel); leaf 4 keeps the interpret compile cheap
    monkeypatch.setattr(bp, "BVH_SCENE", False)
    monkeypatch.setattr(bvh_mod, "build_bvh",
                        partial(_ORIG_BUILD_BVH, leaf_size=4))

    png = tmp_path / "t.png"
    Image.fromarray(
        (np.arange(48, dtype=np.uint8).reshape(4, 4, 3) * 5)
    ).save(png)
    tex = ptrt.Texture(str(png))
    mat = ptrt.Material(ptrt.Vec3(0.7, 0.6, 0.5), diffuse=0.8, texture=tex)

    rng = np.random.default_rng(53)
    scene = ptrt.Scene()
    n_tris = 48
    for _ in range(n_tris):
        a = rng.uniform(-10, 10, 3)
        b = a + rng.uniform(-2, 2, 3)
        c = a + rng.uniform(-2, 2, 3)
        scene.add_object(ptrt.Triangle(
            ptrt.Vec3(*a), ptrt.Vec3(*b), ptrt.Vec3(*c),
            uv0=rng.uniform(0, 1, 2), uv1=rng.uniform(0, 1, 2),
            uv2=rng.uniform(0, 1, 2), material=mat,
        ))
    scene.add_light_sample(ptrt.Vec3(0, 20, 0))
    cs = compile_scene(scene, use_bvh=True)
    assert cs.tri_uv_used is not None and cs.tri_uv_used.shape == (1,)
    assert cs.n_triangles == n_tris  # random soup must not quad-merge

    ro, rd = _rays(256, 54)
    assert bp.bvh_closest_attrs_pallas(cs.bvh, ro, rd, 1e-3, 1e6) is not None
    hit_k = intersect.scene_hit(cs, ro, rd, 1e-3, 1e6)
    intersect.USE_PALLAS = False
    hit_x = intersect.scene_hit(cs, ro, rd, 1e-3, 1e6)
    intersect.USE_PALLAS = True

    same = np.asarray(hit_k.prim) == np.asarray(hit_x.prim)
    assert same.mean() > 0.99  # exact-t ties may differ (QUIRKS.md)
    for name in ("u", "v"):
        np.testing.assert_allclose(
            np.asarray(getattr(hit_k, name))[same],
            np.asarray(getattr(hit_x, name))[same], atol=1e-4,
        )
    for c in ("x", "y", "z"):
        np.testing.assert_allclose(
            np.asarray(getattr(hit_k.normal, c))[same],
            np.asarray(getattr(hit_x.normal, c))[same], atol=1e-5,
        )


def test_bvh_closest_attrs_matches_gathers(interpreted_pallas):
    """The attrs kernel's (t, i) must equal the plain kernel's, its normal
    must equal the STORED per-triangle normal (bit-exact — it is selected,
    not recomputed), and its barycentrics must match the XLA recompute to
    float tolerance."""
    import jax.numpy as jnp

    from path_tracing__ray_tracer_tpu.ops.pallas import bvh_pallas as bp

    scene = _soup_scene(64, seed=51)
    cs = compile_scene(scene, use_bvh=True)
    n = 512
    ro, rd = _rays(n, 52)

    got = bp.bvh_closest_attrs_pallas(cs.bvh, ro, rd, 1e-3, 1e6)
    assert got is not None
    bt_a, bi_a, u_a, v_a, n_a = got
    bt, bi = bp.bvh_closest_pallas(cs.bvh, ro, rd, 1e-3, 1e6)
    np.testing.assert_array_equal(np.asarray(bt_a), np.asarray(bt))
    np.testing.assert_array_equal(np.asarray(bi_a), np.asarray(bi))

    hit = np.asarray(bi) >= 0
    ti = np.clip(np.asarray(bi), 0, cs.n_triangles - 1)
    stored = cs.triangles.normal.take(jnp.asarray(ti))
    for a, b in ((n_a.x, stored.x), (n_a.y, stored.y), (n_a.z, stored.z)):
        np.testing.assert_array_equal(np.asarray(a)[hit], np.asarray(b)[hit])

    # barycentric cross-check against a host Möller-Trumbore recompute
    tv0 = np.asarray(cs.triangles.v0.to_array())[ti]
    tv1 = np.asarray(cs.triangles.v1.to_array())[ti]
    tv2 = np.asarray(cs.triangles.v2.to_array())[ti]
    e1, e2 = tv1 - tv0, tv2 - tv0
    ro_np = np.asarray(ro.to_array())
    rd_np = np.asarray(rd.to_array())
    h = np.cross(rd_np, e2)
    det = (e1 * h).sum(-1)
    inv = 1.0 / np.where(np.abs(det) > 1e-6, det, 1.0)
    s = ro_np - tv0
    bu = inv * (s * h).sum(-1)
    bv = inv * (rd_np * np.cross(s, e1)).sum(-1)
    np.testing.assert_allclose(np.asarray(u_a)[hit], bu[hit], atol=1e-4)
    np.testing.assert_allclose(np.asarray(v_a)[hit], bv[hit], atol=1e-4)


def test_bvh_attrs_hatch_off_matches_scene_hit(interpreted_pallas, monkeypatch):
    """The PTRT_BVH_ATTRS=0 escape hatch (BVH_ATTRS=False) must route
    ``scene_hit`` through the plain kernel + XLA gather recompute and land on
    the same answer as the attrs walk (same winner => same t/normal/uv).
    BVH_SCENE is pinned off so the comparison isolates the attrs hatch."""
    from functools import partial

    from path_tracing__ray_tracer_tpu.ops import bvh as bvh_mod
    from path_tracing__ray_tracer_tpu.ops.pallas import bvh_pallas as bp

    monkeypatch.setattr(bp, "BVH_SCENE", False)
    # small leaves keep the interpret-mode kernel's XLA CPU compile cheap
    # (leaf 16 unrolls ≈ minutes; leaf 4 ≈ tens of seconds)
    monkeypatch.setattr(bvh_mod, "build_bvh",
                        partial(_ORIG_BUILD_BVH, leaf_size=4))
    scene = _soup_scene(48, seed=61)
    cs = compile_scene(scene, use_bvh=True)
    ro, rd = _rays(256, 62)

    assert bp.bvh_closest_attrs_pallas(cs.bvh, ro, rd, 1e-3, 1e6) is not None
    hit_on = intersect.scene_hit(cs, ro, rd, 1e-3, 1e6)
    monkeypatch.setattr(bp, "BVH_ATTRS", False)
    assert bp.bvh_closest_attrs_pallas(cs.bvh, ro, rd, 1e-3, 1e6) is None
    hit_off = intersect.scene_hit(cs, ro, rd, 1e-3, 1e6)

    np.testing.assert_array_equal(np.asarray(hit_on.prim), np.asarray(hit_off.prim))
    np.testing.assert_array_equal(np.asarray(hit_on.t), np.asarray(hit_off.t))
    for c in ("x", "y", "z"):
        np.testing.assert_array_equal(
            np.asarray(getattr(hit_on.normal, c)),
            np.asarray(getattr(hit_off.normal, c)))
    for name in ("u", "v"):
        np.testing.assert_allclose(
            np.asarray(getattr(hit_on, name)),
            np.asarray(getattr(hit_off, name)), atol=1e-4)


def _mixed_scene(n_tris, seed, monkeypatch, mat=None):
    """Triangle soup + one plane + one sphere + one quad (two coplanar
    rectangle triangles that the compiler merges), compiled with a SMALL
    leaf size so the interpret-mode kernel's XLA CPU compile stays cheap
    (leaf 16 unrolls ≈ minutes; leaf 4 ≈ tens of seconds)."""
    from functools import partial

    from path_tracing__ray_tracer_tpu.ops import bvh as bvh_mod

    rng = np.random.default_rng(seed)
    scene = ptrt.Scene()
    mat = mat or ptrt.Material(ptrt.Vec3(0.7, 0.6, 0.5), diffuse=0.8)
    for _ in range(n_tris):
        a = rng.uniform(-10, 10, 3)
        b = a + rng.uniform(-2, 2, 3)
        c = a + rng.uniform(-2, 2, 3)
        scene.add_object(ptrt.Triangle(
            ptrt.Vec3(*a), ptrt.Vec3(*b), ptrt.Vec3(*c), material=mat))
    scene.add_object(ptrt.Sphere(ptrt.Vec3(0, 0, 0), 2.0, mat))
    scene.add_object(ptrt.Plane(
        ptrt.Vec3(-11, -11, -11), ptrt.Vec3(0, 1, 0),
        ptrt.Vec3(1, 0, 0), ptrt.Vec3(0, 0, 1), 22.0, 22.0, mat))
    # axis-aligned rectangle -> quad-merged by the compiler
    q = [ptrt.Vec3(-3, 6, -3), ptrt.Vec3(3, 6, -3),
         ptrt.Vec3(3, 6, 3), ptrt.Vec3(-3, 6, 3)]
    scene.add_object(ptrt.Triangle(q[0], q[1], q[2], material=mat,
                                   uv0=(0, 0), uv1=(1, 0), uv2=(1, 1)))
    scene.add_object(ptrt.Triangle(q[0], q[2], q[3], material=mat,
                                   uv0=(0, 0), uv1=(1, 1), uv2=(0, 1)))
    scene.add_light_sample(ptrt.Vec3(0, 20, 0))
    monkeypatch.setattr(bvh_mod, "build_bvh",
                        partial(_ORIG_BUILD_BVH, leaf_size=4))
    return compile_scene(scene, use_bvh=True)


def test_bvh_scene_fused_matches_split(interpreted_pallas, monkeypatch):
    """The fused whole-scene closest kernel (ps sweep seeding the BVH4 attrs
    walk, ``BVH_SCENE``) must agree bit-exactly with the split path
    (XLA ps broadcast + attrs walk + combine epilogue) on every SceneHit
    field, across plane/sphere/quad/triangle winners and misses."""
    from path_tracing__ray_tracer_tpu.ops.pallas import bvh_pallas as bp

    cs = _mixed_scene(48, 71, monkeypatch)
    assert cs.n_planes == 1 and cs.n_spheres == 1 and cs.n_quads == 1
    assert bp._scene_fused_ok(cs)
    ro, rd = _rays(256, 72)

    hit_f = intersect.scene_hit(cs, ro, rd, 1e-3, 1e6)
    monkeypatch.setattr(bp, "BVH_SCENE", False)
    hit_s = intersect.scene_hit(cs, ro, rd, 1e-3, 1e6)
    monkeypatch.setattr(bp, "BVH_SCENE", True)

    # every winner type must actually occur or the test proves nothing
    prim = np.asarray(hit_f.prim)
    psq = cs.n_planes + cs.n_spheres + cs.n_quads
    assert (prim == 0).any() and ((0 < prim) & (prim < psq)).any() \
        and (prim >= psq).any() and (prim < 0).any()

    # same winner everywhere; per-field float tolerance matches the other
    # interpret-mode kernel-vs-XLA tests (CPU interpret compiles fuse the
    # two formulations differently; bit-exactness is verified on TPU)
    np.testing.assert_array_equal(prim, np.asarray(hit_s.prim))
    np.testing.assert_allclose(np.asarray(hit_f.t), np.asarray(hit_s.t),
                               rtol=1e-5)
    for name in ("u", "v"):
        np.testing.assert_allclose(
            np.asarray(getattr(hit_f, name)),
            np.asarray(getattr(hit_s, name)), atol=1e-4)
    for c in ("x", "y", "z"):
        np.testing.assert_allclose(
            np.asarray(getattr(hit_f.normal, c)),
            np.asarray(getattr(hit_s.normal, c)), atol=1e-5)

    # the sorted wrapper path must be bit-identical too (sorting only
    # reorders kernel blocks; per-lane results are exact)
    monkeypatch.setattr(bp, "_SORT_MIN_ROWS", 2)
    got = bp.bvh_scene_closest_pallas(cs, ro, rd, 1e-3, 1e6)
    np.testing.assert_array_equal(np.asarray(got[1]), prim)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(hit_f.t))


def test_bvh_scene_fused_textured_uv(interpreted_pallas, monkeypatch, tmp_path):
    """Fused path on a TEXTURED-triangle scene: ``_fused_scene_hit`` must
    interpolate per-triangle uv from the kernel's barycentrics exactly like
    the split path's epilogue (``tri_uv_used`` shape (1,) => gate on)."""
    from PIL import Image

    from path_tracing__ray_tracer_tpu.ops.pallas import bvh_pallas as bp

    png = tmp_path / "t.png"
    Image.fromarray(
        (np.arange(48, dtype=np.uint8).reshape(4, 4, 3) * 5)).save(png)
    tex = ptrt.Texture(str(png))
    mat = ptrt.Material(ptrt.Vec3(0.7, 0.6, 0.5), diffuse=0.8, texture=tex)

    cs = _mixed_scene(48, 91, monkeypatch, mat=mat)
    assert cs.tri_uv_used is not None and cs.tri_uv_used.shape == (1,)
    assert bp._scene_fused_ok(cs)
    ro, rd = _rays(256, 92)

    hit_f = intersect.scene_hit(cs, ro, rd, 1e-3, 1e6)
    monkeypatch.setattr(bp, "BVH_SCENE", False)
    hit_s = intersect.scene_hit(cs, ro, rd, 1e-3, 1e6)

    prim = np.asarray(hit_f.prim)
    assert (prim >= cs.n_planes + cs.n_spheres + cs.n_quads).any()
    np.testing.assert_array_equal(prim, np.asarray(hit_s.prim))
    for name in ("u", "v"):
        np.testing.assert_allclose(
            np.asarray(getattr(hit_f, name)),
            np.asarray(getattr(hit_s, name)), atol=1e-4)


def test_bvh_scene_fused_any_matches_split(interpreted_pallas, monkeypatch):
    """The fused whole-scene occlusion kernel must agree with the split path
    (XLA ps any + BVH any-walk OR) for live, bounded, and parked lanes."""
    from path_tracing__ray_tracer_tpu.ops.pallas import bvh_pallas as bp

    cs = _mixed_scene(48, 81, monkeypatch)
    assert bp._scene_fused_ok(cs)
    n = 256
    ro, rd = _rays(n, 82)
    rng = np.random.default_rng(83)
    lim = rng.uniform(0.5, 30, n).astype(np.float32)
    import jax.numpy as jnp

    lim[::7] = -1.0  # parked don't-care lanes
    lim_j = jnp.asarray(lim)

    occ_f = intersect.scene_hit_any(cs, ro, rd, 1e-3, lim_j)
    monkeypatch.setattr(bp, "BVH_SCENE", False)
    occ_s = intersect.scene_hit_any(cs, ro, rd, 1e-3, lim_j)
    monkeypatch.setattr(bp, "BVH_SCENE", True)
    np.testing.assert_array_equal(np.asarray(occ_f), np.asarray(occ_s))
    assert np.asarray(occ_f)[::7].all(), "parked lanes report occluded"


def test_bvh_any_dont_care_lanes(interpreted_pallas):
    """Lanes with limit <= 0 are parked from step 0 ("don't care", reported
    occluded); live lanes must answer exactly as an all-live walk."""
    from path_tracing__ray_tracer_tpu.ops.pallas import bvh_pallas as bp

    scene = _soup_scene(64, seed=41)
    cs = compile_scene(scene, use_bvh=True)
    n = 512
    ro, rd = _rays(n, 42)
    lim = np.full(n, 16.0, np.float32)
    all_live = np.asarray(bp.bvh_any_pallas(cs.bvh, ro, rd, 1e-3, lim))
    dead = np.zeros(n, bool)
    dead[::3] = True
    mixed_lim = np.where(dead, -1.0, lim).astype(np.float32)
    mixed = np.asarray(bp.bvh_any_pallas(cs.bvh, ro, rd, 1e-3, mixed_lim))
    np.testing.assert_array_equal(mixed[~dead], all_live[~dead])
    assert mixed[dead].all(), "parked lanes report occluded (don't care)"


def test_bvh_multipass_matches_single_pass(interpreted_pallas, monkeypatch):
    """The multipass closest-hit walk (subtree passes + cleanup) must agree
    with the single-pass walk on hit/t everywhere — the cleanup pass makes it
    exact no matter what the subtree predictions chose (prim ids
    tie-tolerant, same as the other order-sensitive comparisons)."""
    from path_tracing__ray_tracer_tpu.ops.pallas import bvh_pallas as bp

    scene = _soup_scene(96, seed=31)
    cs = compile_scene(scene, use_bvh=True)
    n = 2048
    ro, rd = _rays(n, 32)
    monkeypatch.setattr(bp, "TRAV_ROWS", 8)
    monkeypatch.setattr(bp, "_SORT_MIN_ROWS", 2)
    monkeypatch.setattr(bp, "_MP_MIN_DEPTH4", 1)
    monkeypatch.setattr(bp, "BVH_MULTIPASS", True)

    assert bp._mp_ok(cs.bvh, n)
    bt_m, bi_m = bp.bvh_closest_pallas(cs.bvh, ro, rd, 1e-3, 1e6)
    monkeypatch.setattr(bp, "BVH_MULTIPASS", False)
    bt_s, bi_s = bp.bvh_closest_pallas(cs.bvh, ro, rd, 1e-3, 1e6)

    np.testing.assert_allclose(np.asarray(bt_m), np.asarray(bt_s),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(bi_m) < 0, np.asarray(bi_s) < 0)
    assert (np.asarray(bi_m) == np.asarray(bi_s)).mean() > 0.99


def test_bvh4_matches_bvh2_walk(interpreted_pallas, monkeypatch):
    """The BVH4 packed-reduction walk must agree with the BVH2 ordered walk
    on hit/t everywhere (prim ids tie-tolerant, misses exact)."""
    from path_tracing__ray_tracer_tpu.ops.pallas import bvh_pallas as bp

    scene = _soup_scene(64, seed=21)
    cs = compile_scene(scene, use_bvh=True)
    assert bp._quad_ok(cs.bvh)
    n = 512
    ro, rd = _rays(n, 22)

    bt4, bi4 = bp.bvh_closest_pallas(cs.bvh, ro, rd, 1e-3, 1e6)
    monkeypatch.setattr(bp, "BVH_QUAD", False)
    bt2, bi2 = bp.bvh_closest_pallas(cs.bvh, ro, rd, 1e-3, 1e6)

    np.testing.assert_allclose(np.asarray(bt4), np.asarray(bt2),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(bi4) < 0, np.asarray(bi2) < 0)
    assert (np.asarray(bi4) == np.asarray(bi2)).mean() > 0.99

    # occlusion is an existence test: BVH4 == BVH2 exactly
    monkeypatch.setattr(bp, "BVH_QUAD", True)
    lim = np.full(n, 14.0, np.float32)
    occ4 = np.asarray(bp.bvh_any_pallas(cs.bvh, ro, rd, 1e-3, lim))
    monkeypatch.setattr(bp, "BVH_QUAD", False)
    occ2 = np.asarray(bp.bvh_any_pallas(cs.bvh, ro, rd, 1e-3, lim))
    np.testing.assert_array_equal(occ4, occ2)
