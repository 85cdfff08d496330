"""Flat BVH: build invariants, native/numpy builder equivalence, traversal
parity with brute force, and the mesh-heavy scene end to end."""
import numpy as np
import pytest

import path_tracing__ray_tracer_tpu as ptrt
from path_tracing__ray_tracer_tpu.compiler import compile_scene
from path_tracing__ray_tracer_tpu.ops import bvh as bvh_mod
from path_tracing__ray_tracer_tpu.ops.v3 import V3


def _triangle_soup(t, seed):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-10, 10, (t, 3)).astype(np.float32)
    v0 = base
    v1 = base + rng.uniform(-1, 1, (t, 3)).astype(np.float32)
    v2 = base + rng.uniform(-1, 1, (t, 3)).astype(np.float32)
    return v0, v1, v2


def _soup_scene(v0, v1, v2):
    scene = ptrt.Scene()
    m = ptrt.Material(ptrt.Vec3(1, 1, 1))
    for i in range(len(v0)):
        scene.add_object(
            ptrt.Triangle(ptrt.Vec3(*v0[i]), ptrt.Vec3(*v1[i]), ptrt.Vec3(*v2[i]),
                          material=m)
        )
    return scene


def test_build_invariants():
    v0, v1, v2 = _triangle_soup(300, 7)
    tri_min = np.minimum(np.minimum(v0, v1), v2)
    tri_max = np.maximum(np.maximum(v0, v1), v2)
    arrs = bvh_mod.build_bvh(tri_min, tri_max, use_native=False)

    slots = arrs["slots"]
    ids = slots[slots >= 0]
    assert sorted(ids.tolist()) == list(range(300)), "each tri in exactly one leaf"
    # skip links always move forward and land inside [0, n]
    n = len(arrs["skip"])
    assert (arrs["skip"] > np.arange(n)).all()
    assert (arrs["skip"] <= n).all()
    # inner nodes have no slots, leaves have at least one
    assert (slots[~arrs["is_leaf"]] == -1).all()
    assert (slots[arrs["is_leaf"], 0] >= 0).all()
    # parent boxes contain child boxes (DFS: child of inner i is i+1)
    inner = np.where(~arrs["is_leaf"])[0]
    for i in inner[:50]:
        assert (arrs["lo"][i] <= arrs["lo"][i + 1] + 1e-5).all()
        assert (arrs["hi"][i] >= arrs["hi"][i + 1] - 1e-5).all()


def test_native_matches_numpy():
    from path_tracing__ray_tracer_tpu.native import load_bvh_builder

    if load_bvh_builder() is None:
        pytest.skip("no C++ toolchain")
    v0, v1, v2 = _triangle_soup(513, 3)
    tri_min = np.minimum(np.minimum(v0, v1), v2)
    tri_max = np.maximum(np.maximum(v0, v1), v2)
    a = bvh_mod.build_bvh(tri_min, tri_max, use_native=True)
    b = bvh_mod.build_bvh(tri_min, tri_max, use_native=False)
    for k in ("lo", "hi", "skip", "is_leaf", "slots"):
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_traversal_matches_bruteforce():
    v0, v1, v2 = _triangle_soup(400, 5)
    scene = _soup_scene(v0, v1, v2)
    cs = compile_scene(scene, with_textures=False)
    assert cs.bvh is not None  # 400 > BVH_THRESHOLD

    # brute-force oracle: a second compile below the threshold trick —
    # force by slicing? simplest: compare against the host linear scan
    rng = np.random.default_rng(2)
    n = 512
    ro_np = rng.uniform(-15, 15, (n, 3)).astype(np.float32)
    rd_np = rng.normal(size=(n, 3)).astype(np.float32)
    rd_np /= np.linalg.norm(rd_np, axis=-1, keepdims=True)

    from path_tracing__ray_tracer_tpu.ops.intersect import scene_hit
    hit = scene_hit(cs, V3.from_array(ro_np), V3.from_array(rd_np), 1e-3, 1e6)

    from tests.test_intersect import host_hits
    oracle = host_hits(scene, ro_np, rd_np)
    t_dev = np.asarray(hit.t)
    for i, (want_hit, rec, _w, tied) in enumerate(oracle):
        assert bool(hit.hit[i]) == want_hit, f"ray {i}"
        if want_hit and not tied:
            assert abs(t_dev[i] - rec.t) < 2e-3, f"ray {i}: {t_dev[i]} vs {rec.t}"


def test_mesh_scene_renders():
    from path_tracing__ray_tracer_tpu.scene_builders.mesh_scene_builder import (
        MeshSceneBuilder,
    )

    builder = MeshSceneBuilder(grid=2, subdivisions=1)
    scene = builder.build_scene()
    cam = builder.create_camera(4 / 3)
    n_tris = sum(1 for o in scene.objects if isinstance(o, ptrt.Triangle))
    assert n_tris == 4 * 80  # 2×2 icospheres at 1 subdivision

    cs = compile_scene(scene, with_textures=False)
    assert cs.bvh is not None

    r = ptrt.RendererFactory.create("tpu_path_raytracer", sample_group=2)
    img = np.asarray(
        r.render(scene, cam, ptrt.RenderSettings(32, 24, 2, 2))
    )
    assert img.mean() > 5.0 and np.isfinite(img.astype(float)).all()
