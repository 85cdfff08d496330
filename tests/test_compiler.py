"""Scene compiler: layout, padding, parity masking, texture IDs, camera pack."""
import numpy as np

from path_tracing__ray_tracer_tpu.compiler import (
    collect_texture_paths,
    compile_scene,
    pack_camera,
    scene_summary,
)
from path_tracing__ray_tracer_tpu.core import Camera, Vec3


def test_counts_and_summary(cornell):
    scene, _ = cornell
    cs = compile_scene(scene)
    s = scene_summary(cs)
    # 5 walls, 3 spheres, 26 triangles (24 cube + 2 canvas → merged into 13
    # parallelogram quads), 16 light samples, 7 textures — SURVEY.md §3.5
    assert s["planes"] >= 5 and s["spheres"] >= 3
    assert s["quads"] == 13 and s["triangles"] <= 1  # all tris merge to quads
    assert s["lights"] == 16
    assert s["textures"] == 7
    assert cs.n_lights == 16

    # opting out keeps the raw triangles
    cs_raw = compile_scene(scene, merge_quads=False)
    assert cs_raw.n_triangles >= 26 and cs_raw.n_quads <= 1


def test_gpu_parity_masks(cornell):
    """Planes/triangles never refract on the GPU wire format
    (cuda_texture_renderer.py:519-520,701-702)."""
    scene, _ = cornell
    gpu = compile_scene(scene, gpu_parity=True)
    cpu = compile_scene(scene, convention="cpu", gpu_parity=False)

    P, S = gpu.n_planes, gpu.n_spheres
    refr = np.asarray(gpu.materials.refractive)
    # plane rows and triangle rows are zeroed
    assert (refr[:P] == 0).all()
    assert (refr[P + S:] == 0).all()
    # sphere rows keep refraction (two glass spheres)
    assert (refr[P : P + S] > 0).sum() == 2

    # cpu-parity compile keeps whatever the materials say
    assert np.asarray(cpu.materials.ior)[P : P + S].max() == 1.5


def test_texture_ids_path_sorted(cornell):
    scene, _ = cornell
    paths = collect_texture_paths(scene)
    assert paths == sorted(paths)
    assert len(paths) == 7
    cs = compile_scene(scene)
    offs = np.asarray(cs.tex_offset)
    ws, hs = np.asarray(cs.tex_width), np.asarray(cs.tex_height)
    # offsets are cumulative pixel counts
    np.testing.assert_array_equal(offs[1:], np.cumsum(ws * hs)[:-1])
    assert cs.atlas.shape[0] == int((ws * hs).sum())


def test_plane_conventions_differ_only_in_v():
    """GPU normalizes the given v_dir, CPU derives v = n × u (quirk 5)."""
    import path_tracing__ray_tracer_tpu as ptrt

    scene = ptrt.Scene()
    # deliberately pass a v_dir that is NOT n × u (flipped)
    scene.add_object(
        ptrt.Plane(
            Vec3(0, 0, 0), Vec3(0, 1, 0), Vec3(1, 0, 0), Vec3(0, 0, 1),
            2.0, 2.0, ptrt.Material(Vec3(1, 1, 1)),
        )
    )
    gpu = compile_scene(scene, convention="gpu", with_textures=False)
    cpu = compile_scene(scene, convention="cpu", with_textures=False)
    v_gpu = np.asarray(gpu.planes.v_unit.to_array())[0]
    v_cpu = np.asarray(cpu.planes.v_unit.to_array())[0]
    np.testing.assert_allclose(v_gpu, [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(v_cpu, [0, 0, -1], atol=1e-6)  # n × u = -z


def test_padding_is_unhittable(tiny_scene):
    from path_tracing__ray_tracer_tpu.ops.intersect import scene_hit
    from path_tracing__ray_tracer_tpu.ops.v3 import V3

    cs = compile_scene(tiny_scene, gpu_parity=False)
    # fire rays in many directions from far away; no hit may report a padded index
    rng = np.random.default_rng(0)
    rd = rng.normal(size=(256, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    ro = np.zeros_like(rd)
    hit = scene_hit(cs, V3.from_array(ro), V3.from_array(rd), 1e-3, 1e6)
    prim = np.asarray(hit.prim)[np.asarray(hit.hit)]
    P, S, Q, T = cs.n_planes, cs.n_spheres, cs.n_quads, cs.n_triangles
    n_real = {"plane": 1, "sphere": 2, "quad": 0, "tri": 1}
    for p in prim:
        if p < P:
            assert p < n_real["plane"]
        elif p < P + S:
            assert p - P < n_real["sphere"]
        elif p < P + S + Q:
            assert p - P - S < n_real["quad"]
        else:
            assert p - P - S - Q < n_real["tri"]


def test_pack_camera_roundtrip():
    cam = Camera(Vec3(0, 0, 50), Vec3(0, 0, 0), Vec3(0, 1, 0), 49.5, 4 / 3)
    packed = np.asarray(pack_camera(cam))
    assert packed.shape == (12,)
    np.testing.assert_allclose(packed[:3], [0, 0, 50], atol=1e-6)
    np.testing.assert_allclose(packed[6:9], cam.horizontal.to_np(), atol=1e-6)
