"""Multi-device sharding: mesh renders must equal single-device renders."""
import numpy as np
import pytest

import path_tracing__ray_tracer_tpu as ptrt
from path_tracing__ray_tracer_tpu.parallel.mesh import make_mesh, mesh_shape


def test_make_mesh_shapes():
    mesh = make_mesh(8, sample_parallel=2)
    assert mesh_shape(mesh) == (4, 2)
    assert dict(mesh.shape) == {"tile": 4, "sample": 2}
    with pytest.raises(ValueError):
        make_mesh(8, sample_parallel=3)
    with pytest.raises(ValueError):
        make_mesh(1000)


@pytest.mark.parametrize("sample_parallel", [1, 2])
def test_path_sharded_equals_single(cornell, sample_parallel):
    scene, cam = cornell
    s = ptrt.RenderSettings(width=32, height=24, samples_per_pixel=4, max_depth=2)
    single = ptrt.RendererFactory.create("tpu_path_raytracer", seed=7, sample_group=2)
    a = single.render_array(scene, cam, s)
    mesh = make_mesh(8, sample_parallel=sample_parallel)
    sharded = ptrt.RendererFactory.create(
        "tpu_path_raytracer", seed=7, sample_group=2, mesh=mesh
    )
    b = sharded.render_array(scene, cam, s)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_whitted_sharded_equals_single(cornell):
    scene, cam = cornell
    # spp=9 → 9 grid cells, unevenly split over 2 sample-devices (masked)
    s = ptrt.RenderSettings(width=32, height=24, samples_per_pixel=9, max_depth=2)
    a = ptrt.RendererFactory.create("tpu_texture_raytracer", seed=1).render_array(
        scene, cam, s
    )
    mesh = make_mesh(8, sample_parallel=2)
    b = ptrt.RendererFactory.create(
        "tpu_texture_raytracer", seed=1, mesh=mesh
    ).render_array(scene, cam, s)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_bvh_scene_sharded_equals_single():
    """shard_map composed with the BVH traversal path (mesh scene compiled
    with use_bvh): sharded must equal single-device bit-for-bit tolerance."""
    from path_tracing__ray_tracer_tpu.scene_builders.mesh_scene_builder import (
        MeshSceneBuilder,
    )

    b = MeshSceneBuilder(grid=1, subdivisions=1)
    scene = b.build_scene()
    cam = b.create_camera(4 / 3)
    s = ptrt.RenderSettings(width=32, height=24, samples_per_pixel=2, max_depth=2)
    kw = dict(seed=3, sample_group=2, shadow_tmax="light",
              compile_overrides={"use_bvh": True})
    single = ptrt.RendererFactory.create("tpu_path_raytracer", **kw)
    a = single.render_array(scene, cam, s)
    assert single.compiled(scene).bvh is not None
    mesh = make_mesh(8, sample_parallel=2)
    sharded = ptrt.RendererFactory.create("tpu_path_raytracer", mesh=mesh, **kw)
    b2 = sharded.render_array(scene, cam, s)
    np.testing.assert_allclose(a, b2, atol=1e-5)


def test_graft_entry_single_chip():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = fn(*args)
    assert out.x.shape == (4096,)
    assert np.isfinite(np.asarray(out.to_array())).all()


def test_graft_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
