"""Unique-material compression and gather-free small-table selects.

The select chain (``ops/select_table.take_rows``) must be bit-exact against
the gather form it replaces — ``resolve_material`` vs ``gather_material``
and the ``pick_light`` row pick vs ``V3.take`` — on both the Cornell scene
(16 distinct materials) and a mesh scene (a handful).  BENCHMARKS.md round 3
records why it exists (flat ~7 ns/lane HLO-gather floor).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from path_tracing__ray_tracer_tpu.compiler import compile_scene
from path_tracing__ray_tracer_tpu.ops.intersect import (
    gather_material,
    resolve_material,
)
from path_tracing__ray_tracer_tpu.ops.sampling import pick_light
from path_tracing__ray_tracer_tpu.ops.select_table import take_rows
from path_tracing__ray_tracer_tpu.ops.v3 import V3
from path_tracing__ray_tracer_tpu.scene_builders.custom_scene_builder import (
    CustomSceneBuilder,
)
from path_tracing__ray_tracer_tpu.scene_builders.mesh_scene_builder import (
    MeshSceneBuilder,
)


def test_take_rows_matches_gather():
    rng = np.random.default_rng(3)
    tabs = [jnp.asarray(rng.normal(size=17).astype(np.float32)),
            jnp.asarray(rng.integers(-5, 99, size=17).astype(np.int32))]
    idx = jnp.asarray(rng.integers(0, 17, size=2048).astype(np.int32))
    got = take_rows(idx, tabs)
    for g, tb in zip(got, tabs):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(tb)[np.asarray(idx)])
        assert g.dtype == tb.dtype


@pytest.mark.parametrize("scene_kind", ["cornell", "mesh"])
def test_resolve_material_bit_exact(scene_kind):
    if scene_kind == "cornell":
        cs = compile_scene(CustomSceneBuilder().build_scene())
    else:
        cs = compile_scene(
            MeshSceneBuilder(grid=2, subdivisions=2).build_scene(), use_bvh=True
        )
    assert cs.mat_table is not None, "scenes this small must compress"
    m_total = cs.materials.diffuse.shape[0]
    rng = np.random.default_rng(7)
    prim = jnp.asarray(
        rng.integers(-1, m_total, size=4096).astype(np.int32)  # incl. miss -1
    )
    want = gather_material(cs.materials, prim)
    got = resolve_material(cs, prim)
    for w, g in zip(want, got):
        if isinstance(w, V3):
            for a, b in zip((w.x, w.y, w.z), (g.x, g.y, g.z)):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        else:
            np.testing.assert_array_equal(np.asarray(w), np.asarray(g))
            assert g.dtype == w.dtype


def test_pick_light_bit_exact_vs_take():
    cs = compile_scene(CustomSceneBuilder().build_scene())
    assert cs.n_lights == 16
    rng = np.random.default_rng(11)
    point = V3(*(jnp.asarray(rng.normal(size=2048).astype(np.float32))
                 for _ in range(3)))
    r = jnp.asarray(rng.random(2048).astype(np.float32))
    ldir, dist, pdf = pick_light(cs, point, r)
    # reference formulation: plain V3.take
    li = jnp.minimum((r * cs.n_lights).astype(jnp.int32), cs.n_lights - 1)
    lp = cs.lights.take(li)
    to_light = lp - point
    dist_ref = to_light.norm()
    ldir_ref = to_light * (1.0 / jnp.where(dist_ref > 0.001, dist_ref, 1.0))
    np.testing.assert_array_equal(np.asarray(dist), np.asarray(dist_ref))
    for a, b in zip((ldir.x, ldir.y, ldir.z), (ldir_ref.x, ldir_ref.y, ldir_ref.z)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mat_uid_roundtrip_covers_table():
    """Every prim's uid row reproduces its original material row exactly."""
    cs = compile_scene(CustomSceneBuilder().build_scene())
    uid = np.asarray(cs.mat_uid)
    mt, ms = cs.mat_table, cs.materials
    for field in ("diffuse", "specular", "reflective", "refractive", "ior",
                  "has_tex", "tex_id"):
        np.testing.assert_array_equal(
            np.asarray(getattr(mt, field))[uid], np.asarray(getattr(ms, field))
        )
    for c in "xyz":
        np.testing.assert_array_equal(
            np.asarray(getattr(mt.color, c))[uid], np.asarray(getattr(ms.color, c))
        )
