"""Renderer smoke, determinism, orientation, capability and quirk tests.

Kept tiny (32×24-ish, low spp/depth) — compile time dominates on the CPU
backend.
"""
import numpy as np
import pytest

import path_tracing__ray_tracer_tpu as ptrt

SMALL = dict(width=32, height=24, samples_per_pixel=4, max_depth=2)

ALL_RENDERERS = [
    "cpu_raytracer",
    "tpu_raytracer",
    "tpu_texture_raytracer",
    "tpu_path_raytracer",
]


@pytest.mark.parametrize("name", ALL_RENDERERS)
def test_smoke_render(name, cornell):
    scene, cam = cornell
    r = ptrt.RendererFactory.create(name)
    img = r.render(scene, cam, ptrt.RenderSettings(**SMALL))
    a = np.asarray(img)
    assert a.shape == (24, 32, 3)
    assert a.dtype == np.uint8
    assert a.mean() > 5.0, "image should not be black"
    assert np.isfinite(a.astype(np.float64)).all()


def test_reference_aliases_resolve():
    for ref, ours in [
        ("cuda_raytracer", "tpu_raytracer"),
        ("cuda_texture_raytracer", "tpu_texture_raytracer"),
        ("cuda_path_raytracer", "tpu_path_raytracer"),
    ]:
        assert ptrt.RendererFactory.create(ref).get_name() == ours
    names = ptrt.RendererFactory.list_available()
    for n in ALL_RENDERERS + ["cuda_raytracer", "cuda_texture_raytracer",
                              "cuda_path_raytracer"]:
        assert n in names


def test_capability_contract():
    r = ptrt.RendererFactory.create("tpu_texture_raytracer")
    for feature in ("ray_tracing", "shadows", "reflection", "refraction", "textures"):
        assert r.supports(feature)
    assert not ptrt.RendererFactory.create("tpu_raytracer").supports("refraction")
    assert ptrt.RendererFactory.create("tpu_path_raytracer").supports(
        "global_illumination"
    )


def test_orientation_left_pink_right_blue(cornell):
    """The final image is flipped to top-down rows; the hot-pink wall must be
    on the left, the blue wall on the right (reference scene layout)."""
    scene, cam = cornell
    r = ptrt.RendererFactory.create("tpu_texture_raytracer")
    a = np.asarray(r.render(scene, cam, ptrt.RenderSettings(**SMALL))).astype(float)
    left = a[8:16, :6]
    right = a[8:16, -6:]
    assert left[..., 0].mean() > left[..., 2].mean(), "left wall should be pink (R>B)"
    assert right[..., 2].mean() > right[..., 0].mean(), "right wall should be blue (B>R)"


def test_deterministic_same_seed(cornell):
    scene, cam = cornell
    s = ptrt.RenderSettings(**SMALL)
    a = np.asarray(ptrt.RendererFactory.create("tpu_path_raytracer", seed=5).render(scene, cam, s))
    b = np.asarray(ptrt.RendererFactory.create("tpu_path_raytracer", seed=5).render(scene, cam, s))
    c = np.asarray(ptrt.RendererFactory.create("tpu_path_raytracer", seed=6).render(scene, cam, s))
    np.testing.assert_array_equal(a, b)
    assert (a != c).any()


def test_reseed_per_render_quirk(cornell):
    """Opt-in parity with the reference's per-render RNG advance
    (``cuda_path_tracer.py:28,739,809``): frame_count reseeds the kernel each
    ``render()``, so back-to-back renders differ.  Default stays off — the
    determinism invariant (two renders identical) is tested above."""
    scene, cam = cornell
    s = ptrt.RenderSettings(**SMALL)
    r = ptrt.RendererFactory.create("tpu_path_raytracer", reseed_per_render=True)
    a = np.asarray(r.render(scene, cam, s))
    b = np.asarray(r.render(scene, cam, s))
    assert (a != b).any(), "reseed_per_render renders should differ"
    # frame 0 of the opted-in renderer equals the default renderer's output
    c = np.asarray(ptrt.RendererFactory.create("tpu_path_raytracer").render(scene, cam, s))
    np.testing.assert_array_equal(a, c)


def test_shadow_tmax_light_mode(cornell):
    """``shadow_tmax="light"`` bounds NEE occlusion at the sampled light;
    relaxing the 1e6 quirk can only *remove* shadowing, so per-pixel radiance
    sums must be >= the quirk mode's (and differ somewhere in the Cornell box,
    where the quirk's beyond-light occluders exist)."""
    scene, cam = cornell
    s = ptrt.RenderSettings(**SMALL)
    ref = ptrt.RendererFactory.create("tpu_path_raytracer", seed=3)
    lit = ptrt.RendererFactory.create("tpu_path_raytracer", seed=3,
                                      shadow_tmax="light")
    sums_ref = np.asarray(ref.render_sums(scene, cam, s))
    sums_lit = np.asarray(lit.render_sums(scene, cam, s))
    assert (sums_lit >= sums_ref - 1e-5).all()
    assert (sums_lit > sums_ref + 1e-5).any()


def test_grid_spp_quirk(cornell):
    """Requesting spp=24 sums only 16 grid samples but divides by 24
    (SURVEY.md §2 quirk 9) → image is ~2/3 the brightness of spp=16."""
    scene, cam = cornell
    r = ptrt.RendererFactory.create("tpu_texture_raytracer")
    m16 = np.asarray(
        r.render(scene, cam, ptrt.RenderSettings(32, 24, 16, 2))
    ).astype(float).mean()
    m24 = np.asarray(
        r.render(scene, cam, ptrt.RenderSettings(32, 24, 24, 2))
    ).astype(float).mean()
    assert abs(m24 / m16 - 2 / 3) < 0.02


def test_chunking_invariance(cornell):
    """Different chunk_rays budgets must produce identical images."""
    scene, cam = cornell
    s = ptrt.RenderSettings(width=40, height=30, samples_per_pixel=4, max_depth=2)
    big = ptrt.RendererFactory.create("tpu_path_raytracer", seed=2, chunk_rays=1 << 20)
    small = ptrt.RendererFactory.create("tpu_path_raytracer", seed=2, chunk_rays=1 << 12)
    a = big.render_array(scene, cam, s)
    b = small.render_array(scene, cam, s)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_fused_render_matches_unfused(cornell):
    """``render()``'s fused one-dispatch u8 path must equal the unfused
    render_array+quantize pipeline exactly, including multi-chunk +
    multi-group shapes."""
    from path_tracing__ray_tracer_tpu.ops.tonemap import quantize_u8
    from path_tracing__ray_tracer_tpu.ops.v3 import V3
    import jax.numpy as jnp

    scene, cam = cornell
    s = ptrt.RenderSettings(width=40, height=30, samples_per_pixel=4, max_depth=2)
    for name in ("tpu_path_raytracer", "tpu_texture_raytracer"):
        # chunk_rays 1<<12 → several pixel chunks; sample_group splits spp
        kw = dict(seed=5, chunk_rays=1 << 12)
        if name == "tpu_path_raytracer":
            kw["sample_group"] = 2
        r = ptrt.RendererFactory.create(name, **kw)
        fused = r._render_fused_u8(scene, cam, s)
        assert fused is not None, "small render should take the fused path"
        img = r.render_array(scene, cam, s)
        ref = np.asarray(quantize_u8(V3.from_array(jnp.asarray(img))).to_array())
        np.testing.assert_array_equal(fused, ref)


def test_progressive_matches_oneshot(cornell, tmp_path):
    from path_tracing__ray_tracer_tpu.parallel.progressive import render_progressive

    scene, cam = cornell
    s = ptrt.RenderSettings(width=32, height=24, samples_per_pixel=8, max_depth=2)

    one = ptrt.RendererFactory.create("tpu_path_raytracer", seed=3, sample_group=4)
    img_one = np.asarray(one.render(scene, cam, s))

    prog = ptrt.RendererFactory.create("tpu_path_raytracer", seed=3, sample_group=4)
    ckpt = str(tmp_path / "acc.npz")
    img_prog = np.asarray(
        render_progressive(prog, scene, cam, s, batch_spp=4, checkpoint_path=ckpt)
    )
    np.testing.assert_array_equal(img_one, img_prog)

    # resume: a fresh renderer continuing from the checkpoint of a partial run
    from path_tracing__ray_tracer_tpu.parallel import progressive as prog_mod

    fp = prog_mod._fingerprint(s, 3)
    sums, done = prog_mod.load_state(ckpt, fp)
    assert done == 8 and sums is not None


def test_progressive_resume_partial(cornell, tmp_path):
    from path_tracing__ray_tracer_tpu.parallel import progressive as prog_mod

    scene, cam = cornell
    s = ptrt.RenderSettings(width=32, height=24, samples_per_pixel=8, max_depth=2)
    r = ptrt.RendererFactory.create("tpu_path_raytracer", seed=3, sample_group=4)
    ckpt = str(tmp_path / "acc.npz")

    # simulate an interrupted run: 4 of 8 spp done, checkpointed
    sums = r.render_sums(scene, cam, s, sample_offset=0, n_samples=4)
    prog_mod.save_state(ckpt, sums, 4, prog_mod._fingerprint(s, 3))

    img_resumed = np.asarray(
        prog_mod.render_progressive(r, scene, cam, s, batch_spp=4, checkpoint_path=ckpt)
    )
    img_oneshot = np.asarray(
        ptrt.RendererFactory.create("tpu_path_raytracer", seed=3, sample_group=4)
        .render(scene, cam, s)
    )
    np.testing.assert_array_equal(img_resumed, img_oneshot)
