"""Device-resident multi-chunk accumulation (_render_device_u8): the fused
group loop (one dispatch per chunk) must be bit-identical to the per-group
dispatch path and to the host render_sums route."""
import numpy as np

import path_tracing__ray_tracer_tpu as ptrt
from path_tracing__ray_tracer_tpu.models import wavefront as wf
from path_tracing__ray_tracer_tpu.ops.tonemap import quantize_u8
from path_tracing__ray_tracer_tpu.ops.v3 import V3


def _render_u8(monkeypatch, *, fuse: bool, force_host: bool = False):
    import jax.numpy as jnp

    # force the device-sums path: no lax.map batching even for tiny renders
    monkeypatch.setattr(wf, "_DISPATCH_TARGET_RAYS", 1)
    if not fuse:
        monkeypatch.setattr(wf, "_DEVICE_SUMS_TARGET_RAYS", 0)
    if force_host:
        monkeypatch.setattr(
            wf.WavefrontRenderer, "_render_device_u8", lambda self, *a: None
        )
    b = ptrt.CustomSceneBuilder()
    scene = b.build_scene()
    cam = b.create_camera(4 / 3)
    r = ptrt.RendererFactory.create(
        "tpu_path_raytracer", sample_group=2, chunk_rays=2048
    )
    s = ptrt.RenderSettings(width=64, height=48, samples_per_pixel=4, max_depth=3)
    img = r.render(scene, cam, s)
    return np.asarray(img)


def test_fused_group_loop_matches_per_group(monkeypatch):
    a = _render_u8(monkeypatch, fuse=True)
    b = _render_u8(monkeypatch, fuse=False)
    assert a.shape == (48, 64, 3)
    np.testing.assert_array_equal(a, b)


def test_device_path_matches_host_route(monkeypatch):
    a = _render_u8(monkeypatch, fuse=True)
    c = _render_u8(monkeypatch, fuse=True, force_host=True)
    np.testing.assert_array_equal(a, c)
