"""Fused in-kernel regeneration (``_PIPE_REGEN``) equivalence.

The pipelined scheduler (``ops/pallas/bounce_pallas._path_step_kernel``) runs
the XLA glue of ``_regen_chunk`` — contribution/throughput FMAs, retirement,
item advance, camera-ray regeneration, RNG — inside the bounce megakernel
launch.  Its formulas mirror ``bounce_step`` term for term, but Mosaic and
XLA may contract FMAs differently, so equality is bounded exactly like the
regen-vs-per-sample-loop tests (tests/test_regen.py): tight mean error, a
tiny fraction of borderline-decision flips.

Runs in Pallas interpret mode on CPU (tiny shapes).
"""
import numpy as np
import pytest
import jax.numpy as jnp

import path_tracing__ray_tracer_tpu as ptrt
from path_tracing__ray_tracer_tpu.models import path_tracer as pt
from path_tracing__ray_tracer_tpu.ops import intersect


@pytest.fixture
def interpreted_pallas(monkeypatch):
    from jax.experimental.pallas import tpu as pltpu

    monkeypatch.setattr(intersect, "USE_PALLAS", True)
    with pltpu.force_tpu_interpret_mode():
        yield


def _sums(cs, cam12, pix0, seed, sbase, **kw):
    out = pt._regen_chunk(
        cs, cam12, jnp.int32(pix0), jnp.uint32(seed), jnp.int32(sbase), **kw
    )
    return np.stack(
        [np.asarray(out.x), np.asarray(out.y), np.asarray(out.z)], -1
    )


def _agree(got, want):
    diff = np.abs(got - want)
    assert float(np.mean(diff > 1e-3)) < 0.01, (
        f"{(diff > 1e-3).mean():.4f} of elements differ by >1e-3 "
        f"(max {diff.max():.4f}) — glue bug, not float flips"
    )
    assert float(diff.mean()) < 1e-3, f"mean diff {diff.mean():.2e}"


def test_pipe_matches_xla_glue(cornell, interpreted_pallas, monkeypatch):
    """Phase 1 runs through the fused kernel (_TAIL_QUANT shrunk so the
    256-lane chunk crosses the cutover), phase 2 through the XLA loop."""
    scene, cam = cornell
    cs = ptrt.compile_scene(scene)
    cam12 = ptrt.pack_camera(cam)
    monkeypatch.setattr(pt, "_TAIL_QUANT", 128)
    kw = dict(n_pix=256, width=16, height=16, n_samples=2, max_depth=3,
              jitter="independent")

    monkeypatch.setattr(pt, "_PIPE_REGEN", True)
    got = _sums(cs, cam12, 0, 7, 0, **kw)

    monkeypatch.setattr(pt, "_PIPE_REGEN", False)
    want = _sums(cs, cam12, 0, 7, 0, **kw)
    _agree(got, want)


def test_pipe_tiny_chunk_skips_to_tail(cornell, interpreted_pallas,
                                       monkeypatch):
    """A chunk no wider than the tail runs zero phase-1 iterations; the pipe
    handoff must still give phase 2 fresh depth-0 camera rays."""
    scene, cam = cornell
    cs = ptrt.compile_scene(scene)
    cam12 = ptrt.pack_camera(cam)
    kw = dict(n_pix=256, width=16, height=16, n_samples=2, max_depth=3,
              jitter="independent")

    monkeypatch.setattr(pt, "_PIPE_REGEN", True)
    got = _sums(cs, cam12, 0, 7, 0, **kw)
    monkeypatch.setattr(pt, "_PIPE_REGEN", False)
    want = _sums(cs, cam12, 0, 7, 0, **kw)
    _agree(got, want)


def test_pipe_offsets_and_overhang(cornell, interpreted_pallas, monkeypatch):
    """Nonzero pix0/sample_base, a chunk overhanging the image end (clamped
    lanes), and the diagonal-jitter quirk — all through the fused kernel's
    incremental (ploc, ux, uy) item-advance path."""
    scene, cam = cornell
    cs = ptrt.compile_scene(scene)
    cam12 = ptrt.pack_camera(cam)
    monkeypatch.setattr(pt, "_TAIL_QUANT", 128)
    # total = 300 < pix0 + n_pix = 432: the tail lanes clamp to the last pixel
    kw = dict(n_pix=256, width=20, height=15, n_samples=3, max_depth=4,
              jitter="diagonal")

    monkeypatch.setattr(pt, "_PIPE_REGEN", True)
    got = _sums(cs, cam12, 176, 9, 6, **kw)
    monkeypatch.setattr(pt, "_PIPE_REGEN", False)
    want = _sums(cs, cam12, 176, 9, 6, **kw)
    _agree(got, want)


def test_pipe_deterministic(cornell, interpreted_pallas, monkeypatch):
    scene, cam = cornell
    cs = ptrt.compile_scene(scene)
    cam12 = ptrt.pack_camera(cam)
    monkeypatch.setattr(pt, "_PIPE_REGEN", True)
    monkeypatch.setattr(pt, "_TAIL_QUANT", 128)
    kw = dict(n_pix=256, width=16, height=16, n_samples=2, max_depth=3,
              jitter="independent")
    a = _sums(cs, cam12, 0, 11, 0, **kw)
    b = _sums(cs, cam12, 0, 11, 0, **kw)
    np.testing.assert_array_equal(a, b)
