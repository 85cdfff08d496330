"""Shared wavefront render driver: chunking, jit caching, image assembly.

The reference launches one CUDA megakernel over a pixel grid
(``cuda_texture_renderer.py:769-773``); the TPU design instead streams the
(pixel × sample) space through a jitted *chunk function* with static shapes:

* pixels are processed in fixed-size chunks (``chunk_rays`` budget), so
  arbitrarily large frames render in bounded device memory;
* samples are split into groups (progressive accumulation comes free);
* every chunk call has identical static shapes → exactly one XLA compilation
  per (scene-shape, settings) pair, reused across chunks, frames and
  progressive batches.

Subclasses provide ``_chunk_fn`` returning per-pixel radiance *sums* over the
group's samples; this driver accumulates into a float32 buffer, then the
subclass finalizes (divide by spp, tonemap) and quantizes.
"""
from __future__ import annotations

import math
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..compiler import CompiledScene, compile_scene, pack_camera, scene_summary
from ..core.camera import Camera
from ..core.scene import RenderSettings, Scene
from ..ops.tonemap import quantize_u8
from ..ops.v3 import V3
from ..utils.image import assemble_image
from ..utils.logging import log_event
from ..utils.profiling import Timer, mrays_per_sec
from .base import BaseRenderer


def pixel_coords(pix0, n_pix: int, width: int, height: int):
    """Flat pixel ids → (x, y measured from the bottom row).  Out-of-frame
    lanes are clamped to the last pixel; the driver discards them on host."""
    idx = pix0 + jnp.arange(n_pix, dtype=jnp.int32)
    total = width * height
    safe = jnp.minimum(idx, total - 1)
    x = (safe % width).astype(jnp.float32)
    y = (safe // width).astype(jnp.float32)
    return idx, x, y


class WavefrontRenderer(BaseRenderer):
    convention = "gpu"
    gpu_parity = True
    progress_label: str = None  # set by slow renderers for per-chunk prints

    def __init__(
        self,
        name: str,
        chunk_rays: int = 1 << 20,
        seed: int = 0,
        jitter: str = "diagonal",  # 'diagonal' (reference quirk) | 'independent' | 'center'
        mesh=None,
        texture_budget: int = 0,  # 0 = reference-exact full-res atlas
        compile_overrides: Optional[dict] = None,  # extra compile_scene kwargs
        device: Optional[str] = None,  # None = session default; "cpu" = host
    ):
        super().__init__(name)
        self.chunk_rays = int(chunk_rays)
        self.seed = int(seed)
        assert jitter in ("diagonal", "independent", "center"), jitter
        self.jitter = jitter
        self.mesh = mesh
        self.texture_budget = int(texture_budget)
        self.compile_overrides = dict(compile_overrides or {})
        self.device = device
        self._scene_cache: Dict[Tuple[int, str, bool], CompiledScene] = {}
        self._jit_cache: Dict[Tuple, Callable] = {}
        # progressive-accumulation hook (reference frame_count analogue,
        # cuda_path_tracer.py:739)
        self.frame_count = 0

    # -- execution placement ---------------------------------------------------
    def _device_scope(self):
        """Context placing this renderer's arrays/compute on an explicit
        backend.  ``device="cpu"`` pins the host CPU (the reference's
        ``cpu_raytracer`` is host-only, ``cpu_renderer.py``; it also avoids
        the remote TPU compile service for a renderer whose workload is
        seconds even on host).  ``None`` keeps the session default."""
        import contextlib

        if self.device is None:
            return contextlib.nullcontext()
        try:
            dev = jax.devices(self.device)[0]
        except Exception:
            return contextlib.nullcontext()  # requested backend absent: degrade
        return jax.default_device(dev)

    # -- scene compilation (cached) -----------------------------------------
    def compiled(self, scene: Scene) -> CompiledScene:
        key = (id(scene), self.convention, self.gpu_parity, self.texture_budget,
               self.device, tuple(sorted(self.compile_overrides.items())))
        if key not in self._scene_cache:
            with self._device_scope():
                cs = compile_scene(
                    scene,
                    convention=self.convention,
                    gpu_parity=self.gpu_parity,
                    texture_budget=self.texture_budget,
                    **self.compile_overrides,
                )
            self._scene_cache[key] = cs
            log_event("scene_compiled", renderer=self.name, **scene_summary(cs))
        return self._scene_cache[key]

    # -- subclass contract ---------------------------------------------------
    def _samples_per_group(self, spp: int) -> int:
        """How many samples one chunk call integrates (whole grid for the
        Whitted grid sampler, bounded groups for the path tracer)."""
        raise NotImplementedError

    def _make_chunk_fn(self, static_key: Tuple) -> Callable:
        """Return jitted ``f(cs, cam12, pix0, seed, sample_base) -> (n_pix, 3)``
        radiance sums for this group's samples."""
        raise NotImplementedError

    def _finalize(self, sums: np.ndarray, spp_total: int, settings: RenderSettings) -> np.ndarray:
        """Radiance sums → display-ready [0,1] float image (pre-quantization)."""
        raise NotImplementedError

    # -- chunk-plan construction (single device or mesh) ----------------------
    def _plan(self, w: int, h: int, spp: int, max_depth: int):
        """Choose chunk geometry and build (or fetch) the chunk callable.

        Returns ``(chunk_fn, n_pix, group)`` where ``chunk_fn`` produces sums
        over ``group`` samples for ``n_pix`` pixels.  With a mesh attached the
        pixel chunk is split over the ``tile`` axis and the sample group over
        the ``sample`` axis (partials psum-reduced) — same compiled kernel per
        device as the single-chip path.
        """
        group = self._samples_per_group(spp)
        n_pix = max(1024, min(w * h, max(1, self.chunk_rays // max(group, 1))))
        n_pix = int(math.ceil(n_pix / 1024) * 1024)

        if self.mesh is None:
            static_key = (n_pix, w, h, spp, max_depth, group, self.jitter)
            if static_key not in self._jit_cache:
                self._jit_cache[static_key] = self._make_chunk_fn(static_key)
            return self._jit_cache[static_key], n_pix, group

        from ..parallel.mesh import mesh_shape
        from ..parallel.sharding import shard_chunk_fn

        tile, samp = mesh_shape(self.mesh)
        local_samples = max(1, -(-group // samp))  # ceil; chunk fns mask overshoot
        n_pix = int(math.ceil(n_pix / (tile * 1024)) * tile * 1024)
        local_pix = n_pix // tile
        cache_key = (local_pix, w, h, spp, max_depth, local_samples,
                     self.jitter, tile, samp)
        if cache_key not in self._jit_cache:
            inner = self._make_chunk_fn(
                (local_pix, w, h, spp, max_depth, local_samples, self.jitter)
            )
            self._jit_cache[cache_key] = jax.jit(
                shard_chunk_fn(inner, self.mesh, local_pix, local_samples)
            )
        return self._jit_cache[cache_key], n_pix, group

    # -- driver ---------------------------------------------------------------
    def render_sums(
        self,
        scene: Scene,
        camera: Camera,
        settings: RenderSettings,
        sample_offset: int = 0,
        n_samples: Optional[int] = None,
    ) -> np.ndarray:
        """Accumulate radiance sums over ``n_samples`` samples starting at
        ``sample_offset`` — the building block for both one-shot and
        progressive rendering.  Returns float32 ``(H*W, 3)`` sums."""
        cs = self.compiled(scene)
        with self._device_scope():
            cam12 = pack_camera(camera)
        w, h, spp = settings.width, settings.height, settings.samples_per_pixel
        if n_samples is None:
            n_samples = spp

        chunk_fn, n_pix, group = self._plan(w, h, spp, settings.max_depth)

        log_event(
            "render_start",
            renderer=self.name,
            width=w,
            height=h,
            spp=n_samples,
            max_depth=settings.max_depth,
            chunk_pixels=n_pix,
            sample_group=group,
            chunks=-(-w * h // n_pix),
        )

        # dispatch every chunk asynchronously, then fetch once: device compute
        # pipelines ahead of the host, and each host sync costs ~30 ms on the
        # tunneled backend
        pending = []
        with self._device_scope():
            for pix0 in range(0, w * h, n_pix):
                chunk_sum = None
                for s0 in range(sample_offset, sample_offset + n_samples, group):
                    out = chunk_fn(
                        cs,
                        cam12,
                        jnp.int32(pix0),
                        jnp.uint32(self.seed),
                        jnp.int32(s0),
                    )
                    chunk_sum = out if chunk_sum is None else jax.tree.map(jnp.add, chunk_sum, out)
                pending.append((pix0, chunk_sum.to_array()))

        sums = np.zeros((w * h, 3), dtype=np.float32)
        n_chunks = len(pending)
        for ci, (pix0, block_dev) in enumerate(pending):
            block = np.asarray(block_dev)  # blocks until this chunk computes
            take = min(n_pix, w * h - pix0)
            sums[pix0 : pix0 + take] += block[:take]
            if self.progress_label and n_chunks > 1:
                # in-flight progress, the analogue of the reference CPU
                # renderer's every-50-rows print (cpu_renderer.py:64-65)
                rows_done = min(h, (pix0 + take) // max(w, 1))
                print(f"{self.progress_label}: {rows_done}/{h} rows")
        return sums

    def render_array(self, scene: Scene, camera: Camera, settings: RenderSettings) -> np.ndarray:
        """Float image in [0,1], shape (H*W, 3), bottom-up row order."""
        sums = self.render_sums(scene, camera, settings)
        return self._finalize(sums, settings.samples_per_pixel, settings)

    def render(self, scene: Scene, camera: Camera, settings: RenderSettings):
        with Timer() as t:
            img = self.render_array(scene, camera, settings)
            rgb = quantize_u8(V3.from_array(jnp.asarray(img)))
            arr = np.asarray(rgb.to_array())
        self.frame_count += 1
        log_event(
            "render_done",
            renderer=self.name,
            seconds=round(t.seconds, 3),
            mrays_per_sec=round(
                mrays_per_sec(
                    settings.width,
                    settings.height,
                    settings.samples_per_pixel,
                    settings.max_depth,
                    t.seconds,
                ),
                2,
            ),
        )
        return assemble_image(arr, settings.width, settings.height)
