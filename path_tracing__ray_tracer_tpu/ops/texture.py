"""Vectorized texture-atlas sampling (TPU analogue of ``cuda_sample_texture``,
``cuda_texture_renderer.py:117-143``): nearest-neighbour with V flip, a
single vector gather into the packed-int32 atlas.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..compiler import CompiledScene
from .v3 import V3


def sample_atlas(cs: CompiledScene, tex_id: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> V3:
    """Sample RGB in [0, 1] for each ray.  ``tex_id < 0`` yields white
    (the reference default, ``cuda_texture_renderer.py:143``); callers mask
    with ``has_tex`` anyway.
    """
    tid = jnp.clip(tex_id, 0, cs.n_textures - 1)
    w = cs.tex_width[tid]
    h = cs.tex_height[tid]
    off = cs.tex_offset[tid]

    uu = jnp.clip(u, 0.0, 1.0)
    vv = jnp.clip(v, 0.0, 1.0)
    iu = jnp.clip((uu * (w - 1).astype(jnp.float32)).astype(jnp.int32), 0, w - 1)
    iv = jnp.clip(((1.0 - vv) * (h - 1).astype(jnp.float32)).astype(jnp.int32), 0, h - 1)

    idx = off + iv * w + iu
    texel = cs.atlas[idx]  # one gather; channels unpacked in registers
    inv255 = jnp.float32(1.0 / 255.0)
    rgb = V3(
        (texel & 0xFF).astype(jnp.float32) * inv255,
        ((texel >> 8) & 0xFF).astype(jnp.float32) * inv255,
        ((texel >> 16) & 0xFF).astype(jnp.float32) * inv255,
    )
    return V3.where(tex_id >= 0, rgb, V3.of(1.0, 1.0, 1.0))


def resolve_base_color(cs: CompiledScene, mat_color: V3, has_tex, tex_id, u, v) -> V3:
    """Texture sample where textured, material color elsewhere
    (``cuda_texture_renderer.py:206-219``)."""
    textured = has_tex > 0.5
    sampled = sample_atlas(cs, jnp.where(textured, tex_id, -1), u, v)
    return V3.where(textured, sampled, mat_color)
