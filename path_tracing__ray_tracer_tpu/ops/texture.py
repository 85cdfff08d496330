"""Vectorized texture-atlas sampling (TPU analogue of ``cuda_sample_texture``,
``cuda_texture_renderer.py:117-143``): nearest-neighbour with V flip, a
single vector gather into the packed-int32 atlas.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..compiler import CompiledScene
from .v3 import V3


def _nearest_index(tex_id, u, v, widths, heights, offsets, n_textures: int):
    """Flat texel index for nearest-neighbour + V-flip sampling
    (``cuda_texture_renderer.py:117-143``) against arbitrary w/h/offset
    tables (full atlas or mip)."""
    tid = jnp.clip(tex_id, 0, n_textures - 1)
    w = widths[tid]
    h = heights[tid]
    off = offsets[tid]
    uu = jnp.clip(u, 0.0, 1.0)
    vv = jnp.clip(v, 0.0, 1.0)
    iu = jnp.clip((uu * (w - 1).astype(jnp.float32)).astype(jnp.int32), 0, w - 1)
    iv = jnp.clip(((1.0 - vv) * (h - 1).astype(jnp.float32)).astype(jnp.int32), 0, h - 1)
    return off + iv * w + iu


def _unpack_rgb(texel: jnp.ndarray) -> V3:
    inv255 = jnp.float32(1.0 / 255.0)
    return V3(
        (texel & 0xFF).astype(jnp.float32) * inv255,
        ((texel >> 8) & 0xFF).astype(jnp.float32) * inv255,
        ((texel >> 16) & 0xFF).astype(jnp.float32) * inv255,
    )


def sample_atlas(cs: CompiledScene, tex_id: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> V3:
    """Sample RGB in [0, 1] for each ray.  ``tex_id < 0`` yields white
    (the reference default, ``cuda_texture_renderer.py:143``); callers mask
    with ``has_tex`` anyway.
    """
    idx = _nearest_index(tex_id, u, v, cs.tex_width, cs.tex_height,
                         cs.tex_offset, cs.n_textures)
    texel = cs.atlas[idx]  # one gather; channels unpacked in registers
    rgb = _unpack_rgb(texel)
    return V3.where(tex_id >= 0, rgb, V3.of(1.0, 1.0, 1.0))


def resolve_base_color(cs: CompiledScene, mat_color: V3, has_tex, tex_id, u, v) -> V3:
    """Texture sample where textured, material color elsewhere
    (``cuda_texture_renderer.py:206-219``)."""
    if cs.any_textured is not None and cs.any_textured.shape[0] == 0:
        # no textured primitive in the scene: ``has_tex`` is all-zero, so
        # the select below is identically ``mat_color`` — skip the atlas
        # gather entirely (flat ~7 ns/lane even on the 1-texel dummy atlas)
        return mat_color
    textured = has_tex > 0.5
    sampled = sample_atlas(cs, jnp.where(textured, tex_id, -1), u, v)
    return V3.where(textured, sampled, mat_color)


def resolve_base_color_lod(cs: CompiledScene, mat_color: V3, tex_id_f,
                           u, v, exact_lane) -> V3:
    """Depth-LOD base-color resolve (path tracer, ``texture_lod`` mode):
    lanes with ``exact_lane`` True sample the reference-exact full-res
    atlas; the rest sample the small ``mip_budget`` atlas.

    The cost asymmetry this exploits (measured round 3, BENCHMARKS.md):
    gathers into the ~70 MB full atlas are HBM-miss bound (~9× the
    per-element cost of a cache-resident table), but the *expensive* part is
    per distinct cache line — so non-exact lanes are pointed at texel 0,
    collapsing their share of the big gather onto one hot line, while the
    remaining exact lanes (camera/first bounces) are screen-coherent and
    share lines.  The mip gather is a flat ~7 ns/lane regardless.
    """
    textured = tex_id_f >= 0.0
    tex_id = jnp.where(textured, tex_id_f, 0.0).astype(jnp.int32)
    idx = _nearest_index(tex_id, u, v, cs.tex_width, cs.tex_height,
                         cs.tex_offset, cs.n_textures)
    take_exact = textured & exact_lane
    rgb_exact = _unpack_rgb(cs.atlas[jnp.where(take_exact, idx, 0)])
    midx = _nearest_index(tex_id, u, v, cs.mip_width, cs.mip_height,
                          cs.mip_offset, cs.n_textures)
    rgb_mip = _unpack_rgb(cs.mip_atlas[jnp.where(textured & ~exact_lane, midx, 0)])
    rgb = V3.where(exact_lane, rgb_exact, rgb_mip)
    return V3.where(textured, rgb, mat_color)
