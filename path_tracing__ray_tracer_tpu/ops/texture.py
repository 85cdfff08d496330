"""Vectorized texture-atlas sampling (TPU analogue of ``cuda_sample_texture``,
``cuda_texture_renderer.py:117-143``): nearest-neighbour with V flip, a
single vector gather into the packed-int32 atlas.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..compiler import CompiledScene
from .select_table import SELECT_LIMIT, take_rows
from .v3 import V3

# Compacted per-bounce gather — built, bit-exact, and a MEASURED LOSS; kept
# gated off as the fourth recorded negative on the texture-gather front
# (after defer/LOD/MXU-mip — BENCHMARKS.md).  Idea: only the textured-hit
# lanes (12–21% on the Cornell bench scene, experiments/measure_texfrac.py)
# need a texel, so stable-sort them to the front, gather ONE static prefix
# of N/TEX_COMPACT_DIV elements, and index-sort the texels back; a lax.cond
# falls back to the full-width gather when the count overflows the prefix
# (bit-identical either way).  Measured at the honest bench config
# (experiments/measure_compact.py, 1024² d8 group 64 budget 0):
# off 206.2/207.9 Mrays/s, DIV=4 190.1, DIV=8 142.7 — the two 8M-lane
# stable sorts cost more than the ~0.92 ms gather they save, and the
# lax.cond splits the fused loop body.  Same flat-floor story as the other
# schemes: gather width is not the knob this backend rewards.
TEX_COMPACT = False
TEX_COMPACT_DIV = 4
# below this lane count the full gather is already cheap and the sort
# bookkeeping would dominate; also keeps tiny CPU-test batches on the
# simple path (the compact path is covered by its own equivalence test)
_COMPACT_MIN_LANES = 8192


def _nearest_index(tex_id, u, v, widths, heights, offsets, n_textures: int):
    """Flat texel index for nearest-neighbour + V-flip sampling
    (``cuda_texture_renderer.py:117-143``) against arbitrary w/h/offset
    tables (full atlas or mip)."""
    tid = jnp.clip(tex_id, 0, n_textures - 1)
    if n_textures <= SELECT_LIMIT:
        # gather-free row pick from the tiny info table (bit-exact; HLO
        # gathers cost a flat ~7 ns/lane however small the table is)
        w, h, off = take_rows(tid, (widths, heights, offsets))
    else:
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


def _gather_texels_compact(cs: CompiledScene, textured, idx) -> jnp.ndarray:
    """Packed-int32 texels for the ``textured`` lanes (others: texel 0) via
    the compacted static-prefix gather (module note at ``TEX_COMPACT``).
    Exact: a ``lax.cond`` falls back to the full-width gather whenever the
    textured count overflows the prefix."""
    n = int(idx.shape[0])
    cap = -(-n // TEX_COMPACT_DIV)
    iota = jnp.arange(n, dtype=jnp.int32)
    # textured lanes first; stable, so their (coherent) lane order survives
    key = 1 - textured.astype(jnp.int32)
    _k, s_idx, s_iota = jax.lax.sort([key, idx, iota], num_keys=1, is_stable=True)
    cnt = jnp.sum(textured.astype(jnp.int32))

    def small(_):
        part = cs.atlas[s_idx[:cap]]
        tex_sorted = jnp.concatenate(
            [part, jnp.zeros((n - cap,), cs.atlas.dtype)]
        )
        _i, tex = jax.lax.sort([s_iota, tex_sorted], num_keys=1, is_stable=True)
        return tex

    def big(_):
        return cs.atlas[idx]

    return jax.lax.cond(cnt <= cap, small, big, None)


def resolve_base_color(cs: CompiledScene, mat_color: V3, has_tex, tex_id, u, v) -> V3:
    """Texture sample where textured, material color elsewhere
    (``cuda_texture_renderer.py:206-219``)."""
    if cs.any_textured is not None and cs.any_textured.shape[0] == 0:
        # no textured primitive in the scene: ``has_tex`` is all-zero, so
        # the select below is identically ``mat_color`` — skip the atlas
        # gather entirely (flat ~7 ns/lane even on the 1-texel dummy atlas)
        return mat_color
    textured = has_tex > 0.5
    if TEX_COMPACT and textured.ndim == 1 and int(textured.shape[0]) >= _COMPACT_MIN_LANES:
        idx = _nearest_index(tex_id, u, v, cs.tex_width, cs.tex_height,
                             cs.tex_offset, cs.n_textures)
        # untextured lanes point at texel 0: they are masked below, and one
        # hot index keeps them off random atlas cache lines in the fallback
        idx = jnp.where(textured, idx, 0)
        rgb = _unpack_rgb(_gather_texels_compact(cs, textured, idx))
        return V3.where(textured, rgb, mat_color)
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
