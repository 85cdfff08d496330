"""MXU texture gather: one-hot matmuls instead of HBM random gathers.

The path tracer's dominant per-bounce cost is the texel fetch — XLA's HLO
gather runs at ~10 ns/element on this TPU regardless of table size.  For a
budget-limited atlas the whole texture set fits VMEM, and a gather can be
phrased as matrix math the MXU eats:

    rows   = one_hot(texel_idx // 128, R)            # (B, R) bf16
    row_v  = rows @ atlas_channel                     # (B, 128) — MXU
    texel  = Σ_l row_v · one_hot(texel_idx % 128, 128)[l]

Texel values are 0–255 integers, exactly representable in bf16, so the MXU
path is bit-identical to the HLO gather (verified in tests).  Rays stream as
``(1024, 1)`` blocks — Mosaic cannot reshape ``(8, 128)`` registers to a
``(B, 1)`` shape in-kernel, so the lane-major layout is chosen at the call
boundary instead.

Measured outcome on v5e (kept for the record): bit-identical to the HLO
gather, but *slower* at useful budgets — the one-hot matmul does dense
``B·R·128`` work for one nonzero per row (~85 GFLOP per 131K-ray bounce at
R≈870, vs ~1 ms for the gather), so end-to-end throughput dropped 109 → 72
Mrays/s.  Disabled by default (``ENABLED``); it only wins for very small
atlases (R ≲ 200), which degrade the canvas texture too far.  Kept as the
working template for MXU-based gathers should a sparse/packed variant land.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...compiler import CompiledScene
from ..v3 import V3

BLOCK = 1024
MAX_ROWS = 1024  # (R, 128) per channel ×3 ≈ 1.5 MB VMEM at the cap
ENABLED = False  # loses to the HLO gather at useful budgets — see module doc


def atlas_rows(cs: CompiledScene) -> int:
    return -(-int(cs.atlas.shape[0]) // 128)


def fits_mxu_atlas(cs: CompiledScene) -> bool:
    return ENABLED and atlas_rows(cs) <= MAX_ROWS


def pack_mxu_atlas(cs: CompiledScene):
    """Unpack the int32 atlas into three (R, 128) bf16 channel planes."""
    n = int(cs.atlas.shape[0])
    rows = atlas_rows(cs)
    pad = rows * 128 - n
    packed = jnp.pad(cs.atlas, (0, pad))

    def chan(shift):
        return ((packed >> shift) & 0xFF).astype(jnp.bfloat16).reshape(rows, 128)

    return chan(0), chan(8), chan(16)


def _gather_kernel(n_rows: int, r_ref, g_ref, b_ref, idx_ref,
                   or_ref, og_ref, ob_ref):
    idx = idx_ref[:]  # (BLOCK, 1) int32 texel indices (already validated)
    trow = idx // 128
    tlane = idx % 128
    oh = (
        jax.lax.broadcasted_iota(jnp.int32, (BLOCK, n_rows), 1) == trow
    ).astype(jnp.bfloat16)
    lane_oh = (
        jax.lax.broadcasted_iota(jnp.int32, (BLOCK, 128), 1) == tlane
    ).astype(jnp.float32)

    for table, out in ((r_ref, or_ref), (g_ref, og_ref), (b_ref, ob_ref)):
        row_vals = jnp.dot(oh, table[:], preferred_element_type=jnp.float32)
        out[:] = jnp.sum(row_vals * lane_oh, axis=1, keepdims=True)


def mxu_gather_rgb(tables, texel_idx: jnp.ndarray) -> V3:
    """Fetch RGB (in [0,1]) for flat texel indices ``(N,)`` via the MXU."""
    r_tbl, g_tbl, b_tbl = tables
    n_rows = int(r_tbl.shape[0])
    n = texel_idx.shape[0]
    assert n % BLOCK == 0, n
    idx2 = jnp.clip(texel_idx, 0, n_rows * 128 - 1).reshape(n, 1)

    spec_tbl = pl.BlockSpec(memory_space=pltpu.VMEM)
    spec_ray = pl.BlockSpec((BLOCK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((n, 1), jnp.float32)

    r, g, b = pl.pallas_call(
        partial(_gather_kernel, n_rows),
        grid=(n // BLOCK,),
        in_specs=[spec_tbl, spec_tbl, spec_tbl, spec_ray],
        out_specs=[spec_ray] * 3,
        out_shape=[shape] * 3,
    )(r_tbl, g_tbl, b_tbl, idx2)
    inv = jnp.float32(1.0 / 255.0)
    return V3(r.reshape(n) * inv, g.reshape(n) * inv, b.reshape(n) * inv)


def texel_index(cs: CompiledScene, tex_id_f: jnp.ndarray, u: jnp.ndarray,
                v: jnp.ndarray) -> jnp.ndarray:
    """Flat texel index per ray (same mapping as ``ops.texture.sample_atlas``;
    untextured lanes clamp to texture 0, masked by the caller)."""
    textured = tex_id_f >= 0.0
    tid = jnp.clip(
        jnp.where(textured, tex_id_f, 0.0).astype(jnp.int32), 0, cs.n_textures - 1
    )
    w = cs.tex_width[tid]
    h = cs.tex_height[tid]
    off = cs.tex_offset[tid]
    uu = jnp.clip(u, 0.0, 1.0)
    vv = jnp.clip(v, 0.0, 1.0)
    iu = jnp.clip((uu * (w - 1).astype(jnp.float32)).astype(jnp.int32), 0, w - 1)
    iv = jnp.clip(((1.0 - vv) * (h - 1).astype(jnp.float32)).astype(jnp.int32), 0, h - 1)
    return off + iv * w + iu


def resolve_base_color_mxu(cs: CompiledScene, tables, mat_color: V3,
                           tex_id_f: jnp.ndarray, u, v) -> V3:
    idx = texel_index(cs, tex_id_f, u, v)
    rgb = mxu_gather_rgb(tables, idx)
    return V3.where(tex_id_f >= 0.0, rgb, mat_color)


# ---- mip gather (deferred-texture mode) -------------------------------------
#
# The path tracer's deferred-texture mode (models/path_tracer.py) samples
# secondary bounces from the small ``mip_budget`` atlas.  At mip scale the
# one-hot matmul wins back from the HLO gather (which is a flat ~7 ns/lane
# regardless of table size — measured round 2); VMEM stays tiny, so each
# block does three channel dots + mask-reduces.
#
# Exactness note (round-3 bug, fixed): a first cut packed R+256·G+65536·B
# into ONE f32 table value so each block needed a single dot — but the MXU
# rounds its *inputs* to bf16 (8-bit mantissa), so 24-bit packed integers
# were truncated (0x36DF89 → 0x36C000: R destroyed, G corrupted).  Per-
# channel 0–255 tables are bf16-exact, same as ``mxu_gather_rgb`` above.

# measured on v5e (experiments/measure_tex4.py, 131072 lanes): block 2048 is
# the sweet spot; 1024 pays per-block overhead, 4096 stalls on VMEM pressure
MIP_BLOCK = 2048
MIP_MAX_ROWS = 512  # (R, 128) bf16 ×3 channels ≤ 384 KB VMEM
MIP_FORCE_KERNEL = False  # tests: exercise the kernel under interpret mode
MIP_DISABLE_KERNEL = False  # A/B: fall back to the HLO gather on the mip


def mip_rows(cs: CompiledScene) -> int:
    return -(-int(cs.mip_atlas.shape[0]) // 128)


def fits_mip(cs: CompiledScene) -> bool:
    return cs.mip_atlas is not None and mip_rows(cs) <= MIP_MAX_ROWS


def pack_mip_table(cs: CompiledScene):
    """Three (R, 128) bf16 channel planes of the mip atlas (0–255 integers
    are bf16-exact, so the MXU path reproduces the HLO gather bit-for-bit)."""
    n = int(cs.mip_atlas.shape[0])
    rows = mip_rows(cs)
    packed = jnp.pad(cs.mip_atlas, (0, rows * 128 - n))

    def chan(shift):
        return ((packed >> shift) & 0xFF).astype(jnp.bfloat16).reshape(rows, 128)

    return chan(0), chan(8), chan(16)


def _mip_kernel(n_rows: int, block: int, r_ref, g_ref, b_ref, idx_ref,
                or_ref, og_ref, ob_ref):
    idx = idx_ref[:]
    trow = idx // 128
    tlane = idx % 128
    oh = (jax.lax.broadcasted_iota(jnp.int32, (block, n_rows), 1) == trow
          ).astype(jnp.bfloat16)
    lane_oh = (jax.lax.broadcasted_iota(jnp.int32, (block, 128), 1) == tlane
               ).astype(jnp.float32)
    for table, out in ((r_ref, or_ref), (g_ref, og_ref), (b_ref, ob_ref)):
        row_vals = jnp.dot(oh, table[:], preferred_element_type=jnp.float32)
        out[:] = jnp.sum(row_vals * lane_oh, axis=1, keepdims=True)


def mip_gather_rgb(cs: CompiledScene, tables, texel_idx: jnp.ndarray) -> V3:
    """RGB in [0,1] for flat mip texel indices; MXU one-hot kernel on TPU,
    plain XLA gather elsewhere (identical values — exact integer math)."""
    r_tbl, g_tbl, b_tbl = tables
    n_rows = int(r_tbl.shape[0])
    n = texel_idx.shape[0]
    idx = jnp.clip(texel_idx, 0, n_rows * 128 - 1)
    inv = jnp.float32(1.0 / 255.0)

    use_kernel = MIP_FORCE_KERNEL
    try:
        use_kernel = use_kernel or (
            jax.default_backend() == "tpu" and n % 1024 == 0
        )
    except Exception:  # pragma: no cover
        pass
    if MIP_DISABLE_KERNEL:
        use_kernel = False
    if not use_kernel:
        texel = cs.mip_atlas[jnp.clip(idx, 0, int(cs.mip_atlas.shape[0]) - 1)]
        return V3(
            (texel & 0xFF).astype(jnp.float32) * inv,
            ((texel >> 8) & 0xFF).astype(jnp.float32) * inv,
            ((texel >> 16) & 0xFF).astype(jnp.float32) * inv,
        )

    block = MIP_BLOCK
    while n % block:
        block //= 2
    spec_tbl = pl.BlockSpec(memory_space=pltpu.VMEM)
    spec_ray = pl.BlockSpec((block, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((n, 1), jnp.float32)
    r, g, b = pl.pallas_call(
        partial(_mip_kernel, n_rows, block),
        grid=(n // block,),
        in_specs=[spec_tbl, spec_tbl, spec_tbl, spec_ray],
        out_specs=[spec_ray] * 3,
        out_shape=[shape] * 3,
    )(r_tbl, g_tbl, b_tbl, idx.reshape(n, 1))
    return V3(r.reshape(n) * inv, g.reshape(n) * inv, b.reshape(n) * inv)


def mip_texel_index(cs: CompiledScene, tex_id_f: jnp.ndarray, u, v) -> jnp.ndarray:
    """Flat texel index into the MIP atlas (same nearest/V-flip mapping as
    ``ops.texture.sample_atlas``, over the mip tables)."""
    textured = tex_id_f >= 0.0
    tid = jnp.clip(
        jnp.where(textured, tex_id_f, 0.0).astype(jnp.int32), 0, cs.n_textures - 1
    )
    w = cs.mip_width[tid]
    h = cs.mip_height[tid]
    off = cs.mip_offset[tid]
    uu = jnp.clip(u, 0.0, 1.0)
    vv = jnp.clip(v, 0.0, 1.0)
    iu = jnp.clip((uu * (w - 1).astype(jnp.float32)).astype(jnp.int32), 0, w - 1)
    iv = jnp.clip(((1.0 - vv) * (h - 1).astype(jnp.float32)).astype(jnp.int32), 0, h - 1)
    return off + iv * w + iu


def resolve_base_color_mip(cs: CompiledScene, tables, mat_color: V3,
                           tex_id_f: jnp.ndarray, u, v) -> V3:
    idx = mip_texel_index(cs, tex_id_f, u, v)
    rgb = mip_gather_rgb(cs, tables, idx)
    return V3.where(tex_id_f >= 0.0, rgb, mat_color)
