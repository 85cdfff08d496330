"""Fused per-bounce Pallas megakernel for the path tracer.

Motivation (measured on v5e): the XLA bounce body materializes its broadcast
candidate matrices and elementwise chains to HBM — ~11.6 KB of traffic per
ray-bounce (cost analysis), ~23 Mrays/s.  This kernel performs the whole
bounce in-core — closest-hit sweep, NEE light pick + shadow sweep, Russian
roulette and the scatter event — reading the ray state once and writing a
compact result record (~50 B/ray each way).

The one thing that cannot live in the kernel is the texture fetch (a random
HBM gather into a ~50 MB atlas; TPU Pallas has no per-lane HBM gather).  The
trick: the base color only ever enters *multiplicatively*, so the kernel
returns shading weights instead of shaded colors:

    radiance  += thr · (w_sky + base · w_nee)
    thr       *= rr_scale · (s_thr + base · t_thr)

and the XLA glue resolves ``base`` (atlas gather or material color) and
applies the two fused multiply-adds.  Physics is identical to
``models/path_tracer.py`` (reference ``cuda_path_tracer.py`` semantics,
quirks included); equivalence is asserted in tests.

Primitive sweeps are unrolled over the SMEM scene blob
(``intersect_pallas.pack_scene_blob``); per-primitive material constants ride
in a second SMEM table and are carried through the sweep with selects, so no
vector gather is ever needed.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...compiler import CompiledScene
from ..v3 import V3
from .intersect_pallas import LANES, ROW_BLOCK, blob_layout, _sweep_prims

# RNG use slots — must match models/path_tracer.py
_U_LIGHT, _U_RR, _U_EVENT, _U_HEMI1, _U_HEMI2 = 0, 1, 2, 3, 4
_P_REFRACT, _P_REFLECT = 0.6, 0.25
_EPS = 1e-3
_SKY = 0.1
_TWO_PI = 6.283185307179586

# material table fields (per global primitive id)
_MAT_FIELDS = 10  # r g b diffuse specular reflective refractive ior has_tex tex_id


def pack_mat_blob(cs: CompiledScene) -> jnp.ndarray:
    m = cs.materials
    parts = [
        m.color.x, m.color.y, m.color.z,
        m.diffuse, m.specular, m.reflective, m.refractive, m.ior,
        m.has_tex, m.tex_id.astype(jnp.float32),
    ]
    return jnp.concatenate(parts)[None, :]


def pack_light_blob(cs: CompiledScene) -> jnp.ndarray:
    return jnp.concatenate([cs.lights.x, cs.lights.y, cs.lights.z])[None, :]


def _hash(h):
    h = (h ^ (h >> jnp.uint32(16))) * jnp.uint32(0x85EBCA6B)
    h = (h ^ (h >> jnp.uint32(13))) * jnp.uint32(0xC2B2AE35)
    return h ^ (h >> jnp.uint32(16))


def _uniform(key, depth_u32, use: int):
    # mirror ops.rng.bits/uniform: two fmix32 rounds over (key, depth, use)
    g_d, g_u = jnp.uint32(0x9E3779B9), jnp.uint32(0x85EBCA6B)
    inc = jnp.uint32(0x9E3779B9)
    h = _hash((key ^ (depth_u32 * g_d)) + inc)
    h = _hash((h + jnp.uint32(use) * g_u) + inc)
    # Mosaic has no uint32→f32 cast; the top-24-bit value fits int32 exactly
    h24 = jax.lax.bitcast_convert_type(h >> jnp.uint32(8), jnp.int32)
    return h24.astype(jnp.float32) * jnp.float32(1.0 / 16777216.0)


def _mat_sweep_select(mat_ref, n_mats: int, best_i):
    """Select the winner's material record via an unrolled pass over the SMEM
    material table (replaces a vector gather)."""
    fields = [jnp.zeros_like(best_i, jnp.float32) for _ in range(_MAT_FIELDS)]
    # ior defaults to 1, tex_id to -1 on miss
    fields[7] = jnp.ones_like(fields[7])
    fields[9] = fields[9] - 1.0
    for i in range(n_mats):
        sel = best_i == i
        for f in range(_MAT_FIELDS):
            fields[f] = jnp.where(sel, mat_ref[0, f * n_mats + i], fields[f])
    return fields


def _shade_scatter(
    n_lights: int, light_ref, t_min: float, t_max: float, shadow_light: bool,
    occl_fn, depth_u32, key, dx, dy, dz, thx, thy, thz,
    hit, best_t, px, py, pz, nx, ny, nz, uu, vv, mats,
):
    """The shading half of a bounce — NEE light pick + shadow query, Russian
    roulette, scatter event — shared by the SMEM-sweep megakernels and the
    whole-bounce BVH megakernel (``bounce_bvh_pallas``), which differ only in
    how they produce the hit record and answer the shadow query.

    ``occl_fn(sox, soy, soz, ldx, ldy, ldz, bound, care) -> occluded`` runs
    the occlusion test; ``care`` marks lanes whose NEE term is nonzero
    regardless of occlusion — walk-based implementations park don't-care
    lanes (their reported occlusion is True, which is unused because
    ``w_nee`` is zero for them; same contract as models/path_tracer.py's
    ``limit = -1`` lanes).

    ``occl_fn=None`` defers the shadow query to the caller: ``w_nee`` is
    returned UNoccluded and the record grows a trailing shadow-query tuple
    ``(sox, soy, soz, ldx, ldy, ldz, limit)`` (limit −1 for don't-care
    lanes); the caller masks ``w_nee`` with its own occlusion answer.  The
    whole-bounce BVH driver uses this to keep the occlusion walk a separate
    launch with its own shadow-ray coherence sort (the fully-fused variant
    measured 18% slower — BENCHMARKS.md round 4)."""
    (mr, mg, mb, diffuse, _spec, reflective, refractive, ior, has_tex, tex_id
     ) = mats

    # ---- NEE: uniform light pick + shadow query (t_max quirk: 1e6) ----------
    w_nee = jnp.zeros_like(best_t)
    shadow_q = None
    if n_lights > 0:
        r_light = _uniform(key, depth_u32, _U_LIGHT)
        li = jnp.minimum((r_light * n_lights).astype(jnp.int32), n_lights - 1)
        lx = jnp.zeros_like(best_t)
        ly = jnp.zeros_like(best_t)
        lz = jnp.zeros_like(best_t)
        for i in range(n_lights):
            sel = li == i
            lx = jnp.where(sel, light_ref[0, 0 * n_lights + i], lx)
            ly = jnp.where(sel, light_ref[0, 1 * n_lights + i], ly)
            lz = jnp.where(sel, light_ref[0, 2 * n_lights + i], lz)
        tlx, tly, tlz = lx - px, ly - py, lz - pz
        dist = jnp.sqrt(tlx * tlx + tly * tly + tlz * tlz)
        inv = 1.0 / jnp.where(dist > 0.001, dist, 1.0)
        ldx, ldy, ldz = tlx * inv, tly * inv, tlz * inv

        sox = px + nx * _EPS
        soy = py + ny * _EPS
        soz = pz + nz * _EPS
        cos_t = jnp.maximum(ldx * nx + ldy * ny + ldz * nz, 0.0)
        care = hit & (cos_t > 0.0) & (diffuse > 0.0)
        # shadow bound: the reference quirk scans to t_max=1e6 (occluders
        # beyond the light still shadow); shadow_light bounds the query at
        # the sampled light point (models/path_tracer.py shadow_tmax)
        shadow_bound = dist - 1e-3 if shadow_light else t_max
        if occl_fn is None:
            lit = jnp.bool_(True)
            limit = jnp.where(
                care,
                jnp.broadcast_to(jnp.asarray(shadow_bound, jnp.float32),
                                 care.shape),
                jnp.float32(-1.0),
            )
            shadow_q = (sox, soy, soz, ldx, ldy, ldz, limit)
        else:
            lit = ~occl_fn(sox, soy, soz, ldx, ldy, ldz, shadow_bound, care)

        glass_cls = refractive > 0.5
        mirror_cls = reflective > 0.7
        intensity = jnp.where(glass_cls, 4.0, jnp.where(mirror_cls, 2.5, 2.0))
        mult = jnp.where(glass_cls, 0.6, jnp.where(mirror_cls, 0.8, 1.0))
        w_nee = jnp.where(
            hit & lit, diffuse * cos_t * intensity * mult * float(n_lights), 0.0
        )

    # ---- Russian roulette ----------------------------------------------------
    luma = 0.299 * thx + 0.587 * thy + 0.114 * thz
    survival = jnp.maximum(0.1, luma)
    rr_on = depth_u32 >= jnp.uint32(3)
    killed = rr_on & (_uniform(key, depth_u32, _U_RR) > survival)
    rr_scale = jnp.where(rr_on & ~killed, 1.0 / survival, 1.0)

    # ---- scatter event --------------------------------------------------------
    choice = _uniform(key, depth_u32, _U_EVENT)
    r1 = _uniform(key, depth_u32, _U_HEMI1)
    r2 = _uniform(key, depth_u32, _U_HEMI2)

    # mirror reflection of d about n
    dn = dx * nx + dy * ny + dz * nz
    rfx = dx - 2.0 * dn * nx
    rfy = dy - 2.0 * dn * ny
    rfz = dz - 2.0 * dn * nz

    # cosine hemisphere about n (reference tangent frame)
    ct = jnp.sqrt(r1)
    st = jnp.sqrt(jnp.maximum(1.0 - r1, 0.0))
    phi = _TWO_PI * r2
    hx_l = st * jnp.cos(phi)
    hy_l = st * jnp.sin(phi)
    steep = jnp.abs(nz) > 0.9
    ntx = jnp.where(steep, 1.0, 0.0)
    ntz = jnp.where(steep, 0.0, 1.0)
    # u = nt × n  (nty == 0)
    ux_ = -ntz * ny
    uy_ = ntz * nx - ntx * nz
    uz_ = ntx * ny
    ul = jnp.sqrt(ux_ * ux_ + uy_ * uy_ + uz_ * uz_)
    inv_ul = 1.0 / jnp.where(ul > 0, ul, 1.0)
    ux_, uy_, uz_ = ux_ * inv_ul, uy_ * inv_ul, uz_ * inv_ul
    vx_ = ny * uz_ - nz * uy_
    vy_ = nz * ux_ - nx * uz_
    vz_ = nx * uy_ - ny * ux_
    hmx = hx_l * ux_ + hy_l * vx_ + ct * nx
    hmy = hx_l * uy_ + hy_l * vy_ + ct * ny
    hmz = hx_l * uz_ + hy_l * vz_ + ct * nz

    # glass refraction (reference entering/eta rules)
    cos_i = jnp.maximum(0.0, -(dx * nx + dy * ny + dz * nz))
    entering = cos_i > 0.0
    eta = jnp.where(entering, 1.0 / ior, ior)
    onx = jnp.where(entering, nx, -nx)
    ony = jnp.where(entering, ny, -ny)
    onz = jnp.where(entering, nz, -nz)
    ci = -(dx * onx + dy * ony + dz * onz)
    sin2 = eta * eta * (1.0 - ci * ci)
    refr_ok = sin2 <= 1.0
    cth = jnp.sqrt(jnp.maximum(1.0 - sin2, 0.0))
    fac = eta * ci - cth
    rx = eta * dx + fac * onx
    ry = eta * dy + fac * ony
    rz = eta * dz + fac * onz

    glass = refractive > 0.1
    mirror = ~glass & (reflective > 0.5)
    ev_refr = glass & (choice < _P_REFRACT)
    ev_refl = glass & ~ev_refr & (choice < _P_REFRACT + _P_REFLECT)
    ev_diff = glass & ~ev_refr & ~ev_refl

    use_hemi = ev_diff | (~glass & ~mirror)
    ndx = jnp.where(ev_refr & refr_ok, rx, jnp.where(use_hemi, hmx, rfx))
    ndy = jnp.where(ev_refr & refr_ok, ry, jnp.where(use_hemi, hmy, rfy))
    ndz = jnp.where(ev_refr & refr_ok, rz, jnp.where(use_hemi, hmz, rfz))

    # origin: refraction offsets −n when entering, +n otherwise (quirk)
    off_in = ev_refr & refr_ok & entering
    nox = jnp.where(off_in, px - nx * _EPS, px + nx * _EPS)
    noy = jnp.where(off_in, py - ny * _EPS, py + ny * _EPS)
    noz = jnp.where(off_in, pz - nz * _EPS, pz + nz * _EPS)

    # throughput multiplier: thr *= (s + base·t)
    s_thr = jnp.where(
        ev_refr,
        jnp.where(refr_ok, refractive * (1.0 / _P_REFRACT), 0.9),
        0.0,
    )
    t_thr = jnp.where(
        ev_refl,
        0.9 / _P_REFLECT,
        jnp.where(
            ev_diff,
            diffuse * (3.0 / (1.0 - _P_REFRACT - _P_REFLECT)),
            jnp.where(mirror, reflective, diffuse),
        ),
    )
    t_thr = jnp.where(ev_refr, 0.0, t_thr)

    rec = (hit, killed, w_nee, rr_scale, s_thr, t_thr,
           nox, noy, noz, ndx, ndy, ndz, uu, vv,
           jnp.where(has_tex > 0.5, tex_id, -1.0), mr, mg, mb)
    if occl_fn is None:
        if shadow_q is None:  # no lights: nothing to occlude
            zero = jnp.zeros_like(best_t)
            shadow_q = (zero, zero, zero, zero, zero, zero, zero - 1.0)
        return rec + shadow_q
    return rec


def _bounce_core(
    layout, n_mats: int, n_lights: int, t_min: float, t_max: float,
    shadow_light: bool, blob_ref, mat_ref, light_ref,
    depth_u32, ox, oy, oz, dx, dy, dz, thx, thy, thz, key,
):
    """The bounce physics shared by the per-bounce megakernel and the fused
    step kernel (``_path_step_kernel``): closest-hit sweep, NEE, Russian
    roulette, scatter event.  Returns the full weight record as values."""
    # ---- closest hit with carried attributes -------------------------------
    best_t, best_i, nx, ny, nz, uu, vv = _sweep_prims(
        blob_ref, layout, ox, oy, oz, dx, dy, dz, t_min, t_max, want_attrs=True
    )
    hit = best_i >= 0
    px = ox + dx * best_t
    py = oy + dy * best_t
    pz = oz + dz * best_t

    mats = _mat_sweep_select(mat_ref, n_mats, best_i)

    def occl_sweep(sox, soy, soz, ldx, ldy, ldz, bound, _care):
        _st, occ_i, *_ = _sweep_prims(
            blob_ref, layout, sox, soy, soz, ldx, ldy, ldz, t_min, bound,
            want_attrs=False,
        )
        return occ_i >= 0

    return _shade_scatter(
        n_lights, light_ref, t_min, t_max, shadow_light, occl_sweep,
        depth_u32, key, dx, dy, dz, thx, thy, thz,
        hit, best_t, px, py, pz, nx, ny, nz, uu, vv, mats,
    )


def _path_bounce_kernel(
    layout, n_mats: int, n_lights: int, t_min: float, t_max: float,
    shadow_light: bool,
    # refs
    blob_ref, mat_ref, light_ref, depth_ref,
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
    thx_ref, thy_ref, thz_ref, key_ref,
    # outputs
    hit_ref, kill_ref, wsky_ref, wnee_ref, rrs_ref, sthr_ref, tthr_ref,
    nox_ref, noy_ref, noz_ref, ndx_ref, ndy_ref, ndz_ref,
    u_ref, v_ref, tex_ref, mr_ref, mg_ref, mb_ref,
):
    # per-lane bounce depth: the ray-regeneration driver mixes lanes at
    # different depths in one batch (models/path_tracer.py)
    (hit, killed, w_nee, rr_scale, s_thr, t_thr,
     nox, noy, noz, ndx, ndy, ndz, uu, vv, tex, mr, mg, mb) = _bounce_core(
        layout, n_mats, n_lights, t_min, t_max, shadow_light,
        blob_ref, mat_ref, light_ref,
        depth_ref[:].astype(jnp.uint32),
        ox_ref[:], oy_ref[:], oz_ref[:],
        dx_ref[:], dy_ref[:], dz_ref[:],
        thx_ref[:], thy_ref[:], thz_ref[:], key_ref[:],
    )

    hit_ref[:] = hit.astype(jnp.float32)
    kill_ref[:] = killed.astype(jnp.float32)
    wsky_ref[:] = jnp.where(hit, 0.0, _SKY)
    wnee_ref[:] = w_nee
    rrs_ref[:] = rr_scale
    sthr_ref[:] = s_thr
    tthr_ref[:] = t_thr
    nox_ref[:] = nox
    noy_ref[:] = noy
    noz_ref[:] = noz
    ndx_ref[:] = ndx
    ndy_ref[:] = ndy
    ndz_ref[:] = ndz
    u_ref[:] = uu
    v_ref[:] = vv
    tex_ref[:] = tex
    mr_ref[:] = mr
    mg_ref[:] = mg
    mb_ref[:] = mb


class StepStatics(NamedTuple):
    """Static (trace-time) parameters of the fused step kernel."""
    layout: object
    n_mats: int
    n_lights: int
    n_tex: int
    tex_on: bool
    t_min: float
    t_max: float
    shadow_light: bool
    jitter: str
    width: int
    height: int
    total: int
    stride: int
    n_pix: int
    ns: int
    max_depth: int


class StepRec(NamedTuple):
    """Per-lane bounce record carried between fused step-kernel calls.

    ``idx`` is the flat atlas texel index of the bounce's hit (−1 when the
    winning primitive is untextured — the in-kernel mirror of
    ``ops.texture._nearest_index``); the XLA loop body gathers
    ``atlas[max(idx, 0)]`` and feeds the packed texel back into the next
    call, which is the ONLY per-iteration XLA compute left.
    """
    idx: jnp.ndarray   # int32 texel index, -1 = untextured
    hit: jnp.ndarray   # f32 0/1
    kill: jnp.ndarray  # f32 0/1
    wnee: jnp.ndarray
    rrs: jnp.ndarray
    sthr: jnp.ndarray
    tthr: jnp.ndarray
    no: V3             # scatter origin
    nd: V3             # scatter direction
    mc: V3             # material color (base fallback)


def pack_tex_blob(cs: CompiledScene) -> jnp.ndarray:
    """Texture tables for the step kernel: (1, 3·T) int32 [widths|heights|offsets]."""
    return jnp.concatenate(
        [cs.tex_width, cs.tex_height, cs.tex_offset]
    ).astype(jnp.int32)[None, :]


def _path_step_kernel(
    st: StepStatics,
    # SMEM refs
    blob_ref, mat_ref, light_ref, tex_ref, cam_ref, scal_ref,
    # VMEM in: previous record
    idxp_ref, texel_ref, hitp_ref, killp_ref, wneep_ref, rrsp_ref,
    sthrp_ref, tthrp_ref,
    pnox_ref, pnoy_ref, pnoz_ref, pndx_ref, pndy_ref, pndz_ref,
    pmr_ref, pmg_ref, pmb_ref,
    # VMEM in: lane state
    thx_ref, thy_ref, thz_ref, psx_ref, psy_ref, psz_ref,
    key_ref, depth_ref, s_ref, ploc_ref, ux_ref, uy_ref,
    # VMEM out: record for the NEXT call
    idx_ref, hit_ref, kill_ref, wnee_ref, rrs_ref, sthr_ref, tthr_ref,
    nox_ref, noy_ref, noz_ref, ndx_ref, ndy_ref, ndz_ref,
    mr_ref, mg_ref, mb_ref,
    # VMEM out: lane state (o/d = the rays THIS call traced, for phase-2 handoff)
    oox_ref, ooy_ref, ooz_ref, odx_ref, ody_ref, odz_ref,
    othx_ref, othy_ref, othz_ref, opsx_ref, opsy_ref, opsz_ref,
    okey_ref, odepth_ref, os_ref, oploc_ref, oux_ref, ouy_ref,
    # VMEM out: accumulator park (item NS-masked, value zero-masked)
    item_ref, pkx_ref, pky_ref, pkz_ref,
):
    """One fused regeneration-scheduler step (models/path_tracer._regen_chunk):

        glue(prev bounce record, its gathered texel)  →  new lane state
        bounce(new rays)                              →  next record

    The glue is the scheduler machinery that used to run as XLA between
    megakernel launches — contribution/throughput FMAs, Russian-roulette /
    cutoff retirement, per-lane (pixel, sample) item advance, camera-ray
    regeneration with the counter-RNG jitter — measured ~0.4 ms of a 1.55 ms
    Cornell bench iteration (BENCHMARKS.md round 3).  Formulas mirror the XLA
    ``bounce_step`` exactly, term for term, for bit-parity.

    Retired lanes (item counter == ns) trace ``prev.no/nd`` garbage rays;
    their contributions are masked by ``active`` exactly as in the XLA loop,
    so the image is unaffected.

    The pixel coordinates of a lane's current item are carried incrementally
    (``ploc/ux/uy``): the item advance is a static stride mod n_pix, so the
    (x, y) update is two static deltas plus one carry/borrow — no integer
    division in-core.
    """
    inc = jnp.uint32(0x9E3779B9)
    g_d, g_u = jnp.uint32(0x9E3779B9), jnp.uint32(0x85EBCA6B)

    pix0 = scal_ref[0, 0]
    seed_u32 = scal_ref[0, 1].astype(jnp.uint32)
    sbase = scal_ref[0, 2]

    # ---- glue: resolve prev base color, accumulate, retire, regenerate ------
    thx, thy, thz = thx_ref[:], thy_ref[:], thz_ref[:]
    psx, psy, psz = psx_ref[:], psy_ref[:], psz_ref[:]
    key = key_ref[:]
    depth = depth_ref[:]
    s = s_ref[:]
    ploc = ploc_ref[:]
    ux, uy = ux_ref[:], uy_ref[:]

    idxp = idxp_ref[:]
    texel = texel_ref[:]
    hitb = hitp_ref[:] > 0.5
    notkill = killp_ref[:] <= 0.5
    wnee = wneep_ref[:]
    rrs = rrsp_ref[:]
    sthr = sthrp_ref[:]
    tthr = tthrp_ref[:]

    wsky = jnp.where(hitb, 0.0, jnp.float32(_SKY))
    textured = idxp >= 0
    inv255 = jnp.float32(1.0 / 255.0)
    br = jnp.where(textured, (texel & 0xFF).astype(jnp.float32) * inv255, pmr_ref[:])
    bg = jnp.where(
        textured, ((texel >> 8) & 0xFF).astype(jnp.float32) * inv255, pmg_ref[:]
    )
    bb = jnp.where(
        textured, ((texel >> 16) & 0xFF).astype(jnp.float32) * inv255, pmb_ref[:]
    )

    active = s < st.ns
    cax = jnp.where(active, thx * wsky + thx * (br * wnee), 0.0)
    cay = jnp.where(active, thy * wsky + thy * (bg * wnee), 0.0)
    caz = jnp.where(active, thz * wsky + thz * (bb * wnee), 0.0)
    psx = psx + cax
    psy = psy + cay
    psz = psz + caz

    live = active & hitb & notkill
    tnx = thx * rrs * (br * tthr + sthr)
    tny = thy * rrs * (bg * tthr + sthr)
    tnz = thz * rrs * (bb * tthr + sthr)
    thx = jnp.where(live, tnx, thx)
    thy = jnp.where(live, tny, thy)
    thz = jnp.where(live, tnz, thz)
    maxc = jnp.maximum(thx, jnp.maximum(thy, thz))
    live = live & (maxc >= 0.001)
    ndepth = depth + 1
    live = live & (ndepth < st.max_depth)
    done = active & ~live

    # item advance: ploc += stride (mod n_pix), coords by static deltas
    s2 = s + done.astype(jnp.int32)
    s_dx = st.stride % st.width
    s_dy = st.stride // st.width
    back = st.n_pix - st.stride  # wrap step is −back
    w_dx = back % st.width
    w_dy = back // st.width
    pl2 = ploc + jnp.int32(st.stride)
    wrapm = pl2 >= st.n_pix
    pl2 = jnp.where(wrapm, pl2 - st.n_pix, pl2)
    ax = jnp.where(wrapm, ux - w_dx, ux + s_dx)
    ay = jnp.where(wrapm, uy - w_dy, uy + s_dy)
    ay = jnp.where(ax >= st.width, ay + 1, jnp.where(ax < 0, ay - 1, ay))
    ax = jnp.where(ax >= st.width, ax - st.width,
                   jnp.where(ax < 0, ax + st.width, ax))
    ploc = jnp.where(done, pl2, ploc)
    ux = jnp.where(done, ax, ux)
    uy = jnp.where(done, ay, uy)

    # camera ray + RNG key for the (possibly) regenerated item — mirrors
    # models/path_tracer.make_ray (ray_key uses the UNclamped pixel index,
    # the jitter coords the total-clamped one — reference quirk order)
    idxg = pix0 + ploc
    k1 = _hash((idxg.astype(jnp.uint32) ^ (seed_u32 * g_d)) + inc)
    keyn = _hash((k1 + (sbase + s2).astype(jnp.uint32) * g_u) + inc)
    md_u32 = jnp.uint32(st.max_depth)
    if st.jitter == "center":
        r1 = jnp.float32(0.5)
        r2 = r1
    else:
        r1 = _uniform(keyn, md_u32, _U_JITX_K)
        r2 = r1 if st.jitter == "diagonal" else _uniform(keyn, md_u32, _U_JITY_K)
    over = idxg > jnp.int32(st.total - 1)
    last_x = jnp.float32((st.total - 1) % st.width)
    last_y = jnp.float32((st.total - 1) // st.width)
    xs = jnp.where(over, last_x, ux.astype(jnp.float32))
    ys = jnp.where(over, last_y, uy.astype(jnp.float32))
    su = (xs + r1) / jnp.float32(st.width)
    sv = (ys + r2) / jnp.float32(st.height)
    cox, coy, coz = cam_ref[0, 0], cam_ref[0, 1], cam_ref[0, 2]
    gdx = cam_ref[0, 3] + cam_ref[0, 6] * su + cam_ref[0, 9] * sv - cox
    gdy = cam_ref[0, 4] + cam_ref[0, 7] * su + cam_ref[0, 10] * sv - coy
    gdz = cam_ref[0, 5] + cam_ref[0, 8] * su + cam_ref[0, 11] * sv - coz
    n2 = gdx * gdx + gdy * gdy + gdz * gdz
    nn = jnp.sqrt(n2)
    pos = nn > 0.0
    invn = 1.0 / jnp.where(pos, nn, 1.0)
    cdx = jnp.where(pos, gdx * invn, 0.0)
    cdy = jnp.where(pos, gdy * invn, 0.0)
    cdz = jnp.where(pos, gdz * invn, 0.0)

    regen = done & (s2 < st.ns)
    # retired lanes keep tracing prev.no/nd (masked; see docstring)
    ox = jnp.where(regen, cox, pnox_ref[:])
    oy = jnp.where(regen, coy, pnoy_ref[:])
    oz = jnp.where(regen, coz, pnoz_ref[:])
    dx = jnp.where(regen, cdx, pndx_ref[:])
    dy = jnp.where(regen, cdy, pndy_ref[:])
    dz = jnp.where(regen, cdz, pndz_ref[:])
    thx = jnp.where(regen, 1.0, thx)
    thy = jnp.where(regen, 1.0, thy)
    thz = jnp.where(regen, 1.0, thz)
    key = jnp.where(regen, keyn, key)
    depth2 = jnp.where(live, ndepth, 0)

    # accumulator park: a finishing lane hands (item, path sum) to the XLA
    # slot fold; item ns == "no park" sentinel (matches bounce_step)
    item_ref[:] = jnp.where(done, s, st.ns)
    pkx_ref[:] = jnp.where(done, psx, 0.0)
    pky_ref[:] = jnp.where(done, psy, 0.0)
    pkz_ref[:] = jnp.where(done, psz, 0.0)
    psx = jnp.where(done, 0.0, psx)
    psy = jnp.where(done, 0.0, psy)
    psz = jnp.where(done, 0.0, psz)

    oox_ref[:] = ox
    ooy_ref[:] = oy
    ooz_ref[:] = oz
    odx_ref[:] = dx
    ody_ref[:] = dy
    odz_ref[:] = dz
    othx_ref[:] = thx
    othy_ref[:] = thy
    othz_ref[:] = thz
    opsx_ref[:] = psx
    opsy_ref[:] = psy
    opsz_ref[:] = psz
    okey_ref[:] = key
    odepth_ref[:] = depth2
    os_ref[:] = s2
    oploc_ref[:] = ploc
    oux_ref[:] = ux
    ouy_ref[:] = uy

    # ---- bounce the new rays -------------------------------------------------
    (hit, killed, w_nee, rr_scale, s_thr, t_thr,
     nox, noy, noz, ndx, ndy, ndz, uu, vv, tex, mr, mg, mb) = _bounce_core(
        st.layout, st.n_mats, st.n_lights, st.t_min, st.t_max, st.shadow_light,
        blob_ref, mat_ref, light_ref,
        depth2.astype(jnp.uint32), ox, oy, oz, dx, dy, dz,
        thx, thy, thz, key,
    )

    # in-kernel texel index (mirror of ops.texture._nearest_index)
    if st.tex_on and st.n_tex > 0:
        T = st.n_tex
        tid = jnp.clip(tex.astype(jnp.int32), 0, T - 1)
        wsel = jnp.zeros_like(tid)
        hsel = jnp.zeros_like(tid)
        osel = jnp.zeros_like(tid)
        for i in range(T):
            m = tid == i
            wsel = jnp.where(m, tex_ref[0, 0 * T + i], wsel)
            hsel = jnp.where(m, tex_ref[0, 1 * T + i], hsel)
            osel = jnp.where(m, tex_ref[0, 2 * T + i], osel)
        uuc = jnp.clip(uu, 0.0, 1.0)
        vvc = jnp.clip(vv, 0.0, 1.0)
        iu = jnp.clip((uuc * (wsel - 1).astype(jnp.float32)).astype(jnp.int32),
                      0, wsel - 1)
        iv = jnp.clip(
            ((1.0 - vvc) * (hsel - 1).astype(jnp.float32)).astype(jnp.int32),
            0, hsel - 1,
        )
        idx_ref[:] = jnp.where(tex >= 0.0, osel + iv * wsel + iu, -1)
    else:
        idx_ref[:] = jnp.zeros_like(s) - 1

    hit_ref[:] = hit.astype(jnp.float32)
    kill_ref[:] = killed.astype(jnp.float32)
    wnee_ref[:] = w_nee
    rrs_ref[:] = rr_scale
    sthr_ref[:] = s_thr
    tthr_ref[:] = t_thr
    nox_ref[:] = nox
    noy_ref[:] = noy
    noz_ref[:] = noz
    ndx_ref[:] = ndx
    ndy_ref[:] = ndy
    ndz_ref[:] = ndz
    mr_ref[:] = mr
    mg_ref[:] = mg
    mb_ref[:] = mb


# jitter RNG slots (match models/path_tracer._U_JITX/_U_JITY)
_U_JITX_K, _U_JITY_K = 0, 1


def path_step_pallas(
    statics: StepStatics, blob, mat_blob, light_blob, tex_blob, cam_smem, scal,
    rec: StepRec, texel, thr: V3, psum: V3, key, depth, s, ploc, ux, uy,
):
    """One fused scheduler step (see ``_path_step_kernel``).  Returns
    ``(rec', o, d, thr', psum', key', depth', s', ploc', ux', uy',
    item, park)`` — ``o/d`` are the rays this call traced (phase-2 handoff),
    ``item``/``park`` feed the XLA slot fold."""
    n = thr.x.shape[0]
    rows = n // LANES

    spec = pl.BlockSpec((ROW_BLOCK, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    f32 = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
    i32 = jax.ShapeDtypeStruct((rows, LANES), jnp.int32)
    u32 = jax.ShapeDtypeStruct((rows, LANES), jnp.uint32)

    def r2(a):
        return a.reshape(rows, LANES)

    outs = pl.pallas_call(
        partial(_path_step_kernel, statics),
        grid=(pl.cdiv(rows, ROW_BLOCK),),
        in_specs=[smem] * 6 + [spec] * 29,
        out_specs=[spec] * 38,
        out_shape=(
            # record': idx + 6 weights + no/nd/mc
            [i32] + [f32] * 15
            # state': o d thr psum (12 f32) + key depth s ploc ux uy
            + [f32] * 12 + [u32] + [i32] * 5
            # park
            + [i32] + [f32] * 3
        ),
    )(
        blob, mat_blob, light_blob, tex_blob, cam_smem, scal,
        r2(rec.idx), r2(texel), r2(rec.hit), r2(rec.kill), r2(rec.wnee),
        r2(rec.rrs), r2(rec.sthr), r2(rec.tthr),
        r2(rec.no.x), r2(rec.no.y), r2(rec.no.z),
        r2(rec.nd.x), r2(rec.nd.y), r2(rec.nd.z),
        r2(rec.mc.x), r2(rec.mc.y), r2(rec.mc.z),
        r2(thr.x), r2(thr.y), r2(thr.z), r2(psum.x), r2(psum.y), r2(psum.z),
        r2(key), r2(depth), r2(s), r2(ploc), r2(ux), r2(uy),
    )
    o = [a.reshape(n) for a in outs]
    (idx, hit, kill, wnee, rrs, sthr, tthr,
     nox, noy, noz, ndx, ndy, ndz, mr, mg, mb,
     oox, ooy, ooz, odx, ody, odz, othx, othy, othz, opsx, opsy, opsz,
     okey, odep, os_, opl, oux, ouy, item, pkx, pky, pkz) = o
    rec2 = StepRec(
        idx=idx, hit=hit, kill=kill, wnee=wnee, rrs=rrs, sthr=sthr, tthr=tthr,
        no=V3(nox, noy, noz), nd=V3(ndx, ndy, ndz), mc=V3(mr, mg, mb),
    )
    return (rec2, V3(oox, ooy, ooz), V3(odx, ody, odz),
            V3(othx, othy, othz), V3(opsx, opsy, opsz),
            okey, odep, os_, opl, oux, ouy, item, V3(pkx, pky, pkz))


class BounceOut(NamedTuple):
    hit: jnp.ndarray
    killed: jnp.ndarray
    w_sky: jnp.ndarray
    w_nee: jnp.ndarray
    rr_scale: jnp.ndarray
    s_thr: jnp.ndarray
    t_thr: jnp.ndarray
    new_org: V3
    new_dir: V3
    u: jnp.ndarray
    v: jnp.ndarray
    tex_id: jnp.ndarray  # float; < 0 when untextured
    mat_color: V3


def path_bounce_pallas(
    cs: CompiledScene, blob, mat_blob, light_blob, ro: V3, rd: V3, thr: V3,
    key, depth, t_min=1e-3, t_max=1e6, shadow_light: bool = False,
) -> BounceOut:
    layout = blob_layout(cs)
    n = ro.x.shape[0]
    rows = n // LANES
    n_mats = int(cs.materials.diffuse.shape[0])

    spec = pl.BlockSpec((ROW_BLOCK, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    shape = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)

    def rows2(a):
        return a.reshape(rows, LANES)

    # depth is per-lane (regeneration mixes depths); scalars broadcast
    depth_arr = rows2(jnp.broadcast_to(jnp.asarray(depth, jnp.int32), (n,)))

    ispec = pl.BlockSpec((ROW_BLOCK, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        partial(
            _path_bounce_kernel, layout, n_mats, cs.n_lights, float(t_min),
            float(t_max), bool(shadow_light),
        ),
        grid=(pl.cdiv(rows, ROW_BLOCK),),
        in_specs=[smem, smem, smem, ispec] + [spec] * 10,
        out_specs=[spec] * 19,
        out_shape=[shape] * 19,
    )(
        blob, mat_blob, light_blob, depth_arr,
        rows2(ro.x), rows2(ro.y), rows2(ro.z),
        rows2(rd.x), rows2(rd.y), rows2(rd.z),
        rows2(thr.x), rows2(thr.y), rows2(thr.z),
        key.reshape(rows, LANES),
    )
    (hit, kill, wsky, wnee, rrs, sthr, tthr,
     nox, noy, noz, ndx, ndy, ndz, u, v, tex, mr, mg, mb) = (
        o.reshape(n) for o in outs
    )
    return BounceOut(
        hit=hit > 0.5,
        killed=kill > 0.5,
        w_sky=wsky,
        w_nee=wnee,
        rr_scale=rrs,
        s_thr=sthr,
        t_thr=tthr,
        new_org=V3(nox, noy, noz),
        new_dir=V3(ndx, ndy, ndz),
        u=u,
        v=v,
        tex_id=tex,
        mat_color=V3(mr, mg, mb),
    )
