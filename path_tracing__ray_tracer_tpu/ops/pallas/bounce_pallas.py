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
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    key = key_ref[:]
    # per-lane bounce depth: the ray-regeneration driver mixes lanes at
    # different depths in one batch (models/path_tracer.py)
    depth_u32 = depth_ref[:].astype(jnp.uint32)

    # ---- closest hit with carried attributes -------------------------------
    best_t, best_i, nx, ny, nz, uu, vv = _sweep_prims(
        blob_ref, layout, ox, oy, oz, dx, dy, dz, t_min, t_max, want_attrs=True
    )
    hit = best_i >= 0
    px = ox + dx * best_t
    py = oy + dy * best_t
    pz = oz + dz * best_t

    (mr, mg, mb, diffuse, _spec, reflective, refractive, ior, has_tex, tex_id
     ) = _mat_sweep_select(mat_ref, n_mats, best_i)

    # ---- NEE: uniform light pick + shadow sweep (t_max quirk: 1e6) ----------
    w_nee = jnp.zeros_like(best_t)
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
        # shadow bound: the reference quirk scans to t_max=1e6 (occluders
        # beyond the light still shadow); shadow_light bounds the sweep at
        # the sampled light point (models/path_tracer.py shadow_tmax)
        shadow_bound = dist - 1e-3 if shadow_light else t_max
        _st, occ_i, *_ = _sweep_prims(
            blob_ref, layout, sox, soy, soz, ldx, ldy, ldz, t_min,
            shadow_bound, want_attrs=False,
        )
        lit = occ_i < 0

        cos_t = jnp.maximum(ldx * nx + ldy * ny + ldz * nz, 0.0)
        glass_cls = refractive > 0.5
        mirror_cls = reflective > 0.7
        intensity = jnp.where(glass_cls, 4.0, jnp.where(mirror_cls, 2.5, 2.0))
        mult = jnp.where(glass_cls, 0.6, jnp.where(mirror_cls, 0.8, 1.0))
        w_nee = jnp.where(
            hit & lit, diffuse * cos_t * intensity * mult * float(n_lights), 0.0
        )

    # ---- Russian roulette ----------------------------------------------------
    thx, thy, thz = thx_ref[:], thy_ref[:], thz_ref[:]
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
    tex_ref[:] = jnp.where(has_tex > 0.5, tex_id, -1.0)
    mr_ref[:] = mr
    mg_ref[:] = mg
    mb_ref[:] = mb


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
