"""Fused per-bounce Pallas megakernel for the Whitted renderers.

One kernel per bounce: closest-hit sweep, the full area-light loop (16
shadow sweeps with per-ray ``t_max = dist − 1e-3``), Lambert/Phong shading
and the reflect/refract continuation — everything except the texture fetch.
As with the path kernel, the base color enters multiplicatively only:

    color += atten · energy · (base · A + W)

where ``A`` collects the base-proportional terms (0.4 ambient, Lambert,
metal-tinted specular) and ``W`` the white specular terms, with the
``max(0.1, 1−kr−kt)`` energy factor folded in.  Unlike the path tracer the
carried attenuation is a *scalar* per ray (the reference multiplies by
``mat_reflective``/``mat_refractive·0.95`` only), so the texture gather sits
entirely off the loop-carried critical path.

Physics constants mirror ``models/whitted.py`` (reference
``cuda_renderer.py`` / ``cuda_texture_renderer.py``), quirks included; the
two variants differ by the same static switches.
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
from .bounce_pallas import _mat_sweep_select

_EPS = 1e-3


def _whitted_bounce_kernel(
    layout, n_mats: int, n_lights: int, t_min: float, t_max: float,
    # static physics switches (see models/whitted.WhittedVariant)
    textured: bool, refraction: bool, falloff_scale: float,
    diffuse_gain: float, spec_table: bool, base_floor: bool,
    # refs
    blob_ref, mat_ref, light_ref, depth_ref,
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
    # outputs
    hit_ref, a_ref, w_ref, cont_ref, mult_ref,
    nox_ref, noy_ref, noz_ref, ndx_ref, ndy_ref, ndz_ref,
    u_ref, v_ref, tex_ref, mr_ref, mg_ref, mb_ref,
):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    depth = depth_ref[0, 0]

    best_t, best_i, nx, ny, nz, uu, vv = _sweep_prims(
        blob_ref, layout, ox, oy, oz, dx, dy, dz, t_min, t_max, want_attrs=True
    )
    hit = best_i >= 0
    px = ox + dx * best_t
    py = oy + dy * best_t
    pz = oz + dz * best_t

    (mr, mg, mb, diffuse, specular, reflective, refractive, ior, has_tex,
     tex_id) = _mat_sweep_select(mat_ref, n_mats, best_i)

    # ---- ambient + area-light loop (cuda_texture_renderer.py:221-334) -------
    a_acc = jnp.full_like(best_t, 0.4)  # hard-coded GPU ambient
    w_acc = jnp.zeros_like(best_t)

    sox = px + nx * _EPS
    soy = py + ny * _EPS
    soz = pz + nz * _EPS
    inv_l = 1.0 / max(n_lights, 1)

    for i in range(n_lights):
        lx = light_ref[0, 0 * n_lights + i]
        ly = light_ref[0, 1 * n_lights + i]
        lz = light_ref[0, 2 * n_lights + i]
        tlx, tly, tlz = lx - px, ly - py, lz - pz
        dist = jnp.sqrt(tlx * tlx + tly * tly + tlz * tlz)
        near_ok = dist > 0.001
        inv_d = 1.0 / jnp.where(near_ok, dist, 1.0)
        ldx, ldy, ldz = tlx * inv_d, tly * inv_d, tlz * inv_d

        _st, occ_i, *_ = _sweep_prims(
            blob_ref, layout, sox, soy, soz, ldx, ldy, ldz, t_min,
            dist - 0.001, want_attrs=False,
        )
        lit = near_ok & (occ_i < 0)

        diff = jnp.maximum(nx * ldx + ny * ldy + nz * ldz, 0.0)
        atten = falloff_scale / (1.0 + 0.001 * dist + 0.0001 * dist * dist)
        a_acc = a_acc + jnp.where(
            lit, diff * atten * inv_l * diffuse * diffuse_gain, 0.0
        )

        # Phong: R = 2(N·L)N − L against the view vector (−d)
        dot_nl = nx * ldx + ny * ldy + nz * ldz
        rx = 2.0 * dot_nl * nx - ldx
        ry = 2.0 * dot_nl * ny - ldy
        rz = 2.0 * dot_nl * nz - ldz
        dot_rv = jnp.maximum(-(rx * dx + ry * dy + rz * dz), 0.0)

        if spec_table:
            chrome = (reflective > 0.9) & (specular > 0.9)
            metal = reflective > 0.7
            glossy = specular > 0.5
            shininess = jnp.where(
                chrome, 256.0, jnp.where(metal, 128.0, jnp.where(glossy, 64.0, 32.0))
            )
            multiplier = jnp.where(chrome, 1.5, jnp.where(metal, 1.2, 1.0))
            gate = (specular > 0.01) & (diff > 0.0) & lit
            spec_int = jnp.where(
                gate, jnp.power(dot_rv, shininess) * atten * multiplier * inv_l, 0.0
            ) * specular
            a_acc = a_acc + jnp.where(metal, spec_int, 0.0)  # tinted by base
            w_acc = w_acc + jnp.where(metal, 0.0, spec_int)  # white highlight
        else:
            gate = (specular > 0.01) & lit
            w_acc = w_acc + jnp.where(
                gate, jnp.power(dot_rv, 32.0) * specular * atten * inv_l, 0.0
            )

    # ---- energy factor + continuation (cuda_texture_renderer.py:336-423) ----
    if base_floor:
        energy = jnp.maximum(0.1, 1.0 - reflective - refractive)
    else:
        energy = 1.0 - reflective
    a_acc = a_acc * energy
    w_acc = w_acc * energy

    dn = dx * nx + dy * ny + dz * nz
    rfx = dx - 2.0 * dn * nx
    rfy = dy - 2.0 * dn * ny
    rfz = dz - 2.0 * dn * nz

    if refraction:
        want = (reflective > 0.01) | (refractive > 0.01)
        use_refr = (refractive > reflective) & (refractive > 0.1)
        inside = dn > 0.0
        onx = jnp.where(inside, -nx, nx)
        ony = jnp.where(inside, -ny, ny)
        onz = jnp.where(inside, -nz, nz)
        eta = jnp.where(inside, ior, 1.0 / ior)
        ci = -(dx * onx + dy * ony + dz * onz)
        sin2 = eta * eta * (1.0 - ci * ci)
        refr_ok = sin2 <= 1.0
        cth = jnp.sqrt(jnp.maximum(1.0 - sin2, 0.0))
        fac = eta * ci - cth
        rx2 = eta * dx + fac * onx
        ry2 = eta * dy + fac * ony
        rz2 = eta * dz + fac * onz
        take_refr = use_refr & refr_ok
        ndx = jnp.where(take_refr, rx2, rfx)
        ndy = jnp.where(take_refr, ry2, rfy)
        ndz = jnp.where(take_refr, rz2, rfz)
        # refraction offsets along +n when exiting, −n when entering (quirk)
        off_sign = jnp.where(take_refr, jnp.where(inside, 1.0, -1.0), 1.0)
        nox = px + nx * (_EPS * off_sign)
        noy = py + ny * (_EPS * off_sign)
        noz = pz + nz * (_EPS * off_sign)
        mult = jnp.where(take_refr, refractive * 0.95, reflective)
    else:
        want = reflective > 0.01
        ndx, ndy, ndz = rfx, rfy, rfz
        nox = px + nx * _EPS
        noy = py + ny * _EPS
        noz = pz + nz * _EPS
        mult = reflective

    hit_ref[:] = hit.astype(jnp.float32)
    a_ref[:] = a_acc
    w_ref[:] = w_acc
    cont_ref[:] = (hit & want).astype(jnp.float32)
    mult_ref[:] = mult
    nox_ref[:] = nox
    noy_ref[:] = noy
    noz_ref[:] = noz
    ndx_ref[:] = ndx
    ndy_ref[:] = ndy
    ndz_ref[:] = ndz
    u_ref[:] = uu
    v_ref[:] = vv
    tex_ref[:] = jnp.where((has_tex > 0.5) if textured else (has_tex < -1.0),
                           tex_id, -1.0)
    mr_ref[:] = mr
    mg_ref[:] = mg
    mb_ref[:] = mb
    del depth


class WhittedBounceOut(NamedTuple):
    hit: jnp.ndarray
    a: jnp.ndarray  # base-proportional shading weight (energy folded in)
    w: jnp.ndarray  # white shading weight (energy folded in)
    cont: jnp.ndarray  # continuation wanted (bool)
    mult: jnp.ndarray  # scalar attenuation multiplier
    new_org: V3
    new_dir: V3
    u: jnp.ndarray
    v: jnp.ndarray
    tex_id: jnp.ndarray  # float; < 0 when untextured
    mat_color: V3


def whitted_bounce_pallas(
    cs: CompiledScene, blob, mat_blob, light_blob, ro: V3, rd: V3, depth,
    variant, t_min=1e-3, t_max=1e6,
) -> WhittedBounceOut:
    layout = blob_layout(cs)
    n = ro.x.shape[0]
    rows = n // LANES
    n_mats = int(cs.materials.diffuse.shape[0])

    spec = pl.BlockSpec((ROW_BLOCK, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    shape = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)

    def rows2(a):
        return a.reshape(rows, LANES)

    outs = pl.pallas_call(
        partial(
            _whitted_bounce_kernel, layout, n_mats, cs.n_lights,
            float(t_min), float(t_max),
            variant.textured, variant.refraction, variant.falloff_scale,
            variant.diffuse_gain, variant.spec_table, variant.base_floor,
        ),
        grid=(pl.cdiv(rows, ROW_BLOCK),),
        in_specs=[smem, smem, smem, smem] + [spec] * 6,
        out_specs=[spec] * 17,
        out_shape=[shape] * 17,
    )(
        blob, mat_blob, light_blob,
        jnp.asarray(depth, jnp.int32).reshape(1, 1),
        rows2(ro.x), rows2(ro.y), rows2(ro.z),
        rows2(rd.x), rows2(rd.y), rows2(rd.z),
    )
    (hit, a, w, cont, mult, nox, noy, noz, ndx, ndy, ndz, u, v, tex,
     mr, mg, mb) = (o.reshape(n) for o in outs)
    return WhittedBounceOut(
        hit=hit > 0.5, a=a, w=w, cont=cont > 0.5, mult=mult,
        new_org=V3(nox, noy, noz), new_dir=V3(ndx, ndy, ndz),
        u=u, v=v, tex_id=tex, mat_color=V3(mr, mg, mb),
    )
