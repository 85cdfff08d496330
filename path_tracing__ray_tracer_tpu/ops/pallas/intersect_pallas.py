"""Fused Pallas intersection kernels (TPU).

Why these exist: the XLA broadcast formulation materializes (N, P) candidate
matrices to HBM whenever the bounce-loop body outgrows XLA's fusion budget —
measured 23 Mrays/s, purely HBM-bound.  These kernels keep the whole
primitive sweep in registers/VMEM: ray state is read once per pass, the
scene lives in SMEM as scalars (it is a few KB for reference-scale scenes),
and every candidate test plus the running-best reduction happens in-core.

Two kernels:

* ``closest_hit``: full hit record — t, global primitive index, shading
  normal (triangles flipped toward the ray), and interpolated UVs, all
  carried through the unrolled primitive sweep with lane-wise selects.
  Semantics identical to ``ops.intersect.scene_hit`` (strict ``<``,
  plane → sphere → triangle order, reference quirks included).
* ``any_hit``: occlusion mask with per-ray ``t_max`` for shadow rays.

Scene wire format for the kernels: one ``(1, K)`` float32 SMEM blob packed
per-field-contiguous (see ``pack_scene_blob``), plus static Python offsets.
Only used when the scene fits the SMEM budget (``fits_smem``); large scenes
take the BVH path.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...compiler import CompiledScene

LANES = 128
# (ROW_BLOCK, 128) rays per kernel instance.  8 measured fastest on v5e for
# the fused sweeps (838 Mray-bounce/s standalone; larger blocks spill VMEM:
# 32→784, 128→145 Mray/s, 256 fails to compile).
ROW_BLOCK = 8
SMEM_PRIM_LIMIT = 192  # total primitives; blob stays a few KB

_T_MIN_DEFAULT = 1e-3


class BlobLayout(NamedTuple):
    n_planes: int
    n_spheres: int
    n_quads: int
    n_tris: int
    # static field offsets into the blob
    plane_base: int
    sphere_base: int
    quad_base: int
    tri_base: int
    size: int


def blob_layout(cs: CompiledScene) -> BlobLayout:
    P, S, Q, T = cs.n_planes, cs.n_spheres, cs.n_quads, cs.n_triangles
    plane_fields = 14  # anchor(3) normal(3) u_unit(3) v_unit(3) u_len v_len
    sphere_fields = 4  # center(3) radius
    quad_fields = 18  # origin(3) normal(3) du(3) dv(3) uv0(2) uva(2) uvb(2)
    tri_fields = 18  # v0(3) e1(3) e2(3) normal(3) uv0(2) uv1(2) uv2(2)
    pb = 0
    sb = pb + plane_fields * P
    qb = sb + sphere_fields * S
    tb = qb + quad_fields * Q
    return BlobLayout(P, S, Q, T, pb, sb, qb, tb, tb + tri_fields * T)


def fits_smem(cs: CompiledScene) -> bool:
    return (
        cs.bvh is None
        and (cs.n_planes + cs.n_spheres + cs.n_quads + cs.n_triangles)
        <= SMEM_PRIM_LIMIT
    )


def _ps_parts(cs: CompiledScene) -> list:
    """Plane/sphere/quad field arrays in blob order (shared packer core)."""
    p, s, q = cs.planes, cs.spheres, cs.quads
    return [
        # planes (14 fields)
        p.anchor.x, p.anchor.y, p.anchor.z,
        p.normal.x, p.normal.y, p.normal.z,
        p.u_unit.x, p.u_unit.y, p.u_unit.z,
        p.v_unit.x, p.v_unit.y, p.v_unit.z,
        p.u_len, p.v_len,
        # spheres (4 fields)
        s.center.x, s.center.y, s.center.z, s.radius,
        # quads (18 fields)
        q.origin.x, q.origin.y, q.origin.z,
        q.normal.x, q.normal.y, q.normal.z,
        q.du.x, q.du.y, q.du.z,
        q.dv.x, q.dv.y, q.dv.z,
        q.uv0[0], q.uv0[1], q.uva[0], q.uva[1], q.uvb[0], q.uvb[1],
    ]


def pack_scene_blob(cs: CompiledScene) -> jnp.ndarray:
    """Pack the primitive tables into the kernels' (1, K) f32 SMEM format.

    Per-field contiguous: e.g. all plane anchor.x values, then anchor.y, …
    so the kernel reads field ``f`` of primitive ``i`` at
    ``base + f·count + i``.
    """
    t = cs.triangles
    e1 = t.v1 - t.v0
    e2 = t.v2 - t.v0
    parts = _ps_parts(cs) + [
        # triangles (18 fields)
        t.v0.x, t.v0.y, t.v0.z,
        e1.x, e1.y, e1.z,
        e2.x, e2.y, e2.z,
        t.normal.x, t.normal.y, t.normal.z,
        t.uv0[0], t.uv0[1], t.uv1[0], t.uv1[1], t.uv2[0], t.uv2[1],
    ]
    return jnp.concatenate(parts)[None, :]


def ps_blob_layout(cs: CompiledScene) -> BlobLayout:
    """Layout of a planes+spheres+quads-only blob — the triangles live in
    the BVH slot records, so the fused BVH scene kernels
    (``bvh_pallas._bvh4_scene_*``) sweep only the non-triangle primitives
    from this blob before/alongside the tree walk."""
    P, S, Q = cs.n_planes, cs.n_spheres, cs.n_quads
    pb = 0
    sb = pb + 14 * P
    qb = sb + 4 * S
    tb = qb + 18 * Q
    return BlobLayout(P, S, Q, 0, pb, sb, qb, tb, tb)


def pack_ps_blob(cs: CompiledScene) -> jnp.ndarray:
    """The planes+spheres+quads prefix of ``pack_scene_blob`` (no tris)."""
    return jnp.concatenate(_ps_parts(cs))[None, :]


def _sweep_prims(blob, layout: BlobLayout, rox, roy, roz, rdx, rdy, rdz,
                 t_min, bound, want_attrs: bool):
    """Unrolled primitive sweep shared by both kernels.

    Returns ``(best_t, best_idx, nx, ny, nz, u, v)`` (attrs are zeros when
    ``want_attrs`` is False).  ``bound`` is the initial best (scalar or
    per-lane array).
    """
    P, S, Q, T = layout.n_planes, layout.n_spheres, layout.n_quads, layout.n_tris

    def f(base, field, count, i):
        return blob[0, base + field * count + i]

    zeros = jnp.zeros_like(rox)
    best_t = jnp.broadcast_to(jnp.asarray(bound, jnp.float32), rox.shape) + zeros
    best_i = jnp.full(rox.shape, -1, jnp.int32)
    nx, ny, nz, uu, vv = zeros, zeros, zeros + 0.0, zeros, zeros

    pb = layout.plane_base
    for i in range(P):
        ax, ay, az = f(pb, 0, P, i), f(pb, 1, P, i), f(pb, 2, P, i)
        px, py, pz = f(pb, 3, P, i), f(pb, 4, P, i), f(pb, 5, P, i)
        uxx, uxy, uxz = f(pb, 6, P, i), f(pb, 7, P, i), f(pb, 8, P, i)
        vxx, vxy, vxz = f(pb, 9, P, i), f(pb, 10, P, i), f(pb, 11, P, i)
        ulen, vlen = f(pb, 12, P, i), f(pb, 13, P, i)

        denom = rdx * px + rdy * py + rdz * pz
        ok = jnp.abs(denom) > 1e-6
        tt = ((ax - rox) * px + (ay - roy) * py + (az - roz) * pz) / jnp.where(
            ok, denom, 1.0
        )
        hx = rox + rdx * tt - ax
        hy = roy + rdy * tt - ay
        hz = roz + rdz * tt - az
        u_hit = hx * uxx + hy * uxy + hz * uxz
        v_hit = hx * vxx + hy * vxy + hz * vxz
        win = (
            ok & (tt > t_min) & (tt < best_t)
            & (u_hit >= 0.0) & (u_hit <= ulen)
            & (v_hit >= 0.0) & (v_hit <= vlen)
        )
        best_t = jnp.where(win, tt, best_t)
        best_i = jnp.where(win, i, best_i)
        if want_attrs:
            nx = jnp.where(win, px, nx)
            ny = jnp.where(win, py, ny)
            nz = jnp.where(win, pz, nz)
            uu = jnp.where(win, u_hit / ulen, uu)
            vv = jnp.where(win, v_hit / vlen, vv)

    sb = layout.sphere_base
    for i in range(S):
        cx, cy, cz = f(sb, 0, S, i), f(sb, 1, S, i), f(sb, 2, S, i)
        rad = f(sb, 3, S, i)
        ocx, ocy, ocz = rox - cx, roy - cy, roz - cz
        a = rdx * rdx + rdy * rdy + rdz * rdz
        bq = ocx * rdx + ocy * rdy + ocz * rdz
        c = ocx * ocx + ocy * ocy + ocz * ocz - rad * rad
        disc = bq * bq - a * c
        has = disc > 0.0
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t1 = (-bq - sq) / a
        t2 = (-bq + sq) / a
        t1ok = (t1 > t_min) & (t1 < best_t)
        t2ok = (t2 > t_min) & (t2 < best_t)
        tt = jnp.where(t1ok, t1, t2)
        win = has & (t1ok | t2ok) & (tt > 0.0)
        best_t = jnp.where(win, tt, best_t)
        best_i = jnp.where(win, P + i, best_i)
        if want_attrs:
            inv_r = 1.0 / jnp.where(rad > 0, rad, 1.0)
            nx = jnp.where(win, (rox + rdx * tt - cx) * inv_r, nx)
            ny = jnp.where(win, (roy + rdy * tt - cy) * inv_r, ny)
            nz = jnp.where(win, (roz + rdz * tt - cz) * inv_r, nz)
            uu = jnp.where(win, 0.0, uu)  # sphere UVs fixed at 0 (quirk 3)
            vv = jnp.where(win, 0.0, vv)

    qb = layout.quad_base
    for i in range(Q):
        oxq, oyq, ozq = f(qb, 0, Q, i), f(qb, 1, Q, i), f(qb, 2, Q, i)
        qnx, qny, qnz = f(qb, 3, Q, i), f(qb, 4, Q, i), f(qb, 5, Q, i)
        dux, duy, duz = f(qb, 6, Q, i), f(qb, 7, Q, i), f(qb, 8, Q, i)
        dvx, dvy, dvz = f(qb, 9, Q, i), f(qb, 10, Q, i), f(qb, 11, Q, i)

        denom = rdx * qnx + rdy * qny + rdz * qnz
        ok = jnp.abs(denom) > 1e-6
        tt = ((oxq - rox) * qnx + (oyq - roy) * qny + (ozq - roz) * qnz) / jnp.where(
            ok, denom, 1.0
        )
        relx = rox + rdx * tt - oxq
        rely = roy + rdy * tt - oyq
        relz = roz + rdz * tt - ozq
        a = relx * dux + rely * duy + relz * duz
        bqd = relx * dvx + rely * dvy + relz * dvz
        win = (
            ok & (tt > t_min) & (tt < best_t)
            & (a >= 0.0) & (a <= 1.0) & (bqd >= 0.0) & (bqd <= 1.0)
        )
        best_t = jnp.where(win, tt, best_t)
        best_i = jnp.where(win, P + S + i, best_i)
        if want_attrs:
            flip = denom > 0.0  # flip toward the ray, like the merged tris
            sgn = jnp.where(flip, -1.0, 1.0)
            nx = jnp.where(win, sgn * qnx, nx)
            ny = jnp.where(win, sgn * qny, ny)
            nz = jnp.where(win, sgn * qnz, nz)
            u0u, u0v = f(qb, 12, Q, i), f(qb, 13, Q, i)
            uau, uav = f(qb, 14, Q, i), f(qb, 15, Q, i)
            ubu, ubv = f(qb, 16, Q, i), f(qb, 17, Q, i)
            uu = jnp.where(win, u0u + a * uau + bqd * ubu, uu)
            vv = jnp.where(win, u0v + a * uav + bqd * ubv, vv)

    tb = layout.tri_base
    for i in range(T):
        v0x, v0y, v0z = f(tb, 0, T, i), f(tb, 1, T, i), f(tb, 2, T, i)
        e1x, e1y, e1z = f(tb, 3, T, i), f(tb, 4, T, i), f(tb, 5, T, i)
        e2x, e2y, e2z = f(tb, 6, T, i), f(tb, 7, T, i), f(tb, 8, T, i)

        hx = rdy * e2z - rdz * e2y
        hy = rdz * e2x - rdx * e2z
        hz = rdx * e2y - rdy * e2x
        det = e1x * hx + e1y * hy + e1z * hz
        ok = jnp.abs(det) > 1e-6
        inv_det = 1.0 / jnp.where(ok, det, 1.0)
        sx, sy, sz = rox - v0x, roy - v0y, roz - v0z
        bu = inv_det * (sx * hx + sy * hy + sz * hz)
        qx = sy * e1z - sz * e1y
        qy = sz * e1x - sx * e1z
        qz = sx * e1y - sy * e1x
        bv = inv_det * (rdx * qx + rdy * qy + rdz * qz)
        tt = inv_det * (e2x * qx + e2y * qy + e2z * qz)
        win = (
            ok & (bu >= 0.0) & (bu <= 1.0) & (bv >= 0.0) & (bu + bv <= 1.0)
            & (tt > t_min) & (tt < best_t)
        )
        best_t = jnp.where(win, tt, best_t)
        best_i = jnp.where(win, P + S + Q + i, best_i)
        if want_attrs:
            tnx, tny, tnz = f(tb, 9, T, i), f(tb, 10, T, i), f(tb, 11, T, i)
            flip = rdx * tnx + rdy * tny + rdz * tnz > 0.0
            sgn = jnp.where(flip, -1.0, 1.0)
            nx = jnp.where(win, sgn * tnx, nx)
            ny = jnp.where(win, sgn * tny, ny)
            nz = jnp.where(win, sgn * tnz, nz)
            u0u, u0v = f(tb, 12, T, i), f(tb, 13, T, i)
            u1u, u1v = f(tb, 14, T, i), f(tb, 15, T, i)
            u2u, u2v = f(tb, 16, T, i), f(tb, 17, T, i)
            bw = 1.0 - bu - bv
            uu = jnp.where(win, bw * u0u + bu * u1u + bv * u2u, uu)
            vv = jnp.where(win, bw * u0v + bu * u1v + bv * u2v, vv)

    return best_t, best_i, nx, ny, nz, uu, vv


def _closest_kernel(layout, t_min, t_max, blob_ref,
                    rox_ref, roy_ref, roz_ref, rdx_ref, rdy_ref, rdz_ref,
                    t_ref, idx_ref, nx_ref, ny_ref, nz_ref, u_ref, v_ref):
    best_t, best_i, nx, ny, nz, uu, vv = _sweep_prims(
        blob_ref, layout,
        rox_ref[:], roy_ref[:], roz_ref[:],
        rdx_ref[:], rdy_ref[:], rdz_ref[:],
        t_min, t_max, want_attrs=True,
    )
    t_ref[:] = best_t
    idx_ref[:] = best_i
    nx_ref[:] = nx
    ny_ref[:] = ny
    nz_ref[:] = nz
    u_ref[:] = uu
    v_ref[:] = vv


def _any_kernel(layout, t_min, blob_ref,
                rox_ref, roy_ref, roz_ref, rdx_ref, rdy_ref, rdz_ref,
                tmax_ref, occ_ref):
    _bt, best_i, *_ = _sweep_prims(
        blob_ref, layout,
        rox_ref[:], roy_ref[:], roz_ref[:],
        rdx_ref[:], rdy_ref[:], rdz_ref[:],
        t_min, tmax_ref[:], want_attrs=False,
    )
    occ_ref[:] = (best_i >= 0).astype(jnp.float32)


def _as_rows(a: jnp.ndarray):
    n = a.shape[0]
    assert n % LANES == 0, n
    return a.reshape(n // LANES, LANES)


def _ray_specs(n_rows: int):
    grid = pl.cdiv(n_rows, ROW_BLOCK)
    spec = pl.BlockSpec((ROW_BLOCK, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return grid, spec


def closest_hit_pallas(cs: CompiledScene, blob, ro, rd, t_min, t_max):
    """Fused closest-hit over SoA rays.  Returns (t, idx, nx, ny, nz, u, v)
    as flat (N,) arrays."""
    layout = blob_layout(cs)
    n = ro.x.shape[0]
    rows = n // LANES
    grid, spec = _ray_specs(rows)
    shape = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
    ishape = jax.ShapeDtypeStruct((rows, LANES), jnp.int32)

    out = pl.pallas_call(
        partial(_closest_kernel, layout, float(t_min), float(t_max)),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [spec] * 6,
        out_specs=[spec] * 7,
        out_shape=[shape, ishape, shape, shape, shape, shape, shape],
    )(blob, *map(_as_rows, (ro.x, ro.y, ro.z, rd.x, rd.y, rd.z)))
    t, idx, nx, ny, nz, u, v = (o.reshape(n) for o in out)
    return t, idx, nx, ny, nz, u, v


def any_hit_pallas(cs: CompiledScene, blob, ro, rd, t_min, t_max):
    """Fused any-hit with per-ray t_max.  Returns a boolean (N,) mask."""
    layout = blob_layout(cs)
    n = ro.x.shape[0]
    rows = n // LANES
    grid, spec = _ray_specs(rows)
    tmax_arr = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))

    occ = pl.pallas_call(
        partial(_any_kernel, layout, float(t_min)),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [spec] * 7,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
    )(blob, *map(_as_rows, (ro.x, ro.y, ro.z, rd.x, rd.y, rd.z, tmax_arr)))
    return occ.reshape(n) > 0.5
