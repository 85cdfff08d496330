"""Whole-bounce BVH megakernel: closest walk + NEE + shadow walk + scatter
in ONE Pallas launch.

Round-3 state of the mesh/BVH path (BENCHMARKS.md): a bounce iteration was
two separate Pallas launches — the fused whole-scene closest walk
(``bvh_pallas._bvh4_scene_closest_kernel``) and the NEE occlusion walk
(``_bvh4_scene_any_kernel``) — each with its own coherence sort, plus the
XLA glue between them (material select chains, light pick, scatter math,
two lane-state HBM roundtrips).  This kernel runs the ENTIRE path-tracer
bounce over one SMEM-resident tree:

* ps sweep + seeded BVH4 attrs walk (identical to the fused scene kernel);
* the winner's material resolved IN-KERNEL with zero gathers: each slot
  record's gid field carries a packed unique-material id
  (``bvh_pallas.GID_UID_SHIFT`` — zero SMEM cost), and the ≤ 32-row unique
  table resolves by select chain, exactly like the Cornell megakernel's
  ``_mat_sweep_select``;
* NEE light pick, shadow-ray construction and the occlusion walk — the
  shadow ray's origin is the closest hit, available in registers, so the
  second launch + second sort + roundtrip disappear (VERDICT round-3 #1);
  don't-care lanes (missed scene / light under horizon / zero diffuse)
  park from step 0 via ``limit = -1``, the same contract as
  ``models/path_tracer._bounce_xla``;
* Russian roulette + scatter via the shared ``bounce_pallas._shade_scatter``
  — formula-identical to the Cornell megakernel and the XLA bounce.

One coherence sort per bounce (primary-ray key) replaces the round-3 two;
the shadow walk inherits the primary ordering — shadow origins are the hit
points of coherently-sorted rays and directions point at one small light
grid, so blocks stay coherent.

Gates (``bounce_bvh_ok``): BVH4 + fused-scene blobs fit SMEM, packed uids
present, no textured triangles (their uv interpolation tables don't ride in
the slot records; mesh scenes are untextured — Cornell takes the SMEM-sweep
megakernel instead), and small ps/material tables so the select chains stay
cheap.  Falls back to the split path otherwise.  Equivalence with the XLA
bounce is asserted in tests (FMA-level, like the Cornell megakernel).
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...compiler import CompiledScene
from ..v3 import V3
from .bounce_pallas import _MAT_FIELDS, _SKY, BounceOut, _shade_scatter, pack_light_blob
from .bvh_pallas import (
    _NODE4_F,
    _STACK_CAP,
    GID_UID_SHIFT,
    LANES,
    _blocks,
    _bvh4_any_walk,
    _bvh4_walk,
    _packed,
    _scene_fused_ok,
    _sort_enabled,
    _sort_key,
)
from .intersect_pallas import _sweep_prims, pack_ps_blob, ps_blob_layout

# interpret-verified escape hatch, like PTRT_BVH_SCENE/PTRT_BVH_ATTRS
BVH_BOUNCE = os.environ.get("PTRT_BVH_BOUNCE", "1") != "0"
# Occlusion placement.  True (default): the bounce kernel fuses closest walk
# + NEE prep + scatter and DEFERS the shadow query — emitted as a shadow-ray
# record — to a separate ``bvh_scene_any_pallas`` launch with its OWN
# shadow-ray coherence sort.  False: the occlusion walk runs inside the same
# kernel under the primary sort — measured 18% SLOWER on the config-5 mesh
# (59.4 vs 72.6 Mrays/s steady, A/B/A reproduced, round 4): shadow rays
# sorted by (octant-toward-light, hit-point morton) walk far fewer nodes
# than primary-ordered ones, and the saved launch/glue does not cover it.
# Kept as the recorded negative; flip for re-measurement.
BVH_BOUNCE_SPLIT_ANY = True
# select-chain unroll bounds (per-bounce cost is linear in these)
_UID_PS_LIMIT = 64  # ps-prim → uid chain entries (P + S + Q)
_UMAT_LIMIT = 32  # unique-material rows (10 selects each)
# group shadow rays by their sampled light index before the occlusion walk
# (major sort key).  MEASURED LOSS on the config-5 mesh (round 4): 31.0 s
# steady vs 20.5 s baseline (51.4 vs 77.7 Mrays/s) — the light points span
# a few centimetres so direction coherence was never the problem, and
# light-major grouping scatters shadow-ray ORIGINS (hit points) across the
# frame, destroying the origin-morton locality the walk actually relies
# on.  Kept gated off as the recorded negative.
BVH_SHADOW_LIGHT_KEY = False
_U_LIGHT_K = 0  # rng use slot, must match bounce_pallas._U_LIGHT
_UID_SHIFT_BITS = GID_UID_SHIFT.bit_length() - 1


def pack_umat_blob(cs: CompiledScene) -> jnp.ndarray:
    """(1, 10·U) f32 unique-material table, field-major (same field order as
    ``bounce_pallas.pack_mat_blob`` but over ``cs.mat_table`` rows)."""
    mt = cs.mat_table
    parts = [
        mt.color.x, mt.color.y, mt.color.z,
        mt.diffuse, mt.specular, mt.reflective, mt.refractive, mt.ior,
        mt.has_tex, mt.tex_id.astype(jnp.float32),
    ]
    return jnp.concatenate(parts)[None, :]


def pack_psuid_blob(cs: CompiledScene) -> jnp.ndarray:
    """(1, P+S+Q) f32 unique-material ids of the non-triangle primitives
    (their global prim index IS the blob index)."""
    psq = cs.n_planes + cs.n_spheres + cs.n_quads
    return cs.mat_uid[:psq].astype(jnp.float32)[None, :]


def _uid_mat_select(umat_ref, n_umats: int, uid):
    """Winner material record by select chain over the unique table (the
    uid-indexed counterpart of ``bounce_pallas._mat_sweep_select``; same
    miss defaults: ior 1, tex_id −1, everything else 0 — uid < 0 matches no
    row)."""
    fields = [jnp.zeros(uid.shape, jnp.float32) for _ in range(_MAT_FIELDS)]
    fields[7] = fields[7] + 1.0
    fields[9] = fields[9] - 1.0
    for i in range(n_umats):
        sel = uid == i
        for f in range(_MAT_FIELDS):
            fields[f] = jnp.where(sel, umat_ref[0, f * n_umats + i], fields[f])
    return fields


def _path_bounce_bvh_kernel(
    m4, leaf_size, ps_layout, gid_offset: int, n_umats: int, n_lights: int,
    t_min: float, t_max: float, shadow_light: bool, split_any: bool,
    # SMEM refs
    tree_ref, slot_ref, ps_ref, psuid_ref, umat_ref, light_ref,
    # VMEM in
    depth_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
    thx_ref, thy_ref, thz_ref, key_ref,
    # VMEM out: the 19-field _path_bounce_kernel record, plus (split_any)
    # the 7-field deferred shadow query
    *out_refs,
):
    stack_ref = out_refs[-1]  # scratch rides after the outputs
    out_refs = out_refs[:-1]
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    thx, thy, thz = thx_ref[:], thy_ref[:], thz_ref[:]
    depth_u32 = depth_ref[:].astype(jnp.uint32)
    key = key_ref[:]

    # ---- whole-scene closest hit: ps sweep seeds the BVH4 attrs walk --------
    ps_t, ps_i, ps_nx, ps_ny, ps_nz, ps_u, ps_v = _sweep_prims(
        ps_ref, ps_layout, ox, oy, oz, dx, dy, dz, t_min, t_max,
        want_attrs=True,
    )
    bt, bi, bu, bv, nx, ny, nz = _bvh4_walk(
        m4, leaf_size, t_min, tree_ref, slot_ref, stack_ref, jnp.int32(0),
        ox, oy, oz, dx, dy, dz, ps_t, ps_i,
        with_attrs=True, attrs0=(ps_u, ps_v, ps_nx, ps_ny, ps_nz),
        gid_offset=gid_offset,
    )
    is_tri = bi >= gid_offset
    # decode the packed gid: uid rides the high bits (GID_UID_SHIFT)
    packed_v = bi - gid_offset
    uid_tri = jnp.right_shift(packed_v, _UID_SHIFT_BITS)
    # ps winners: global prim index == psuid blob index (select chain)
    uid = jnp.full(bi.shape, -1, jnp.int32)
    for i in range(gid_offset):
        uid = jnp.where(bi == i, psuid_ref[0, i].astype(jnp.int32), uid)
    uid = jnp.where(is_tri, uid_tri, uid)

    # normal flip + uv rules identical to _bvh4_scene_closest_kernel /
    # _fused_scene_hit on an untextured-triangle scene
    flip = is_tri & (nx * dx + ny * dy + nz * dz > 0.0)
    sgn = jnp.where(flip, -1.0, 1.0)
    nx, ny, nz = nx * sgn, ny * sgn, nz * sgn
    uu = jnp.where(is_tri, 0.0, bu)
    vv = jnp.where(is_tri, 0.0, bv)

    hit = bi >= 0
    px = ox + dx * bt
    py = oy + dy * bt
    pz = oz + dz * bt
    mats = _uid_mat_select(umat_ref, n_umats, uid)

    def occl_walk(sox, soy, soz, ldx, ldy, ldz, bound, care):
        """ps sweep seeds the BVH4 occlusion walk; don't-care lanes park
        from step 0 (limit −1), mirroring the split path's
        scene_hit_any(limit = −1) contract."""
        limit = jnp.where(
            care,
            jnp.broadcast_to(jnp.asarray(bound, jnp.float32), care.shape),
            jnp.float32(-1.0),
        )
        _t2, ps_i2, *_ = _sweep_prims(
            ps_ref, ps_layout, sox, soy, soz, ldx, ldy, ldz, t_min, limit,
            want_attrs=False,
        )
        found0 = jnp.maximum(
            (limit <= 0.0).astype(jnp.float32),
            (ps_i2 >= 0).astype(jnp.float32),
        )
        found = _bvh4_any_walk(
            m4, leaf_size, t_min, tree_ref, slot_ref, stack_ref,
            sox, soy, soz, ldx, ldy, ldz, limit, found0,
        )
        return found > 0.5

    out = _shade_scatter(
        n_lights, light_ref, t_min, t_max, shadow_light,
        None if split_any else occl_walk,
        depth_u32, key, dx, dy, dz, thx, thy, thz,
        hit, bt, px, py, pz, nx, ny, nz, uu, vv, mats,
    )
    hit_o, killed, w_nee = out[0], out[1], out[2]
    vals = (
        (hit_o.astype(jnp.float32), killed.astype(jnp.float32),
         jnp.where(hit_o, 0.0, _SKY), w_nee)
        + tuple(out[3:])
    )
    assert len(vals) == len(out_refs), (len(vals), len(out_refs))
    for ref, val in zip(out_refs, vals):
        ref[:] = val


def bounce_bvh_ok(cs: CompiledScene) -> bool:
    """Static gate for the whole-bounce BVH megakernel (see module doc)."""
    bvh = cs.bvh
    if not (BVH_BOUNCE and bvh is not None and _packed(bvh)):
        return False
    if cs.mat_table is None or cs.mat_uid is None:
        return False
    if not _scene_fused_ok(cs):
        return False
    # textured triangles would need per-vertex uv in the slot records
    if cs.tri_uv_used is None or cs.tri_uv_used.shape[0]:
        return False
    psq = cs.n_planes + cs.n_spheres + cs.n_quads
    if psq > _UID_PS_LIMIT:
        return False
    if int(cs.mat_table.diffuse.shape[0]) > _UMAT_LIMIT:
        return False
    return True


def path_bounce_bvh_pallas(
    cs: CompiledScene, ro: V3, rd: V3, thr: V3, key, depth,
    t_min=1e-3, t_max=1e6, shadow_light: bool = False,
) -> BounceOut:
    """One path-tracer bounce for a BVH scene in one kernel (see module
    doc).  Caller must have checked ``bounce_bvh_ok(cs)``; ``n % 128 == 0``.
    Rays are coherence-sorted by the primary-ray key once per bounce; all
    19 record fields are unsorted back."""
    bvh = cs.bvh
    n = ro.x.shape[0]
    assert n % LANES == 0, n
    split_any = BVH_BOUNCE_SPLIT_ANY
    n_out = 26 if split_any else 19
    ps_layout = ps_blob_layout(cs)
    ps_blob = pack_ps_blob(cs)
    psuid_blob = pack_psuid_blob(cs)
    umat_blob = pack_umat_blob(cs)
    light_blob = pack_light_blob(cs)
    gid_offset = cs.n_planes + cs.n_spheres + cs.n_quads
    n_umats = int(cs.mat_table.diffuse.shape[0])
    depth_v = jnp.broadcast_to(jnp.asarray(depth, jnp.int32), (n,))

    def run(o, d, th, ky, dp):
        rows, block_rows = _blocks(n)
        m4 = int(bvh.quad_blob.shape[1]) // _NODE4_F
        leaf_size = int(bvh.slots.shape[1])
        spec = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
        smem = pl.BlockSpec(memory_space=pltpu.SMEM)
        f32 = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)

        def r2(a):
            return a.reshape(rows, LANES)

        outs = pl.pallas_call(
            partial(
                _path_bounce_bvh_kernel, m4, leaf_size, ps_layout,
                gid_offset, n_umats, cs.n_lights, float(t_min),
                float(t_max), bool(shadow_light), split_any,
            ),
            grid=(rows // block_rows,),
            in_specs=[smem] * 6 + [spec] * 11,
            out_specs=[spec] * n_out,
            out_shape=[f32] * n_out,
            scratch_shapes=[pltpu.SMEM((_STACK_CAP,), jnp.int32)],
        )(
            bvh.quad_blob, bvh.slot_blob, ps_blob, psuid_blob, umat_blob,
            light_blob,
            r2(dp), r2(o.x), r2(o.y), r2(o.z), r2(d.x), r2(d.y), r2(d.z),
            r2(th.x), r2(th.y), r2(th.z), r2(ky),
        )
        return [a.reshape(n) for a in outs]

    if _sort_enabled(n):
        iota = jnp.arange(n, dtype=jnp.int32)
        (_k, sx, sy, sz, sdx, sdy, sdz, stx, sty, stz, skey, sdep, sidx
         ) = jax.lax.sort(
            [_sort_key(bvh, ro, rd), ro.x, ro.y, ro.z, rd.x, rd.y, rd.z,
             thr.x, thr.y, thr.z, key, depth_v, iota],
            num_keys=1, is_stable=True,
        )
        outs = run(V3(sx, sy, sz), V3(sdx, sdy, sdz), V3(stx, sty, stz),
                   skey, sdep)
        outs = list(jax.lax.sort([sidx] + outs, num_keys=1, is_stable=True)[1:])
    else:
        outs = run(ro, rd, thr, key, depth_v)

    if split_any:
        # deferred shadow query: one whole-scene occlusion launch with its
        # own shadow-ray coherence sort (don't-care lanes carry limit −1 and
        # park; their w_nee is already zero).  The sampled light index rides
        # as the MAJOR sort key (BVH_SHADOW_LIGHT_KEY): same-light shadow
        # rays are maximally direction-coherent.
        from .. import rng
        from .bvh_pallas import bvh_scene_any_pallas

        extra = None
        # ≤ 512 lights keeps the composite sort key inside int32
        if BVH_SHADOW_LIGHT_KEY and 1 < cs.n_lights <= 512:
            r_light = rng.uniform(key, depth_v, _U_LIGHT_K)
            extra = jnp.minimum(
                (r_light * cs.n_lights).astype(jnp.int32), cs.n_lights - 1
            )
        (sox, soy, soz, ldx, ldy, ldz, slim) = outs[19:]
        occluded = bvh_scene_any_pallas(
            cs, V3(sox, soy, soz), V3(ldx, ldy, ldz), t_min, slim,
            extra_key=extra,
        )
        outs = outs[:19]
        outs[3] = jnp.where(occluded, 0.0, outs[3])

    (hit, kill, wsky, wnee, rrs, sthr, tthr, nox, noy, noz, ndx, ndy, ndz,
     u, v, tex, mr, mg, mb) = outs
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
