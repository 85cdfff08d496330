"""Wavefront Monte-Carlo path tracer — TPU equivalent of the reference's
``cuda_path_raytracer`` (``renderers/cuda_path_tracer.py``): global
illumination with next-event estimation, Russian roulette, a stochastic
three-event glass model, and ACES tonemapping.

The per-thread path loop becomes a masked ``lax.while_loop`` over the SoA ray
batch.  Every data-dependent branch of the reference kernel (hit/miss,
material class, TIR, RR kill, event choice) is a lane-wise select; randomness
is a pure function of (seed, pixel, sample, depth, use) via the counter RNG,
so progressive batches and sharded renders are reproducible by construction.

Reproduced stylized-physics details (SURVEY.md §2 quirks 6–7, §7):

* NEE at every bounce for every material class, shadow rays with
  ``t_max = 1e6`` (an occluder *beyond* the light still shadows,
  ``cuda_path_tracer.py:275-277``);
* light pdf ``1/num_lights`` with material-class intensity constants
  (refractive 4.0×0.6 / reflective 2.5×0.8 / diffuse 2.0×1.0, ``:285-296``);
* Russian roulette from depth ≥ 3 with Rec.601-luma survival (``:307-314``);
* glass = 60/25/15 refract/reflect/diffuse event mixture with pdf-corrected
  throughput (``:320-428``); fixed Fresnel probabilities, as in the reference
  (its Schlick helper is defined but never called, ``:135-136``);
* constant 0.1 sky on miss (``:234-239``), throughput cutoff 1e-3 (``:468``);
* ACES fit on the spp-averaged radiance, then truncate-quantize (``:52-58``).
"""
from __future__ import annotations

from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import rng
from ..ops.camera import generate_rays
from ..ops.intersect import resolve_material, scene_hit, scene_hit_any
from ..ops.sampling import cosine_hemisphere, pick_light
from ..ops.texture import resolve_base_color
from ..ops.tonemap import aces
from ..ops.v3 import V3, refract
from .base import RendererFactory
from .wavefront import WavefrontRenderer

_T_MIN = 1e-3
_T_MAX = 1e6
_EPS_OFFSET = 1e-3
_SKY = 0.1

# RNG "use" slots per bounce
_U_LIGHT, _U_RR, _U_EVENT, _U_HEMI1, _U_HEMI2 = 0, 1, 2, 3, 4
# jitter slots live at depth == max_depth (outside the bounce counter range)
_U_JITX, _U_JITY = 0, 1

# glass event mixture (cuda_path_tracer.py:323-326)
_P_REFRACT, _P_REFLECT, _P_DIFFUSE = 0.6, 0.25, 0.15

# Measurement probe: when True, _regen_chunk returns (sums, phase1_iters,
# phase2_iters) so experiments can attribute end-to-end chunk time to loop
# iterations (experiments/measure_cfg5_loop.py).  Never set in production.
_PROBE_ITERS = False

# Phase-1 → phase-2 cutover: phase 1 ends once at most N // _TAIL_DIV lanes
# are unfinished (rounded up to a _TAIL_QUANT-lane width).  Bigger divisors
# keep phase 1 running longer at full width; smaller ones hand stragglers to
# the compact tail earlier.  Read at trace time; sweep knob for experiments
# (results are bit-identical for any value — see the phase-2 docstring).
_TAIL_DIV = 64
# Tail width floor/rounding (8 sublanes × 128 lanes); tests shrink it so
# small chunks still exercise the phase-1 loop.
_TAIL_QUANT = 1024

# Phase-1 accumulator fold cadence.  The (NS, N) accumulator is ~100 MB at
# the bench shapes; reading+writing it every iteration is pure HBM traffic
# (~0.25 ms of the measured 1.80 ms iteration, measure_hl_probe).  A lane
# finishes at most ONE item per iteration and each (item, lane) cell receives
# exactly one total contribution, so the loop instead carries a per-lane
# running path sum, parks finished items in _FOLD_EVERY pending slot rows,
# and folds them into the accumulator once per _FOLD_EVERY iterations —
# bit-identical (the per-cell addition tree is unchanged: 0 + x == x).
_FOLD_EVERY = 8

# Fused in-kernel regeneration (phase 1 of _regen_chunk): when the scene
# takes the Pallas bounce megakernel, run the scheduler glue — contribution/
# throughput FMAs, retirement, item advance, camera-ray regeneration, RNG —
# inside the same Pallas launch as the next bounce
# (ops/pallas/bounce_pallas._path_step_kernel).  The only per-iteration XLA
# work left is the atlas texel gather and the slot-fold parks.  Motivation
# was the ~0.4 ms of XLA glue in a 1.55 ms Cornell bench iteration — but the
# A/B at the honest bench config measured FLAT (pipe 204.7/207.9 vs XLA-glue
# 206.6/203.9 Mrays/s, within tunnel noise; experiments/measure_pipe.py):
# the step kernel's 29-in/38-out lane-state roundtrip costs what the fused
# glue saves.  Kept built + equivalence-tested (tests/test_pipe_regen.py),
# gated off like the other measured-flat levers (BENCHMARKS.md round 3).
_PIPE_REGEN = False

# Shuffled work assignment in the regeneration scheduler (see _regen_chunk).
# Shuffling equalizes lane workloads (2.1x on the Cornell bench).  Measured
# on the 11.5K-tri mesh scene with the Pallas BVH walk: the weakened
# block-frustum coherence does NOT hurt (4.49 Mrays/s shuffled vs 4.14
# unshuffled — occupancy wins).  Read at trace time; flip for experiments.
_REGEN_SHUFFLE = True


def _zero(shape):
    return V3.full(0.0, shape)


def path_radiance(cs, org: V3, rd: V3, key: jnp.ndarray, max_depth: int,
                  shadow_tmax: str = "reference") -> V3:
    """Trace one batch of camera rays to completion (one radiance sample).

    One loop over the shared per-bounce body (``_make_bounce_and_resolve``:
    the fused Pallas megakernel on TPU when the scene fits SMEM, the XLA
    ``_bounce_xla`` formulation elsewhere) — the same physics the chunked
    regeneration driver (``_regen_chunk``) runs, minus the lane scheduling.
    """
    bounce_fn, resolve_fn = _make_bounce_and_resolve(
        cs, org.x.shape[0], shadow_tmax
    )
    n = org.x.shape

    def cond(state):
        depth, *_rest, active = state
        return (depth < max_depth) & jnp.any(active)

    def body(state):
        depth, o, d, thr, color, active = state
        out = bounce_fn(o, d, thr, key, depth)
        base = resolve_fn(out)
        contrib = thr * out.w_sky + thr * (base * out.w_nee)
        color = color + V3.where(active, contrib, _zero(n))
        live = active & out.hit & ~out.killed
        thr_new = thr * out.rr_scale * (
            base * out.t_thr + V3(out.s_thr, out.s_thr, out.s_thr)
        )
        thr = V3.where(live, thr_new, thr)
        live = live & (thr.max_component() >= 0.001)
        o = V3.where(live, out.new_org, o)
        d = V3.where(live, out.new_dir, d)
        return depth + 1, o, d, thr, color, live

    init = (
        jnp.int32(0),
        org,
        rd,
        V3.full(1.0, n),
        _zero(n),
        jnp.ones(n, dtype=bool),
    )
    *_s, color, _a = jax.lax.while_loop(cond, body, init)
    return color


def _bounce_xla(cs, o: V3, d: V3, thr: V3, key, depth, shadow_tmax: str = "reference"):
    """One path-tracer bounce as a pure-XLA op, returning the same
    ``BounceOut`` weight record as the Pallas megakernel
    (``ops/pallas/bounce_pallas.py``): the base color enters only
    multiplicatively, so the bounce emits shading *weights* and the shared
    regeneration driver resolves textures and applies

        radiance += thr · (w_sky + base · w_nee)
        thr      *= rr_scale · (s_thr + base · t_thr)

    Physics identical to the reference ``cuda_path_tracer.py`` (quirks
    included; see module docstring).  ``depth`` may be per-lane.
    """
    from ..ops.pallas.bounce_pallas import BounceOut

    n = o.x.shape
    depth = jnp.broadcast_to(jnp.asarray(depth, jnp.int32), n)
    hit = scene_hit(cs, o, d, _T_MIN, _T_MAX)
    mats = resolve_material(cs, hit.prim)
    (mcolor, diffuse, _spec, reflective, refractive, ior, has_tex, tex_id) = mats
    normal = hit.normal
    point = hit.point
    above = point + normal * _EPS_OFFSET

    w_sky = jnp.where(hit.hit, 0.0, jnp.float32(_SKY))

    # ---- next-event estimation (every bounce, every material) --------------
    if cs.n_lights > 0:
        r_light = rng.uniform(key, depth, _U_LIGHT)
        ldir, dist, pdf = pick_light(cs, point, r_light)
        # default reproduces the reference quirk (t_max = 1e6: occluders
        # *beyond* the light still shadow, cuda_path_tracer.py:275-277);
        # shadow_tmax="light" bounds the walk at the sampled light point —
        # physically correct and much cheaper for BVH scenes, where an
        # unbounded any-walk must scan the whole ray (QUIRKS.md).
        limit = _T_MAX if shadow_tmax == "reference" else dist - 1e-3
        cos_theta = jnp.maximum(ldir.dot(normal), 0.0)
        # lanes whose NEE term is zero regardless of occlusion — missed the
        # scene, light below the surface horizon, or a zero-diffuse material
        # — don't need the occlusion answer; limit = -1 lets the BVH
        # any-walk park them from step 0 so their blocks early-exit instead
        # of walking the tree (exact: w_nee is masked/zero for them below)
        care = hit.hit & (cos_theta > 0.0) & (diffuse > 0.0)
        limit = jnp.where(care, jnp.asarray(limit, jnp.float32), -1.0)
        occluded = scene_hit_any(cs, above, ldir, _T_MIN, limit)
        is_glass_cls = refractive > 0.5
        is_mirror_cls = reflective > 0.7
        intensity = jnp.where(is_glass_cls, 4.0, jnp.where(is_mirror_cls, 2.5, 2.0))
        multiplier = jnp.where(is_glass_cls, 0.6, jnp.where(is_mirror_cls, 0.8, 1.0))
        w_nee = jnp.where(
            hit.hit & ~occluded,
            diffuse * cos_theta * intensity * multiplier / pdf,
            0.0,
        )
    else:
        w_nee = jnp.zeros_like(w_sky)

    # ---- Russian roulette from depth >= 3 -----------------------------------
    survival = jnp.maximum(0.1, thr.luminance())
    rr_on = depth >= 3
    killed = rr_on & (rng.uniform(key, depth, _U_RR) > survival)
    rr_scale = jnp.where(rr_on & ~killed, 1.0 / survival, 1.0)

    # ---- scatter event -------------------------------------------------------
    choice = rng.uniform(key, depth, _U_EVENT)
    r1 = rng.uniform(key, depth, _U_HEMI1)
    r2 = rng.uniform(key, depth, _U_HEMI2)

    refl_dir = d.reflect(normal)
    hemi_dir = cosine_hemisphere(normal, r1, r2)

    # glass refraction event (cuda_path_tracer.py:328-388)
    cos_i = jnp.maximum(0.0, -d.dot(normal))
    entering = cos_i > 0.0
    eta = jnp.where(entering, 1.0 / ior, ior)
    outward = V3.where(entering, normal, -normal)
    refr_ok, refr_dir = refract(d, outward, eta)
    refr_org = V3.where(entering, point - normal * _EPS_OFFSET, above)

    glass = refractive > 0.1
    mirror = ~glass & (reflective > 0.5)
    ev_refract = glass & (choice < _P_REFRACT)
    ev_reflect = glass & (choice >= _P_REFRACT) & (choice < _P_REFRACT + _P_REFLECT)
    ev_diffuse = glass & (choice >= _P_REFRACT + _P_REFLECT)

    new_d = V3.where(
        ev_refract,
        V3.where(refr_ok, refr_dir, refl_dir),  # TIR falls back to mirror
        V3.where(ev_reflect | mirror, refl_dir, hemi_dir),
    )
    new_o = V3.where(
        ev_refract,
        V3.where(refr_ok, refr_org, above),
        above,  # reflect/diffuse/mirror/lambertian all offset along +n
    )

    # throughput multiplier in (s + base·t) form (reference constants)
    s_thr = jnp.where(
        ev_refract,
        jnp.where(refr_ok, refractive / _P_REFRACT, 0.9),  # TIR: flat 0.9
        0.0,
    )
    t_thr = jnp.where(
        ev_refract,
        0.0,
        jnp.where(
            ev_reflect,
            0.9 / _P_REFLECT,
            jnp.where(
                ev_diffuse,
                diffuse * 3.0 / _P_DIFFUSE,
                jnp.where(mirror, reflective, diffuse),
            ),
        ),
    )

    return BounceOut(
        hit=hit.hit,
        killed=killed,
        w_sky=w_sky,
        w_nee=w_nee,
        rr_scale=rr_scale,
        s_thr=s_thr,
        t_thr=t_thr,
        new_org=new_o,
        new_dir=new_d,
        u=hit.u,
        v=hit.v,
        tex_id=jnp.where(has_tex > 0.5, tex_id.astype(jnp.float32), -1.0),
        mat_color=mcolor,
    )


def _make_bounce_and_resolve(cs, width_hint: int, shadow_tmax: str = "reference"):
    """(bounce_fn, resolve_fn) for this scene: the fused Pallas megakernel on
    TPU (scene fits SMEM), the XLA formulation elsewhere — both returning the
    same ``BounceOut`` record, verified equivalent in tests.

    ``shadow_tmax`` ("reference" | "light") selects the NEE occlusion bound
    and is honored by both paths (the megakernel takes it as a static
    compile flag)."""
    from ..ops.intersect import _bvh_bounce_enabled, _pallas_enabled
    from ..ops.pallas.texture_pallas import (
        fits_mxu_atlas,
        pack_mxu_atlas,
        resolve_base_color_mxu,
    )

    if _pallas_enabled(cs):
        from ..ops.pallas.bounce_pallas import (
            pack_light_blob,
            pack_mat_blob,
            path_bounce_pallas,
        )
        from ..ops.pallas.intersect_pallas import pack_scene_blob

        blob = pack_scene_blob(cs)
        mat_blob = pack_mat_blob(cs)
        light_blob = pack_light_blob(cs)

        def bounce_fn(o, d, thr, key, depth):
            return path_bounce_pallas(
                cs, blob, mat_blob, light_blob, o, d, thr, key, depth,
                t_min=_T_MIN, t_max=_T_MAX,
                shadow_light=(shadow_tmax == "light"),
            )
    elif _bvh_bounce_enabled(cs, width_hint):
        # whole-bounce BVH megakernel: closest walk + NEE + shadow walk +
        # scatter in one launch with one coherence sort per bounce
        # (ops/pallas/bounce_bvh_pallas.py, VERDICT round-3 #1)
        from ..ops.pallas.bounce_bvh_pallas import path_bounce_bvh_pallas

        def bounce_fn(o, d, thr, key, depth):
            return path_bounce_bvh_pallas(
                cs, o, d, thr, key, depth, t_min=_T_MIN, t_max=_T_MAX,
                shadow_light=(shadow_tmax == "light"),
            )
    else:
        def bounce_fn(o, d, thr, key, depth):
            return _bounce_xla(cs, o, d, thr, key, depth, shadow_tmax=shadow_tmax)

    use_mxu_tex = fits_mxu_atlas(cs) and (width_hint % 1024 == 0)
    if fits_mxu_atlas(cs) and not use_mxu_tex:
        from ..utils.logging import log_event

        log_event(  # fires at trace time, once per compiled shape
            "fast_path_declined", path="mxu_texture",
            reason="batch_alignment", n_rays=int(width_hint),
        )
    mxu_tables = pack_mxu_atlas(cs) if use_mxu_tex else None

    def resolve_fn(out):
        if use_mxu_tex and out.u.shape[0] % 1024 == 0:
            return resolve_base_color_mxu(
                cs, mxu_tables, out.mat_color, out.tex_id, out.u, out.v
            )
        return resolve_base_color(
            cs,
            out.mat_color,
            (out.tex_id >= 0.0).astype(jnp.float32),
            out.tex_id.astype(jnp.int32),
            out.u,
            out.v,
        )

    return bounce_fn, resolve_fn


def _regen_chunk(
    cs,
    cam12,
    pix0,
    seed,
    sample_base,
    *,
    n_pix: int,
    width: int,
    height: int,
    n_samples: int,
    max_depth: int,
    jitter: str,
    shadow_tmax: str = "reference",
    lod_depth: int = 0,
    pipe: bool = None,
):
    """Radiance sums via *ray regeneration*: one persistent pool of ``n_pix``
    lanes where a lane that finishes a path (miss / RR kill / throughput
    cutoff / max depth) immediately starts its next (pixel, sample) work item
    instead of idling.

    Measured motivation (Cornell, depth 8): mean path length is 2.66 bounces,
    so the plain per-sample loop (``n_samples × max_depth`` full-width
    iterations) runs at ~33% lane occupancy.  Regeneration needs only
    ``Σ path length`` iterations per lane — ~3× fewer bounce executions.

    Two design points make it exact and fast:

    * **Shuffled work assignment.**  Path length is strongly pixel-correlated
      (glass-sphere pixels are always slow), so a lane that kept one pixel for
      all its samples would straggle.  Lane ``i``'s ``s``-th item is pixel
      ``(i + s·STRIDE) mod n_pix`` — per-sample golden-ratio offsets
      decorrelate lane workloads, and because the permutation is a pure
      shift, re-binning the per-(item) sums to pixels is ``n_samples`` static
      ``jnp.roll``s, not gathers.
    * **Narrow tail phase.**  The main loop runs while more than ``tail``
      lanes are unfinished; the stragglers are then compacted into one small
      batch that finishes at low width.  Contributions always accumulate in
      (sample, depth) order per pixel, so the result is bit-identical
      *across phase boundaries* — where the tail cutover falls cannot change
      the image.  (Against the separate per-sample-loop implementation the
      match is FMA-level, not bitwise: the two compiled loop bodies may
      reassociate differently — see tests/test_regen.py.)

    RNG keys are pure functions of (seed, pixel, sample), so every radiance
    sample is identical to the per-sample loop's — only lane scheduling
    changes.

    The measured-negative modes — deferred-texture (``mip_budget``),
    texture-LOD (``lod_depth``) and fused in-kernel regeneration
    (``_PIPE_REGEN``) — are quarantined behind ``models/experimental.py``
    (BENCHMARKS.md round 3 records); requesting any of them delegates there
    so this production path stays single-mode.
    """
    if pipe is None:
        pipe = _PIPE_REGEN
    if pipe or lod_depth > 0 or cs.mip_atlas is not None:
        from .experimental import regen_chunk_modes

        return regen_chunk_modes(
            cs, cam12, pix0, seed, sample_base, n_pix=n_pix, width=width,
            height=height, n_samples=n_samples, max_depth=max_depth,
            jitter=jitter, shadow_tmax=shadow_tmax, lod_depth=lod_depth,
            pipe=pipe,
        )

    NS = int(n_samples)
    N = int(n_pix)
    STRIDE = (int(N * 0.6180339887) | 1) % N if (NS > 1 and _REGEN_SHUFFLE) else 0
    total = width * height
    iter_cap = NS * max_depth + 2  # loop provably terminates; belt-and-braces
    bounce_fn, resolve_fn = _make_bounce_and_resolve(cs, N, shadow_tmax)

    def make_ray(lane_ids, s):
        """Camera ray + RNG key for lane ``lane_ids``'s item ``s`` — exactly
        the per-sample loop's ray for (pixel, sample), quirks included."""
        p_local = (lane_ids + s * STRIDE) % N
        idx = pix0 + p_local
        safe = jnp.minimum(idx, total - 1)
        x = (safe % width).astype(jnp.float32)
        y = (safe // width).astype(jnp.float32)
        key = rng.ray_key(seed, idx, sample_base + s)
        if jitter == "center":
            r1 = r2 = jnp.float32(0.5)
        else:
            r1 = rng.uniform(key, max_depth, _U_JITX)
            r2 = r1 if jitter == "diagonal" else rng.uniform(key, max_depth, _U_JITY)
        u = (x + r1) / width
        v = (y + r2) / height
        o, d = generate_rays(cam12, u, v)
        return o, d, key

    def bounce_step(lane_ids, st):
        """One bounce for every lane; finished lanes regenerate in place.
        Returns the new ray state plus this iteration's contribution, item
        id and done mask for the caller's accumulator."""
        o, d, thr, key, depth, s = st
        m = o.x.shape
        active = s < NS
        out = bounce_fn(o, d, thr, key, depth)
        base = resolve_fn(out)
        cA = thr * out.w_sky + thr * (base * out.w_nee)
        cA = V3.where(active, cA, V3.full(0.0, m))
        live = active & out.hit & ~out.killed
        thr_new = thr * out.rr_scale * (
            base * out.t_thr + V3(out.s_thr, out.s_thr, out.s_thr)
        )
        thr = V3.where(live, thr_new, thr)
        live = live & (thr.max_component() >= 0.001)
        ndepth = depth + 1
        live = live & (ndepth < max_depth)

        done = active & ~live
        s2 = s + done.astype(jnp.int32)
        o_new, d_new, key_new = make_ray(lane_ids, s2)
        regen = done & (s2 < NS)
        o = V3.where(regen, o_new, V3.where(live, out.new_org, o))
        d = V3.where(regen, d_new, V3.where(live, out.new_dir, d))
        thr = V3.where(regen, V3.full(1.0, m), thr)
        key = jnp.where(regen, key_new, key)
        depth = jnp.where(live, ndepth, jnp.int32(0))
        return (o, d, thr, key, depth, s2), cA, s, done

    lane = jnp.arange(N, dtype=jnp.int32)
    o0, d0, key0 = make_ray(lane, jnp.zeros((N,), jnp.int32))
    state0 = (
        o0, d0, V3.full(1.0, (N,)), key0,
        jnp.zeros((N,), jnp.int32), jnp.zeros((N,), jnp.int32),
    )
    acc0 = tuple(jnp.zeros((NS, N), jnp.float32) for _ in range(3))

    # ---- phase 1: full width, slot-buffered accumulation into (NS, N) ------
    q = _TAIL_QUANT
    tail = min(-(-max(q, N // _TAIL_DIV) // q) * q, N)
    item_rows = jax.lax.broadcasted_iota(jnp.int32, (NS, N), 0)

    # K-slot fold (module note at _FOLD_EVERY): the loop carries a per-
    # lane running path sum; a finishing lane parks (item, sum) in slot
    # row (k) and the (NS, N) accumulator is touched once per K bounces.
    # Bit-identical to the per-iteration fold: every (item, lane) cell
    # receives exactly one add, and the within-item chain is unchanged.
    K = _FOLD_EVERY
    zeroN = V3.full(0.0, (N,))

    def cond1(carry):
        st, _acc, _psum, it = carry
        return (jnp.sum(st[5] < NS) > tail) & (it < iter_cap)

    def body1(carry):
        st, acc, psum, it = carry
        slot_item0 = jnp.full((K, N), NS, jnp.int32)
        slot_val0 = V3.full(0.0, (K, N))

        def step(k, c):
            st, psum, s_item, s_val, it = c
            st, cA, item, done = bounce_step(lane, st)
            psum = psum + cA
            s_item = s_item.at[k].set(jnp.where(done, item, NS))
            s_val = V3(
                s_val.x.at[k].set(jnp.where(done, psum.x, 0.0)),
                s_val.y.at[k].set(jnp.where(done, psum.y, 0.0)),
                s_val.z.at[k].set(jnp.where(done, psum.z, 0.0)),
            )
            psum = V3.where(done, zeroN, psum)
            return st, psum, s_item, s_val, it + 1

        st, psum, s_item, s_val, it = jax.lax.fori_loop(
            0, K, step, (st, psum, slot_item0, slot_val0, it)
        )
        # distinct slots hold distinct items per lane, so the K one-hot
        # rows never overlap; the accumulator is read+written once here
        adds = [jnp.float32(0.0)] * 3
        for k in range(K):
            hit_row = item_rows == s_item[k][None, :]
            for c, ch in enumerate((s_val.x, s_val.y, s_val.z)):
                adds[c] = adds[c] + jnp.where(hit_row, ch[k][None, :], 0.0)
        acc = tuple(a + add for a, add in zip(acc, adds))
        return st, acc, psum, it

    st1, acc, psum1, _it = jax.lax.while_loop(
        cond1, body1, (state0, acc0, zeroN, jnp.int32(0))
    )
    o, d, thr, key, depth, s = st1

    # ---- phase 2: compact the ≤ tail stragglers, finish at low width --------
    unfinished = s < NS
    cnt = jnp.sum(unfinished.astype(jnp.int32))
    pos = jnp.cumsum(unfinished.astype(jnp.int32)) - 1
    scatter_to = jnp.where(unfinished, pos, tail)
    sel = jnp.zeros((tail,), jnp.int32).at[scatter_to].set(lane, mode="drop")
    valid = jnp.arange(tail, dtype=jnp.int32) < cnt

    st_t = (
        o.take(sel), d.take(sel), thr.take(sel), key[sel], depth[sel],
        jnp.where(valid, s[sel], NS),
    )
    # flush the carried mid-item path sums into their cells; phase 2
    # then keeps adding per-bounce — the per-cell chain stays sequential
    psum_t = psum1.take(sel)
    item_cur = st_t[5]
    acc = tuple(
        a.at[item_cur, sel].add(jnp.where(valid, c, 0.0), mode="drop")
        for a, c in zip(acc, (psum_t.x, psum_t.y, psum_t.z))
    )

    def cond2(carry):
        st, _acc, it = carry
        return jnp.any(st[5] < NS) & (it < iter_cap)

    def body2(carry):
        st, acc, it = carry
        st, cA, item, _done = bounce_step(sel, st)
        # contributions scatter straight into the phase-1 accumulator rows,
        # preserving per-item (sample, depth) addition order exactly
        item_safe = jnp.where(valid, item, NS)  # out of range → dropped
        new = tuple(
            a.at[item_safe, sel].add(jnp.where(valid, c, 0.0), mode="drop")
            for a, c in zip(acc, (cA.x, cA.y, cA.z))
        )
        return st, new, it + 1

    _st, acc, _it2 = jax.lax.while_loop(cond2, body2, (st_t, acc, jnp.int32(0)))

    # ---- re-bin items to pixels: inverse of the shift permutation ----------
    out = V3(acc[0][0], acc[1][0], acc[2][0])
    for si in range(1, NS):
        shift = (si * STRIDE) % N
        out = out + V3(
            jnp.roll(acc[0][si], shift),
            jnp.roll(acc[1][si], shift),
            jnp.roll(acc[2][si], shift),
        )
    if _PROBE_ITERS:
        return out, _it, _it2
    return out


@partial(
    jax.jit,
    static_argnames=("n_pix", "width", "height", "n_samples", "max_depth",
                     "jitter", "shadow_tmax", "lod_depth", "pipe"),
)
def _path_chunk(
    cs,
    cam12,
    pix0,
    seed,
    sample_base,
    *,
    n_pix: int,
    width: int,
    height: int,
    n_samples: int,
    max_depth: int,
    jitter: str,
    shadow_tmax: str = "reference",
    lod_depth: int = 0,
    pipe: bool = None,
):
    """Radiance sums over ``n_samples`` independent samples for one pixel chunk.

    Per-sample pixel jitter is uniform (``cuda_path_tracer.py:34-36``); in
    ``faithful`` mode the x and y jitters share one draw (the reference reads
    the unadvanced RNG state twice — SURVEY.md §2 quirk 2).  Work is scheduled
    by ray regeneration (see ``_regen_chunk``): same RNG streams and per-item
    math as the per-sample loop over ``path_radiance``, equal up to FMA-level
    reassociation between the two compiled loop bodies (tests/test_regen.py
    bounds the drift; renders for a fixed scheduler are exactly
    deterministic and chunk/shard/progressive-invariant).
    """
    return _regen_chunk(
        cs,
        cam12,
        pix0,
        seed,
        sample_base,
        n_pix=n_pix,
        width=width,
        height=height,
        n_samples=n_samples,
        max_depth=max_depth,
        jitter=jitter,
        shadow_tmax=shadow_tmax,
        lod_depth=lod_depth,
        pipe=pipe,
    )


class TPUPathTracer(WavefrontRenderer):
    """Parity renderer for ``cuda_path_raytracer`` — the flagship model."""

    def __init__(self, sample_group: int = 128, jitter: str = "independent",
                 shadow_tmax: str = "reference", mip_budget: int = 0,
                 texture_lod: int = 0, texture_lod_depth: int = 2, **kw):
        # sample_group 128: the measured knee of the group sweep — Cornell
        # bench 8/16/32/64 -> 156/188/191/219 Mrays/s (budget 256), then the
        # round-3 extension at budget 0: group 128 beats 64 by ~2.5% and
        # group 256 loses ~9% (experiments/measure_group128.py /
        # measure_group256.py); mesh benchmark best at its spp cap of 64
        # (54.8/49.6/39.3/37.8 s steady at groups 8/16/32/64).  Bigger
        # groups amortize dispatch overhead and regeneration tails; the
        # (NS, N) accumulator fold scales with NS and wins past 128.
        # Groups clamp to spp, and renders are group-invariant bit-for-bit
        # (tests/test_regen.py), so this is a pure scheduling knob.
        # independent x/y jitter by default: strictly better sampling, and the
        # reference hero image is a missing blob so there is no RMSE target
        # (BASELINE.md); pass jitter="diagonal" for the quirk-exact stream.
        # shadow_tmax="light" bounds NEE occlusion at the sampled light
        # (physically correct, cheaper for BVH scenes) instead of the
        # reference's 1e6 quirk.
        # mip_budget > 0 enables deferred-texture mode (_regen_chunk doc):
        # camera-bounce textures stay exact, bounces >= 1 sample a
        # mip_budget-capped mip — the exact atlas gather then runs once per
        # path instead of once per bounce.  Measured SLOWER than the exact
        # path on this backend (BENCHMARKS.md); off by default.
        # texture_lod > 0 enables texture-LOD mode: camera rays and bounces
        # below ``texture_lod_depth`` keep the reference-exact full-res
        # gather, deeper bounces sample a texture_lod-capped mip — the
        # HBM-miss-bound share of the big-atlas gather drops to the shallow
        # (screen-coherent) lanes.  RMSE vs the exact path is recorded in
        # BENCHMARKS.md ("Texture LOD"); texture_budget stays untouched.
        assert not (mip_budget and texture_lod), \
            "deferred-texture and texture-LOD modes are mutually exclusive"
        if mip_budget or texture_lod:
            co = dict(kw.pop("compile_overrides", None) or {})
            co.setdefault("mip_budget", int(mip_budget or texture_lod))
            kw["compile_overrides"] = co
        super().__init__("tpu_path_raytracer", jitter=jitter, **kw)
        self.sample_group = int(sample_group)
        self.shadow_tmax = str(shadow_tmax)
        self.lod_depth = int(texture_lod_depth) if texture_lod else 0

    def get_capabilities(self) -> List[str]:
        return [
            "path_tracing",
            "global_illumination",
            "monte_carlo",
            "next_event_estimation",
            "russian_roulette",
            "soft_shadows",
            "caustics",
            "reflection",
            "refraction",
            "textures",
            "aces_tonemapping",
            "tpu_acceleration",
            "progressive_rendering",
            "xla_compute",
        ]

    def _samples_per_group(self, spp: int) -> int:
        return max(1, min(self.sample_group, spp))

    def _make_chunk_fn(self, static_key):
        n_pix, w, h, _spp, max_depth, group, jitter = static_key
        return partial(
            _path_chunk,
            n_pix=n_pix,
            width=w,
            height=h,
            n_samples=group,
            max_depth=max_depth,
            jitter=jitter,
            shadow_tmax=self.shadow_tmax,
            lod_depth=self.lod_depth,
            pipe=_PIPE_REGEN,
        )

    def render_sums(self, scene, camera, settings, sample_offset=0, n_samples=None):
        spp = settings.samples_per_pixel if n_samples is None else n_samples
        group = self._samples_per_group(settings.samples_per_pixel)
        if spp % group != 0:
            # keep groups uniform so there is exactly one compiled chunk fn
            group = next(g for g in range(min(group, spp), 0, -1) if spp % g == 0)
            self.sample_group = group
        return super().render_sums(
            scene, camera, settings, sample_offset=sample_offset, n_samples=spp
        )

    def _finalize_dev(self, sums, spp_total: int, settings):
        return aces(jnp.asarray(sums) / float(spp_total))


RendererFactory.register("tpu_path_raytracer", TPUPathTracer)
RendererFactory.register_alias("cuda_path_raytracer", "tpu_path_raytracer")
