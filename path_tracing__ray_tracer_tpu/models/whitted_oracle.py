"""CPU-parity Whitted renderer — the TPU equivalent of the reference's
``cpu_raytracer`` (``renderers/cpu_renderer.py``), which serves as the slow
physics oracle the GPU renderers were compared against.

Physics (all from ``cpu_renderer.py:75-151``):

* ambient = ``diffuse · base · scene.ambient`` — the only renderer that reads
  the scene's tuned ``ambient``/``light_color`` globals (SURVEY.md §2
  quirk 12);
* per-light Lambert with **no distance falloff**, Phong with the reference's
  inverted half-vector (``to_light.reflect(n)`` against the view vector) and
  fixed shininess 32;
* unlike every GPU renderer, the recursion **forks into both** reflection and
  refraction (``cpu_renderer.py:113-142``), mixed as
  ``local·(1−kr−kt) + kr·R + kt·T``.

The fork makes the wavefront cost 2^depth, so this renderer statically
unrolls the recursion and clamps depth to ``ORACLE_MAX_DEPTH`` (the energy in
deeper fork chains is below 0.85^8 of a single glass path; documented in
QUIRKS.md).  It compiles the scene with the host conventions: plane
``v = n × u`` and no GPU wire-format masking (planes/triangles may refract,
any primitive may be textured).
"""
from __future__ import annotations

import math
from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import rng
from ..ops.camera import generate_rays
from ..ops.intersect import gather_material, scene_hit, scene_hit_any
from ..ops.texture import resolve_base_color
from ..ops.v3 import V3, refract
from .base import RendererFactory
from .wavefront import WavefrontRenderer, pixel_coords

_T_MIN = 1e-3
_EPS_OFFSET = 1e-3
ORACLE_MAX_DEPTH = 8  # fork-evaluation depth cap (2^d lanes; see QUIRKS.md)
# deepest-level lane budget: bounds the level arrays' memory (the forward
# pass saves ~6 floats per lane across all levels ≈ 2x the deepest level)
_LEVEL_LANE_BUDGET = 1 << 22


def _shade_local(cs, hit, base_color, mats, ray_origin: V3) -> V3:
    (_c, diffuse, specular, _refl, _refr, _ior, _ht, _tid) = mats
    normal = hit.normal
    point = hit.point

    local = base_color * cs.ambient * diffuse
    n_lights = cs.n_lights
    if n_lights == 0:
        return local

    shadow_org = point + normal * _EPS_OFFSET
    inv_n = 1.0 / n_lights

    def light_body(li, acc):
        lp = cs.lights.at_index(li)
        to_light_raw = lp - point
        dist = to_light_raw.norm()
        ldir = to_light_raw.normalized()
        occluded = scene_hit_any(cs, shadow_org, ldir, _T_MIN, dist)

        diff = jnp.maximum(normal.dot(ldir), 0.0)
        lambert = base_color * cs.light_color * (diffuse * diff * inv_n)

        # reference Phong: reflect the *light* vector (cpu_renderer.py:107-110)
        view = (ray_origin - point).normalized()
        refl_l = ldir.reflect(normal)
        spec = jnp.maximum(view.dot(refl_l), 0.0)
        phong = cs.light_color * (specular * jnp.power(spec, 32.0) * inv_n)

        return acc + V3.where(~occluded, lambert + phong, V3.of(0.0, 0.0, 0.0))

    zero = V3.full(0.0, hit.t.shape)
    return local + jax.lax.fori_loop(0, n_lights, light_body, zero)


def _interleave(a: V3, b: V3) -> V3:
    """Children of parent ``j`` land at ``2j`` (reflection) and ``2j+1``
    (refraction) — a pure reshape, so the level fan-out needs no gathers."""
    def ix(u, v):
        return jnp.stack([u, v], axis=1).reshape(-1)

    return V3(ix(a.x, b.x), ix(a.y, b.y), ix(a.z, b.z))


def _trace(cs, org: V3, rd: V3, depth: int, max_depth: int, active) -> V3:
    """Level-synchronous evaluation of the reference's fork recursion.

    The reference CPU renderer forks into *both* reflection and refraction
    (``cpu_renderer.py:113-142``).  Round 1 statically unrolled that
    recursion — 2^depth inlined subgraphs, 244 s to compile at depth 8.  This
    formulation evaluates the same tree **level by level**: level ``k`` is
    one batch of ``n·2^k`` lanes (reflection/refraction children interleaved),
    so the compiled graph is ``depth`` stages, and the backward pass combines
    ``local·(1−kr−kt) + kr·R + kt·T`` bottom-up with reshapes only.
    Per-lane arithmetic is identical to the recursive form.
    """
    n = int(org.x.shape[0])

    def level_segment(o, d, act):
        """One constant-width (n-lane) segment of a level: shade + fork.

        Constant width matters: every Pallas intersect kernel inside gets
        compiled for exactly one shape, so the whole oracle costs one Mosaic
        compile set instead of one per level."""
        hit = scene_hit(cs, o, d, _T_MIN, 1e30)
        mats = gather_material(cs.materials, hit.prim)
        (mcolor, _diff, _spec, reflective, refractive, ior, has_tex, tex_id) = mats
        base = resolve_base_color(cs, mcolor, has_tex, tex_id, hit.u, hit.v)
        local = _shade_local(cs, hit, base, mats, o)
        lane = act & hit.hit

        normal = hit.normal
        point = hit.point
        # reflection branch (cpu_renderer.py:113-117); Ray() normalizes
        refl_dir = d.reflect(normal).normalized()
        refl_org = point + normal * _EPS_OFFSET
        want_refl = lane & (reflective > 0.0)

        # refraction branch (cpu_renderer.py:119-142)
        inside = d.dot(normal) > 0.0
        outward = V3.where(inside, -normal, normal)
        eta = jnp.where(inside, ior, 1.0 / ior)
        ok, refr_dir = refract(d, outward, eta)
        # quirk: refracted rays always offset along −n, even when exiting
        refr_org = point - normal * _EPS_OFFSET
        branch_dir = V3.where(ok, refr_dir.normalized(), refl_dir)
        branch_org = V3.where(ok, refr_org, refl_org)
        want_refr = lane & (refractive > 0.0)

        child_o = _interleave(refl_org, branch_org)
        child_d = _interleave(refl_dir, branch_dir)
        child_act = jnp.stack([want_refl, want_refr], axis=1).reshape(-1)
        return (local, reflective, refractive, lane), (child_o, child_d, child_act)

    o, d, act = org, rd, active
    saved = []

    # ---- forward: shade every level, fan out masked children ----------------
    for k in range(max_depth + 1):
        segs = 2 ** k
        if segs == 1:
            (local, kr, kt, lane), (child_o, child_d, child_act) = level_segment(
                o, d, act
            )
        else:
            # level k is 2^k constant-width segments processed sequentially
            W = segs * n

            def seg_body(j, carry):
                (lx, ly, lz, kr_a, kt_a, lane_a,
                 cox, coy, coz, cdx, cdy, cdz, ca) = carry
                s = j * n

                def seg(a):
                    return jax.lax.dynamic_slice(a, (s,), (n,))

                so = V3(seg(o.x), seg(o.y), seg(o.z))
                sd = V3(seg(d.x), seg(d.y), seg(d.z))
                (loc, kr_s, kt_s, lane_s), (co, cd, cact) = level_segment(
                    so, sd, seg(act)
                )

                def put(dst, val, off):
                    return jax.lax.dynamic_update_slice(dst, val, (off,))

                return (
                    put(lx, loc.x, s), put(ly, loc.y, s), put(lz, loc.z, s),
                    put(kr_a, kr_s, s), put(kt_a, kt_s, s), put(lane_a, lane_s, s),
                    put(cox, co.x, 2 * s), put(coy, co.y, 2 * s), put(coz, co.z, 2 * s),
                    put(cdx, cd.x, 2 * s), put(cdy, cd.y, 2 * s), put(cdz, cd.z, 2 * s),
                    put(ca, cact, 2 * s),
                )

            zf = jnp.zeros((W,), jnp.float32)
            z2 = jnp.zeros((2 * W,), jnp.float32)
            init = (zf, zf, zf, zf, zf, jnp.zeros((W,), bool),
                    z2, z2, z2, z2, z2, z2, jnp.zeros((2 * W,), bool))
            (lx, ly, lz, kr, kt, lane,
             cox, coy, coz, cdx, cdy, cdz, child_act) = jax.lax.fori_loop(
                0, segs, seg_body, init
            )
            local = V3(lx, ly, lz)
            child_o = V3(cox, coy, coz)
            child_d = V3(cdx, cdy, cdz)

        saved.append((local, kr, kt, lane))
        if k == max_depth:
            break
        o, d, act = child_o, child_d, child_act

    # ---- backward: combine children into parents ----------------------------
    color = None
    for local, kr, kt, lane in reversed(saved):
        if color is None:
            c = local * (1.0 - kr - kt)
        else:
            pair_x = color.x.reshape(-1, 2)
            pair_y = color.y.reshape(-1, 2)
            pair_z = color.z.reshape(-1, 2)
            reflected = V3(pair_x[:, 0], pair_y[:, 0], pair_z[:, 0])
            refracted = V3(pair_x[:, 1], pair_y[:, 1], pair_z[:, 1])
            c = (
                local * (1.0 - kr - kt)
                + reflected * kr
                + refracted * kt
            )
        color = V3.where(lane, c, V3.full(0.0, lane.shape))
    return color


@partial(
    jax.jit,
    static_argnames=(
        "n_pix", "width", "height", "spp", "max_depth", "n_samples", "jitter",
    ),
)
def _oracle_chunk(
    cs,
    cam12,
    pix0,
    seed,
    sample_base,
    *,
    n_pix: int,
    width: int,
    height: int,
    spp: int,
    max_depth: int,
    n_samples: int,
    jitter: str,
):
    idx, x, y = pixel_coords(pix0, n_pix, width, height)
    grid_n = int(math.isqrt(spp))
    grid_total = grid_n * grid_n

    def sample_body(s, acc):
        cell = sample_base + s
        a = (cell // grid_n).astype(jnp.float32)
        b = (cell % grid_n).astype(jnp.float32)
        key = rng.ray_key(seed, idx, cell)
        # the reference CPU sampler draws two independent uniforms
        # (cpu_renderer.py:49-50) — no du==dv quirk here
        if jitter == "center":
            r1 = r2 = jnp.float32(0.5)
        else:
            r1 = rng.uniform(key, max_depth, 0)
            r2 = r1 if jitter == "diagonal" else rng.uniform(key, max_depth, 1)
        u = (x + (a + r1) / grid_n) / width
        v = (y + (b + r2) / grid_n) / height
        o, d = generate_rays(cam12, u, v)
        ones = jnp.ones((n_pix,), dtype=bool)
        radiance = _trace(cs, o, d, 0, max_depth, ones)
        return acc + V3.where(cell < grid_total, radiance, V3.of(0.0, 0.0, 0.0))

    return jax.lax.fori_loop(0, n_samples, sample_body, V3.full(0.0, (n_pix,)))


class CPUParityRayTracer(WavefrontRenderer):
    """Registered as ``cpu_raytracer``: the reference oracle's physics, but
    still executed as vectorized XLA (on the CPU backend when no TPU is
    present — the degradation path mirroring the reference's CUDA probe,
    ``main.py:11-20``)."""

    convention = "cpu"
    gpu_parity = False
    # reference prints "CPU is working for you...: <rows>" every 50 rows
    # (cpu_renderer.py:64-65); here each finished chunk reports row progress
    progress_label = "CPU is working for you..."

    def __init__(self, **kw):
        kw.setdefault("jitter", "independent")
        super().__init__("cpu_raytracer", **kw)

    def get_capabilities(self) -> List[str]:
        return [
            "ray_tracing",
            "shadows",
            "reflection",
            "refraction",
            "area_lights",
            "anti_aliasing",
            "bvh_acceleration",
        ]

    def _samples_per_group(self, spp: int) -> int:
        return max(1, int(math.isqrt(spp)) ** 2)

    def _plan(self, w, h, spp, max_depth):
        # level-synchronous evaluation allocates n_pix·2^depth lanes at the
        # deepest level; shrink the pixel chunk so that stays bounded
        depth = min(max_depth, ORACLE_MAX_DEPTH)
        group = self._samples_per_group(spp)
        budget_rays = max(1024, _LEVEL_LANE_BUDGET >> depth) * max(group, 1)
        old = self.chunk_rays
        self.chunk_rays = min(old, budget_rays)
        try:
            return super()._plan(w, h, spp, max_depth)
        finally:
            self.chunk_rays = old

    def _make_chunk_fn(self, static_key):
        n_pix, w, h, spp, max_depth, group, jitter = static_key
        depth = min(max_depth, ORACLE_MAX_DEPTH)
        return partial(
            _oracle_chunk,
            n_pix=n_pix,
            width=w,
            height=h,
            spp=spp,
            max_depth=depth,
            n_samples=group,
            jitter=jitter,
        )

    def render_sums(self, scene, camera, settings, sample_offset=0, n_samples=None):
        return super().render_sums(
            scene,
            camera,
            settings,
            sample_offset=0,
            n_samples=self._samples_per_group(settings.samples_per_pixel),
        )

    def _finalize(self, sums: np.ndarray, spp_total: int, settings) -> np.ndarray:
        # same ⌊√spp⌋²-sum / requested-spp division as the reference
        # (cpu_renderer.py:40,58)
        return sums / float(spp_total)


RendererFactory.register("cpu_raytracer", CPUParityRayTracer)
