"""Decompose the paged-walk bounce cost on the 128K-tri scene (round 5).

The full phase-2 schedule (page-major sort + cull + skip) measured only +7%
end-to-end (measure_page_sort.py); this pins down why, by measuring on one
131072-lane batch of camera / bounce-like rays:

1. PEND STATISTICS from the real phase-1 kernel outputs (plo/phi/best):
   pages pended per lane, pages live after the final-best cull, distinct
   live pages per 1024-lane block under the spatial sort vs the page-major
   sort, and the total number of (block, page) walks each schedule incurs —
   the block-synchronous cost model's work term.
2. TIMING via scan-slope: phase 1 alone (ps sweep + top walk) vs the full
   closest walk, under base and full schedules.

Run:  python -m experiments.measure_paged_decomp [--n 131072]
"""
from __future__ import annotations

import argparse
import os
import time
from functools import partial

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from path_tracing__ray_tracer_tpu.compiler import compile_scene
from path_tracing__ray_tracer_tpu.ops.camera import generate_rays
from path_tracing__ray_tracer_tpu.ops.pallas import bvh_pallas as bp
from path_tracing__ray_tracer_tpu.ops.pallas import bvh_paged_pallas as bpp
from path_tracing__ray_tracer_tpu.ops.v3 import V3
from path_tracing__ray_tracer_tpu.scene_builders.mesh_scene_builder import (
    MeshSceneBuilder,
)

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BLOCK = bp.TRAV_ROWS * bp.LANES


def scan_slope(body_fn, k_lo=1, k_hi=6):
    def run(k):
        @jax.jit
        def f(seed):
            def body(c, i):
                return c + body_fn(i + seed), None

            c, _ = jax.lax.scan(body, jnp.float32(0),
                                jnp.arange(k, dtype=jnp.int32))
            return c

        f(jnp.int32(0)).block_until_ready()
        t0 = time.time()
        f(jnp.int32(11)).block_until_ready()
        return time.time() - t0

    t_lo = run(k_lo)
    t_hi = run(k_hi)
    return (t_hi - t_lo) / (k_hi - k_lo)


def top_phase(cs, o, d, t_min=1e-3, t_max=1e6):
    """Phase 1 exactly as the wrapper launches it (spatial sort included);
    returns flat (n,) best_t, plo, phi in SORTED lane order."""
    n = o.x.shape[0]
    gid_offset = cs.n_planes + cs.n_spheres + cs.n_quads
    bvh = cs.bvh
    key = bp._sort_key(bvh, o, d)
    _k, sx, sy, sz, sdx, sdy, sdz = jax.lax.sort(
        [key, o.x, o.y, o.z, d.x, d.y, d.z], num_keys=1, is_stable=True)
    o, d = V3(sx, sy, sz), V3(sdx, sdy, sdz)
    (pg, rows, block_rows, m4t, m4p, leaf_size, layout, ps_blob, spec,
     smem) = bpp._paged_geom(cs, n)

    def r2(a):
        return a.reshape(rows, bp.LANES)

    f32 = jax.ShapeDtypeStruct((rows, bp.LANES), jnp.float32)
    i32 = jax.ShapeDtypeStruct((rows, bp.LANES), jnp.int32)
    ray_args = (r2(o.x), r2(o.y), r2(o.z), r2(d.x), r2(d.y), r2(d.z))
    out = pl.pallas_call(
        partial(bpp._paged_top_closest_kernel, m4t, leaf_size, layout,
                gid_offset, float(t_min), float(t_max)),
        grid=(rows // block_rows,),
        in_specs=[smem, smem, smem] + [spec] * 6,
        out_specs=[spec] * 9,
        out_shape=[f32, i32] + [f32] * 5 + [i32, i32],
        scratch_shapes=[pltpu.SMEM((bp._STACK_CAP,), jnp.int32)],
    )(pg.top_tree, pg.top_slot, ps_blob, *ray_args)
    bt, _bi, _u, _v, _nx, _ny, _nz, plo, phi = out
    return (bt.reshape(n), plo.reshape(n), phi.reshape(n), o, d)


def pend_stats(cs, o, d, label):
    pg = cs.bvh.paged
    n = int(o.x.shape[0])
    bt, plo, phi, so, sd = jax.jit(partial(top_phase, cs))(o, d)
    live_k = []
    pendc = np.zeros(n, np.int64)
    livec = np.zeros(n, np.int64)
    live_by_page = []
    for p in range(pg.n_pages):
        pendb = np.asarray(bpp._page_bit(plo, phi, p)) > 0.5
        liveb = pendb & np.asarray(
            bpp._page_root_slab(pg, p, so, sd, 1e-3, bt))
        pendc += pendb
        livec += liveb
        live_by_page.append(liveb)
    live = np.stack(live_by_page)  # (P, n) in SPATIAL sort order
    key2 = np.asarray(
        bpp._first_page_key(
            pg, plo, phi,
            lambda p: bpp._page_root_slab(pg, p, so, sd, 1e-3, bt)))
    order = np.argsort(key2, kind="stable")
    live_pm = live[:, order]

    def blockwalks(lv):
        b = lv[:, : (n // BLOCK) * BLOCK].reshape(len(lv), -1, BLOCK)
        per_block_pages = b.any(-1).sum(0)  # distinct live pages per block
        return int(b.any(-1).sum()), per_block_pages

    w_sp, pb_sp = blockwalks(live)
    w_pm, pb_pm = blockwalks(live_pm)
    print(f"[{label}] pages={pg.n_pages} "
          f"pend/lane mean {pendc.mean():.2f} "
          f"live/lane mean {livec.mean():.2f} "
          f"| block-walks spatial {w_sp} (pages/block mean "
          f"{pb_sp.mean():.2f} p90 {np.percentile(pb_sp, 90):.0f}) "
          f"-> page-major {w_pm} (mean {pb_pm.mean():.2f} p90 "
          f"{np.percentile(pb_pm, 90):.0f})", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=131072)
    ap.add_argument("--timing", action="store_true")
    args = ap.parse_args()
    n = args.n

    b = MeshSceneBuilder(grid=5, subdivisions=4)
    scene = b.build_scene()
    cam = b.create_camera(16 / 9)
    cs = compile_scene(scene, use_bvh=True)
    cam12 = jnp.asarray(cam.packed(), jnp.float32)
    print(f"tris={cs.n_triangles} pages={cs.bvh.paged.n_pages}", flush=True)

    rng = np.random.default_rng(1)
    W, H = 1920, 1080
    idx = (np.arange(n) + (H // 2 - n // W // 2) * W) % (W * H)
    cx = (idx % W + 0.5) / W
    cy = (idx // W + 0.5) / H
    cam_o, cam_d = generate_rays(cam12, jnp.asarray(cx, jnp.float32),
                                 jnp.asarray(cy, jnp.float32))

    centers = np.array([[dx * 9.0, dy * 9.0, 0.0]
                        for dx in (-2, -1, 0, 1, 2) for dy in (-2, -1, 0, 1, 2)],
                       np.float32) * 0.6
    ci = rng.integers(0, len(centers), n)
    nrm = rng.normal(size=(n, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    borg = centers[ci] + nrm * 3.0
    u1, u2 = rng.random(n, np.float32), rng.random(n, np.float32)
    r = np.sqrt(u1)
    phi = 2 * np.pi * u2
    a = np.where(np.abs(nrm[:, 2:3]) < 0.9, [[0, 0, 1]], [[1, 0, 0]]).astype(np.float32)
    t1 = np.cross(nrm, a)
    t1 /= np.linalg.norm(t1, axis=1, keepdims=True)
    t2 = np.cross(nrm, t1)
    bdir = (t1 * (r * np.cos(phi))[:, None] + t2 * (r * np.sin(phi))[:, None]
            + nrm * np.sqrt(1 - u1)[:, None]).astype(np.float32)
    bdir /= np.linalg.norm(bdir, axis=1, keepdims=True)

    rays = {
        "camera": (cam_o, cam_d),
        "bounce": (V3(*[jnp.asarray(borg[:, i]) for i in range(3)]),
                   V3(*[jnp.asarray(bdir[:, i]) for i in range(3)])),
    }
    for kind, (o, d) in rays.items():
        pend_stats(cs, o, d, kind)

    if args.timing:
        for kind, (o, d) in rays.items():
            def vary(i, o=o, d=d):
                eps = (i.astype(jnp.float32) + 1.0) * 1e-5
                return V3(o.x + eps, o.y, o.z), d

            def body_top(i):
                oo, dd = vary(i)
                bt, _plo, _phi, _o, _d = top_phase(cs, oo, dd)
                return bt.sum()

            t_top = scan_slope(body_top)

            def body_full(i):
                oo, dd = vary(i)
                bt, *_ = bpp.bvh_paged_scene_closest_pallas(cs, oo, dd,
                                                            1e-3, 1e6)
                return bt.sum()

            for name, flags in (("base", (False, False, False)),
                                ("full", (True, True, True))):
                bpp.PAGE_SORT, bpp.PAGE_CULL, bpp.PAGE_COND_SKIP = flags
                jax.clear_caches()
                t_full = scan_slope(body_full)
                print(f"[{kind}] {name}: full {t_full*1e3:.2f} ms "
                      f"(phase1+sort {t_top*1e3:.2f} ms, pages "
                      f"{(t_full-t_top)*1e3:.2f} ms)", flush=True)
            bpp.PAGE_SORT = bpp.PAGE_CULL = bpp.PAGE_COND_SKIP = True


if __name__ == "__main__":
    main()
