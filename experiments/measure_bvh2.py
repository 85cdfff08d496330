"""Round 2 of BVH traversal measurements: sort-key variants × block sizes.

Timing uses the scan-slope method (k varied iterations inside ONE jit call,
slope between k_lo and k_hi) — per-call timing through the tunnel is
unreliable (CLAUDE.md).
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

from path_tracing__ray_tracer_tpu.compiler import compile_scene
from path_tracing__ray_tracer_tpu.ops.camera import generate_rays
from path_tracing__ray_tracer_tpu.ops.pallas import bvh_pallas as bp
from path_tracing__ray_tracer_tpu.ops.v3 import V3
from path_tracing__ray_tracer_tpu.scene_builders.mesh_scene_builder import (
    MeshSceneBuilder,
)
from experiments.measure_bvh import instrumented_closest

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def scan_slope(body_fn, k_lo=1, k_hi=6):
    """body_fn(i) -> scalar f32; returns seconds per iteration."""

    def run(k):
        @jax.jit
        def f(seed):
            def body(c, i):
                return c + body_fn(i + seed), None

            c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(k, dtype=jnp.int32))
            return c

        f(jnp.int32(0)).block_until_ready()
        t0 = time.time()
        f(jnp.int32(11)).block_until_ready()
        return time.time() - t0

    t_lo = run(k_lo)
    t_hi = run(k_hi)
    return (t_hi - t_lo) / (k_hi - k_lo)


def make_key_fn(root_lo, root_hi, variant, bits=4):
    def spread(v, B):
        r = jnp.zeros_like(v)
        for b in range(B):
            r = r | (((v >> b) & 1) << (3 * b))
        return r

    def key(o, d):
        B = bits
        scale = (2.0**B - 1e-3) / (root_hi - root_lo + 1e-30)
        kx = jnp.clip((o.x - root_lo[0]) * scale[0], 0, 2**B - 1).astype(jnp.int32)
        ky = jnp.clip((o.y - root_lo[1]) * scale[1], 0, 2**B - 1).astype(jnp.int32)
        kz = jnp.clip((o.z - root_lo[2]) * scale[2], 0, 2**B - 1).astype(jnp.int32)
        morton = (spread(kx, B) << 2) | (spread(ky, B) << 1) | spread(kz, B)
        octant = ((d.x > 0).astype(jnp.int32) << 2) | \
                 ((d.y > 0).astype(jnp.int32) << 1) | (d.z > 0).astype(jnp.int32)
        if variant == "morton_major":
            return (morton << 3) | octant
        if variant == "octant_major":
            return (octant << (3 * B)) | morton
        if variant == "dir_fine":
            # finer direction bins: octant + dominant axis + secondary signs
            ax = jnp.abs(d.x); ay = jnp.abs(d.y); az = jnp.abs(d.z)
            dom = jnp.where(ax >= jnp.maximum(ay, az), 0,
                            jnp.where(ay >= az, 1, 2)).astype(jnp.int32)
            dkey = (octant << 2) | dom  # 5 bits
            return (dkey << (3 * B)) | morton
        raise ValueError(variant)

    return key


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=131072)
    args = ap.parse_args()

    b = MeshSceneBuilder()
    scene = b.build_scene()
    cam = b.create_camera(16 / 9)
    cs = compile_scene(scene)
    cam12 = jnp.asarray(cam.packed(), jnp.float32)
    bvh = cs.bvh
    root_lo = np.asarray(bvh.tree_blob[0, 0:3])
    root_hi = np.asarray(bvh.tree_blob[0, 3:6])
    n = args.n
    print(f"tris={cs.n_triangles} nodes={bvh.n_nodes} n={n}")

    rng = np.random.default_rng(1)

    # camera rays: middle band of a 1920x1080 frame (should hit the spheres)
    W, H = 1920, 1080
    idx = np.arange(n) + (H // 2 - n // W // 2) * W
    cx = (idx % W + 0.5) / W
    cy = (idx // W + 0.5) / H
    cam_o, cam_d = generate_rays(cam12, jnp.asarray(cx, jnp.float32),
                                 jnp.asarray(cy, jnp.float32))

    # bounce-like: origins on the 9 icosphere shells, cosine dirs about the normal
    centers = np.array([[dx * 9.0, dy * 9.0, 0.0]
                        for dx in (-1, 0, 1) for dy in (-1, 0, 1)], np.float32)
    ci = rng.integers(0, 9, n)
    nrm = rng.normal(size=(n, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    borg = centers[ci] + nrm * 3.0
    # cosine-weighted hemisphere about nrm
    u1, u2 = rng.random(n, np.float32), rng.random(n, np.float32)
    r = np.sqrt(u1)
    phi = 2 * np.pi * u2
    # local frame
    a = np.where(np.abs(nrm[:, 2:3]) < 0.9, [[0, 0, 1]], [[1, 0, 0]]).astype(np.float32)
    t1 = np.cross(nrm, a); t1 /= np.linalg.norm(t1, axis=1, keepdims=True)
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
        def vary(i, o=o, d=d):
            eps = (i.astype(jnp.float32) + 1.0) * 1e-5
            return V3(o.x + eps, o.y, o.z), d

        # unsorted baseline: steps + time
        for rows in (8, 32):
            bt, bi, steps, leaves = jax.jit(
                partial(instrumented_closest, bvh, t_min=1e-3, t_max=1e6,
                        rows_per_block=rows)
            )(o, d)
            hit_frac = float(jnp.mean((bi >= 0).astype(jnp.float32)))
            def body(i, rows=rows):
                oo, dd = vary(i)
                bt, _ = bp.bvh_closest_pallas(bvh, oo, dd, 1e-3, 1e6)
                return bt.sum()
            saved_rows = bp.TRAV_ROWS
            bp.TRAV_ROWS = rows
            t = scan_slope(body)
            bp.TRAV_ROWS = saved_rows
            print(f"[{kind}] rows={rows} unsorted: steps mean="
                  f"{np.asarray(steps).mean():.0f} hit={hit_frac:.2f} "
                  f"time={t*1e3:.2f} ms = {n/t/1e6:.1f} Mrays/s")

        for variant in ("morton_major", "octant_major", "dir_fine"):
            for bits in (4, 5):
                keyf = make_key_fn(root_lo, root_hi, variant, bits)
                for rows in (8, 32):
                    def sorted_body(i, keyf=keyf, rows=rows):
                        oo, dd = vary(i)
                        k = keyf(oo, dd)
                        iota = jnp.arange(n, dtype=jnp.int32)
                        _k, sx, sy, sz, sdx, sdy, sdz, sidx = jax.lax.sort(
                            [k, oo.x, oo.y, oo.z, dd.x, dd.y, dd.z, iota],
                            num_keys=1, is_stable=True)
                        bt, bi = bp.bvh_closest_pallas(
                            bvh, V3(sx, sy, sz), V3(sdx, sdy, sdz), 1e-3, 1e6)
                        _i, bt_u, bi_u = jax.lax.sort(
                            [sidx, bt, bi.astype(jnp.float32)],
                            num_keys=1, is_stable=True)
                        return bt_u.sum() + bi_u.sum()

                    # step counts on sorted rays
                    k = keyf(o, d)
                    srt = jax.lax.sort(
                        [k, o.x, o.y, o.z, d.x, d.y, d.z], num_keys=1,
                        is_stable=True)
                    so = V3(srt[1], srt[2], srt[3]); sd = V3(srt[4], srt[5], srt[6])
                    _bt, _bi, steps_s, _l = jax.jit(
                        partial(instrumented_closest, bvh, t_min=1e-3,
                                t_max=1e6, rows_per_block=rows)
                    )(so, sd)
                    saved_rows = bp.TRAV_ROWS
                    bp.TRAV_ROWS = rows
                    t = scan_slope(sorted_body)
                    bp.TRAV_ROWS = saved_rows
                    print(f"[{kind}] rows={rows} {variant}/b{bits}: steps mean="
                          f"{np.asarray(steps_s).mean():.0f} "
                          f"time={t*1e3:.2f} ms = {n/t/1e6:.1f} Mrays/s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
