"""Measure the block-synchronous Pallas BVH walk on the mesh scene (TPU).

Reports, for coherent (camera) and incoherent (bounce-like) ray batches:
  * traversal steps per block (instrumented kernel copy),
  * wall time per batch via the two-point slope method (the tunnel memoizes
    identical-buffer executions, so every call gets distinct inputs).

Usage:  python experiments/measure_bvh.py [--rows 32] [--n 131072]
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
from path_tracing__ray_tracer_tpu.ops.v3 import V3
from path_tracing__ray_tracer_tpu.scene_builders.mesh_scene_builder import (
    MeshSceneBuilder,
)

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _instrumented_kernel(m, leaf_size, t_min, t_max,
                         tree_ref, slot_ref, ox_ref, oy_ref, oz_ref,
                         dx_ref, dy_ref, dz_ref,
                         bt_ref, bi_ref, steps_ref, leaves_ref):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    ivx = 1.0 / jnp.where(jnp.abs(dx) > 1e-12, dx, 1e-12)
    ivy = 1.0 / jnp.where(jnp.abs(dy) > 1e-12, dy, 1e-12)
    ivz = 1.0 / jnp.where(jnp.abs(dz) > 1e-12, dz, 1e-12)

    def cond(carry):
        cursor, *_ = carry
        return cursor < m

    def body(carry):
        cursor, best_t, best_i, steps, leaves = carry
        b = cursor * bp._NODE_F
        box_hit = bp._slab(
            tree_ref[0, b], tree_ref[0, b + 1], tree_ref[0, b + 2],
            tree_ref[0, b + 3], tree_ref[0, b + 4], tree_ref[0, b + 5],
            ox, oy, oz, ivx, ivy, ivz, t_min, best_t,
        )
        skip_i = tree_ref[0, b + 6].astype(jnp.int32)
        base_f = tree_ref[0, b + 7]
        any_hit = jnp.any(box_hit)
        is_leaf = base_f >= 0.0

        def leaf_fn(args):
            bt, bi = args

            def upd(carry2, win, t, gid):
                bt2, bi2 = carry2 if carry2 is not None else (bt, bi)
                w = win & box_hit & (t < bt2)
                bt2 = jnp.where(w, t, bt2)
                bi2 = jnp.where(w, gid.astype(jnp.int32), bi2)
                return bt2, bi2

            return bp._leaf_tris(
                slot_ref, base_f.astype(jnp.int32), leaf_size,
                ox, oy, oz, dx, dy, dz, t_min, upd,
            )

        best_t, best_i = jax.lax.cond(
            any_hit & is_leaf, leaf_fn, lambda a: a, (best_t, best_i)
        )
        cursor = jnp.where(any_hit & ~is_leaf, cursor + 1, skip_i)
        leaves = leaves + (any_hit & is_leaf).astype(jnp.int32)
        return cursor, best_t, best_i, steps + 1, leaves

    init = (
        jnp.int32(0),
        jnp.full_like(ox, t_max),
        jnp.full(ox.shape, -1, jnp.int32),
        jnp.int32(0),
        jnp.int32(0),
    )
    _c, best_t, best_i, steps, leaves = jax.lax.while_loop(cond, body, init)
    bt_ref[:] = best_t
    bi_ref[:] = best_i
    steps_ref[:] = jnp.full(best_i.shape, steps, jnp.int32)
    leaves_ref[:] = jnp.full(best_i.shape, leaves, jnp.int32)


def instrumented_closest(bvh, ro, rd, t_min, t_max, rows_per_block):
    n = ro.x.shape[0]
    rows = n // bp.LANES
    block_rows = min(rows_per_block, rows)
    m = bvh.n_nodes
    leaf_size = int(bvh.slots.shape[1])
    spec = pl.BlockSpec((block_rows, bp.LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    def rows2(a):
        return a.reshape(rows, bp.LANES)

    nblocks = rows // block_rows
    bt, bi, steps, leaves = pl.pallas_call(
        partial(_instrumented_kernel, m, leaf_size, float(t_min), float(t_max)),
        grid=(nblocks,),
        in_specs=[smem, smem] + [spec] * 6,
        out_specs=[spec, spec, spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((rows, bp.LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, bp.LANES), jnp.int32),
            jax.ShapeDtypeStruct((rows, bp.LANES), jnp.int32),
            jax.ShapeDtypeStruct((rows, bp.LANES), jnp.int32),
        ],
    )(
        bvh.tree_blob, bvh.slot_blob,
        rows2(ro.x), rows2(ro.y), rows2(ro.z),
        rows2(rd.x), rows2(rd.y), rows2(rd.z),
    )
    stride = block_rows
    return (bt.reshape(n), bi.reshape(n),
            steps[::stride, 0], leaves[::stride, 0])


def make_rays(cs, cam12, n, kind, seed=0):
    rng = np.random.default_rng(seed)
    if kind == "camera":
        W, H = 1920, 1088
        idx = np.arange(n)
        x = (idx % W + 0.5) / W
        y = (idx // W + 0.5) / H
        o, d = generate_rays(cam12, jnp.asarray(x, jnp.float32),
                             jnp.asarray(y, jnp.float32))
        return o, d
    # bounce-like: origins on the icosphere shells, cosine-ish random dirs
    o = rng.uniform(-14, 14, size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return (V3(*[jnp.asarray(o[:, i]) for i in range(3)]),
            V3(*[jnp.asarray(d[:, i]) for i in range(3)]))


def slope_time(fn, make_input, k_lo=2, k_hi=8):
    """Run fn over k distinct inputs inside one python loop; slope gives
    per-call time free of dispatch floor."""
    def run(k, base):
        outs = []
        t0 = time.time()
        for i in range(k):
            outs.append(fn(*make_input(base + i)))
        for o in outs:
            jax.tree_util.tree_map(
                lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
                o)
        return time.time() - t0

    t_lo = run(k_lo, 100)
    t_hi = run(k_hi, 200)
    return (t_hi - t_lo) / (k_hi - k_lo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=32)
    ap.add_argument("--n", type=int, default=131072)
    args = ap.parse_args()

    bp.TRAV_ROWS = args.rows

    b = MeshSceneBuilder()
    scene = b.build_scene()
    cam = b.create_camera(16 / 9)
    cs = compile_scene(scene)
    cam12 = jnp.asarray(cam.packed(), jnp.float32)
    bvh = cs.bvh
    print(f"tris={cs.n_triangles} nodes={bvh.n_nodes} "
          f"leaf_size={bvh.slots.shape[1]} rows/block={args.rows} n={args.n}")

    n = args.n
    for kind in ("camera", "bounce"):
        o, d = make_rays(cs, cam12, n, kind)

        bt, bi, steps, leaves = jax.jit(
            lambda o, d: instrumented_closest(bvh, o, d, 1e-3, 1e6, args.rows)
        )(o, d)
        steps = np.asarray(steps)
        leaves = np.asarray(leaves)
        hit_frac = float(np.mean(np.asarray(bi) >= 0))
        print(f"[{kind}] steps/block mean={steps.mean():.0f} "
              f"p50={np.percentile(steps,50):.0f} p95={np.percentile(steps,95):.0f} "
              f"max={steps.max()} leaves mean={leaves.mean():.0f} "
              f"(tree nodes {bvh.n_nodes}) hit={hit_frac:.2f}")

        # timing: plain production kernel, distinct inputs each call
        base_o, base_d = o, d

        def make_input(i):
            # shift origins slightly: distinct buffers, same distribution
            eps = jnp.float32(1e-4 * (i + 1))
            return (V3(base_o.x + eps, base_o.y, base_o.z), base_d)

        f = jax.jit(lambda o, d: bp.bvh_closest_pallas(bvh, o, d, 1e-3, 1e6))
        f(*make_input(0))  # compile
        per_call = slope_time(f, make_input)
        mrays = n / per_call / 1e6
        print(f"[{kind}] closest: {per_call*1e3:.2f} ms / {n} rays = "
              f"{mrays:.1f} Mrays/s  "
              f"({per_call/steps.mean()/ (n//bp.LANES//min(args.rows, n//bp.LANES)) *1e9:.0f} ns/step/block)")

        # ---- sorted variant: bin rays by (origin morton, direction octant) --
        root_lo = np.asarray(bvh.tree_blob[0, 0:3])
        root_hi = np.asarray(bvh.tree_blob[0, 3:6])

        def sort_key(o, d):
            B = 4  # bits per axis
            scale = (2.0**B - 1e-3) / (root_hi - root_lo + 1e-30)
            kx = jnp.clip((o.x - root_lo[0]) * scale[0], 0, 2**B - 1).astype(jnp.int32)
            ky = jnp.clip((o.y - root_lo[1]) * scale[1], 0, 2**B - 1).astype(jnp.int32)
            kz = jnp.clip((o.z - root_lo[2]) * scale[2], 0, 2**B - 1).astype(jnp.int32)
            # interleave bits (morton)
            def spread(v):
                r = jnp.zeros_like(v)
                for b in range(B):
                    r = r | (((v >> b) & 1) << (3 * b))
                return r
            morton = (spread(kx) << 2) | (spread(ky) << 1) | spread(kz)
            octant = ((d.x > 0).astype(jnp.int32) << 2) | \
                     ((d.y > 0).astype(jnp.int32) << 1) | (d.z > 0).astype(jnp.int32)
            return (morton << 3) | octant

        def sorted_closest(o, d):
            key = sort_key(o, d)
            iota = jnp.arange(o.x.shape[0], dtype=jnp.int32)
            _k, sx, sy, sz, sdx, sdy, sdz, sidx = jax.lax.sort(
                [key, o.x, o.y, o.z, d.x, d.y, d.z, iota], num_keys=1,
                is_stable=True)
            so = V3(sx, sy, sz)
            sd = V3(sdx, sdy, sdz)
            bt, bi = bp.bvh_closest_pallas(bvh, so, sd, 1e-3, 1e6)
            _i, bt_u, bi_u = jax.lax.sort(
                [sidx, bt, bi], num_keys=1, is_stable=True)
            return bt_u, bi_u

        fs = jax.jit(sorted_closest)
        bt_ref, bi_ref_ = f(*make_input(0))
        bt2, bi2 = fs(*make_input(0))
        same = bool(jnp.all(bt2 == bt_ref) & jnp.all(bi2 == bi_ref_))
        per_call = slope_time(fs, make_input)
        mrays = n / per_call / 1e6
        print(f"[{kind}] sorted closest: {per_call*1e3:.2f} ms = {mrays:.1f} "
              f"Mrays/s  bitexact_vs_unsorted={same}")

        # sorted step counts
        key = sort_key(o, d)
        iota = jnp.arange(n, dtype=jnp.int32)
        _k, sx, sy, sz, sdx, sdy, sdz, _i = jax.lax.sort(
            [key, o.x, o.y, o.z, d.x, d.y, d.z, iota], num_keys=1, is_stable=True)
        _bt, _bi, steps_s, leaves_s = jax.jit(
            lambda o, d: instrumented_closest(bvh, o, d, 1e-3, 1e6, args.rows)
        )(V3(sx, sy, sz), V3(sdx, sdy, sdz))
        steps_s = np.asarray(steps_s)
        print(f"[{kind}] sorted steps/block mean={steps_s.mean():.0f} "
              f"p50={np.percentile(steps_s,50):.0f} "
              f"p95={np.percentile(steps_s,95):.0f} max={steps_s.max()}")

    return 0


if __name__ == "__main__":
    raise SystemExit(main())
