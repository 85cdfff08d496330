"""Measure the textured-hit lane fraction per bounce on the Cornell bench
scene (CPU, small frame — the fraction is a geometry property, not a
resolution one).

Motivation: the per-bounce atlas gather costs a flat ~7 ns/lane for ALL
lanes (0.92 ms of a 131K-lane Cornell bounce), but only lanes whose winning
primitive is textured need it.  If the textured fraction is well below 1/2,
a compacted gather (textured lanes sorted to a static prefix, lax.cond
fallback when the prefix overflows) saves proportionally.

Run: python -m experiments.measure_texfrac
"""
from __future__ import annotations

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import path_tracing__ray_tracer_tpu as ptrt
from path_tracing__ray_tracer_tpu.compiler import compile_scene
from path_tracing__ray_tracer_tpu.models import path_tracer as pt
from path_tracing__ray_tracer_tpu.ops import rng
from path_tracing__ray_tracer_tpu.ops.camera import generate_rays
from path_tracing__ray_tracer_tpu.ops.v3 import V3


def main():
    b = ptrt.CustomSceneBuilder()
    scene = b.build_scene()
    cam = b.create_camera(1.0)
    cs = compile_scene(scene)
    cam12 = jnp.asarray(cam.packed(), jnp.float32)

    W = H = 64
    n = W * H
    xs = (jnp.arange(n) % W).astype(jnp.float32)
    ys = (jnp.arange(n) // W).astype(jnp.float32)
    max_depth = 8
    seed = jnp.int32(7)

    idx = jnp.arange(n, dtype=jnp.int32)
    key = rng.ray_key(seed, idx, jnp.int32(0))
    r1 = rng.uniform(key, max_depth, pt._U_JITX)
    r2 = rng.uniform(key, max_depth, pt._U_JITY)
    o, d = generate_rays(cam12, (xs + r1) / W, (ys + r2) / H)

    thr = V3.full(1.0, (n,))
    active = jnp.ones((n,), bool)

    @jax.jit
    def bounce(o, d, thr, key, depth):
        return pt._bounce_xla(cs, o, d, thr, key, depth)

    print(f"lanes={n} depth={max_depth}")
    for depth in range(max_depth):
        out = bounce(o, d, thr, key, jnp.int32(depth))
        textured = (out.tex_id >= 0.0) & active
        hit = out.hit & active
        na = int(jnp.sum(active))
        print(
            f"bounce {depth}: active={na/n:6.1%} hit={int(jnp.sum(hit))/max(na,1):6.1%} "
            f"textured={int(jnp.sum(textured))/max(na,1):6.1%} "
            f"textured/all_lanes={int(jnp.sum(textured))/n:6.1%}"
        )
        from path_tracing__ray_tracer_tpu.ops.texture import resolve_base_color

        base = resolve_base_color(
            cs, out.mat_color, (out.tex_id >= 0.0).astype(jnp.float32),
            out.tex_id.astype(jnp.int32), out.u, out.v,
        )
        live = active & out.hit & ~out.killed
        thr_new = thr * out.rr_scale * (
            base * out.t_thr + V3(out.s_thr, out.s_thr, out.s_thr)
        )
        thr = V3.where(live, thr_new, thr)
        live = live & (thr.max_component() >= 0.001)
        o = V3.where(live, out.new_org, o)
        d = V3.where(live, out.new_dir, d)
        active = live

    # steady-state regen mix: weight each bounce's textured count by its
    # active share -> the fraction of gather work that is textured in the
    # regeneration scheduler (every lane busy every iteration, mixed depths)
    print("\n(regen-steady fraction is the active-weighted mean above)")


if __name__ == "__main__":
    main()
