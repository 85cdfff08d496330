"""Texel-index locality study for the windowed-DMA texel scheme (round 5,
VERDICT #2).

The only per-lane dynamic indexing this Mosaic compiles is the in-vreg lane
shuffle (``take_along_axis`` axis=-1, probe_gather.py), so an in-kernel
texel resolve must first land the needed texels in a bounded VMEM window
per block: sort lanes by texel index, DMA ``atlas[start : start+W]``
HBM->VMEM per block, lane-shuffle texels out of the window.  That works
only if a sorted block's index SPAN fits W.  This script measures the real
spans: drive the XLA bounce on the headline config's chunk (131072 lanes of
the 1024 sq frame), compute each bounce's texel indices, and report
per-1024-lane-block span percentiles for textured lanes, sorted by index.

CPU is fine (same RNG, same data) -- run:  python -m experiments.measure_texspan
"""
from __future__ import annotations

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

import path_tracing__ray_tracer_tpu as ptrt  # noqa: E402
from path_tracing__ray_tracer_tpu.models.path_tracer import (  # noqa: E402
    _bounce_xla,
    _U_JITX,
    _U_JITY,
)
from path_tracing__ray_tracer_tpu.ops import rng  # noqa: E402
from path_tracing__ray_tracer_tpu.ops.camera import generate_rays  # noqa: E402
from path_tracing__ray_tracer_tpu.ops.texture import _nearest_index  # noqa: E402
from path_tracing__ray_tracer_tpu.ops.v3 import V3  # noqa: E402

N = 131072
W, H = 1024, 1024
DEPTHS = 5
BLOCK = 1024  # lanes per traversal block (TRAV_ROWS * LANES)

builder = ptrt.CustomSceneBuilder()
scene = builder.build_scene()
camera = builder.create_camera(W / H)
cs = ptrt.compile_scene(scene)
cam12 = ptrt.pack_camera(camera)
print(f"atlas texels: {int(cs.atlas.shape[0])}", flush=True)

idxs = jnp.arange(N, dtype=jnp.int32)
x = (idxs % W).astype(jnp.float32)
y = (idxs // W).astype(jnp.float32)
key = rng.ray_key(jnp.uint32(0), idxs, jnp.int32(0))
r1 = rng.uniform(key, DEPTHS, _U_JITX)
r2 = rng.uniform(key, DEPTHS, _U_JITY)
o, d = generate_rays(cam12, (x + r1) / W, (y + r2) / H)
thr = V3.full(1.0, (N,))


@jax.jit
def one_bounce(o, d, thr, depth):
    return _bounce_xla(cs, o, d, thr, key, depth)


def span_stats(tex_id_f, u, v, label):
    tex_id = np.asarray(tex_id_f)
    textured = tex_id >= 0.0
    frac = textured.mean()
    if textured.sum() < BLOCK:
        print(f"{label}: textured {frac:.3f} (too few lanes)", flush=True)
        return
    idx = np.asarray(
        _nearest_index(
            jnp.asarray(np.where(textured, tex_id, 0.0).astype(np.int32)),
            u, v, cs.tex_width, cs.tex_height, cs.tex_offset, cs.n_textures,
        )
    )
    t_idx = np.sort(idx[textured])
    nb = len(t_idx) // BLOCK
    spans = np.array(
        [t_idx[(b + 1) * BLOCK - 1] - t_idx[b * BLOCK] for b in range(nb)]
    )
    uniq = len(np.unique(t_idx))
    # row-span variant: atlas rows of 128 texels (DMA granularity)
    r_idx = t_idx // 128
    row_spans = np.array(
        [r_idx[(b + 1) * BLOCK - 1] - r_idx[b * BLOCK] + 1 for b in range(nb)]
    )
    q = lambda a, p: int(np.percentile(a, p))
    print(
        f"{label}: textured {frac:.3f}  unique {uniq}  blocks {nb}  "
        f"span p50/p90/max {q(spans,50)}/{q(spans,90)}/{int(spans.max())}  "
        f"rowspan p50/p90/max {q(row_spans,50)}/{q(row_spans,90)}/"
        f"{int(row_spans.max())}",
        flush=True,
    )


depth = jnp.zeros((N,), jnp.int32)
for b in range(DEPTHS):
    out = one_bounce(o, d, thr, depth)
    span_stats(out.tex_id, out.u, out.v, f"bounce {b}")
    o, d = out.new_org, out.new_dir
    depth = depth + 1
print("done", flush=True)
