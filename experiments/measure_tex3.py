"""Texture-LOD groundwork measurements (round 3):

1. HLO gather cost for TINY tables (256–4096 entries) — round 2 measured a
   flat 7.15 ns/element for 4K–262K; below 4K is unknown.
2. MXU one-hot gather cost at mip-scale tables (R = 14/56/126/224 rows of
   128) as a function of BLOCK — round 2 measured 0.50 ms at R=32 with
   BLOCK=1024, suspected per-block pipeline overhead, so bigger blocks
   should collapse the cost for small R (one-hot VMEM = BLOCK·R·2 bytes).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python experiments/measure_tex3.py
"""
from __future__ import annotations

import os
from functools import partial

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from experiments.measure_bvh2 import scan_slope

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = 131072
rng = np.random.default_rng(0)

# ---- 1. tiny-table HLO gather ------------------------------------------------
print("== HLO gather vs tiny table size (131072 lanes) ==", flush=True)
base_idx = jnp.asarray(rng.integers(0, 1 << 20, N, dtype=np.int32))
for tsize in (128, 256, 1024, 4096, 65536):
    table = jnp.asarray(rng.integers(0, 1 << 24, tsize, dtype=np.int32))

    def body(i, table=table, tsize=tsize):
        idx = jnp.remainder(base_idx + i, tsize)
        return table[idx].sum().astype(jnp.float32)

    t = scan_slope(body)
    print(f"  table={tsize:6d}: {t*1e3:.3f} ms = {t/N*1e9:.2f} ns/elem", flush=True)

# ---- 2. MXU one-hot gather at mip scale ---------------------------------------
print("== MXU one-hot gather (3 channels) vs R, BLOCK ==", flush=True)


def _gather_kernel(n_rows, block, r_ref, g_ref, b_ref, idx_ref,
                   or_ref, og_ref, ob_ref):
    idx = idx_ref[:]
    trow = idx // 128
    tlane = idx % 128
    oh = (jax.lax.broadcasted_iota(jnp.int32, (block, n_rows), 1) == trow
          ).astype(jnp.bfloat16)
    lane_oh = (jax.lax.broadcasted_iota(jnp.int32, (block, 128), 1) == tlane
               ).astype(jnp.float32)
    for table, out in ((r_ref, or_ref), (g_ref, og_ref), (b_ref, ob_ref)):
        row_vals = jnp.dot(oh, table[:], preferred_element_type=jnp.float32)
        out[:] = jnp.sum(row_vals * lane_oh, axis=1, keepdims=True)


def mxu_gather(tables, idx, block):
    n_rows = int(tables[0].shape[0])
    idx2 = idx.reshape(N, 1)
    spec_tbl = pl.BlockSpec(memory_space=pltpu.VMEM)
    spec_ray = pl.BlockSpec((block, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((N, 1), jnp.float32)
    r, g, b = pl.pallas_call(
        partial(_gather_kernel, n_rows, block),
        grid=(N // block,),
        in_specs=[spec_tbl] * 3 + [spec_ray],
        out_specs=[spec_ray] * 3,
        out_shape=[shape] * 3,
    )(*tables, idx2)
    return r, g, b


for R in (14, 56, 126, 224, 448):
    tables = tuple(
        jnp.asarray(rng.integers(0, 256, (R, 128)).astype(np.float32), jnp.bfloat16)
        for _ in range(3)
    )
    for block in (1024, 4096, 8192):
        if block * R * 2 > 6 << 20:  # one-hot VMEM guard
            continue

        def body(i, tables=tables, R=R, block=block):
            idx = jnp.remainder(base_idx + i, R * 128)
            r, g, b = mxu_gather(tables, idx, block)
            return (r.sum() + g.sum() + b.sum())

        t = scan_slope(body)
        print(f"  R={R:4d} block={block:5d}: {t*1e3:.3f} ms", flush=True)
