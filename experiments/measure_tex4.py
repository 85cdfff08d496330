"""MXU one-hot mip gather, VMEM-frugal: ONE dot + ONE mask-reduce per block
by packing RGB into a single f32 value (R + 256 G + 65536 B — 24-bit ints are
exact in f32).  measure_tex3's 3-channel variant OOM'd scoped VMEM at
block=4096 (3 live (block,128) row_vals); this one keeps a single row_vals.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python experiments/measure_tex4.py
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
base_idx = jnp.asarray(rng.integers(0, 1 << 20, N, dtype=np.int32))


def _kernel(n_rows, block, tbl_ref, idx_ref, out_ref):
    idx = idx_ref[:]
    trow = idx // 128
    tlane = idx % 128
    oh = (jax.lax.broadcasted_iota(jnp.int32, (block, n_rows), 1) == trow
          ).astype(jnp.float32)
    row_vals = jnp.dot(oh, tbl_ref[:], preferred_element_type=jnp.float32)
    lane_oh = (jax.lax.broadcasted_iota(jnp.int32, (block, 128), 1) == tlane
               ).astype(jnp.float32)
    out_ref[:] = jnp.sum(row_vals * lane_oh, axis=1, keepdims=True)


def mxu_gather(table, idx, block):
    n_rows = int(table.shape[0])
    idx2 = idx.reshape(N, 1)
    spec_tbl = pl.BlockSpec(memory_space=pltpu.VMEM)
    spec_ray = pl.BlockSpec((block, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_kernel, n_rows, block),
        grid=(N // block,),
        in_specs=[spec_tbl, spec_ray],
        out_specs=spec_ray,
        out_shape=jax.ShapeDtypeStruct((N, 1), jnp.float32),
    )(table, idx2)


for R in (14, 56, 126, 224):
    packed = (rng.integers(0, 256, (R, 128)) + 256 * rng.integers(0, 256, (R, 128))
              + 65536 * rng.integers(0, 256, (R, 128))).astype(np.float32)
    table = jnp.asarray(packed)
    for block in (1024, 2048, 4096, 8192):
        if block * R * 4 > 8 << 20:
            continue

        def body(i, table=table, R=R, block=block):
            idx = jnp.remainder(base_idx + i, R * 128)
            v = mxu_gather(table, idx, block)
            # unpack outside the kernel (vector ops, fused)
            r = jnp.remainder(v, 256.0)
            g = jnp.remainder(jnp.floor(v / 256.0), 256.0)
            b = jnp.floor(v / 65536.0)
            return (r.sum() + g.sum() + b.sum())

        try:
            t = scan_slope(body)
        except Exception as e:  # noqa: BLE001 - VMEM OOM etc.
            print(f"  R={R:4d} block={block:5d}: FAILED {type(e).__name__}",
                  flush=True)
            continue
        print(f"  R={R:4d} block={block:5d}: {t*1e3:.3f} ms "
              f"({t/N*1e9:.2f} ns/elem)", flush=True)
