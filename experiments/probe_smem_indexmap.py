"""Probe: can a grid-step-dependent index map (scalar prefetch) feed an
SMEM operand?  (round 5 — the collapse-page-launches lever)

If a BlockSpec with memory_space=SMEM can select a different row of an HBM
``(P, C)`` page array per grid step, the per-page rooted-walk launches
collapse into ONE kernel whose blocks each walk their own (majority) page.

Run on TPU:  python -m experiments.probe_smem_indexmap
"""
from __future__ import annotations

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
G = 8          # grid steps (blocks)
P = 5          # pages
C = 1024   # floats per page row-block


def probe(name, fn):
    try:
        got, want = fn()
        ok = np.allclose(np.asarray(got), want)
        print(f"PROBE {name}: {'OK' if ok else 'WRONG RESULT'}", flush=True)
        if not ok:
            print("  got ", np.asarray(got)[:, :3], flush=True)
            print("  want", want[:, :3], flush=True)
    except Exception as e:
        first = str(e).splitlines()[0][:300] if str(e) else repr(e)[:300]
        print(f"PROBE {name}: FAIL {type(e).__name__}: {first}", flush=True)


def smem_indexmap():
    # (P, 8, C) so the block (1, 8, C) matches the whole trailing dims
    pages = jnp.arange(P * 8 * C, dtype=jnp.float32).reshape(P, 8, C)
    pick = jnp.array([0, 3, 1, 4, 2, 2, 0, 1], jnp.int32)  # page per block

    def kernel(pick_ref, page_ref, out_ref):
        i = pl.program_id(0)
        v = page_ref[0, 0, 7]  # scalar read from this block's page
        out_ref[:] = jnp.full((8, LANES), v, jnp.float32) + 0.0 * i

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, 8, C), lambda i, pick: (pick[i], 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((8, LANES), lambda i, pick: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G * 8, LANES), jnp.float32),
    )(pick, pages)
    want = np.asarray(pages)[np.asarray(pick), 0, 7].repeat(8)[:, None].repeat(LANES, 1)
    return out, want


def vmem_indexmap():
    """Control: same thing with a VMEM operand (block-sparse classic)."""
    pages = jnp.arange(P * 8 * C, dtype=jnp.float32).reshape(P, 8, C)
    pick = jnp.array([0, 3, 1, 4, 2, 2, 0, 1], jnp.int32)

    def kernel(pick_ref, page_ref, out_ref):
        out_ref[:] = page_ref[0, :, 7:7 + LANES]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, 8, C), lambda i, pick: (pick[i], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, LANES), lambda i, pick: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G * 8, LANES), jnp.float32),
    )(pick, pages)
    want = np.asarray(pages)[np.asarray(pick)][:, :, 7:7 + LANES].reshape(G * 8, LANES)
    return out, want


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    probe("smem_indexmap", smem_indexmap)
    probe("vmem_indexmap", vmem_indexmap)
    print("probes done", flush=True)
