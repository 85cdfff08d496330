"""Probe: does the planned kernel's per-block SMEM index-map operand fit
the SMEM budget at REAL page sizes (does the pipeline double-buffer SMEM
operands)?  Run on TPU:  python -m experiments.probe_plan_budget
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
G = 16
P = 14


def try_size(tcw, scw):
    tree = jnp.ones((P, 8, tcw), jnp.float32)
    slot = jnp.ones((P, 8, scw), jnp.float32) * 2.0
    pick = jnp.arange(G, dtype=jnp.int32) % P

    def kernel(pick_ref, tree_ref, slot_ref, out_ref):
        v = tree_ref[0, 0, 5] + slot_ref[0, 7, 11]
        out_ref[:] = jnp.full((8, LANES), v, jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, 8, tcw), lambda i, pick: (pick[i], 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, scw), lambda i, pick: (pick[i], 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((8, LANES), lambda i, pick: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G * 8, LANES), jnp.float32),
    )(pick, tree, slot)
    ok = np.allclose(np.asarray(out), 3.0)
    total = 8 * (tcw + scw)
    print(f"tcw={tcw} scw={scw} ({total} floats/block): "
          f"{'OK' if ok else 'WRONG'}", flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    for tcw, scw in ((7040, 18176), (3520, 9088), (1792, 4608)):
        try:
            try_size(tcw, scw)
        except Exception as e:
            first = str(e).splitlines()[0][:240] if str(e) else repr(e)[:240]
            print(f"tcw={tcw} scw={scw} ({8*(tcw+scw)} floats/block): "
                  f"FAIL {type(e).__name__}: {first}", flush=True)
    print("done", flush=True)
