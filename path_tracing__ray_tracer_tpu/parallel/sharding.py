"""shard_map wrapper turning a single-device chunk function into a
multi-device one.

Scene, camera and scalars are replicated; each device derives its own pixel
base (``tile`` axis) and sample base (``sample`` axis) from its mesh
coordinates, renders its private sub-batch with the *same* compiled kernel a
single chip runs, then partial sample sums are ``psum``-reduced over the
``sample`` axis.  The output is sharded over ``tile`` — the final image
gather is the single all-gather the reference's design needs none of
(SURVEY.md §5, distributed backend).
"""
from __future__ import annotations

from functools import partial

import jax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.v3 import V3


def shard_chunk_fn(inner_chunk_fn, mesh: Mesh, local_pix: int, local_samples: int):
    """Wrap ``inner_chunk_fn(cs, cam12, pix0, seed, sample_base) -> V3(local_pix,)``
    into a mesh-wide function producing ``V3(local_pix · tile,)`` sums over
    ``local_samples · sample`` samples."""

    def per_device(cs, cam12, pix0, seed, sample_base):
        ti = jax.lax.axis_index("tile")
        si = jax.lax.axis_index("sample")
        my_pix0 = pix0 + ti.astype(pix0.dtype) * local_pix
        my_s0 = sample_base + si.astype(sample_base.dtype) * local_samples
        out = inner_chunk_fn(cs, cam12, my_pix0, seed, my_s0)
        return jax.tree.map(partial(jax.lax.psum, axis_name="sample"), out)

    return shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P()),
        out_specs=V3(P("tile"), P("tile"), P("tile")),
        check_vma=False,
    )
