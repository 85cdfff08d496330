"""Vectorized primary-ray generation from the packed 12-float camera.

Wavefront counterpart of ``cuda_get_ray`` (``cuda_texture_renderer.py:83-114``):
``dir = llc + u·horizontal + v·vertical − origin``, normalized.
"""
from __future__ import annotations

import jax.numpy as jnp

from .v3 import V3


def unpack_camera(cam12: jnp.ndarray):
    """Split the wire format into (origin, lower_left, horizontal, vertical)."""
    origin = V3(cam12[0], cam12[1], cam12[2])
    llc = V3(cam12[3], cam12[4], cam12[5])
    horizontal = V3(cam12[6], cam12[7], cam12[8])
    vertical = V3(cam12[9], cam12[10], cam12[11])
    return origin, llc, horizontal, vertical


def generate_rays(cam12: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray):
    """Primary rays for screen-space coordinates ``u, v ∈ [0,1]`` (any shape).

    Returns ``(origins, directions)`` as broadcast SoA ``V3``; directions are
    unit length (the reference normalizes with a zero guard).
    """
    origin, llc, horizontal, vertical = unpack_camera(cam12)
    d = llc + horizontal * u + vertical * v - origin
    d = d.normalized()
    o = V3(
        jnp.broadcast_to(origin.x, u.shape),
        jnp.broadcast_to(origin.y, u.shape),
        jnp.broadcast_to(origin.z, u.shape),
    )
    return o, d
