"""Tonemapping and quantization.

Matches the reference exactly: the Whitted renderers clamp-and-truncate only
(``cuda_renderer.py:68-71`` — despite the comment, no gamma is applied), the
path tracer applies the ACES fit first (``cuda_path_tracer.py:74-81,52-58``).
Quantization truncates toward zero (`int()` semantics), then clamps to
[0, 255].
"""
from __future__ import annotations

import jax.numpy as jnp

from .v3 import V3


def aces(x: jnp.ndarray) -> jnp.ndarray:
    """Narkowicz ACES filmic fit, per channel."""
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return (x * (a * x + b)) / (x * (c * x + d) + e)


def aces_v3(color: V3) -> V3:
    return V3(aces(color.x), aces(color.y), aces(color.z))


def quantize_u8(color: V3) -> V3:
    """[0,1] float → uint8 with truncation, reference semantics
    ``min(255, max(0, int(c * 255)))``."""

    def q(c):
        return jnp.clip(jnp.trunc(c * 255.0), 0.0, 255.0).astype(jnp.uint8)

    return V3(q(color.x), q(color.y), q(color.z))
