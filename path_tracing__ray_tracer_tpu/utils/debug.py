"""Numeric debugging helpers.

The reference has no sanitizers (SURVEY.md §5: each CUDA thread writes only
its own pixel, nothing to race on).  The wavefront design is pure-functional,
so the failure mode that matters here is numeric: NaN/Inf escaping a masked
lane.  These helpers wrap a render in ``jax.debug_nans``-style checking
without polluting the hot path.
"""
from __future__ import annotations

import contextlib

import numpy as np

from .logging import log_event


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Enable JAX NaN-checking for the scope (slow; debugging only)."""
    import jax

    if not enable:
        yield
        return
    old = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)


def assert_finite_image(img, context: str = "render") -> np.ndarray:
    """Host-side validation of a finished render; raises on NaN/Inf."""
    arr = np.asarray(img)
    bad = ~np.isfinite(arr.astype(np.float64))
    if bad.any():
        log_event(
            "nonfinite_pixels", context=context, count=int(bad.sum()),
            first_index=[int(i) for i in np.argwhere(bad)[0]],
        )
        raise FloatingPointError(
            f"{context}: {int(bad.sum())} non-finite pixel components"
        )
    return arr
