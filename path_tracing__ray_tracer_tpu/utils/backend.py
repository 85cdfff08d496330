"""Backend probing and graceful degradation.

The reference wraps its CUDA imports in try/except and falls back to the CPU
renderer when CUDA is absent (``main.py:11-20``, ``cuda_renderer.py:517-523``).
The JAX analogue: probe device initialization once; if the TPU backend is
unavailable or fails to initialize, force the CPU backend so every renderer
still runs (same jitted code, slower device).
"""
from __future__ import annotations

from .logging import log_event


def probe_backend() -> str:
    """Initialize JAX and return the platform name, degrading to CPU on
    failure.  Safe to call multiple times."""
    import jax

    try:
        devices = jax.devices()
        platform = devices[0].platform
        log_event(
            "backend_probe", platform=platform, device_count=len(devices),
            device=str(devices[0]),
        )
        return platform
    except Exception as exc:  # backend failed to initialize
        log_event("backend_probe_failed", error=f"{type(exc).__name__}: {exc}")
        try:
            jax.config.update("jax_platforms", "cpu")
            devices = jax.devices()
            log_event("backend_fallback", platform="cpu", device_count=len(devices))
            return "cpu"
        except Exception as exc2:  # pragma: no cover
            raise RuntimeError(f"no usable JAX backend: {exc2}") from exc2
