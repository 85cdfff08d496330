"""Timing and throughput reporting.

``mrays_per_sec`` uses the reference's own ray-counting formula
(``main.py:104-108``): ``width · height · spp · depth / seconds``, so
numbers are directly comparable with the reference README's figures.
Optionally wraps renders in a ``jax.profiler`` trace for Perfetto.
"""
from __future__ import annotations

import contextlib
import time


def mrays_per_sec(width: int, height: int, spp: int, depth: int, seconds: float) -> float:
    total_rays = width * height * spp * depth
    return total_rays / max(seconds, 1e-12) / 1e6


class Timer:
    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.seconds = time.perf_counter() - self.start
        return False


@contextlib.contextmanager
def maybe_trace(trace_dir: str | None):
    """``jax.profiler`` trace context when a directory is given."""
    if trace_dir:
        import jax

        with jax.profiler.trace(trace_dir):
            yield
    else:
        yield
