"""Statistical and determinism tests for the counter-based RNG."""
import jax.numpy as jnp
import numpy as np

from path_tracing__ray_tracer_tpu.ops import rng


def test_deterministic():
    k = rng.ray_key(0, jnp.arange(128), 3)
    a = rng.uniform(k, 2, 1)
    b = rng.uniform(k, 2, 1)
    np.testing.assert_array_equal(a, b)


def test_range_and_mean():
    k = rng.ray_key(7, jnp.arange(1 << 16), 0)
    u = np.asarray(rng.uniform(k, 0, 0))
    assert (u >= 0).all() and (u < 1).all()
    assert abs(u.mean() - 0.5) < 0.005
    assert abs(u.var() - 1 / 12) < 0.005


def test_streams_decorrelated():
    """Adjacent pixels / samples / depths / uses produce uncorrelated values."""
    n = 1 << 15
    pix = jnp.arange(n)
    base = np.asarray(rng.uniform(rng.ray_key(0, pix, 0), 0, 0))

    for other in (
        rng.uniform(rng.ray_key(0, pix, 1), 0, 0),   # next sample
        rng.uniform(rng.ray_key(0, pix, 0), 1, 0),   # next depth
        rng.uniform(rng.ray_key(0, pix, 0), 0, 1),   # next use
        rng.uniform(rng.ray_key(1, pix, 0), 0, 0),   # next seed
        rng.uniform(rng.ray_key(0, pix + 1, 0), 0, 0),  # next pixel
    ):
        corr = np.corrcoef(base, np.asarray(other))[0, 1]
        assert abs(corr) < 0.02, corr


def test_uniform_bits_histogram():
    n = 1 << 16
    u = np.asarray(rng.uniform(rng.ray_key(3, jnp.arange(n), 5), 4, 2))
    hist, _ = np.histogram(u, bins=16, range=(0, 1))
    expected = n / 16
    chi2 = float(((hist - expected) ** 2 / expected).sum())
    # 15 dof; 3-sigma-ish bound
    assert chi2 < 45.0, chi2
