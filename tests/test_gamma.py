"""Discrete-Gamma discretization vs scipy, both MEAN and MEDIAN modes."""

import numpy as np
import pytest
import jax.numpy as jnp

from pllmod_tpu.common import GAMMA_RATES_MEAN, GAMMA_RATES_MEDIAN
from pllmod_tpu.ops import gamma
from tests import reference_impl as ref


@pytest.mark.parametrize("alpha", [0.05, 0.2, 0.5, 1.0, 2.7, 10.0, 73.0])
@pytest.mark.parametrize("k", [1, 2, 4, 8])
def test_gamma_mean(alpha, k):
    got = np.asarray(gamma.compute_gamma_cats(
        jnp.float64(alpha), k, GAMMA_RATES_MEAN))
    want = ref.gamma_cats_mean(alpha, k)
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)
    # category rates must have mean 1
    assert abs(got.mean() - 1.0) < 1e-8


@pytest.mark.parametrize("alpha", [0.05, 0.5, 1.0, 5.0])
@pytest.mark.parametrize("k", [2, 4, 6])
def test_gamma_median(alpha, k):
    got = np.asarray(gamma.compute_gamma_cats(
        jnp.float64(alpha), k, GAMMA_RATES_MEDIAN))
    want = ref.gamma_cats_median(alpha, k)
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)


def test_gammaincinv_roundtrip():
    from jax.scipy.special import gammainc
    rng = np.random.default_rng(0)
    a = 10 ** rng.uniform(-1.6, 2, size=200)
    p = rng.uniform(1e-4, 1 - 1e-4, size=200)
    x = np.asarray(gamma.gammaincinv(jnp.float64(a), jnp.float64(p)))
    back = np.asarray(gammainc(jnp.float64(a), jnp.float64(x)))
    np.testing.assert_allclose(back, p, rtol=1e-7, atol=1e-9)


def test_gamma_grad_finite():
    """alpha -> rates must be differentiable (used by analytic-gradient
    optimizers; the reference needs finite differences here)."""
    import jax

    g = jax.grad(lambda a: jnp.sum(
        gamma.compute_gamma_cats(a, 4) ** 2))(jnp.float64(0.7))
    # finite-difference check
    eps = 1e-6
    f = lambda a: float(jnp.sum(gamma.compute_gamma_cats(jnp.float64(a), 4) ** 2))
    fd = (f(0.7 + eps) - f(0.7 - eps)) / (2 * eps)
    assert np.isfinite(float(g))
    np.testing.assert_allclose(float(g), fd, rtol=1e-4)


@pytest.mark.parametrize("mode", [GAMMA_RATES_MEAN, GAMMA_RATES_MEDIAN])
@pytest.mark.parametrize("alpha", [0.1, 0.5, 1.0, 3.3, 25.0])
def test_gamma_host_matches_device(alpha, mode):
    """Host float64 discretization (used at partition construction to avoid
    the silent f64->f32 truncation inside a default-f32 device runtime)
    must match the jittable path; f32 cast stays within 1e-7."""
    host = gamma.compute_gamma_cats_host(alpha, 4, mode)
    dev = np.asarray(gamma.compute_gamma_cats(jnp.float64(alpha), 4, mode))
    np.testing.assert_allclose(host, dev, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(host.astype(np.float32), dev.astype(np.float32),
                               rtol=1e-7, atol=1e-7)
