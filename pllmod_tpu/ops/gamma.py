"""Discrete Gamma rate heterogeneity (Yang 1994) + proportion of invariant sites.

TPU-native equivalent of libpll's ``pll_compute_gamma_cats(alpha, ncats,
rates, PLL_GAMMA_RATES_MEAN|MEDIAN)`` (SURVEY.md §2.9 "State & setup").

Fully jittable and differentiable w.r.t. ``alpha`` — the reference's Brent
search on alpha re-enters C code per evaluation; here the whole
alpha -> category-rates -> logL graph is one XLA computation, so alpha can
also be optimized with analytic gradients.

The Gamma quantile function (``gammaincinv``) is not exposed by
``jax.scipy``; we implement it with a Wilson–Hilferty / small-shape initial
guess refined by bounded Newton iterations on ``jax.scipy.special.gammainc``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import gammainc, gammaln

from pllmod_tpu.common import GAMMA_RATES_MEAN, GAMMA_RATES_MEDIAN

_NEWTON_ITERS = 40


def gammaincinv(a, p):
    """Inverse of the regularized lower incomplete gamma function P(a, x).

    Solves P(a, x) = p for x. Supports broadcasting; jittable/differentiable.
    Accuracy ~1e-12 in float64 over a ∈ [1e-2, 1e3], p ∈ (0, 1).
    """
    a = jnp.asarray(a)
    p = jnp.asarray(p)
    dtype = jnp.result_type(a, p, jnp.float32)
    a = a.astype(dtype)
    p = p.astype(dtype)

    # --- initial guess -----------------------------------------------------
    # Wilson–Hilferty: x ≈ a * (1 - 1/(9a) + z * sqrt(1/(9a)))^3, z = Φ⁻¹(p)
    z = jnp.sqrt(jnp.asarray(2.0, dtype)) * jax.scipy.special.erfinv(2.0 * p - 1.0)
    wh = a * (1.0 - 1.0 / (9.0 * a) + z * jnp.sqrt(1.0 / (9.0 * a))) ** 3
    # small-a / small-p regime: P(a,x) ≈ x^a / (a Γ(a))  =>  x ≈ (p a Γ(a))^(1/a)
    small = jnp.exp((jnp.log(jnp.maximum(p, 1e-300)) + gammaln(a + 1.0)) / a)
    x0 = jnp.where((wh > 1e-8) & jnp.isfinite(wh), jnp.maximum(wh, 1e-300), small)
    x0 = jnp.where(a < 0.5, small, x0)  # WH is poor for small shapes
    x0 = jnp.clip(x0, 1e-300, None)

    # --- Newton refinement in log-space (keeps x > 0) -----------------------
    # f(x) = P(a,x) - p ;  f'(x) = x^(a-1) e^(-x) / Γ(a)
    # iterate on u = log x:  du = -f / (x f'(x))
    def body(_, u):
        x = jnp.exp(u)
        f = gammainc(a, x) - p
        logdf = (a - 1.0) * u - x - gammaln(a)
        # d f / d u = x * f'(x) = exp(a*u - x - lgamma(a))
        dfdu = jnp.exp(a * u - x - gammaln(a))
        step = f / jnp.maximum(dfdu, 1e-300)
        step = jnp.clip(step, -2.0, 2.0)  # damp far-from-root steps
        return u - step

    u = jax.lax.fori_loop(0, _NEWTON_ITERS, body, jnp.log(x0))
    return jnp.exp(u)


def _gamma_quantile(alpha, p):
    """Quantile of Gamma(shape=alpha, rate=alpha) (mean 1)."""
    return gammaincinv(alpha, p) / alpha


def compute_gamma_cats(alpha, n_cats: int, mode: int = GAMMA_RATES_MEAN):
    """Discrete Gamma category rates with mean 1.

    mode=GAMMA_RATES_MEAN   — Yang (1994) mean-per-bin discretization
    mode=GAMMA_RATES_MEDIAN — median-per-bin, renormalized to mean 1

    Matches libpll's ``pll_compute_gamma_cats`` semantics
    (PLL_GAMMA_RATES_MEAN | PLL_GAMMA_RATES_MEDIAN attribute flags).
    """
    alpha = jnp.asarray(alpha)
    k = n_cats
    if k == 1:
        return jnp.ones((1,), dtype=alpha.dtype)
    if mode == GAMMA_RATES_MEDIAN:
        ps = (2.0 * jnp.arange(k, dtype=alpha.dtype) + 1.0) / (2.0 * k)
        med = _gamma_quantile(alpha, ps)
        return med * (k / jnp.sum(med))
    # mean mode: bin boundaries at quantiles i/k of Gamma(alpha, alpha);
    # category mean = k * [ P(alpha+1, alpha*b_{i+1}) - P(alpha+1, alpha*b_i) ]
    ps = jnp.arange(1, k, dtype=alpha.dtype) / k
    bounds = gammaincinv(alpha, ps)  # in units of rate=1 gamma: x = alpha * b
    cdf_ap1 = gammainc(alpha + 1.0, bounds)
    cdf_full = jnp.concatenate([jnp.zeros((1,), alpha.dtype), cdf_ap1,
                                jnp.ones((1,), alpha.dtype)])
    return k * (cdf_full[1:] - cdf_full[:-1])


def compute_gamma_cats_host(alpha, n_cats: int, mode: int = GAMMA_RATES_MEAN):
    """Host-side float64 category rates (numpy/scipy), for partition
    construction: requesting f64 inside a default-f32 device runtime would
    silently truncate the one quantity that feeds every P-matrix. Same
    discretization as :func:`compute_gamma_cats`; agrees to ~1e-12.
    """
    import numpy as np
    from scipy.special import gammainc as sp_gammainc
    from scipy.special import gammaincinv as sp_gammaincinv
    alpha = float(alpha)
    k = n_cats
    if k == 1:
        return np.ones(1)
    if mode == GAMMA_RATES_MEDIAN:
        ps = (2.0 * np.arange(k) + 1.0) / (2.0 * k)
        med = sp_gammaincinv(alpha, ps) / alpha
        return med * (k / med.sum())
    ps = np.arange(1, k) / k
    bounds = sp_gammaincinv(alpha, ps)
    cdf_full = np.concatenate([[0.0], sp_gammainc(alpha + 1.0, bounds), [1.0]])
    return k * np.diff(cdf_full)


def invariant_sites_mask(tip_code_masks, tip_states):
    """Per-site invariant-state bitmask: AND over tips of state bitmasks.

    Equivalent of libpll ``pll_update_invariant_sites`` (SURVEY.md §2.9):
    a site is (potentially) invariant iff the intersection of all tips'
    compatible-state sets is non-empty; the p-inv likelihood term sums the
    base frequencies of the intersection states.

    Args:
      tip_code_masks: uint64 [n_codes] bitmask per tip-state code
      tip_states: int [tips, sites] code per tip per site
    Returns:
      uint64 [sites] intersection bitmask (0 = site cannot be invariant)
    """
    masks = tip_code_masks[tip_states]  # [tips, sites]
    import numpy as np
    out = masks[0]
    for i in range(1, masks.shape[0]):
        out = out & masks[i]
    return np.asarray(out)


def invariant_freq_sum(inv_mask, freqs):
    """Sum of base frequencies over the invariant-state set per site.

    Args:
      inv_mask: uint [sites] bitmask from :func:`invariant_sites_mask`
      freqs: [states] base frequencies
    Returns:
      [sites] p-inv likelihood term (0 where site cannot be invariant)
    """
    states = freqs.shape[-1]
    bits = (inv_mask[:, None] >> jnp.arange(states, dtype=inv_mask.dtype)[None, :]) & 1
    return bits.astype(freqs.dtype) @ freqs
