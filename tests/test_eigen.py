"""P-matrix construction vs scipy expm + analytic JC69."""

import numpy as np
import jax.numpy as jnp
from scipy.linalg import expm

from pllmod_tpu.ops import eigen
from tests import reference_impl as ref


def test_q_normalization(rng):
    rates = jnp.float64(rng.uniform(0.2, 3.0, size=6))
    freqs = rng.dirichlet([5, 5, 5, 5])
    Q = np.asarray(eigen.build_q(rates, jnp.float64(freqs)))
    np.testing.assert_allclose(Q.sum(axis=1), 0, atol=1e-12)
    assert abs(-np.sum(freqs * np.diag(Q)) - 1.0) < 1e-12
    # detailed balance (reversibility): pi_i Q_ij == pi_j Q_ji
    np.testing.assert_allclose(freqs[:, None] * Q, (freqs[:, None] * Q).T,
                               atol=1e-12)


def test_pmatrix_vs_expm(rng):
    for states, nr in [(4, 6), (20, 190)]:
        rates = jnp.float64(rng.uniform(0.05, 5.0, size=nr))
        freqs = jnp.float64(rng.dirichlet(np.full(states, 5.0)))
        lam, V, Vinv = eigen.eigen_reversible(rates, freqs)
        brlens = jnp.float64([0.0, 0.05, 0.3, 2.0])
        cats = jnp.float64([0.2, 1.0, 2.5])
        P = np.asarray(eigen.prob_matrices(lam, V, Vinv, brlens, cats))
        Q = ref.build_q(np.asarray(rates), np.asarray(freqs))
        for e, t in enumerate(np.asarray(brlens)):
            for c, r in enumerate(np.asarray(cats)):
                np.testing.assert_allclose(P[e, c], expm(Q * t * r),
                                           atol=1e-10)
        # rows sum to 1
        np.testing.assert_allclose(P.sum(-1), 1.0, atol=1e-10)


def test_pmatrix_pinv_scaling(rng):
    """p-inv divides the effective rate by (1 - pinv)."""
    rates = jnp.float64(np.ones(6))
    freqs = jnp.float64(np.full(4, 0.25))
    lam, V, Vinv = eigen.eigen_reversible(rates, freqs)
    t = jnp.float64([0.4])
    cats = jnp.float64([1.0])
    P0 = np.asarray(eigen.prob_matrices(lam, V, Vinv, t, cats, 0.0))
    P1 = np.asarray(eigen.prob_matrices(lam, V, Vinv, t * 0.75, cats, 0.25))
    np.testing.assert_allclose(P0, P1, atol=1e-12)


def test_jc_analytic():
    """JC69: P_ii = 1/4 + 3/4 e^{-4t/3}, P_ij = 1/4 - 1/4 e^{-4t/3}."""
    rates = jnp.float64(np.ones(6))
    freqs = jnp.float64(np.full(4, 0.25))
    lam, V, Vinv = eigen.eigen_reversible(rates, freqs)
    for t in [0.01, 0.1, 0.777, 3.0]:
        P = np.asarray(eigen.prob_matrices(lam, V, Vinv, jnp.float64([t]),
                                           jnp.float64([1.0])))[0, 0]
        e = np.exp(-4.0 * t / 3.0)
        want = np.full((4, 4), 0.25 - 0.25 * e)
        np.fill_diagonal(want, 0.25 + 0.75 * e)
        np.testing.assert_allclose(P, want, atol=1e-12)


def test_expm_fallback_matches_eigen(rng):
    rates = jnp.float64(rng.uniform(0.1, 3.0, size=6))
    freqs = jnp.float64(rng.dirichlet([4] * 4))
    lam, V, Vinv = eigen.eigen_reversible(rates, freqs)
    brlens = jnp.float64([0.1, 1.2])
    cats = jnp.float64([0.5, 1.5])
    P_eig = np.asarray(eigen.prob_matrices(lam, V, Vinv, brlens, cats))
    P_exp = np.asarray(eigen.prob_matrices_expm(rates, freqs, brlens, cats))
    np.testing.assert_allclose(P_eig, P_exp, atol=1e-9)
