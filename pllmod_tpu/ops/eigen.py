"""GTR-family rate matrices, eigendecomposition, transition probabilities.

TPU-native equivalent of libpll's ``pll_update_prob_matrices`` (SURVEY.md
§2.9 "Hot kernels"): build the reversible rate matrix Q from exchangeability
rates + stationary frequencies, eigendecompose it once per rate matrix, then
produce P(t) = V · exp(Λ · t · r_c / (1 - p_inv)) · V⁻¹ for *all* edges and
rate categories in one batched XLA computation — the reference computes one
edge at a time (``treeinfo.c:832-870``); here edges are a batch axis feeding
the MXU.

Reversible Q is symmetrized as B = D^{1/2} Q D^{-1/2} (D = diag(π)) so that
``jnp.linalg.eigh`` (TPU-supported, differentiable) applies; libpll does the
same similarity transform. Non-reversible custom models fall back to a
batched ``jax.scipy.linalg.expm``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_FREQ_FLOOR = 1e-16


def rates_to_matrix(rates, states: int):
    """Symmetric exchangeability matrix from upper-triangle rate vector.

    Rate order is row-major upper triangle (AC AG AT CG CT GT for DNA),
    matching the reference's convention (models_dna.c:38).
    """
    iu = jnp.triu_indices(states, k=1)
    R = jnp.zeros((states, states), dtype=rates.dtype)
    R = R.at[iu].set(rates)
    return R + R.T


def matrix_to_rates(R):
    states = R.shape[-1]
    iu = jnp.triu_indices(states, k=1)
    return R[iu]


def build_q(rates, freqs):
    """Normalized reversible rate matrix Q with mean substitution rate 1.

    Q_ij = s_ij * π_j (i≠j), Q_ii = -Σ_j Q_ij, scaled so Σ_i π_i (-Q_ii) = 1.
    """
    states = freqs.shape[-1]
    R = rates_to_matrix(rates, states)
    Q = R * freqs[None, :]
    Q = Q - jnp.diag(jnp.sum(Q, axis=1))
    mean_rate = -jnp.sum(freqs * jnp.diag(Q))
    return Q / jnp.maximum(mean_rate, _FREQ_FLOOR)


def eigen_reversible(rates, freqs):
    """Eigendecomposition of a reversible Q via symmetrization.

    Returns (eigenvals [S], eigenvecs [S,S], inv_eigenvecs [S,S]) such that
    Q = eigenvecs · diag(eigenvals) · inv_eigenvecs.
    """
    pi = jnp.maximum(freqs, _FREQ_FLOOR)
    Q = build_q(rates, pi)
    sqrt_pi = jnp.sqrt(pi)
    B = Q * (sqrt_pi[:, None] / sqrt_pi[None, :])
    B = 0.5 * (B + B.T)  # enforce exact symmetry for eigh
    lam, U = jnp.linalg.eigh(B)
    V = U / sqrt_pi[:, None]          # eigenvecs of Q
    Vinv = U.T * sqrt_pi[None, :]     # V^{-1}
    return lam, V, Vinv


eigen_reversible_batched = jax.vmap(eigen_reversible)  # over rate matrices


def prob_matrices(eigenvals, eigenvecs, inv_eigenvecs, brlens, rate_cats,
                  prop_invar=0.0):
    """Batched transition-probability matrices.

    P[e, c] = V · diag(exp(λ · t_e · r_c / (1 - p_inv))) · V⁻¹

    Args:
      eigenvals/eigenvecs/inv_eigenvecs: [S], [S,S], [S,S]
      brlens: [edges]
      rate_cats: [cats]
      prop_invar: scalar — libpll divides the effective rate by (1 - p_inv)
        when proportion-of-invariant-sites is active.
    Returns:
      P: [edges, cats, S, S]
    """
    dtype = eigenvecs.dtype
    brlens = jnp.asarray(brlens, dtype)
    scale = rate_cats.astype(dtype) / (1.0 - jnp.asarray(prop_invar, dtype))
    # t[e,c] = brlen_e * r_c
    t = brlens[:, None] * scale[None, :]
    expo = jnp.exp(eigenvals[None, None, :] * t[:, :, None])  # [E,C,S]
    # P = (V * expo) @ Vinv, batched over E,C
    return jnp.einsum("ik,eck,kj->ecij", eigenvecs, expo, inv_eigenvecs,
                      preferred_element_type=dtype)


def prob_matrices_multi(eigen, brlens, rate_cats, param_indices, prop_invar):
    """P-matrices when rate categories use different rate matrices
    (mixture models, e.g. LG4M/LG4X: one matrix per category).

    Args:
      eigen: tuple of batched (eigenvals [M,S], eigenvecs [M,S,S],
             inv_eigenvecs [M,S,S]) over M rate matrices
      brlens: [edges]
      rate_cats: [cats]
      param_indices: int [cats] — rate-matrix index per category
        (libpll's params_indices, treeinfo.c:289)
      prop_invar: [M] per-matrix proportion of invariant sites
    Returns:
      P: [edges, cats, S, S]
    """
    lam, V, Vinv = eigen
    dtype = V.dtype
    lam_c = lam[param_indices]          # [C,S]
    V_c = V[param_indices]              # [C,S,S]
    Vinv_c = Vinv[param_indices]        # [C,S,S]
    pinv_c = jnp.asarray(prop_invar, dtype)[param_indices]  # [C]
    brlens = jnp.asarray(brlens, dtype)
    t = brlens[:, None] * (rate_cats.astype(dtype) / (1.0 - pinv_c))[None, :]
    expo = jnp.exp(lam_c[None] * t[:, :, None])  # [E,C,S]
    return jnp.einsum("cik,eck,ckj->ecij", V_c, expo, Vinv_c,
                      preferred_element_type=dtype)


def prob_matrices_expm(rates, freqs, brlens, rate_cats, prop_invar=0.0):
    """General (possibly non-reversible) fallback via matrix exponential."""
    Q = build_q(rates, jnp.maximum(freqs, _FREQ_FLOOR))
    scale = rate_cats / (1.0 - prop_invar)
    t = brlens[:, None] * scale[None, :]

    def one(ti):
        return jax.scipy.linalg.expm(Q * ti)

    return jax.vmap(jax.vmap(one))(t)
