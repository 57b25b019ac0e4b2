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

# TPU matmuls default to bf16 inputs; likelihoods need true f32
_PREC = jax.lax.Precision.HIGHEST

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
    C = t.shape[1]
    V_c = jnp.broadcast_to(eigenvecs[None], (C,) + eigenvecs.shape)
    Vinv_c = jnp.broadcast_to(inv_eigenvecs[None], (C,) + eigenvecs.shape)
    return _propagate(expo, V_c, Vinv_c)


def _propagate(expo, V_c, Vinv_c):
    """P[e,c] = V_c · diag(expo[e,c]) · Vinv_c as ONE [E,CS]@[CS,C·S²]
    matmul against the precomputed basis B[(c,k),(c,i,j)] = V[c,i,k] ·
    Vinv[c,k,j].

    The naive batched einsum ("cik,eck,ckj->ecij") lowers on TPU to
    E·C separate padded [S,S] MXU matmuls (~2.7 ms/eval for 253 edges of
    DNA+Γ4 — dominating the whole likelihood); this form is a handful of
    tiny fused ops + one small matmul (~µs)."""
    E, C, S = expo.shape
    dtype = V_c.dtype
    # basis M[c,k,i,j] = V[c,i,k] * Vinv[c,k,j]
    M = jnp.einsum("cik,ckj->ckij", V_c, Vinv_c,
                   preferred_element_type=dtype, precision=_PREC)
    B = jnp.zeros((C, S, C, S * S), dtype)
    for c in range(C):
        B = B.at[c, :, c, :].set(M[c].reshape(S, S * S))
    B = B.reshape(C * S, C * S * S)
    P = jnp.einsum("ek,kn->en", expo.reshape(E, C * S), B,
                   preferred_element_type=dtype, precision=_PREC)
    return P.reshape(E, C, S, S)


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
    return _propagate(expo, V_c, Vinv_c)


# ---------------------------------------------------------------------------
# Differentiable P-matrices with exact derivatives at DEGENERATE eigenvalues.
#
# jnp.linalg.eigh's JVP divides by eigenvalue gaps and produces NaN when Q
# has repeated eigenvalues (e.g. JC / equal-rates starting points — exactly
# where optimizers start). P(t) = exp(Qt) itself is analytic in Q, so we
# override the JVP with the Fréchet derivative of the matrix exponential:
#
#   dP = V (F ∘ (V⁻¹ (dQ·t + Q·dt) V)) V⁻¹,
#   F_ij = (e^{a_i} − e^{a_j})/(a_i − a_j),  F_ii = e^{a_i},  a = λt
#
# computed with a numerically-stable divided difference
# (e^a−e^b)/(a−b) = e^{(a+b)/2}·sinh(x)/x, x=(a−b)/2.
# ---------------------------------------------------------------------------
@jax.custom_jvp
def prob_matrices_params(rates_m, freqs_m, brlens, rate_cats, param_indices,
                         prop_invar):
    """P-matrices [E, C, S, S] directly from model parameters.

    Args match :func:`prob_matrices_multi` but the eigendecomposition is
    internal, so this function is safely differentiable w.r.t. every real
    argument (rates, freqs, brlens, rate_cats, prop_invar).
    """
    eigen = eigen_reversible_batched(rates_m, freqs_m)
    return prob_matrices_multi(eigen, brlens, rate_cats, param_indices,
                               prop_invar)


def _dexp_divided_difference(a):
    """F_ij for the Fréchet derivative of exp at diag a (last axis S)."""
    ai = a[..., :, None]
    aj = a[..., None, :]
    x = 0.5 * (ai - aj)
    mid = jnp.exp(0.5 * (ai + aj))
    small = jnp.abs(x) < 1e-6
    sinhc = jnp.where(small, 1.0 + x * x / 6.0,
                      jnp.sinh(jnp.where(small, 1.0, x))
                      / jnp.where(small, 1.0, x))
    return mid * sinhc


@prob_matrices_params.defjvp
def _prob_matrices_params_jvp(primals, tangents):
    rates_m, freqs_m, brlens, rate_cats, param_indices, prop_invar = primals
    drates, dfreqs, dbrlens, drate_cats, _dpi, dprop_invar = tangents

    lam, V, Vinv = eigen_reversible_batched(rates_m, freqs_m)
    dtype = V.dtype
    lam_c = lam[param_indices]
    V_c = V[param_indices]
    Vinv_c = Vinv[param_indices]
    pinv_c = jnp.asarray(prop_invar, dtype)[param_indices]
    rc = rate_cats.astype(dtype) / (1.0 - pinv_c)
    t = brlens[:, None] * rc[None, :]                      # [E,C]
    a = lam_c[None] * t[:, :, None]                        # [E,C,S]
    expo = jnp.exp(a)
    P = jnp.einsum("cik,eck,ckj->ecij", V_c, expo, Vinv_c,
                   preferred_element_type=dtype,
                      precision=_PREC)

    # dQ per matrix via autodiff of the (non-degenerate-safe) Q builder
    def q_of(rf):
        r, f = rf
        return build_q(r, jnp.maximum(f, _FREQ_FLOOR))

    drates = _materialize(drates, rates_m)
    dfreqs = _materialize(dfreqs, freqs_m)
    dbrlens = _materialize(dbrlens, brlens)
    drate_cats = _materialize(drate_cats, rate_cats)
    dprop_invar = _materialize(dprop_invar, prop_invar)

    Q, dQ = jax.vmap(lambda r, f, dr, df: jax.jvp(
        lambda rr, ff: q_of((rr, ff)), (r, f), (dr, df)))(
            rates_m, freqs_m, drates, dfreqs)
    Q_c = Q[param_indices]
    dQ_c = dQ[param_indices]

    # dt from brlens, rate_cats, prop_invar
    dpinv_c = jnp.asarray(dprop_invar, dtype)[param_indices]
    drc = (drate_cats.astype(dtype) / (1.0 - pinv_c)
           + rate_cats.astype(dtype) * dpinv_c / (1.0 - pinv_c) ** 2)
    dt = dbrlens[:, None] * rc[None, :] + brlens[:, None] * drc[None, :]

    # E_in[e,c] = dQ_c * t + Q_c * dt   [E,C,S,S]
    E_in = (dQ_c[None, :, :, :] * t[:, :, None, None]
            + Q_c[None, :, :, :] * dt[:, :, None, None])
    M = jnp.einsum("cik,eckl,clj->ecij", Vinv_c, E_in, V_c,
                   preferred_element_type=dtype,
                      precision=_PREC)
    F = _dexp_divided_difference(a)                        # [E,C,S,S]
    dP = jnp.einsum("cik,eckl,clj->ecij", V_c, F * M, Vinv_c,
                    preferred_element_type=dtype,
                      precision=_PREC)
    return P, dP


def _materialize(dx, x):
    if isinstance(dx, jax.custom_derivatives.SymbolicZero) or dx is None:
        return jnp.zeros_like(x)
    if hasattr(dx, "dtype") and dx.dtype == jax.dtypes.float0:
        return jnp.zeros_like(x)
    return dx


def prob_matrices_expm_multi(rates_m, freqs_m, brlens, rate_cats,
                             param_indices, prop_invar):
    """General (non-reversible-capable) P-matrices via batched matrix
    exponentials: the fallback when Q cannot be symmetrized (custom
    non-reversible models). Differentiable; O(S^3 log t) per matrix.

    Same signature/semantics as :func:`prob_matrices_params`.
    """
    Q = jax.vmap(lambda r, f: build_q(r, jnp.maximum(f, _FREQ_FLOOR)))(
        rates_m, freqs_m)                             # [M,S,S]
    dtype = Q.dtype
    Q_c = Q[param_indices]                            # [C,S,S]
    pinv_c = jnp.asarray(prop_invar, dtype)[param_indices]
    rc = rate_cats.astype(dtype) / (1.0 - pinv_c)     # [C]
    brlens = jnp.asarray(brlens, dtype)
    t = brlens[:, None] * rc[None, :]                 # [E,C]

    def one(ti, Qi):
        return jax.scipy.linalg.expm(Qi * ti)

    return jax.vmap(lambda te: jax.vmap(one)(te, Q_c))(t)  # [E,C,S,S]


def prob_matrices_expm(rates, freqs, brlens, rate_cats, prop_invar=0.0):
    """General (possibly non-reversible) fallback via matrix exponential."""
    Q = build_q(rates, jnp.maximum(freqs, _FREQ_FLOOR))
    scale = rate_cats / (1.0 - prop_invar)
    t = brlens[:, None] * scale[None, :]

    def one(ti):
        return jax.scipy.linalg.expm(Q * ti)

    return jax.vmap(jax.vmap(one))(t)
