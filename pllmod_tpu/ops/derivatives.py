"""Analytic branch-length derivatives via the sumtable factorization.

TPU-native equivalent of libpll's ``pll_update_sumtable`` +
``pll_compute_likelihood_derivatives`` (SURVEY.md §2.9; call sites
``pll_optimize.c:303-314``, ``pll_optimize.c:1223-1287``).

For an edge with CLVs clv_p / clv_c and eigensystem Q = V Λ V⁻¹, the
per-site per-category likelihood across the edge is

    L(t) = Σ_k  st[k] · exp(λ_k · r_c · t)          (r_c = rate / (1-pinv))
    st[k] = (Σ_i π_i clv_p[i] V[i,k]) · (Σ_j V⁻¹[k,j] clv_c[j])

so L, dL/dt, d²L/dt² come from one table ``st`` (computed **once per edge**)
and three weighted exponential sums — Newton iterations then cost O(sites ·
cats · states) with no CLV re-traversal, exactly like the reference, but
batched over many edges at once (the reference loops serially).

Derivatives of the *log*-likelihood per site:
    l' = L'/L,   l'' = L''/L − (L'/L)²
summed over sites with pattern weights; with p-inv the mixture term
``p·L_inv`` (constant in t) joins L and its derivatives before the ratio.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pllmod_tpu.ops.clv import LN2

# TPU matmuls default to bf16 inputs; likelihoods need true f32
_PREC = jax.lax.Precision.HIGHEST


def sumtable(partition, clv_p, clv_c, eigen=None):
    """Per-edge sumtable: st[p, c, k].

    Args:
      partition: Partition
      clv_p, clv_c: [P, C, S] parent/child CLVs (tips already expanded)
      eigen: optional precomputed (lam [M,S], V [M,S,S], Vinv [M,S,S])
    Returns:
      st [P, C, S]
    """
    if eigen is None:
        eigen = partition.eigen()
    lam, V, Vinv = eigen
    pi_c = partition.freqs_per_cat()                 # [C,S]
    V_c = V[partition.param_indices]                 # [C,S,S]
    Vinv_c = Vinv[partition.param_indices]           # [C,S,S]
    dtype = partition.dtype
    left = jnp.einsum("pci,ci,cik->pck", clv_p, pi_c, V_c,
                      preferred_element_type=dtype,
                      precision=_PREC)
    right = jnp.einsum("ckj,pcj->pck", Vinv_c, clv_c,
                       preferred_element_type=dtype,
                      precision=_PREC)
    return left * right


def edge_derivatives(partition, st, scaler, brlen, eigen=None):
    """(logL, dlogL/dt, d2logL/dt2) for one edge from its sumtable.

    Args:
      st: [P, C, S] sumtable
      scaler: [P] int32 combined scaler counts of the two CLVs
      brlen: scalar branch length
    Returns:
      (lnl, df, ddf) scalars. Sign convention matches libpll: df/ddf are
      derivatives of the POSITIVE log-likelihood w.r.t. t.
    """
    if eigen is None:
        eigen = partition.eigen()
    lam = eigen[0][partition.param_indices]          # [C,S]
    dtype = partition.dtype
    # per-category p-inv (reference indexes prop_invar[params_indices[c]]
    # inside the category loop, not matrix 0)
    pinv_c = partition.prop_invar[partition.param_indices]   # [C]
    rc = partition.rate_cats / (1.0 - pinv_c)        # [C]
    lr = lam * rc[:, None]                           # [C,S] effective rates
    # fold the per-category (1-p_c) factor into the mixture weights:
    #   A(t) = Σ_c w_c (1-p_c) L_c(t)
    w_eff = partition.rate_weights * (1.0 - pinv_c)

    expo = jnp.exp(lr[None] * jnp.asarray(brlen, dtype))   # [1->P? C,S]
    # A, A', A'' per site (scaled space)
    base = st * expo                                  # [P,C,S]
    L = jnp.einsum("pcs,c->p", base, w_eff, preferred_element_type=dtype,
                      precision=_PREC)
    dL = jnp.einsum("pcs,cs,c->p", base, lr, w_eff,
                    preferred_element_type=dtype,
                      precision=_PREC)
    ddL = jnp.einsum("pcs,cs,c->p", base, lr * lr, w_eff,
                     preferred_element_type=dtype,
                      precision=_PREC)

    tiny = jnp.asarray(1e-300 if dtype == jnp.float64 else 1e-37, dtype)
    Lsafe = jnp.maximum(L, tiny)

    # p-inv mixture in log space (overflow-safe under arbitrary scaling):
    #   M(t) = A(t) 2^s + B,  B = Σ_c w_c p_c I_c (constant in t)
    #   frac = A 2^s / M ∈ [0,1]
    #   (log M)'  = frac * A'/A
    #   (log M)'' = frac * A''/A - (frac * A'/A)^2
    inv_pc = jnp.einsum("ps,cs->pc", partition.inv_indicator,
                        partition.freqs_per_cat(), precision=_PREC)  # [P,C]
    B = jnp.einsum("pc,c->p", inv_pc,
                   partition.rate_weights * pinv_c, precision=_PREC)
    ln_a = jnp.log(Lsafe) + scaler.astype(dtype) * LN2
    ln_b = jnp.where(B > 0, jnp.log(jnp.maximum(B, tiny)), -jnp.inf)
    site_lnl = jnp.logaddexp(ln_a, ln_b)
    frac = jnp.exp(ln_a - site_lnl)                  # variable-part fraction

    r1 = frac * dL / Lsafe
    site_df = r1
    site_ddf = frac * ddL / Lsafe - r1 * r1

    pw = partition.pattern_weights
    return (jnp.sum(site_lnl * pw), jnp.sum(site_df * pw),
            jnp.sum(site_ddf * pw))


def edge_derivatives_batch(partition, st, scaler, brlens, eigen=None):
    """Vectorized :func:`edge_derivatives` over a batch of edges.

    st: [E, P, C, S], scaler: [E, P], brlens: [E] -> (lnl, df, ddf) each [E].
    Used by the batched Newton BLO (independent-edge sets optimized in
    parallel — a coloring the reference's serial loop can't exploit,
    SURVEY.md §7 'Hard parts')."""
    fn = jax.vmap(lambda s, sc, t: edge_derivatives(partition, s, sc, t,
                                                    eigen=eigen))
    return fn(st, scaler, brlens)
