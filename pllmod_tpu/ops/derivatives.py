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
    pinv = partition.pinv_mix()
    rc = partition.rate_cats / (1.0 - pinv)          # [C]
    lr = lam * rc[:, None]                           # [C,S] effective rates
    w = partition.rate_weights

    expo = jnp.exp(lr[None] * jnp.asarray(brlen, dtype))   # [1->P? C,S]
    # L, L', L'' per site (scaled space)
    base = st * expo                                  # [P,C,S]
    L = jnp.einsum("pcs,c->p", base, w, preferred_element_type=dtype,
                      precision=_PREC)
    dL = jnp.einsum("pcs,cs,c->p", base, lr, w, preferred_element_type=dtype,
                      precision=_PREC)
    ddL = jnp.einsum("pcs,cs,c->p", base, lr * lr, w,
                     preferred_element_type=dtype,
                      precision=_PREC)

    tiny = jnp.asarray(1e-300 if dtype == jnp.float64 else 1e-37, dtype)
    Lsafe = jnp.maximum(L, tiny)

    # p-inv mixture in log space (overflow-safe under arbitrary scaling):
    #   M(t) = (1-p) L(t) 2^s + p Linv;  frac = (1-p) L 2^s / M in [0,1]
    #   (log M)'  = frac * L'/L
    #   (log M)'' = frac * L''/L - (frac * L'/L)^2
    inv_term = partition.inv_indicator @ partition.freqs[0]  # [P]
    ln_var = jnp.log(Lsafe) + scaler.astype(dtype) * LN2
    ln_a = jnp.log1p(-pinv) + ln_var
    ln_b = jnp.where((pinv > 0) & (inv_term > 0),
                     jnp.log(jnp.maximum(pinv * inv_term, tiny)), -jnp.inf)
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
