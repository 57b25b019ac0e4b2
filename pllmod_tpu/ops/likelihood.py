"""Edge / root log-likelihood.

TPU-native equivalents of libpll's ``pll_compute_edge_loglikelihood`` and
``pll_compute_root_loglikelihood`` (SURVEY.md §2.9 "Hot kernels";
call site ``treeinfo.c:1049-1057``).

The p-inv mixture is combined in log space with ``logaddexp`` so that it is
exact under arbitrary CLV rescaling:

    lnL_site = logaddexp( log(1-p) + log(L_var_scaled) + scaler*ln2,
                          log(p)   + log(L_inv) )

where ``L_inv = Σ_{s ∈ invariant set} π_s`` (gamma.invariant_freq_sum) —
mathematically identical to libpll's formulation but overflow-safe when
scalers are large.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from pllmod_tpu.ops.clv import LN2, get_node_clv

# TPU matmuls default to bf16 inputs; likelihoods need true f32
_PREC = jax.lax.Precision.HIGHEST

_TINY = 1e-300


def _site_lnl(partition, per_cat_lk, scaler):
    """Combine scaled per-category site likelihoods with the p-inv term.

    ``per_cat_lk``: [P, C] scaled per-category likelihoods (BEFORE
    rate-weight mixing), ``scaler``: [P] int. Returns per-site logL [P].

    The p-inv and frequency terms are indexed per category through
    ``param_indices`` (the reference indexes ``prop_invar`` / ``frequencies``
    by ``params_indices[c]`` inside the category loop — libpll
    core_likelihood; NOT matrix 0), so mixtures with per-matrix pinv/freqs
    (e.g. LG4X+I) are exact:

        L_site = Σ_c w_c [ (1-p_c)·L_c·2^s + p_c·I_c ],
        I_c = Σ_{s ∈ invariant set} π_c[s]

    computed overflow-safely as
        logaddexp( ln Σ_c w_c (1-p_c) L_c_scaled + s·ln2,
                   ln Σ_c w_c p_c I_c ).
    """
    dtype = partition.dtype
    w = partition.rate_weights                                   # [C]
    pinv_c = partition.prop_invar[partition.param_indices]       # [C]
    tiny = jnp.asarray(_TINY if dtype == jnp.float64 else 1e-37, dtype)

    A = jnp.einsum("pc,c->p", per_cat_lk, w * (1.0 - pinv_c),
                   precision=_PREC)
    ln_var = jnp.log(jnp.maximum(A, tiny)) + scaler.astype(dtype) * LN2

    def with_pinv(_):
        inv_pc = jnp.einsum("ps,cs->pc", partition.inv_indicator,
                            partition.freqs_per_cat(),
                            precision=_PREC)                     # [P,C]
        B = jnp.einsum("pc,c->p", inv_pc, w * pinv_c, precision=_PREC)
        ln_b = jnp.where(B > 0, jnp.log(jnp.maximum(B, tiny)), -jnp.inf)
        return jnp.logaddexp(ln_var, ln_b)

    def without(_):
        return ln_var

    return lax.cond(jnp.max(pinv_c) > 0, with_pinv, without, None)


def edge_site_likelihood(partition, clv_p, clv_c, P_edge):
    """Scaled per-site per-category likelihood across an edge (before
    rate-weight / p-inv mixing; those happen in :func:`_site_lnl`).

    L[p,c] = Σ_i π_c[i] clv_p[p,c,i] Σ_j P[c,i,j] clv_c[p,c,j]
    """
    dtype = partition.dtype
    fc = partition.freqs_per_cat()                             # [C,S]
    right = jnp.einsum("pcj,cij->pci", clv_c, P_edge,
                       preferred_element_type=dtype,
                      precision=_PREC)
    return jnp.einsum("pci,ci,pci->pc", clv_p, fc, right,
                      preferred_element_type=dtype,
                      precision=_PREC)                         # [P,C]


def edge_loglikelihood(partition, clvs, scalers, node_p, node_c, P_edge,
                       persite: bool = False):
    """Log-likelihood across the edge (node_p, node_c).

    Either node may be a tip. Equivalent of pll_compute_edge_loglikelihood.
    """
    clv_p, s_p = get_node_clv(partition, clvs, scalers, node_p)
    clv_c, s_c = get_node_clv(partition, clvs, scalers, node_c)
    per_cat = edge_site_likelihood(partition, clv_p, clv_c, P_edge)
    lnl = _site_lnl(partition, per_cat, s_p + s_c)
    total = jnp.sum(lnl * partition.pattern_weights)
    if persite:
        return total, lnl
    return total


def root_loglikelihood(partition, clvs, scalers, node, persite: bool = False):
    """Log-likelihood at a (root) CLV: L[p] = Σ_c w_c Σ_i π_i clv[p,c,i].

    Equivalent of pll_compute_root_loglikelihood."""
    clv, s = get_node_clv(partition, clvs, scalers, node)
    fc = partition.freqs_per_cat()
    per_cat = jnp.einsum("pci,ci->pc", clv, fc,
                         preferred_element_type=partition.dtype,
                      precision=_PREC)
    lnl = _site_lnl(partition, per_cat, s)
    total = jnp.sum(lnl * partition.pattern_weights)
    if persite:
        return total, lnl
    return total
