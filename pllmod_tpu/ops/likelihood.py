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


def _site_lnl(partition, site_lk, scaler):
    """Combine scaled variable-site likelihood with the p-inv term.

    site_lk: [P] (scaled by 2^-scaler), scaler: [P] int
    returns per-site log-likelihood [P]."""
    dtype = partition.dtype
    pinv = partition.pinv_mix()
    tiny = jnp.asarray(_TINY if dtype == jnp.float64 else 1e-37, dtype)
    ln_var = jnp.log(jnp.maximum(site_lk, tiny)) + scaler.astype(dtype) * LN2

    inv_term = partition.inv_indicator @ partition.freqs[0]     # [P]

    def with_pinv(_):
        ln_a = jnp.log1p(-pinv) + ln_var
        ln_b = jnp.log(jnp.maximum(pinv, tiny)) + \
            jnp.log(jnp.maximum(inv_term, tiny))
        ln_b = jnp.where(inv_term > 0, ln_b, -jnp.inf)
        return jnp.logaddexp(ln_a, ln_b)

    def without(_):
        return ln_var

    return lax.cond(pinv > 0, with_pinv, without, None)


def edge_site_likelihood(partition, clv_p, clv_c, P_edge):
    """Scaled per-site likelihood across an edge (before p-inv mixing).

    L[p] = Σ_c w_c Σ_i π_i clv_p[p,c,i] Σ_j P[c,i,j] clv_c[p,c,j]
    """
    dtype = partition.dtype
    fc = partition.freqs_per_cat()                             # [C,S]
    right = jnp.einsum("pcj,cij->pci", clv_c, P_edge,
                       preferred_element_type=dtype,
                      precision=_PREC)
    per_cat = jnp.einsum("pci,ci,pci->pc", clv_p, fc, right,
                         preferred_element_type=dtype,
                      precision=_PREC)
    return jnp.einsum("pc,c->p", per_cat, partition.rate_weights,
                      precision=_PREC)  # [P]


def edge_loglikelihood(partition, clvs, scalers, node_p, node_c, P_edge,
                       persite: bool = False):
    """Log-likelihood across the edge (node_p, node_c).

    Either node may be a tip. Equivalent of pll_compute_edge_loglikelihood.
    """
    clv_p, s_p = get_node_clv(partition, clvs, scalers, node_p)
    clv_c, s_c = get_node_clv(partition, clvs, scalers, node_c)
    site_lk = edge_site_likelihood(partition, clv_p, clv_c, P_edge)
    lnl = _site_lnl(partition, site_lk, s_p + s_c)
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
    site_lk = jnp.einsum("pc,c->p", per_cat, partition.rate_weights,
                         precision=_PREC)
    lnl = _site_lnl(partition, site_lk, s)
    total = jnp.sum(lnl * partition.pattern_weights)
    if persite:
        return total, lnl
    return total
