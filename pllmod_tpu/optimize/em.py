"""EM algorithm for free-rate mixture weights (Wang et al. 2008).

TPU build of ``pllmod_algo_opt_rates_weights``'s EM core
(opt_algorithms.c:1473-1546): given per-site per-category likelihoods,
iterate posterior responsibilities (E) and weight re-estimation (M) until
the weights stabilize. Fully batched: one [patterns, cats] matmul per
iteration.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


@partial(jax.jit, static_argnames=("max_iters",))
def em_rates_weights(site_cat_lh, pattern_weights, weights0,
                     max_iters: int = 100, tol: float = 1e-8,
                     min_weight: float = 1e-7):
    """EM update of category weights.

    Args:
      site_cat_lh: [P, C] per-site per-category likelihoods (any common
        per-site scaling cancels in the posterior)
      pattern_weights: [P]
      weights0: [C] starting weights (sum 1)
    Returns:
      weights [C]
    """
    W = jnp.sum(pattern_weights)

    def cond(state):
        i, w, delta = state
        return (i < max_iters) & (delta > tol)

    def body(state):
        i, w, _ = state
        mix = site_cat_lh * w[None, :]                     # [P, C]
        denom = jnp.maximum(jnp.sum(mix, axis=1, keepdims=True), 1e-300)
        post = mix / denom                                  # responsibilities
        w_new = (pattern_weights @ post) / W
        w_new = jnp.maximum(w_new, min_weight)
        w_new = w_new / jnp.sum(w_new)
        return i + 1, w_new, jnp.max(jnp.abs(w_new - w))

    _, w, _ = lax.while_loop(cond, body,
                             (jnp.asarray(0), jnp.asarray(weights0),
                              jnp.asarray(jnp.inf, site_cat_lh.dtype)))
    return w
