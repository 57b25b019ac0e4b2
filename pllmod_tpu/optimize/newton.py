"""Vectorized bracketed Newton-Raphson for 1-D maximization.

TPU build of ``pllmod_opt_minimize_newton_multi`` (opt_algorithms.c:133-261):
``xnum`` independent scalar problems advance in lock-step with ONE shared
derivative callback per iteration (the reference's multi-partition sync
point); each variable tracks a bracket ``[xl, xh]``, clamps its step, and
freezes once converged. Here the lock-step is a ``vmap``/array axis and the
loop is a ``lax.while_loop`` — the derivative callback is evaluated for the
whole batch at once, which is exactly what the sumtable-based edge
derivatives want (SURVEY.md §3.2).

Convention: we MAXIMIZE (df/ddf are derivatives of the log-likelihood);
the reference minimizes -logL with the same update rule.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def minimize_newton_multi(deriv_fn, x0, xmin, xmax, tol=1e-4, max_iters=10):
    """Bracketed Newton on a batch of independent 1-D problems.

    Args:
      deriv_fn: x [N] -> (df [N], ddf [N]) derivatives of the objective
        (to maximize) at x. Called once per iteration for the whole batch.
      x0: [N] starting points
      xmin/xmax: scalar or [N] bounds
      tol: convergence threshold on |dx|
      max_iters: iteration cap (also bounds the per-step clamp, mirroring
        opt_algorithms.c:195 ``dx`` clamp)
    Returns:
      x_opt [N]
    """
    x0 = jnp.asarray(x0)
    dtype = x0.dtype
    xmin = jnp.broadcast_to(jnp.asarray(xmin, dtype), x0.shape)
    xmax = jnp.broadcast_to(jnp.asarray(xmax, dtype), x0.shape)
    max_step = (xmax - xmin) / max_iters

    def cond(state):
        i, x, xl, xh, conv = state
        return (i < max_iters) & ~jnp.all(conv)

    def body(state):
        i, x, xl, xh, conv = state
        df, ddf = deriv_fn(x)
        # bracket update: df > 0 => maximum is to the right
        xl = jnp.where(~conv & (df > 0), x, xl)
        xh = jnp.where(~conv & (df < 0), x, xh)
        # Newton step where concave; bisection toward ascent otherwise
        newton_dx = jnp.where(ddf < 0, -df / ddf, 0.0)
        newton_dx = jnp.clip(newton_dx, -max_step, max_step)
        x_newton = x + newton_dx
        x_bisect = jnp.where(df > 0, 0.5 * (x + xh), 0.5 * (x + xl))
        use_newton = (ddf < 0) & (x_newton > xl) & (x_newton < xh)
        x_new = jnp.where(use_newton, x_newton, x_bisect)
        x_new = jnp.clip(x_new, xmin, xmax)
        dx = jnp.abs(x_new - x)
        new_conv = conv | (dx < tol) | (df == 0)
        x = jnp.where(conv, x, x_new)
        return i + 1, x, xl, xh, new_conv

    state = (jnp.asarray(0), x0, xmin, xmax,
             jnp.zeros(x0.shape, bool))
    _, x, _, _, _ = lax.while_loop(cond, body, state)
    return x
