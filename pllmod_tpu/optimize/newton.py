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


def minimize_newton_old(deriv_fn, x0, xmin, xmax, tol=1e-4, max_iters=32):
    """Legacy IQ-TREE-derived Newton variant with bisection fallback
    (``pllmod_opt_minimize_newton_old``, opt_algorithms.c:281-384),
    vectorized over a batch like :func:`minimize_newton_multi`.

    Update rules are the reference's, in the maximize convention
    (f = dlogL/dx, df = d²logL/dx²; the reference minimizes −logL):

    - keep a bracket [xl, xh] from the sign of f,
    - take the raw (unclamped) Newton step ``x − f/df`` unless the
      objective is locally convex (``df >= 0``) or the step lands out of
      bracket (the reference's product test, sign-convention invariant),
      in which case bisect to ``(xl + xh)/2``,
    - stop when |dx| < tol or the derivative vanishes inside the bracket.

    Returns x_opt [N].
    """
    x0 = jnp.asarray(x0)
    dtype = x0.dtype
    xmin = jnp.broadcast_to(jnp.asarray(xmin, dtype), x0.shape)
    xmax = jnp.broadcast_to(jnp.asarray(xmax, dtype), x0.shape)
    x = jnp.clip(x0, xmin, xmax)

    f0, _ = deriv_fn(x)
    # f > 0: maximum to the right (reference f < 0 in minimize convention)
    xl = jnp.where(f0 > 0, x, xmin)
    xh = jnp.where(f0 > 0, xmax, x)

    def cond(state):
        i, x, xl, xh, conv = state
        return (i < max_iters) & ~jnp.all(conv)

    def body(state):
        i, x, xl, xh, conv = state
        f, df = deriv_fn(x)
        done_now = (df < 0) & (jnp.abs(f) < tol)
        # out-of-bracket product test (opt_algorithms.c:330-333);
        # invariant under the min/max sign flip
        oob = ((x - xh) * df - f) * ((x - xl) * df - f) >= 0.0
        bisect = (df >= 0.0) | oob
        x_newton = x - f / df
        x_bisect = xl + 0.5 * (xh - xl)
        x_new = jnp.where(bisect, x_bisect, x_newton)
        x_new = jnp.clip(x_new, xmin, xmax)
        dx = jnp.abs(x_new - x)
        # bracket update at the new point's derivative sign next iteration;
        # the reference updates with the current f before stepping
        xl = jnp.where(~conv & (f > 0), x, xl)
        xh = jnp.where(~conv & (f <= 0), x, xh)
        new_conv = conv | done_now | (dx < tol)
        x = jnp.where(conv | done_now, x, x_new)
        return i + 1, x, xl, xh, new_conv

    state = (jnp.asarray(0), x, xl, xh, jnp.zeros(x.shape, bool))
    _, x, _, _, _ = lax.while_loop(cond, body, state)
    return x
