"""Vectorized bounded Brent 1-D minimization.

TPU build of the reference's Brent machinery (opt_algorithms.c:809-1467).
The reference splits Brent into init/loop/post phases so that N independent
optimizations synchronize only at target-function calls (``brent_opt_alt``
+ ``minimize_brent_multi``) — keeping ranks' collectives aligned. Here the
same lock-step shape falls out naturally: the whole batch advances in a
``lax.while_loop`` and the objective is evaluated ONCE per iteration for
all N problems (converged entries are frozen by masks).

Classic Brent: golden-section steps with parabolic-interpolation
acceleration on the bracketed interval [a, b].
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_GOLD = 0.3819660112501051  # (3 - sqrt(5)) / 2
_EPS = 1.0e-12


def minimize_brent_multi(f, xmin, xmax, x0=None, tol=1e-4, max_iters=100):
    """Minimize N independent scalar functions on boxes [xmin, xmax].

    Args:
      f: x [N] -> fx [N], evaluated batch-wise once per iteration.
      xmin, xmax: [N] or scalar bounds
      x0: optional [N] starting points (default: golden point of the box)
      tol: relative x tolerance
    Returns:
      (x_opt [N], f_opt [N])
    """
    dtype = jnp.result_type(xmin, xmax, 0.1)
    a = jnp.asarray(xmin, dtype)
    b = jnp.asarray(xmax, dtype)
    if x0 is None:
        x = a + _GOLD * (b - a)
    else:
        x = jnp.clip(jnp.asarray(x0, dtype), a, b)
    fx = f(x)
    # batch shape may come from the objective itself (scalar bounds, batched f)
    shape = jnp.broadcast_shapes(jnp.shape(x), jnp.shape(fx))
    a = jnp.broadcast_to(a, shape)
    b = jnp.broadcast_to(b, shape)
    x = jnp.broadcast_to(x, shape)
    fx = jnp.broadcast_to(fx, shape)
    w = v = x
    fw = fv = fx
    d = e = jnp.zeros(shape, dtype)

    def cond(state):
        i, a, b, x, w, v, fx, fw, fv, d, e, conv = state
        return (i < max_iters) & ~jnp.all(conv)

    def body(state):
        i, a, b, x, w, v, fx, fw, fv, d, e, conv = state
        xm = 0.5 * (a + b)
        tol1 = tol * jnp.abs(x) + _EPS
        tol2 = 2.0 * tol1
        new_conv = conv | (jnp.abs(x - xm) <= tol2 - 0.5 * (b - a))

        # parabolic fit through (x, w, v)
        r = (x - w) * (fx - fv)
        q = (x - v) * (fx - fw)
        p = (x - v) * q - (x - w) * r
        q2 = 2.0 * (q - r)
        p = jnp.where(q2 > 0, -p, p)
        q2 = jnp.abs(q2)
        use_para = ((jnp.abs(p) < jnp.abs(0.5 * q2 * e)) &
                    (p > q2 * (a - x)) & (p < q2 * (b - x)))
        # golden-section fallback
        e_gold = jnp.where(x >= xm, a - x, b - x)
        d_gold = _GOLD * e_gold
        d_para = jnp.where(q2 != 0, p / jnp.where(q2 == 0, 1.0, q2), 0.0)
        new_e = jnp.where(use_para, d, e_gold)
        new_d = jnp.where(use_para, d_para, d_gold)
        # enforce minimum step
        step = jnp.where(jnp.abs(new_d) >= tol1, new_d,
                         jnp.where(new_d >= 0, tol1, -tol1))
        u = x + step
        fu = f(jnp.where(new_conv, x, u))
        fu = jnp.where(new_conv, fx, fu)

        better = fu <= fx
        # bracket update
        a2 = jnp.where(better, jnp.where(u >= x, x, a),
                       jnp.where(u < x, u, a))
        b2 = jnp.where(better, jnp.where(u >= x, b, x),
                       jnp.where(u < x, b, u))
        # best-three bookkeeping
        v2 = jnp.where(better, w,
                       jnp.where((fu <= fw) | (w == x), w,
                                 jnp.where((fu <= fv) | (v == x) | (v == w),
                                           u, v)))
        fv2 = jnp.where(better, fw,
                        jnp.where((fu <= fw) | (w == x), fw,
                                  jnp.where((fu <= fv) | (v == x) | (v == w),
                                            fu, fv)))
        w2 = jnp.where(better, x, jnp.where((fu <= fw) | (w == x), u, w))
        fw2 = jnp.where(better, fx, jnp.where((fu <= fw) | (w == x), fu, fw))
        x2 = jnp.where(better, u, x)
        fx2 = jnp.where(better, fu, fx)

        frz = new_conv

        def keep(old, new):
            return jnp.where(frz, old, new)

        return (i + 1, keep(a, a2), keep(b, b2), keep(x, x2), keep(w, w2),
                keep(v, v2), keep(fx, fx2), keep(fw, fw2), keep(fv, fv2),
                keep(d, new_e * 0 + step), keep(e, new_e), new_conv)

    state = (jnp.asarray(0), a, b, x, w, v, fx, fw, fv, d, e,
             jnp.zeros(x.shape, bool))
    out = lax.while_loop(cond, body, state)
    return out[3], out[6]
