"""Bound-constrained L-BFGS with analytic gradients.

Replaces the reference's vendored f2c L-BFGS-B v3.0 + forward
finite-difference gradients (opt_algorithms.c:418-540: one extra objective
evaluation PER DIMENSION per iteration — nmax=189 for protein GTR). Here
gradients come from ``jax.grad`` through the likelihood graph, so each
iteration costs one value-and-grad evaluation regardless of dimension —
the single biggest algorithmic win of the TPU build (SURVEY.md §3.3).

Algorithm: projected two-loop-recursion L-BFGS — the quasi-Newton
direction is computed on the free variables (active-set by bound +
gradient sign), the trial point is projected onto the box, and an Armijo
backtracking line search guarantees monotone descent. This preserves the
reference's L-BFGS-B contract (box bounds, memory m, convergence on
projected-gradient norm and relative f decrease) without the Fortran
state machine.

The optimizer core is a GENERATOR state machine (`_lbfgsb_gen`): it
yields the point to evaluate and receives ``(f, g)`` — so the same
trajectory code serves both the single-instance driver
(:func:`minimize_lbfgsb`) and the LOCK-STEP multi-instance driver
(:func:`minimize_lbfgsb_multi`), the reference's
``pllmod_opt_minimize_lbfgsb_multi`` (opt_algorithms.c:542-807): K
instances advance together, and every step ALL lanes are evaluated in
ONE batched call — finished lanes are evaluated at their final point and
the result discarded, exactly the reference's ranks-evaluate-in-lock-step
invariant. The driver is a host loop: the objective itself (a jitted
logL) dominates cost; the O(m·d) vector algebra is negligible.
"""

from __future__ import annotations

import numpy as np

LBFGSB_FACTR = 1e7  # reference default factr (machine-eps multiples)
_EPSMCH = np.finfo(np.float64).eps


def _lbfgsb_gen(x0, lower, upper, m: int = 10, max_iters: int = 100,
                factr: float = LBFGSB_FACTR, pgtol: float = 1e-5):
    """Projected L-BFGS as a coroutine: ``f, g = yield x`` requests one
    objective evaluation. Returns (x_opt, f_opt, n_evals) via
    StopIteration.value. Trajectories are identical to the previous
    callback-driven implementation (same code, evaluation seam inverted).
    """
    x = np.clip(np.asarray(x0, np.float64), lower, upper)
    lower = np.broadcast_to(np.asarray(lower, np.float64), x.shape)
    upper = np.broadcast_to(np.asarray(upper, np.float64), x.shape)
    f, g = yield x
    f, g = float(f), np.asarray(g, np.float64)
    n_evals = 1
    S, Y, RHO = [], [], []

    for _ in range(max_iters):
        # projected gradient (KKT residual on the box)
        pg = np.where((x <= lower) & (g > 0), 0.0,
                      np.where((x >= upper) & (g < 0), 0.0, g))
        if np.max(np.abs(pg)) <= pgtol:
            break

        # free-variable mask; restrict direction to free set
        free = ~(((x <= lower) & (g > 0)) | ((x >= upper) & (g < 0)))
        q = np.where(free, g, 0.0)
        alphas = []
        for s, y, rho in zip(reversed(S), reversed(Y), reversed(RHO)):
            a = rho * np.dot(s, q)
            alphas.append(a)
            q = q - a * y
        if S:
            gamma = np.dot(S[-1], Y[-1]) / max(np.dot(Y[-1], Y[-1]), 1e-300)
            q = gamma * q
        for (s, y, rho), a in zip(zip(S, Y, RHO), reversed(alphas)):
            b = rho * np.dot(y, q)
            q = q + s * (a - b)
        d = -np.where(free, q, 0.0)
        if np.dot(d, g) >= 0:  # not a descent direction -> steepest descent
            d = -np.where(free, g, 0.0)
            if not np.any(d):
                break

        # Armijo backtracking on the projected path, with a Wolfe-style
        # expansion phase: if the unit step satisfies Armijo but the
        # directional derivative is still strongly negative (curvature
        # condition violated), grow the step — Armijo-only unit steps
        # crawl on ill-scaled valleys (the 189-dim protein-GTR case)
        step = 1.0
        accepted = False
        for _ls in range(30):
            x_new = np.clip(x + step * d, lower, upper)
            dx = x_new - x
            if not np.any(dx):
                break
            f_new, g_new = yield x_new
            f_new = float(f_new)
            n_evals += 1
            if f_new <= f + 1e-4 * np.dot(g, dx):
                accepted = True
                break
            step *= 0.5
        if not accepted:
            break
        for _exp in range(8):
            dgx = np.dot(np.asarray(g_new, np.float64), x_new - x)
            if dgx >= 0.9 * np.dot(g, x_new - x):
                break                       # curvature condition holds
            x_try = np.clip(x + 2.0 * step * d, lower, upper)
            if not np.any(x_try - x_new):
                break
            f_try, g_try = yield x_try
            f_try = float(f_try)
            n_evals += 1
            if f_try > f + 1e-4 * np.dot(g, x_try - x) or f_try >= f_new:
                break
            step *= 2.0
            x_new, f_new, g_new = x_try, f_try, g_try

        s_vec = x_new - x
        y_vec = np.asarray(g_new, np.float64) - g
        sy = np.dot(s_vec, y_vec)
        if sy > 1e-10 * np.linalg.norm(s_vec) * np.linalg.norm(y_vec):
            S.append(s_vec)
            Y.append(y_vec)
            RHO.append(1.0 / sy)
            if len(S) > m:
                S.pop(0), Y.pop(0), RHO.pop(0)

        f_prev = f
        x, f, g = x_new, f_new, np.asarray(g_new, np.float64)
        # factr <= 0 disables the relative-decrease stop (run to pgtol)
        if factr > 0 and (f_prev - f) <= factr * _EPSMCH * max(
                abs(f), abs(f_prev), 1.0):
            break

    return x, f, n_evals


def minimize_lbfgsb(value_and_grad, x0, lower, upper, m: int = 10,
                    max_iters: int = 100, factr: float = LBFGSB_FACTR,
                    pgtol: float = 1e-5):
    """Minimize f on a box.

    Args:
      value_and_grad: x [d] (np.float64) -> (f, g [d]); typically a jitted
        ``jax.value_and_grad`` wrapped to numpy.
      x0, lower, upper: [d]
      m: history size
      factr: stop when (f_k - f_{k+1}) <= factr * eps * max(|f|, 1)
      pgtol: stop when max_i |proj_grad_i| <= pgtol
    Returns:
      (x_opt [d], f_opt, n_evals)
    """
    gen = _lbfgsb_gen(x0, lower, upper, m=m, max_iters=max_iters,
                      factr=factr, pgtol=pgtol)
    try:
        x = next(gen)
        while True:
            x = gen.send(value_and_grad(x))
    except StopIteration as stop:
        return stop.value


def minimize_lbfgsb_multi(value_and_grad_multi, x0s, lowers, uppers,
                          m: int = 10, max_iters: int = 100,
                          factr: float = LBFGSB_FACTR, pgtol: float = 1e-5):
    """K lock-step L-BFGS-B instances with ONE batched evaluation per
    step (pllmod_opt_minimize_lbfgsb_multi, opt_algorithms.c:542-807:
    every rank executes each instance's objective evaluations in the
    same order; here the "ranks" are lanes of one device program).

    Args:
      value_and_grad_multi: xs (list of K [d_k] float64 arrays) ->
        list of K (f, g) pairs — ONE combined dispatch evaluating every
        lane (lanes whose instance already converged are passed their
        final x; their result is ignored).
      x0s / lowers / uppers: per-lane arrays (dims may differ).
    Returns:
      list of K (x_opt, f_opt, n_evals) — each lane's trajectory is
      IDENTICAL to a standalone :func:`minimize_lbfgsb` run (the lock
      step only aligns evaluation timing, never lane state).
    """
    K = len(x0s)
    gens, xs, live, results = [], [], [], [None] * K
    for k in range(K):
        gen = _lbfgsb_gen(x0s[k], lowers[k], uppers[k], m=m,
                          max_iters=max_iters, factr=factr, pgtol=pgtol)
        gens.append(gen)
        xs.append(next(gen))
        live.append(True)
    while any(live):
        fgs = value_and_grad_multi(xs)
        for k in range(K):
            if not live[k]:
                continue
            try:
                xs[k] = gens[k].send(fgs[k])
            except StopIteration as stop:
                results[k] = stop.value
                xs[k] = stop.value[0]
                live[k] = False
    return results


# ---------------------------------------------------------------------------
# Whole-optimizer-on-device variant: the ENTIRE lock-step multi-lane
# L-BFGS trajectory as ONE jitted program (the L-BFGS member of the
# round-3/4 "whole optimizer as one device program" family — whole-Brent
# lanes and the on-device BLO driver are the precedents). The host
# drivers above pay one ~40 ms dispatch ISSUE per evaluation on the
# remote-TPU runtime (~40 evals × 2-3 families per opt_model call);
# this collapses a family's whole optimization to one dispatch.
#
# The state machine mirrors `_lbfgsb_gen` transition-for-transition
# (projected two-loop direction, Armijo backtracking, Wolfe-style
# expansion, curvature-guarded history update, pgtol/factr stops); lane
# algebra runs in float64 like the host version (tiny [m, d] tensors —
# negligible even on TPU's emulated f64).
# ---------------------------------------------------------------------------
def _device_lane_state(x0, lower, upper, m):
    import jax.numpy as jnp
    f64 = jnp.float64
    x = jnp.clip(jnp.asarray(x0, f64), jnp.asarray(lower, f64),
                 jnp.asarray(upper, f64))
    d = x.shape[0]
    z = jnp.zeros((), f64)
    return dict(
        x=x, f=z, g=jnp.zeros(d, f64),
        S=jnp.zeros((m, d), f64), Y=jnp.zeros((m, d), f64),
        rho=jnp.zeros(m, f64), cnt=jnp.zeros((), jnp.int32),
        phase=jnp.zeros((), jnp.int32),        # 0=init, 1=LS, 2=EXPAND
        dvec=jnp.zeros(d, f64), step=jnp.ones((), f64),
        ls=jnp.zeros((), jnp.int32), exp=jnp.zeros((), jnp.int32),
        x_eval=x, x_new=x, f_new=z, g_new=jnp.zeros(d, f64),
        iters=jnp.zeros((), jnp.int32), done=jnp.zeros((), bool),
        n_evals=jnp.zeros((), jnp.int32), lower=jnp.asarray(lower, f64),
        upper=jnp.asarray(upper, f64))


def _two_loop_direction(st, m):
    """Projected two-loop recursion on the free set (newest history at
    ring slot m-1; `valid` masks unfilled slots)."""
    import jax
    import jax.numpy as jnp
    x, g = st["x"], st["g"]
    lower, upper = st["lower"], st["upper"]
    free = ~(((x <= lower) & (g > 0)) | ((x >= upper) & (g < 0)))
    q = jnp.where(free, g, 0.0)
    valid = jnp.arange(m) >= (m - jnp.minimum(st["cnt"], m))

    def bwd(i, carry):
        q, alphas = carry
        idx = m - 1 - i                      # newest -> oldest
        a = st["rho"][idx] * jnp.dot(st["S"][idx], q)
        a = jnp.where(valid[idx], a, 0.0)
        q = q - a * st["Y"][idx]
        return q, alphas.at[idx].set(a)

    q, alphas = jax.lax.fori_loop(0, m, bwd,
                                  (q, jnp.zeros(m, q.dtype)))
    have = st["cnt"] > 0
    sy = jnp.dot(st["S"][m - 1], st["Y"][m - 1])
    yy = jnp.maximum(jnp.dot(st["Y"][m - 1], st["Y"][m - 1]), 1e-300)
    q = jnp.where(have, q * (sy / yy), q)

    def fwd(idx, q):
        b = st["rho"][idx] * jnp.dot(st["Y"][idx], q)
        upd = st["S"][idx] * (alphas[idx] - b)
        return q + jnp.where(valid[idx], upd, 0.0)

    q = jax.lax.fori_loop(0, m, fwd, q)
    d = -jnp.where(free, q, 0.0)
    # not a descent direction -> projected steepest descent
    d = jnp.where(jnp.dot(d, g) >= 0, -jnp.where(free, g, 0.0), d)
    return d


_DEVICE_PROGRAMS: dict = {}


def minimize_lbfgsb_multi_device(vg_multi_traced, x0s, lowers, uppers,
                                 m: int = 10, max_iters: int = 100,
                                 factr: float = LBFGSB_FACTR,
                                 pgtol: float = 1e-5, cache_key=None,
                                 auxs=()):
    """One-dispatch lock-step multi-lane L-BFGS-B.

    Args:
      vg_multi_traced: traced fn, (tuple of K x-arrays (f64), auxs) ->
        tuple of K (f, g) pairs (any float dtype; cast to f64
        internally).
      x0s/lowers/uppers: per-lane numpy arrays (dims may differ).
      cache_key: hashable key under which the compiled whole-trajectory
        program is cached; MUST capture everything that changes the
        computation except ``auxs`` (which are TRACED operands, so one
        program serves every topology / parameter state).
      auxs: per-lane traced operand pytrees forwarded to the objective.
    Returns list of K (x_opt np[d], f_opt float, n_evals int).
    """
    import jax
    import jax.numpy as jnp

    K = len(x0s)
    EPS = _EPSMCH

    def finalize(st, is_init=False):
        """History update + stops + next direction + first LS trial.
        Consumes (x_new, f_new, g_new)."""
        s_vec = st["x_new"] - st["x"]
        y_vec = st["g_new"] - st["g"]
        sy = jnp.dot(s_vec, y_vec)
        good = sy > 1e-10 * jnp.linalg.norm(s_vec) * jnp.linalg.norm(
            y_vec)
        S2 = jnp.where(good, jnp.roll(st["S"], -1, axis=0)
                       .at[m - 1].set(s_vec), st["S"])
        Y2 = jnp.where(good, jnp.roll(st["Y"], -1, axis=0)
                       .at[m - 1].set(y_vec), st["Y"])
        rho2 = jnp.where(good, jnp.roll(st["rho"], -1)
                         .at[m - 1].set(1.0 / sy), st["rho"])
        cnt2 = st["cnt"] + good.astype(st["cnt"].dtype)
        f_prev = st["f"]
        st = dict(st, S=S2, Y=Y2, rho=rho2, cnt=cnt2, x=st["x_new"],
                  f=st["f_new"], g=st["g_new"],
                  iters=st["iters"] + (0 if is_init else 1))
        # the host loop has no factr check before the first step
        stop_factr = (not is_init) & (factr > 0) & (
            (f_prev - st["f"]) <= factr * EPS * jnp.maximum(
                jnp.maximum(jnp.abs(st["f"]), jnp.abs(f_prev)), 1.0))
        x, g = st["x"], st["g"]
        pg = jnp.where((x <= st["lower"]) & (g > 0), 0.0,
                       jnp.where((x >= st["upper"]) & (g < 0), 0.0, g))
        stop_pg = jnp.max(jnp.abs(pg)) <= pgtol
        stop_iters = st["iters"] >= max_iters
        d = _two_loop_direction(st, m)
        no_dir = ~jnp.any(d != 0)
        x_t = jnp.clip(x + d, st["lower"], st["upper"])
        no_move = ~jnp.any(x_t != x)
        done = stop_factr | stop_pg | stop_iters | no_dir | no_move
        return dict(st, done=st["done"] | done, dvec=d,
                    step=jnp.ones((), x.dtype),
                    ls=jnp.zeros((), jnp.int32),
                    phase=jnp.full((), 1, jnp.int32),
                    x_eval=jnp.where(done, x, x_t))

    def lane_step(st, f_e, g_e):
        f_e = f_e.astype(jnp.float64)
        g_e = g_e.astype(jnp.float64)
        st = dict(st, n_evals=st["n_evals"]
                  + (~st["done"]).astype(jnp.int32))

        def do_init(st):
            st = dict(st, f=f_e, g=g_e, x_new=st["x"], f_new=f_e,
                      g_new=g_e)
            return finalize(st, is_init=True)

        def do_ls(st):
            dx = st["x_eval"] - st["x"]
            gdx = jnp.dot(st["g"], dx)
            armijo = f_e <= st["f"] + 1e-4 * gdx

            # -- accepted: enter the expansion check ---------------------
            def accepted(st):
                st = dict(st, x_new=st["x_eval"], f_new=f_e, g_new=g_e,
                          exp=jnp.zeros((), jnp.int32))
                dgx = jnp.dot(st["g_new"], st["x_new"] - st["x"])
                curv = dgx >= 0.9 * jnp.dot(st["g"],
                                            st["x_new"] - st["x"])
                x_try = jnp.clip(st["x"] + 2.0 * st["step"] * st["dvec"],
                                 st["lower"], st["upper"])
                same = ~jnp.any(x_try != st["x_new"])

                def fin(st):
                    return finalize(st)

                def expand(st):
                    return dict(st, phase=jnp.full((), 2, jnp.int32),
                                x_eval=x_try)

                return jax.lax.cond(curv | same, fin, expand, st)

            # -- rejected: halve the step or give up ---------------------
            def rejected(st):
                step2 = st["step"] * 0.5
                ls2 = st["ls"] + 1
                x_t = jnp.clip(st["x"] + step2 * st["dvec"],
                               st["lower"], st["upper"])
                give_up = (ls2 >= 30) | (~jnp.any(x_t != st["x"]))
                return dict(st, step=step2, ls=ls2,
                            done=st["done"] | give_up,
                            x_eval=jnp.where(give_up, st["x"], x_t))

            return jax.lax.cond(armijo, accepted, rejected, st)

        def do_expand(st):
            x_try = st["x_eval"]
            gdx = jnp.dot(st["g"], x_try - st["x"])
            fail = (f_e > st["f"] + 1e-4 * gdx) | (f_e >= st["f_new"])

            def keep(st):            # expansion failed: finalize x_new
                return finalize(st)

            def grow(st):
                st = dict(st, step=st["step"] * 2.0, x_new=x_try,
                          f_new=f_e, g_new=g_e, exp=st["exp"] + 1)
                dgx = jnp.dot(st["g_new"], st["x_new"] - st["x"])
                curv = dgx >= 0.9 * jnp.dot(st["g"],
                                            st["x_new"] - st["x"])
                x_t2 = jnp.clip(st["x"] + 2.0 * st["step"] * st["dvec"],
                                st["lower"], st["upper"])
                same = ~jnp.any(x_t2 != st["x_new"])
                stop = curv | same | (st["exp"] >= 8)
                return jax.lax.cond(
                    stop, finalize,
                    lambda s: dict(s, x_eval=x_t2), st)

            return jax.lax.cond(fail, keep, grow, st)

        def live(st):
            return jax.lax.switch(st["phase"], (do_init, do_ls,
                                                do_expand), st)

        return jax.lax.cond(st["done"], lambda s: s, live, st)

    def run(states, auxs):
        def cond(carry):
            states, _ = carry
            return ~jnp.stack([s["done"] for s in states]).all()

        def body(carry):
            states, auxs = carry
            fgs = vg_multi_traced(tuple(s["x_eval"] for s in states),
                                  auxs)
            return (tuple(lane_step(s, f, g)
                          for s, (f, g) in zip(states, fgs)), auxs)

        out, _ = jax.lax.while_loop(cond, body, (tuple(states), auxs))
        return out

    states = tuple(_device_lane_state(x0s[k], lowers[k], uppers[k], m)
                   for k in range(K))
    prog = _DEVICE_PROGRAMS.get(cache_key) if cache_key else None
    if prog is None:
        import jax as _jax
        prog = _jax.jit(run)
        if cache_key:
            _DEVICE_PROGRAMS[cache_key] = prog
    out = prog(states, auxs)
    out = jax.device_get(out)                 # ONE host sync for all
    return [(np.asarray(s["x"], np.float64), float(s["f"]),
             int(s["n_evals"])) for s in out]
