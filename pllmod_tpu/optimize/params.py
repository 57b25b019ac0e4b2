"""Generic masked parameter-vector optimization over one partition.

TPU build of the reference's ``pllmod_opt_optimize_onedim`` /
``pllmod_opt_optimize_multidim`` (pll_optimize.c:411-454, 473-742) and the
parameter-vector encoder ``set_x_to_parameters`` (pll_optimize.c:71-301):
any combination of PLLMOD_OPT_PARAM_* bits packs into ONE flat ``x``
vector, in the reference's segment order

    SUBST_RATES (symmetry classes, last class pinned to 1)
    FREQUENCIES (s-1 ratios to the last state)
    PINV        (one scalar, written to every rate matrix)
    ALPHA       (one scalar; gamma cats recomputed differentiably)
    FREE_RATES  (rate_cats)
    RATE_WEIGHTS(C-1 ratios to the last category)
    BRANCHES_ALL(every branch length)

and one projected L-BFGS run optimizes the whole vector with ANALYTIC
gradients through the eigendecomp + pruning graph — replacing the
reference's vendored L-BFGS-B with per-dimension finite differences
(opt_algorithms.c:500-516). ``optimize_onedim`` is the Brent single-scalar
path (ALPHA / PINV / BRANCHES_SINGLE).

Difference from the reference encoder (deliberate): frequency and
rate-weight ratios are pinned to the LAST state/category instead of the
argmax (``highest_freq_state``) — with analytic gradients the pin choice
only affects conditioning, not the optimum, and a static pin keeps the
jitted objective shape stable across calls.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from pllmod_tpu import common
from pllmod_tpu.common import (
    OptimizeError, OPT_ERROR_PARAMETER, PARAM_ALPHA, PARAM_PINV,
    PARAM_SUBST_RATES, PARAM_FREQUENCIES, PARAM_FREE_RATES,
    PARAM_RATE_WEIGHTS, PARAM_BRANCHES_ALL, PARAM_BRANCHES_SINGLE,
)
from pllmod_tpu.ops import engine as engine_mod
from pllmod_tpu.optimize.brent import minimize_brent_multi
from pllmod_tpu.optimize.lbfgsb import minimize_lbfgsb

_MULTIDIM_ORDER = (PARAM_SUBST_RATES, PARAM_FREQUENCIES, PARAM_PINV,
                   PARAM_ALPHA, PARAM_FREE_RATES, PARAM_RATE_WEIGHTS,
                   PARAM_BRANCHES_ALL)


def _sym_expand_info(partition, symmetries):
    """Symmetry-class packing bookkeeping (set_x_to_parameters subst-rates
    branch, pll_optimize.c:95-146): returns (remap, pinned_class, k)."""
    n_rates = partition.states * (partition.states - 1) // 2
    sym = (np.arange(n_rates, dtype=np.int32) if symmetries is None
           else np.asarray(symmetries, np.int32))
    uniq, remap = np.unique(sym, return_inverse=True)
    return jnp.asarray(remap), int(remap[-1]), len(uniq)


def _segments(partition, tree, which, symmetries):
    """Build (x0, lo, hi) per selected segment, reference order."""
    segs = []          # (bit, size, x0, lo, hi)
    s = partition.states
    C = partition.n_cats
    if which & PARAM_SUBST_RATES:
        _, pinned, k = _sym_expand_info(partition, symmetries)
        if k >= 2:
            cur = np.asarray(partition.subst_rates[0], np.float64)
            remap = np.asarray(_sym_expand_info(partition, symmetries)[0])
            first = np.zeros(k, np.int64)
            seen = np.zeros(k, bool)
            for j, c in enumerate(remap):
                if not seen[c]:
                    first[c], seen[c] = j, True
            x0 = cur[first] / cur[first][pinned]
            x0 = np.delete(x0, pinned)
            segs.append((PARAM_SUBST_RATES, k - 1,
                         np.clip(x0, common.MIN_SUBST_RATE,
                                 common.MAX_SUBST_RATE),
                         common.MIN_SUBST_RATE, common.MAX_SUBST_RATE))
    if which & PARAM_FREQUENCIES:
        cur = np.asarray(partition.freqs[0], np.float64)
        x0 = np.clip(cur[:-1] / cur[-1], common.MIN_FREQ, common.MAX_FREQ)
        segs.append((PARAM_FREQUENCIES, s - 1, x0,
                     common.MIN_FREQ, common.MAX_FREQ))
    if which & PARAM_PINV:
        x0 = np.array([max(float(partition.pinv_mix()), 0.02)])
        segs.append((PARAM_PINV, 1, x0, 1e-9, common.MAX_PINV))
    if which & PARAM_ALPHA:
        segs.append((PARAM_ALPHA, 1, np.array([float(partition.alpha)]),
                     common.MIN_ALPHA, common.MAX_ALPHA))
    if which & PARAM_FREE_RATES:
        segs.append((PARAM_FREE_RATES, C,
                     np.asarray(partition.rate_cats, np.float64),
                     common.MIN_RATE, common.MAX_RATE))
    if which & PARAM_RATE_WEIGHTS:
        cur = np.asarray(partition.rate_weights, np.float64)
        x0 = np.clip(cur[:-1] / cur[-1], 1e-4, 1e4)
        segs.append((PARAM_RATE_WEIGHTS, C - 1, x0, 1e-4, 1e4))
    if which & PARAM_BRANCHES_ALL:
        live = np.asarray(tree.lengths, np.float64)
        segs.append((PARAM_BRANCHES_ALL, len(live),
                     np.clip(live, common.MIN_BRANCH_LEN,
                             common.MAX_BRANCH_LEN),
                     common.MIN_BRANCH_LEN, common.MAX_BRANCH_LEN))
    return segs


def _make_builder(partition, tree, which, symmetries):
    """x -> (partition', brlens') decoder, traceable under jit/grad."""
    if which & PARAM_SUBST_RATES:
        remap_j, pinned, k = _sym_expand_info(partition, symmetries)
    segs = _segments(partition, tree, which, symmetries)
    offsets = np.cumsum([0] + [sz for _, sz, *_ in segs])
    seg_of = {bit: (int(offsets[i]), int(offsets[i] + sz))
              for i, (bit, sz, *_rest) in enumerate(segs)}
    brl0 = jnp.asarray(tree.lengths, partition.dtype)

    def build(x):
        part = partition
        if PARAM_SUBST_RATES in seg_of:
            a, b = seg_of[PARAM_SUBST_RATES]
            free = x[a:b]
            ones = jnp.ones((1,), x.dtype)
            vals = jnp.concatenate([free[:pinned], ones, free[pinned:]])
            full = vals[remap_j]
            part = part.with_model_params(
                subst_rates=jnp.broadcast_to(full, part.subst_rates.shape))
        if PARAM_FREQUENCIES in seg_of:
            a, b = seg_of[PARAM_FREQUENCIES]
            raw = jnp.concatenate([x[a:b], jnp.ones((1,), x.dtype)])
            freqs = raw / jnp.sum(raw)
            part = part.with_model_params(
                freqs=jnp.broadcast_to(freqs, part.freqs.shape))
        if PARAM_PINV in seg_of:
            a, _ = seg_of[PARAM_PINV]
            part = part.replace(
                prop_invar=jnp.full_like(part.prop_invar, x[a]))
        if PARAM_ALPHA in seg_of:
            a, _ = seg_of[PARAM_ALPHA]
            part = part.with_alpha(x[a])
        if PARAM_FREE_RATES in seg_of:
            a, b = seg_of[PARAM_FREE_RATES]
            part = part.replace(rate_cats=x[a:b])
        if PARAM_RATE_WEIGHTS in seg_of:
            a, b = seg_of[PARAM_RATE_WEIGHTS]
            raw = jnp.concatenate([x[a:b], jnp.ones((1,), x.dtype)])
            part = part.replace(rate_weights=raw / jnp.sum(raw))
        if PARAM_BRANCHES_ALL in seg_of:
            a, b = seg_of[PARAM_BRANCHES_ALL]
            brl = x[a:b]
        else:
            brl = brl0
        return part, brl

    return build, segs, seg_of


def optimize_multidim(partition, tree, which: int, symmetries=None,
                      umin=None, umax=None, tol: float = 1e-4,
                      max_iters: int = 200):
    """One projected-L-BFGS run over every parameter selected in ``which``
    (pllmod_opt_optimize_multidim, pll_optimize.c:473-742).

    Args:
      which: OR of PARAM_SUBST_RATES | PARAM_FREQUENCIES | PARAM_PINV |
        PARAM_ALPHA | PARAM_FREE_RATES | PARAM_RATE_WEIGHTS |
        PARAM_BRANCHES_ALL
      symmetries: rate-symmetry int vector (SUBST_RATES packing)
      umin/umax: optional flat bound arrays over the whole packed vector
        (reference signature); default = the per-segment PLLMOD_OPT_MIN/
        MAX_* constants.
    Returns (new_partition, logL). With BRANCHES_ALL set, ``tree.lengths``
    is updated in place (the reference writes its branch buffer back).
    """
    known = 0
    for bit in _MULTIDIM_ORDER:
        known |= bit
    if not (which & known):
        raise OptimizeError(OPT_ERROR_PARAMETER,
                       f"no optimizable parameter in mask {which:#x}")
    build, segs, seg_of = _make_builder(partition, tree, which, symmetries)
    x0 = np.concatenate([x for _, _, x, _, _ in segs])
    lo = np.concatenate([np.full(sz, lo) for _, sz, _, lo, _ in segs])
    hi = np.concatenate([np.full(sz, hi) for _, sz, _, _, hi in segs])
    if umin is not None:
        lo = np.broadcast_to(np.asarray(umin, np.float64), lo.shape)
    if umax is not None:
        hi = np.broadcast_to(np.asarray(umax, np.float64), hi.shape)
    ops, root_info = tree.traversal_ops()
    ri = tuple(int(x) for x in root_info)
    ops_j = jnp.asarray(ops)

    @jax.jit
    def neg(x):
        part, brl = build(x)
        return -engine_mod.loglikelihood(part, ops_j, brl, ri)

    vg = jax.jit(jax.value_and_grad(neg))
    x, fv, _ = minimize_lbfgsb(
        lambda z: tuple(map(np.asarray, vg(jnp.asarray(z, partition.dtype)))),
        np.clip(x0, lo, hi), lo, hi, max_iters=max_iters, pgtol=tol)
    part, brl = build(jnp.asarray(x, partition.dtype))
    if PARAM_BRANCHES_ALL in seg_of:
        tree.lengths[:] = np.asarray(brl, np.float64)
    return part, -float(fv)


def optimize_onedim(partition, tree, which: int, edge: int | None = None,
                    umin: float | None = None, umax: float | None = None,
                    tol: float = 1e-4):
    """Brent on one scalar: ALPHA, PINV, or BRANCHES_SINGLE
    (pllmod_opt_optimize_onedim, pll_optimize.c:411-454). Any other mask
    raises, like the reference's -INFINITY return.

    Returns (new_partition, logL); BRANCHES_SINGLE updates
    ``tree.lengths[edge]`` in place and returns the partition unchanged.
    """
    ops, root_info = tree.traversal_ops()
    ri = tuple(int(x) for x in root_info)
    ops_j = jnp.asarray(ops)
    brl0 = jnp.asarray(tree.lengths, partition.dtype)
    if partition.reversible and partition.eigen_lam is None and \
            which in (PARAM_PINV, PARAM_BRANCHES_SINGLE):
        partition = partition.cache_eigen()

    if which == PARAM_ALPHA:
        x0 = float(partition.alpha)
        lo = umin if umin else common.MIN_ALPHA
        hi = umax if umax else common.MAX_ALPHA
        make = lambda x: (partition.with_alpha(x), brl0)
    elif which == PARAM_PINV:
        x0 = max(float(partition.pinv_mix()), 0.02)
        lo = umin if umin else 1e-9
        hi = umax if umax else common.MAX_PINV
        make = lambda x: (partition.replace(
            prop_invar=jnp.full_like(partition.prop_invar, x)), brl0)
    elif which == PARAM_BRANCHES_SINGLE:
        if edge is None:
            raise OptimizeError(OPT_ERROR_PARAMETER,
                           "BRANCHES_SINGLE needs an edge id")
        x0 = float(tree.lengths[edge])
        lo = umin if umin else common.MIN_BRANCH_LEN
        hi = umax if umax else common.MAX_BRANCH_LEN
        make = lambda x: (partition, brl0.at[edge].set(x))
    else:
        raise OptimizeError(OPT_ERROR_PARAMETER,
                       f"mask {which:#x} is not a one-dim parameter")

    @jax.jit
    def obj(xs):
        def one(x):
            part, brl = make(x)
            return -engine_mod.loglikelihood(part, ops_j, brl, ri)
        return jnp.stack([one(xs[k]) for k in range(xs.shape[0])])

    dt = partition.dtype
    x_opt, f_opt = minimize_brent_multi(
        obj, jnp.asarray([lo], dt), jnp.asarray([hi], dt),
        x0=jnp.asarray([np.clip(x0, lo, hi)], dt), tol=tol)
    x = float(x_opt[0])
    if which == PARAM_BRANCHES_SINGLE:
        tree.lengths[edge] = x
        return partition, -float(f_opt[0])
    part, _ = make(jnp.asarray(x, dt))
    return part, -float(f_opt[0])
