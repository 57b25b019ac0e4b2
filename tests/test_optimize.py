"""Optimizer tests: Newton BLO, Brent, L-BFGS-B, EM.

Mirrors the reference's optimize tests (test/src/optimize/blopt-minimal):
BLO must strictly improve logL, reach a stationary point (near-zero
per-edge derivatives), and agree with an independent autodiff-based
optimum.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pllmod_tpu.ops.partition import create_partition
from pllmod_tpu.ops.engine import tree_loglikelihood
from pllmod_tpu.optimize import (minimize_newton_multi, minimize_brent_multi,
                                 minimize_lbfgsb, em_rates_weights,
                                 optimize_branch_lengths)
from pllmod_tpu.optimize.blo import DirectedTraversal, _blo_sweep, _lnl_at
from pllmod_tpu.tree import Tree
from tests import reference_impl as ref


def make_case(rng, n_tips=8, n_sites=120, cats=4, pinv=0.0):
    tree = ref.random_binary_tree(rng, n_tips, 0.02, 0.6)
    seqs = ref.random_sequences(rng, n_tips, n_sites)
    part = create_partition(
        seqs, states=4, n_rate_cats=cats, alpha=0.8,
        subst_rates=rng.uniform(0.5, 3.0, 6),
        freqs=rng.dirichlet([8, 8, 8, 8]), prop_invar=pinv,
        dtype=jnp.float64)
    return tree, part


# ---------------------------------------------------------------------------
# generic minimizers
# ---------------------------------------------------------------------------
def test_newton_multi_quartics():
    # maximize f_i(x) = -(x - m_i)^2 independently
    m = jnp.array([0.3, 1.7, 5.0, 0.01])

    def deriv(x):
        return -2 * (x - m), jnp.full_like(x, -2.0)

    x = minimize_newton_multi(deriv, jnp.full(4, 1.0), 1e-4, 10.0,
                              tol=1e-8, max_iters=50)
    np.testing.assert_allclose(np.asarray(x), np.asarray(m), atol=1e-6)


def test_brent_multi_minima():
    m = jnp.array([0.4, 2.2, 0.9])

    def f(x):
        return (x - m) ** 2 + jnp.sin(x)

    x, fx = minimize_brent_multi(f, 0.01, 5.0, tol=1e-10, max_iters=200)
    # compare against dense grid optimum
    grid = jnp.linspace(0.01, 5.0, 200001)
    fg = jax.vmap(lambda g: (g - m) ** 2 + jnp.sin(g))(grid)
    expect = grid[jnp.argmin(fg, axis=0)]
    np.testing.assert_allclose(np.asarray(x), np.asarray(expect), atol=1e-4)


def test_lbfgsb_rosenbrock_box():
    def vg(x):
        xj = jnp.asarray(x)
        f = lambda z: jnp.sum(100 * (z[1:] - z[:-1] ** 2) ** 2
                              + (1 - z[:-1]) ** 2)
        val, g = jax.value_and_grad(f)(xj)
        return float(val), np.asarray(g)

    x, fv, ne = minimize_lbfgsb(vg, np.array([-1.0, 2.0, 2.0]),
                                np.full(3, -5.0), np.full(3, 5.0),
                                max_iters=500)
    np.testing.assert_allclose(x, 1.0, atol=1e-4)
    # active bound case: constrain x0 <= 0.5
    x2, f2, _ = minimize_lbfgsb(vg, np.array([-1.0, 2.0, 2.0]),
                                np.full(3, -5.0), np.array([0.5, 5.0, 5.0]),
                                max_iters=500)
    assert x2[0] == pytest.approx(0.5, abs=1e-8)


def test_em_weights_match_direct_ml():
    rng = np.random.default_rng(0)
    true_w = np.array([0.6, 0.3, 0.1])
    P = 2000
    comp = rng.choice(3, p=true_w, size=P)
    L = np.full((P, 3), 0.05) + rng.uniform(0, 0.02, (P, 3))
    L[np.arange(P), comp] = 1.0
    w_em = np.asarray(em_rates_weights(jnp.asarray(L), jnp.ones(P),
                                       jnp.full(3, 1 / 3), max_iters=500,
                                       tol=1e-12))
    # direct ML over the simplex via softmax + L-BFGS
    Lj = jnp.asarray(L)

    def neg(theta):
        w = jax.nn.softmax(theta)
        return -jnp.sum(jnp.log(Lj @ w))

    vg = jax.jit(jax.value_and_grad(neg))
    th, f_opt, _ = minimize_lbfgsb(
        lambda z: tuple(map(np.asarray, vg(jnp.asarray(z)))),
        np.zeros(3), np.full(3, -20.0), np.full(3, 20.0), max_iters=500)
    w_ml = np.asarray(jax.nn.softmax(jnp.asarray(th)))
    np.testing.assert_allclose(w_em, w_ml, atol=1e-4)
    assert abs(float(neg(jnp.log(jnp.asarray(w_em)))) - f_opt) < 1e-6


# ---------------------------------------------------------------------------
# branch-length optimization
# ---------------------------------------------------------------------------
def test_blo_sweep_lnl_matches_engine(rng):
    tree, part = make_case(rng)
    trav = DirectedTraversal(tree)
    levels, offsets, edge_ref, n_slots = trav.schedule()
    lnl_ref = float(tree_loglikelihood(part, tree))
    lnl = float(_lnl_at(part, levels, offsets, edge_ref,
                        jnp.asarray(trav.edge_mask),
                        jnp.asarray(tree.lengths, part.dtype), n_slots))
    assert lnl == pytest.approx(lnl_ref, abs=1e-8)


def test_blo_improves_and_reaches_stationary_point(rng):
    tree, part = make_case(rng)
    l0 = float(tree_loglikelihood(part, tree))
    brlens, lnl = optimize_branch_lengths(part, tree, max_sweeps=64,
                                          tolerance=1e-10, newton_tol=1e-8)
    assert lnl > l0 + 0.1
    # engine agrees with reported logL
    assert float(tree_loglikelihood(part, tree)) == pytest.approx(lnl, abs=1e-6)
    # stationarity: gradient of logL w.r.t. every live branch ~ 0
    ops, root_info = tree.traversal_ops()
    from pllmod_tpu.ops import engine

    def f(b):
        return engine.loglikelihood(part, jnp.asarray(ops), b,
                                    tuple(int(x) for x in root_info))

    g = np.asarray(jax.grad(f)(jnp.asarray(tree.lengths, part.dtype)))
    live = np.asarray(tree.edge_nodes[:, 0] >= 0)
    interior = live & (np.asarray(brlens) > 2e-4) & (np.asarray(brlens) < 99)
    assert np.max(np.abs(g[interior])) < 0.05


def test_blo_matches_autodiff_optimum(rng):
    """Independent check: optimize the same objective with plain gradient
    ascent via autodiff; logL optima must agree closely."""
    tree, part = make_case(rng, n_tips=6, n_sites=80)
    t2 = tree.copy()
    _, lnl_newton = optimize_branch_lengths(part, tree, max_sweeps=40,
                                            tolerance=1e-10)

    ops, root_info = t2.traversal_ops()
    from pllmod_tpu.ops import engine
    ri = tuple(int(x) for x in root_info)

    def neg(logb):
        return -engine.loglikelihood(part, jnp.asarray(ops), jnp.exp(logb), ri)

    vg = jax.jit(jax.value_and_grad(neg))
    x, f_opt, _ = minimize_lbfgsb(
        lambda z: tuple(map(np.asarray, vg(jnp.asarray(z)))),
        np.log(np.clip(t2.lengths, 1e-4, None)),
        np.full(len(t2.lengths), np.log(1e-4)),
        np.full(len(t2.lengths), np.log(100.0)), max_iters=300)
    # Newton BLO must be at least as good as the independent optimizer
    # (it may be strictly better if L-BFGS under-converges)
    assert lnl_newton >= -f_opt - 1e-3


def test_blo_with_pinv(rng):
    tree, part = make_case(rng, pinv=0.2)
    l0 = float(tree_loglikelihood(part, tree))
    _, lnl = optimize_branch_lengths(part, tree)
    assert lnl >= l0 - 1e-9
    assert float(tree_loglikelihood(part, tree)) == pytest.approx(lnl, abs=1e-6)


def test_blo_local_radius(rng):
    """Radius-limited local BLO (pllmod_opt_optimize_branch_lengths_local
    semantics): only edges within the radius move; logL improves; a full
    BLO from the same start does at least as well."""
    import numpy as np
    import jax.numpy as jnp
    from pllmod_tpu.optimize.blo import optimize_branch_lengths
    from tests import reference_impl as ref
    from pllmod_tpu.ops.partition import create_partition

    tree = ref.random_binary_tree(rng, 10)
    seqs = ref.random_sequences(rng, 10, 90)
    part = create_partition(seqs, states=4, n_rate_cats=4, alpha=0.9,
                            dtype=jnp.float64)
    edge = int(np.nonzero(tree.edge_nodes[:, 0] >= 0)[0][4])
    t_local = tree.copy()
    before = t_local.lengths.copy()
    b_loc, l_loc = optimize_branch_lengths(part, t_local,
                                           around_edge=edge, radius=1)
    moved = np.nonzero(~np.isclose(np.asarray(t_local.lengths), before,
                                   rtol=0, atol=1e-12))[0]
    from pllmod_tpu.optimize.blo import _edges_within_radius
    allowed = set(_edges_within_radius(tree, edge, 1))
    assert set(moved.tolist()) <= allowed
    assert len(moved) > 0
    t_full = tree.copy()
    _, l_full = optimize_branch_lengths(part, t_full)
    assert l_full >= l_loc - 1e-6


def test_blo_hard_case_coupled_branches(rng):
    """SAFE-mode analog on a hard, strongly-coupled case (the reference
    reverts a worsening per-edge Newton step, pll_optimize.c:1587-1632;
    we use color-grouped Gauss-Seidel + best-iterate damping).

    Duplicate sequence pairs force near-zero terminal branches while the
    start point puts every branch at the far bracket end -- simultaneous
    Newton steps on adjacent edges overshoot badly here if uncorrected.
    The production path must still land on the autodiff joint optimum,
    and must never return an iterate worse than the best one seen.
    """
    n_tips, n_sites = 8, 100
    tree = ref.random_binary_tree(rng, n_tips, 0.05, 0.3)
    base = ref.random_sequences(rng, n_tips // 2, n_sites)
    seqs = [base[i // 2] for i in range(n_tips)]  # tips 2k,2k+1 identical
    part = create_partition(seqs, states=4, n_rate_cats=4, alpha=0.8,
                            dtype=jnp.float64)
    # adversarial start: every branch at the far end of the bracket
    tree.lengths[:] = 5.0
    t_prod = tree.copy()
    _, lnl_prod = optimize_branch_lengths(part, t_prod, max_sweeps=64,
                                          tolerance=1e-10, newton_tol=1e-8)

    # independent joint optimum via autodiff L-BFGS in log-space
    ops, root_info = tree.traversal_ops()
    from pllmod_tpu.ops import engine
    ri = tuple(int(x) for x in root_info)

    def neg(logb):
        return -engine.loglikelihood(part, jnp.asarray(ops),
                                     jnp.exp(logb), ri)

    vg = jax.jit(jax.value_and_grad(neg))
    _, f_opt, _ = minimize_lbfgsb(
        lambda z: tuple(map(np.asarray, vg(jnp.asarray(z)))),
        np.log(np.clip(tree.lengths, 1e-4, None)),
        np.full(len(tree.lengths), np.log(1e-4)),
        np.full(len(tree.lengths), np.log(100.0)), max_iters=500)
    assert lnl_prod >= -f_opt - 1e-3

    # plain Jacobi (colored=False) relies on the damped retry + best
    # iterate: must also recover, and never regress below the start
    t_jac = tree.copy()
    l0 = float(tree_loglikelihood(part, t_jac))
    _, lnl_jac = optimize_branch_lengths(part, t_jac, max_sweeps=64,
                                         tolerance=1e-10, colored=False)
    assert lnl_jac >= l0 - 1e-9
    assert lnl_jac >= -f_opt - 0.5   # damping keeps it near the optimum


# ---------------------------------------------------------------------------
# on-device fused driver (one-program BLO: lax.while_loop smoothing)
# ---------------------------------------------------------------------------
def test_blo_ondevice_driver_matches_host(rng):
    """The fused on-device driver (_blo_run: the whole smoothing loop —
    damping, best-iterate tracking, tolerance break, polish, final eval —
    in ONE device program) must reproduce the host driver exactly: both
    implement pll_optimize.c:1849-1919's smoothing semantics, and on the
    same arithmetic the branch decisions are identical, so the results
    are bit-equal."""
    tree = ref.random_binary_tree(rng, 12, 0.02, 0.6)
    seqs = ref.random_sequences(rng, 12, 180)
    part = create_partition(seqs, states=4, n_rate_cats=4, alpha=0.8,
                            subst_rates=rng.uniform(0.5, 3.0, 6),
                            freqs=rng.dirichlet([8, 8, 8, 8]),
                            dtype=jnp.float64)
    t1, t2 = tree.copy(), tree.copy()
    b1, l1 = optimize_branch_lengths(part, t1, on_device=False)
    b2, l2 = optimize_branch_lengths(part, t2, on_device=True)
    assert l1 == l2
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))

    # edge-subset (local/radius) mode through the fused driver
    t3, t4 = tree.copy(), tree.copy()
    _, l3 = optimize_branch_lengths(part, t3, around_edge=0, radius=2,
                                    on_device=False)
    _, l4 = optimize_branch_lengths(part, t4, around_edge=0, radius=2,
                                    on_device=True)
    assert l3 == l4
    np.testing.assert_array_equal(t3.lengths, t4.lengths)


def test_blo_ondevice_driver_treeinfo_scaled(rng):
    """Multi-partition SCALED-linkage fused driver == host driver."""
    from pllmod_tpu.tree.treeinfo import TreeInfo
    from pllmod_tpu.common import BRLEN_SCALED
    tree = ref.random_binary_tree(rng, 10, 0.02, 0.5)
    parts = [create_partition(ref.random_sequences(rng, 10, n), states=4,
                              n_rate_cats=4, alpha=a, dtype=jnp.float64)
             for n, a in ((150, 0.8), (90, 1.4))]
    ti1 = TreeInfo(tree.copy(), list(parts), brlen_linkage=BRLEN_SCALED)
    ti2 = TreeInfo(tree.copy(), list(parts), brlen_linkage=BRLEN_SCALED)
    ti1.brlen_scalers[:] = [1.0, 1.7]
    ti2.brlen_scalers[:] = [1.0, 1.7]
    from pllmod_tpu.optimize.blo import optimize_branch_lengths_treeinfo
    L1 = optimize_branch_lengths_treeinfo(ti1, on_device=False,
                                          max_sweeps=8)
    L2 = optimize_branch_lengths_treeinfo(ti2, on_device=True,
                                          max_sweeps=8)
    assert L1 == L2
    np.testing.assert_array_equal(ti1.tree.lengths, ti2.tree.lengths)


# ---------------------------------------------------------------------------
# generic masked parameter-vector optimization (pll_optimize.c:411-742)
# ---------------------------------------------------------------------------
def test_optimize_multidim_masked_params(rng):
    """optimize_multidim over rates+freqs+alpha+pinv+branches in ONE
    L-BFGS run: improves logL, returned logL matches a fresh engine
    evaluation, symmetry classes stay tied with the last class pinned."""
    from pllmod_tpu.optimize import optimize_multidim
    from pllmod_tpu.common import (PARAM_ALPHA, PARAM_PINV,
                                   PARAM_SUBST_RATES, PARAM_FREQUENCIES,
                                   PARAM_BRANCHES_ALL)
    tree, part = make_case(rng, n_tips=6, n_sites=100, pinv=0.1)
    l0 = float(tree_loglikelihood(part, tree))
    mask = (PARAM_SUBST_RATES | PARAM_FREQUENCIES | PARAM_ALPHA
            | PARAM_PINV | PARAM_BRANCHES_ALL)
    part2, lnl = optimize_multidim(part, tree, mask)
    assert lnl > l0
    assert abs(float(tree_loglikelihood(part2, tree)) - lnl) < 1e-6

    # HKY symmetry packing: tied classes equal, last rate pinned to 1
    sym = [0, 1, 0, 0, 1, 0]
    part3, _ = optimize_multidim(part, tree, PARAM_SUBST_RATES,
                                 symmetries=sym)
    r = np.asarray(part3.subst_rates[0])
    assert r[0] == r[2] == r[3] == r[5] == 1.0
    assert r[1] == r[4]


def test_optimize_multidim_matches_single_param_driver(rng):
    """Golden equivalence: alpha-only multidim == the treeinfo Brent
    driver's optimum (same objective, two optimizers)."""
    from pllmod_tpu.optimize import optimize_multidim
    from pllmod_tpu.algorithm.opt_model import opt_alpha
    from pllmod_tpu.tree import TreeInfo
    from pllmod_tpu.common import PARAM_ALPHA
    tree, part = make_case(rng, n_tips=6, n_sites=80)
    part2, lnl2 = optimize_multidim(part, tree, PARAM_ALPHA, tol=1e-6)
    ti = TreeInfo(tree.copy(), [part])
    lnl1 = opt_alpha(ti, tol=1e-7)
    assert abs(lnl1 - lnl2) < 1e-3
    assert abs(float(ti.partitions[0].alpha) - float(part2.alpha)) < 0.05


def test_optimize_onedim(rng):
    """Brent single-scalar path: ALPHA / PINV / BRANCHES_SINGLE improve
    monotonically; non-onedim masks raise OPT_ERROR_PARAMETER."""
    from pllmod_tpu.optimize import optimize_onedim
    from pllmod_tpu.common import (OptimizeError, PARAM_ALPHA, PARAM_PINV,
                                   PARAM_BRANCHES_SINGLE,
                                   PARAM_SUBST_RATES)
    tree, part = make_case(rng, n_tips=5, n_sites=80, pinv=0.15)
    l0 = float(tree_loglikelihood(part, tree))
    part, l1 = optimize_onedim(part, tree, PARAM_ALPHA)
    assert l1 >= l0 - 1e-9
    part, l2 = optimize_onedim(part, tree, PARAM_PINV)
    assert l2 >= l1 - 1e-9
    old = float(tree.lengths[1])
    part, l3 = optimize_onedim(part, tree, PARAM_BRANCHES_SINGLE, edge=1)
    assert l3 >= l2 - 1e-9 and float(tree.lengths[1]) != old
    assert abs(float(tree_loglikelihood(part, tree)) - l3) < 1e-6
    with pytest.raises(OptimizeError):
        optimize_onedim(part, tree, PARAM_SUBST_RATES)
    with pytest.raises(OptimizeError):
        optimize_onedim(part, tree, PARAM_BRANCHES_SINGLE)  # no edge


def test_newton_old_matches_newton_multi():
    """Legacy bisection-fallback Newton (opt_algorithms.c:281-384) finds
    the same optima as the production bracketed Newton on a batch of
    concave problems, and survives a locally-convex start (pure Newton
    would diverge there; the fallback bisects back into the basin)."""
    from pllmod_tpu.optimize.newton import (minimize_newton_multi,
                                            minimize_newton_old)
    m = jnp.array([0.3, 1.7, 5.0, 0.01])

    def deriv(x):
        # f(x) = -(x-m)^4: df = -4(x-m)^3, ddf = -12(x-m)^2
        return -4 * (x - m) ** 3, -12 * (x - m) ** 2

    x0 = jnp.full(4, 2.0)
    xa = minimize_newton_multi(deriv, x0, 1e-6, 10.0, tol=1e-8,
                               max_iters=100)
    xb = minimize_newton_old(deriv, x0, 1e-6, 10.0, tol=1e-8,
                             max_iters=200)
    np.testing.assert_allclose(np.asarray(xa), m, atol=1e-2)
    np.testing.assert_allclose(np.asarray(xb), m, atol=1e-2)

    def deriv2(x):
        # f(x) = cos(x) on [0.1, 6]: max at 2*pi-ish edge effects; the
        # convex half (df >= 0) triggers the bisection branch
        return -jnp.sin(x), -jnp.cos(x)

    x0 = jnp.array([3.0])   # convex region for maximizing cos
    xo = minimize_newton_old(deriv2, x0, 0.1, 6.2, tol=1e-10,
                             max_iters=200)
    # cos has interior max at 2pi ~ 6.28 (clipped to 6.2) or at left edge
    v = float(jnp.cos(xo[0]))
    assert v > float(jnp.cos(3.0))


def test_optimize_multidim_free_rates_weights(rng):
    """optimize_multidim over FREE_RATES + RATE_WEIGHTS (+ branches):
    the packed ratios decode to normalized weights (Σw=1), logL improves,
    and the returned value matches a fresh evaluation."""
    from pllmod_tpu.optimize import optimize_multidim
    from pllmod_tpu.common import (PARAM_FREE_RATES, PARAM_RATE_WEIGHTS,
                                   PARAM_BRANCHES_ALL)
    tree, part = make_case(rng, n_tips=6, n_sites=120)
    # heterogeneous start (all-equal rates are a symmetric saddle)
    part = part.replace(rate_cats=jnp.asarray([0.2, 0.6, 1.2, 2.0],
                                              part.dtype))
    l0 = float(tree_loglikelihood(part, tree))
    mask = PARAM_FREE_RATES | PARAM_RATE_WEIGHTS | PARAM_BRANCHES_ALL
    part2, lnl = optimize_multidim(part, tree, mask, tol=1e-5)
    assert lnl >= l0 - 1e-9
    assert abs(float(tree_loglikelihood(part2, tree)) - lnl) < 1e-6
    w = np.asarray(part2.rate_weights)
    assert w.sum() == pytest.approx(1.0, abs=1e-9)
    assert (w > 0).all()


def _safe_mode_case():
    """The pinned adversarial BLO case for per-edge SAFE mode: with one
    bracketed-Newton iteration and far-from-optimal start lengths, edge
    2's proposal (bisection toward the untouched bracket end) DEGRADES
    the tree logL while other edges' proposals improve — the situation
    the reference's per-edge eval-and-revert exists for
    (PLLMOD_OPT_BLO_NEWTON_SAFE, pll_optimize.c:1587-1632). Found by a
    deterministic scan (seed 28, 6 taxa, alpha 0.2, start = 3×U(.3,1),
    5th uniform batch)."""
    rng = np.random.default_rng(28)
    tree = ref.random_binary_tree(rng, 6, 0.01, 1.5)
    part = create_partition(ref.random_sequences(rng, 6, 120), states=4,
                            n_rate_cats=4, alpha=0.2, dtype=jnp.float64)
    trav = DirectedTraversal(tree)
    nlive = int(trav.edge_mask.sum())
    for _ in range(4):                      # scan drew 0.9/1.7/3.0 ×2
        rng.uniform(0.3, 1.0, nlive)
    start = np.clip(np.asarray(tree.lengths), 1e-6, 100.0)
    start[trav.edge_mask] = 3.0 * rng.uniform(0.3, 1.0, nlive)
    return tree, part, trav, start


def _lnl_with(part, tree, lengths):
    t = tree.copy()
    t.lengths = np.asarray(lengths, np.float64)
    return float(tree_loglikelihood(part, t))


def test_blo_safe_mode_per_edge_revert():
    """safe=True reverts exactly the edges whose single-edge update
    degrades the tree logL (independently verified with the engine
    oracle) and keeps the improving ones; the fast sweep demonstrably
    contains such a degrading edge alongside improving ones."""
    tree, part, trav, start = _safe_mode_case()
    levels, offsets, edge_ref, n_slots = trav.schedule()
    mask = jnp.asarray(trav.edge_mask)
    dt = jnp.float64
    args = (part, levels, offsets, edge_ref, mask, jnp.asarray(start, dt),
            jnp.asarray(1e-6, dt), jnp.asarray(100.0, dt),
            jnp.asarray(1e-8, dt), n_slots)
    new_fast = np.asarray(_blo_sweep(*args, max_newton_iters=1)[0])
    new_safe = np.asarray(_blo_sweep(*args, max_newton_iters=1,
                                     safe=True)[0])
    l_start = _lnl_with(part, tree, start)

    degrading, improving = [], []
    for e in np.nonzero(trav.edge_mask)[0]:
        if abs(new_fast[e] - start[e]) < 1e-12:
            continue
        trial = start.copy()
        trial[e] = new_fast[e]
        dl = _lnl_with(part, tree, trial) - l_start
        (degrading if dl < -1e-6 else improving).append((int(e), dl))
    # the construction: at least one degrading edge among improving ones
    assert degrading, "pinned case lost its degrading edge"
    assert improving, "pinned case lost its improving edges"
    for e, _ in degrading:      # reverted by safe, moved by fast
        assert new_safe[e] == start[e]
        assert new_fast[e] != start[e]
    for e, _ in improving:      # kept identical to the fast proposal
        assert new_safe[e] == new_fast[e]
    # per-edge monotonicity contract of the accepted safe proposals
    for e in np.nonzero(trav.edge_mask)[0]:
        if new_safe[e] == start[e]:
            continue
        trial = start.copy()
        trial[e] = new_safe[e]
        assert _lnl_with(part, tree, trial) >= l_start - 1e-6


def test_blo_safe_mode_noop_equivalence(rng):
    """On a benign case no revert fires: safe=True is bit-identical to
    the default through the public driver (host loop and the on-device
    program), so enabling SAFE never changes healthy trajectories."""
    import os
    tree, part = make_case(rng, n_tips=8, n_sites=200)
    for ondev in ("0", "1"):
        os.environ["PLLMOD_BLO_ONDEVICE"] = ondev
        try:
            t1, t2 = tree.copy(), tree.copy()
            b1, l1 = optimize_branch_lengths(part, t1, safe=False)
            b2, l2 = optimize_branch_lengths(part, t2, safe=True)
        finally:
            del os.environ["PLLMOD_BLO_ONDEVICE"]
        assert l1 == l2
        assert np.array_equal(np.asarray(b1), np.asarray(b2))
