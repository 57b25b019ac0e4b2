"""Mixture-model (per-category rate matrices, LG4M/LG4X machinery) and
branch-length linkage tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from pllmod_tpu import common
from pllmod_tpu.ops.partition import create_partition
from pllmod_tpu.ops.engine import tree_loglikelihood
from pllmod_tpu.tree.treeinfo import TreeInfo
from pllmod_tpu.optimize.blo import optimize_branch_lengths_treeinfo
from tests import reference_impl as ref


def test_per_category_matrices_mixture(rng):
    """A 4-matrix partition (param_indices = [0,1,2,3], the LG4M/LG4X
    shape) must equal the log of the weighted average of per-matrix
    single-category likelihoods."""
    n, sites = 6, 40
    tree = ref.random_binary_tree(rng, n)
    seqs = ref.random_sequences(rng, n, sites, gap_frac=0.0)
    rates4 = rng.uniform(0.5, 2.0, (4, 6))
    freqs4 = rng.dirichlet([5] * 4, size=4)
    cat_rates = np.array([0.2, 0.6, 1.2, 2.0])

    mix = create_partition(
        seqs, states=4, n_rate_cats=4, alpha=None,
        subst_rates=np.ones(6), freqs=np.full(4, 0.25),
        n_matrices=4, param_indices=np.arange(4, dtype=np.int32),
        compress=False, dtype=jnp.float64)
    mix = mix.replace(subst_rates=jnp.asarray(rates4),
                      freqs=jnp.asarray(freqs4),
                      rate_cats=jnp.asarray(cat_rates))
    l_mix, per_site = _persite(mix, tree)

    # manual mixture: per-matrix single-category likelihood
    site_l = np.zeros(mix.n_patterns_padded)
    for m in range(4):
        p1 = create_partition(
            seqs, states=4, n_rate_cats=1, alpha=None,
            subst_rates=rates4[m], freqs=freqs4[m],
            compress=False, dtype=jnp.float64)
        p1 = p1.replace(rate_cats=jnp.asarray([cat_rates[m]]))
        _, ps = _persite(p1, tree)
        site_l += 0.25 * np.exp(np.asarray(ps))
    expect = float(np.sum(np.log(site_l[:sites])))
    assert l_mix == pytest.approx(expect, abs=1e-8)


def test_per_matrix_pinv_freqs_mixture(rng):
    """Per-matrix pinv + freqs under a mixture (the LG4+I edge case):
    the likelihood must mix p-inv and frequencies PER CATEGORY through
    param_indices (reference indexes prop_invar/frequencies by
    params_indices[c], libpll core_likelihood), and the analytic edge
    derivatives must agree with autodiff through the same graph."""
    import jax
    from pllmod_tpu.ops import clv as clv_mod
    from pllmod_tpu.ops import derivatives as deriv_mod
    from pllmod_tpu.ops import engine
    from pllmod_tpu.ops.clv import get_node_clv

    n, sites = 5, 60
    tree = ref.random_binary_tree(rng, n)
    seqs = ref.random_sequences(rng, n, sites, gap_frac=0.1)
    rates2 = rng.uniform(0.5, 2.0, (2, 6))
    freqs2 = rng.dirichlet([5] * 4, size=2)
    pinv2 = np.array([0.15, 0.35])
    cat_rates = np.array([0.3, 0.8, 1.1, 1.8])
    pidx = np.array([0, 0, 1, 1], np.int32)

    mix = create_partition(
        seqs, states=4, n_rate_cats=4, alpha=None, n_matrices=2,
        param_indices=pidx, compress=False, dtype=jnp.float64)
    mix = mix.replace(subst_rates=jnp.asarray(rates2),
                      freqs=jnp.asarray(freqs2),
                      rate_cats=jnp.asarray(cat_rates),
                      prop_invar=jnp.asarray(pinv2))
    l_mix, _ = _persite(mix, tree)

    # manual mixture: L_site = sum_c w_c [(1-p_c) Lvar_c + p_c I_c], with
    # Lvar_c from a single-category partition at effective rate r_c/(1-p_c)
    site_l = np.zeros(mix.n_patterns_padded)
    inv_ind = np.asarray(mix.inv_indicator)
    for c in range(4):
        m = int(pidx[c])
        p1 = create_partition(
            seqs, states=4, n_rate_cats=1, alpha=None,
            subst_rates=rates2[m], freqs=freqs2[m],
            compress=False, dtype=jnp.float64)
        p1 = p1.replace(rate_cats=jnp.asarray([cat_rates[c] / (1 - pinv2[m])]))
        _, ps = _persite(p1, tree)
        I_c = inv_ind @ freqs2[m]
        site_l += 0.25 * ((1 - pinv2[m]) * np.exp(np.asarray(ps))
                          + pinv2[m] * I_c)
    w = np.asarray(mix.pattern_weights)
    expect = float(np.sum(np.log(site_l[:mix.n_patterns])
                          * w[:mix.n_patterns]))
    assert l_mix == pytest.approx(expect, abs=1e-8)

    # analytic derivatives vs autodiff on the root edge
    ops, root_info = tree.traversal_ops()
    ri = tuple(int(x) for x in root_info)
    brl = jnp.asarray(tree.lengths, jnp.float64)
    t0 = brl[ri[2]]

    def f(t):
        return engine.loglikelihood(mix, jnp.asarray(ops),
                                    brl.at[ri[2]].set(t), ri)

    g = float(jax.grad(f)(t0))
    h = float(jax.grad(jax.grad(f))(t0))

    P = mix.prob_matrices(brl)
    clvs, sc = clv_mod.update_partials(mix, P, jnp.asarray(ops))
    clv_u, s_u = get_node_clv(mix, clvs, sc, ri[0])
    clv_v, s_v = get_node_clv(mix, clvs, sc, ri[1])
    eigen = mix.eigen()
    st = deriv_mod.sumtable(mix, clv_u, clv_v, eigen)
    lnl, df, ddf = deriv_mod.edge_derivatives(mix, st, s_u + s_v, t0, eigen)
    assert float(lnl) == pytest.approx(l_mix, abs=1e-8)
    assert float(df) == pytest.approx(g, rel=1e-6, abs=1e-8)
    assert float(ddf) == pytest.approx(h, rel=1e-6, abs=1e-8)


def _persite(part, tree):
    from pllmod_tpu.ops import engine, clv as clv_mod
    from pllmod_tpu.ops import likelihood as lk_mod
    import jax
    ops, root_info = tree.traversal_ops()
    ri = tuple(int(x) for x in root_info)
    P = part.prob_matrices(jnp.asarray(tree.lengths, part.dtype))
    clvs, sc = clv_mod.update_partials(part, P, jnp.asarray(ops))
    total, persite = lk_mod.edge_loglikelihood(
        part, clvs, sc, ri[0], ri[1], P[ri[2]], persite=True)
    return float(total), persite


AA20 = "ARNDCQEGHILKMFPSTWYV"


def test_lg4x_set_protmix_golden(rng):
    """LG4X end-to-end (models_aa.c:57-75 + pllmod_util_model_set_protmix):
    a 4-matrix LG4X partition with the published free-rate defaults must
    equal the manually-mixed per-component likelihood Σ_c w_c L_c, where
    each L_c is a single-category partition on the LG4Xc table."""
    from pllmod_tpu.utils import models_aa
    from pllmod_tpu.utils.aa_data import (LG4X_RATES_DEFAULT,
                                          LG4X_WEIGHTS_DEFAULT)
    n, sites = 5, 30
    tree = ref.random_binary_tree(rng, n)
    seqs = ref.random_sequences(rng, n, sites, alphabet=AA20, gap_frac=0.0)

    part = create_partition(
        seqs, states=20, n_rate_cats=4, alpha=None,
        n_matrices=4, compress=False, dtype=jnp.float64)
    part = models_aa.set_protmix(part, "LG4X")
    part = part.replace(rate_cats=jnp.asarray(LG4X_RATES_DEFAULT),
                        rate_weights=jnp.asarray(LG4X_WEIGHTS_DEFAULT))
    l_mix, _ = _persite(part, tree)

    site_l = np.zeros(part.n_patterns_padded)
    for c in range(4):
        comp = models_aa.info(f"LG4X{c+1}")
        p1 = create_partition(
            seqs, states=20, n_rate_cats=1, alpha=None,
            subst_rates=comp.rates, freqs=comp.freqs,
            compress=False, dtype=jnp.float64)
        p1 = p1.replace(rate_cats=jnp.asarray([LG4X_RATES_DEFAULT[c]]))
        _, ps = _persite(p1, tree)
        site_l += LG4X_WEIGHTS_DEFAULT[c] * np.exp(np.asarray(ps))
    expect = float(np.sum(np.log(site_l[:sites])))
    assert l_mix == pytest.approx(expect, abs=1e-7)


def test_lg4x_rates_weights_optimization(rng):
    """Free-rate optimization round on an LG4X partition
    (pllmod_algo_opt_rates_weights_treeinfo on a protmix model): logL must
    not decrease and the Σ wᵢrᵢ = 1 normalization must hold."""
    from pllmod_tpu.utils import models_aa
    from pllmod_tpu.utils.aa_data import (LG4X_RATES_DEFAULT,
                                          LG4X_WEIGHTS_DEFAULT)
    from pllmod_tpu.algorithm.opt_model import opt_rates_weights
    n, sites = 5, 40
    tree = ref.random_binary_tree(rng, n)
    seqs = ref.random_sequences(rng, n, sites, alphabet=AA20, gap_frac=0.0)
    part = create_partition(
        seqs, states=20, n_rate_cats=4, alpha=None,
        n_matrices=4, compress=False, dtype=jnp.float64)
    part = models_aa.set_protmix(part, "LG4X")
    part = part.replace(rate_cats=jnp.asarray(LG4X_RATES_DEFAULT),
                        rate_weights=jnp.asarray(LG4X_WEIGHTS_DEFAULT))
    ti = TreeInfo(tree, [part],
                  params_to_optimize=(common.PARAM_FREE_RATES
                                      | common.PARAM_RATE_WEIGHTS))
    l0 = ti.compute_loglh()
    l1 = opt_rates_weights(ti, max_rounds=3)
    assert l1 >= l0 - 1e-6
    p = ti.partitions[0]
    wr = float(jnp.sum(p.rate_weights * p.rate_cats))
    assert wr == pytest.approx(1.0, abs=1e-6)
    assert ti.compute_loglh() == pytest.approx(l1, abs=1e-6)


def test_blo_unlinked_mode(rng):
    tree = ref.random_binary_tree(rng, 7)
    seqs1 = ref.random_sequences(rng, 7, 120)
    seqs2 = ref.random_sequences(rng, 7, 90)
    p1 = create_partition(seqs1, states=4, n_rate_cats=2, alpha=1.0,
                          dtype=jnp.float64)
    p2 = create_partition(seqs2, states=4, n_rate_cats=2, alpha=0.5,
                          dtype=jnp.float64)
    ti = TreeInfo(tree, [p1, p2], brlen_linkage=common.BRLEN_UNLINKED)
    l0 = ti.compute_loglh_unlinked() if hasattr(ti, "compute_loglh_unlinked") \
        else sum(float(tree_loglikelihood(p, tree, brlens=ti.partition_brlens(i)))
                 for i, p in enumerate([p1, p2]))
    lnl = optimize_branch_lengths_treeinfo(ti)
    assert lnl > l0
    # per-partition brlens diverged (different data)
    assert not np.allclose(ti.brlens[0], ti.brlens[1])


def test_blo_scaled_mode(rng):
    tree = ref.random_binary_tree(rng, 7)
    seqs = ref.random_sequences(rng, 7, 150)
    p1 = create_partition(seqs, states=4, n_rate_cats=2, alpha=1.0,
                          dtype=jnp.float64)
    p2 = create_partition(seqs, states=4, n_rate_cats=2, alpha=1.0,
                          dtype=jnp.float64)
    ti = TreeInfo(tree, [p1, p2], brlen_linkage=common.BRLEN_SCALED)
    ti.brlen_scalers[:] = [1.0, 2.0]
    l0 = ti.compute_loglh()
    lnl = optimize_branch_lengths_treeinfo(ti)
    assert lnl >= l0 - 1e-9
    # same data, scaler 2 partition contributes at double length
    np.testing.assert_allclose(ti.partition_brlens(1),
                               2.0 * np.asarray(tree.lengths))


def test_brlen_scaler_optimization(rng):
    """SCALED mode: opt_brlen_scalers should find a scaler ~2 when one
    partition evolved at double rate."""
    from pllmod_tpu.algorithm import opt_brlen_scalers
    from tests.test_algorithm import simulate
    tree = ref.random_binary_tree(rng, 7, 0.05, 0.2)
    rates = np.ones(6)
    freqs = np.full(4, 0.25)
    seqs1 = simulate(rng, tree, rates, freqs, 10.0, 800, cats=1)
    t2 = tree.copy()
    t2.lengths = tree.lengths * 2.0
    seqs2 = simulate(rng, t2, rates, freqs, 10.0, 800, cats=1)
    p1 = create_partition(seqs1, states=4, n_rate_cats=1, alpha=None,
                          dtype=jnp.float64)
    p2 = create_partition(seqs2, states=4, n_rate_cats=1, alpha=None,
                          dtype=jnp.float64)
    ti = TreeInfo(tree, [p1, p2], brlen_linkage=common.BRLEN_SCALED,
                  params_to_optimize=common.PARAM_BRANCH_LEN_SCALER)
    opt_brlen_scalers(ti)
    ratio = ti.brlen_scalers[1] / ti.brlen_scalers[0]
    assert ratio == pytest.approx(2.0, rel=0.35)
