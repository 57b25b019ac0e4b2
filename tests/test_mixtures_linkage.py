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
