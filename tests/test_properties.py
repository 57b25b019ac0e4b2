"""Mathematical property tests (the invariants libpll's golden files
check implicitly).

- pulley principle: logL identical for every virtual root placement
- P(t) rows sum to 1; P(0) = I; Chapman-Kolmogorov P(a)P(b) = P(a+b)
- detailed balance for reversible models: π_i P_ij(t) = π_j P_ji(t)
- rescaling invariance: logL identical with scaling disabled (short trees)
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pllmod_tpu.ops.partition import create_partition
from pllmod_tpu.ops.engine import tree_loglikelihood
from pllmod_tpu.ops import eigen as eigen_mod
from tests import reference_impl as ref


@pytest.fixture
def gtr(rng):
    rates = jnp.asarray(rng.uniform(0.5, 3.0, 6))
    freqs = jnp.asarray(rng.dirichlet([6] * 4))
    return rates, freqs


def test_virtual_root_invariance(rng):
    tree = ref.random_binary_tree(rng, 9)
    seqs = ref.random_sequences(rng, 9, 70)
    part = create_partition(seqs, states=4, n_rate_cats=4, alpha=0.7,
                            prop_invar=0.1, dtype=jnp.float64)
    vals = [float(tree_loglikelihood(part, tree, root_edge=e))
            for e in range(tree.n_edges)]
    np.testing.assert_allclose(vals, vals[0], atol=1e-9)


def test_pmatrix_stochastic(gtr):
    rates, freqs = gtr
    lam, V, Vinv = eigen_mod.eigen_reversible(rates, freqs)
    cats = jnp.array([0.5, 1.0, 2.0])
    P = eigen_mod.prob_matrices(lam, V, Vinv, jnp.array([0.0, 0.1, 1.0, 10.0]),
                                cats)
    P = np.asarray(P)
    np.testing.assert_allclose(P.sum(-1), 1.0, atol=1e-10)
    assert np.all(P > -1e-12)
    # P(0) = I
    np.testing.assert_allclose(P[0, 0], np.eye(4), atol=1e-10)


def test_chapman_kolmogorov(gtr):
    rates, freqs = gtr
    lam, V, Vinv = eigen_mod.eigen_reversible(rates, freqs)
    one = jnp.ones(1)
    Pa = np.asarray(eigen_mod.prob_matrices(lam, V, Vinv,
                                            jnp.array([0.3]), one))[0, 0]
    Pb = np.asarray(eigen_mod.prob_matrices(lam, V, Vinv,
                                            jnp.array([0.5]), one))[0, 0]
    Pab = np.asarray(eigen_mod.prob_matrices(lam, V, Vinv,
                                             jnp.array([0.8]), one))[0, 0]
    np.testing.assert_allclose(Pa @ Pb, Pab, atol=1e-10)


def test_detailed_balance(gtr):
    rates, freqs = gtr
    lam, V, Vinv = eigen_mod.eigen_reversible(rates, freqs)
    P = np.asarray(eigen_mod.prob_matrices(lam, V, Vinv, jnp.array([0.4]),
                                           jnp.ones(1)))[0, 0]
    pi = np.asarray(freqs)
    np.testing.assert_allclose(pi[:, None] * P, (pi[:, None] * P).T,
                               atol=1e-10)


def test_expm_agrees_with_eigen(gtr):
    rates, freqs = gtr
    lam, V, Vinv = eigen_mod.eigen_reversible(rates, freqs)
    P_eig = np.asarray(eigen_mod.prob_matrices(
        lam, V, Vinv, jnp.array([0.7]), jnp.ones(1)))[0, 0]
    P_expm = np.asarray(eigen_mod.prob_matrices_expm(
        rates, freqs, jnp.array([0.7]), jnp.ones(1)))[0, 0]
    np.testing.assert_allclose(P_eig, P_expm, atol=1e-9)


def test_gamma_cats_mean_one(rng):
    from pllmod_tpu.ops.gamma import compute_gamma_cats
    from pllmod_tpu.common import GAMMA_RATES_MEAN, GAMMA_RATES_MEDIAN
    for alpha in [0.05, 0.3, 1.0, 5.0, 50.0]:
        for mode in (GAMMA_RATES_MEAN, GAMMA_RATES_MEDIAN):
            cats = np.asarray(compute_gamma_cats(jnp.asarray(alpha, jnp.float64),
                                                 4, mode))
            np.testing.assert_allclose(cats.mean(), 1.0, atol=1e-8)
            assert np.all(np.diff(cats) > 0)  # increasing


def test_duplicate_sites_equal_weighted_patterns(rng):
    """Compression invariance: logL of raw alignment == logL of the
    compressed pattern set (libpll pattern-weight semantics)."""
    tree = ref.random_binary_tree(rng, 7)
    base = ref.random_sequences(rng, 7, 30)
    doubled = [s + s for s in base]  # every column twice
    p1 = create_partition(doubled, states=4, n_rate_cats=2, alpha=1.0,
                          compress=False, dtype=jnp.float64)
    p2 = create_partition(doubled, states=4, n_rate_cats=2, alpha=1.0,
                          compress=True, dtype=jnp.float64)
    assert p2.n_patterns <= 30
    l1 = float(tree_loglikelihood(p1, tree))
    l2 = float(tree_loglikelihood(p2, tree))
    assert l2 == pytest.approx(l1, abs=1e-8)


def test_nonreversible_partition_matches_reversible_for_gtr(rng):
    """For a reversible GTR, the expm path must agree with the eigen path
    (non-reversible wiring sanity)."""
    from pllmod_tpu.common import PllModError
    tree = ref.random_binary_tree(rng, 6)
    seqs = ref.random_sequences(rng, 6, 50)
    kw = dict(states=4, n_rate_cats=3, alpha=0.9,
              subst_rates=rng.uniform(0.5, 2, 6),
              freqs=rng.dirichlet([5] * 4), dtype=jnp.float64)
    p_rev = create_partition(seqs, **kw)
    p_gen = create_partition(seqs, reversible=False, **kw)
    l_rev = float(tree_loglikelihood(p_rev, tree))
    l_gen = float(tree_loglikelihood(p_gen, tree))
    assert l_gen == pytest.approx(l_rev, abs=1e-8)
    with pytest.raises(PllModError):
        p_gen.eigen()


def test_fused_kernel_property_sweep(rng):
    """Fuzz: the fused megakernel (interpret) must track the serial scan
    across random topologies, category counts, p-inv, gaps and ambiguity
    codes."""
    from pllmod_tpu.ops import pallas_clv
    import jax.numpy as jnp

    for trial in range(6):
        n = int(rng.integers(4, 26))
        sites = int(rng.integers(40, 400))
        cats = int(rng.choice([1, 2, 4]))
        pinv = float(rng.choice([0.0, 0.15]))
        tree = ref.random_binary_tree(rng, n)
        seqs = ref.random_sequences(rng, n, sites,
                                    alphabet="ACGTRYN"[:int(
                                        rng.integers(4, 8))],
                                    gap_frac=0.1)
        part = create_partition(
            seqs, states=4, n_rate_cats=cats,
            alpha=float(rng.uniform(0.3, 2.0)), prop_invar=pinv,
            subst_rates=rng.uniform(0.3, 3.0, 6),
            freqs=rng.dirichlet([5] * 4), dtype=jnp.float32)
        l_scan = float(tree_loglikelihood(part, tree, schedule="scan"))
        idx8, e1, e2, ri, ns = pallas_clv.compile_fused(part, tree)
        l_f = float(pallas_clv.loglikelihood_fused(
            part, idx8, jnp.asarray(tree.lengths, jnp.float32),
            e1, e2, ri, ns, True))
        assert l_f == pytest.approx(l_scan, abs=2e-3), (
            trial, n, sites, cats, pinv)
