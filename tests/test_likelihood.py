"""End-to-end likelihood vs the independent brute-force oracle.

These are the TPU analog of the reference's golden-output tests
(test/src/optimize/blopt-minimal.c style fixtures, SURVEY.md §4).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pllmod_tpu.ops import charmap
from pllmod_tpu.ops.partition import create_partition
from pllmod_tpu.ops.engine import tree_loglikelihood, loglikelihood
from pllmod_tpu.tree.topology import Tree, parse_newick
from tests import reference_impl as ref


def make_partition_and_masks(seqs, tree, **kw):
    part = create_partition(seqs, states=4, dtype=jnp.float64,
                            compress=False, **kw)
    cm = charmap.DNA
    masks = np.stack([cm.table[np.frombuffer(s.encode(), np.uint8)]
                      for s in seqs])
    return part, masks


NEWICK5 = "((t0:0.1,t1:0.2):0.15,(t2:0.3,t3:0.05):0.4,t4:0.25);"
SEQS5 = ["ACGTACGTAC", "ACGTACGTCC", "AAGTACGTAT", "ACGAACGTAC", "ACGT-CGTNC"]


def test_parse_newick_roundtrip():
    t = parse_newick(NEWICK5)
    assert t.n_tips == 5
    assert t.n_edges == 2 * 5 - 3
    t.check_integrity()
    t2 = parse_newick(t.to_newick())
    assert t2.n_tips == 5
    assert sorted(t2.labels) == sorted(t.labels)


def test_jc_gamma1_vs_bruteforce():
    tree = parse_newick(NEWICK5)
    part, masks = make_partition_and_masks(SEQS5, tree, n_rate_cats=1,
                                           alpha=None)
    got = float(tree_loglikelihood(part, tree))
    want, _ = ref.brute_force_loglh(
        tree, masks, np.ones(6), np.full(4, 0.25), np.ones(1), np.ones(1))
    np.testing.assert_allclose(got, want, atol=1e-8)


@pytest.mark.parametrize("pinv", [0.0, 0.3])
def test_gtr_gamma4_vs_bruteforce(rng, pinv):
    tree = ref.random_binary_tree(rng, 8)
    seqs = ref.random_sequences(rng, 8, 64)
    rates = rng.uniform(0.2, 4.0, size=6)
    freqs = rng.dirichlet([6, 6, 6, 6])
    alpha = 0.8
    part = create_partition(seqs, states=4, n_rate_cats=4, alpha=alpha,
                            subst_rates=rates, freqs=freqs, prop_invar=pinv,
                            dtype=jnp.float64, compress=False)
    got = float(tree_loglikelihood(part, tree))

    cm = charmap.DNA
    masks = np.stack([cm.table[np.frombuffer(s.encode(), np.uint8)]
                      for s in seqs])
    cats = ref.gamma_cats_mean(alpha, 4)
    want, _ = ref.brute_force_loglh(tree, masks, rates, freqs, cats,
                                    np.full(4, 0.25), prop_invar=pinv)
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_pattern_compression_invariance(rng):
    tree = ref.random_binary_tree(rng, 6)
    seqs = ref.random_sequences(rng, 6, 200)
    kw = dict(states=4, n_rate_cats=4, alpha=0.5,
              subst_rates=rng.uniform(0.5, 2.0, 6),
              freqs=rng.dirichlet([5] * 4), dtype=jnp.float64)
    p1 = create_partition(seqs, compress=False, **kw)
    p2 = create_partition(seqs, compress=True, **kw)
    assert p2.n_patterns < p1.n_patterns
    l1 = float(tree_loglikelihood(p1, tree))
    l2 = float(tree_loglikelihood(p2, tree))
    np.testing.assert_allclose(l1, l2, atol=1e-8)


def test_pulley_principle(rng):
    """logL must be identical for every virtual-root placement."""
    tree = ref.random_binary_tree(rng, 7)
    seqs = ref.random_sequences(rng, 7, 40)
    part = create_partition(seqs, states=4, n_rate_cats=4, alpha=1.2,
                            subst_rates=rng.uniform(0.3, 3.0, 6),
                            freqs=rng.dirichlet([5] * 4), prop_invar=0.2,
                            dtype=jnp.float64)
    vals = [float(tree_loglikelihood(part, tree, root_edge=e))
            for e in range(tree.n_edges)]
    np.testing.assert_allclose(vals, vals[0], atol=1e-9)


def test_scaling_deep_tree(rng):
    """A long caterpillar tree underflows without rescaling; the exact
    power-of-two scalers must keep logL finite and correct."""
    n = 40
    tree = ref.random_binary_tree(rng, n, min_len=0.8, max_len=1.0)
    seqs = ref.random_sequences(rng, n, 16, gap_frac=0.0)
    part = create_partition(seqs, states=4, n_rate_cats=2, alpha=1.0,
                            dtype=jnp.float64, compress=False)
    got = float(tree_loglikelihood(part, tree))
    assert np.isfinite(got)
    cm = charmap.DNA
    masks = np.stack([cm.table[np.frombuffer(s.encode(), np.uint8)]
                      for s in seqs])
    cats = ref.gamma_cats_mean(1.0, 2)
    want, _ = ref.brute_force_loglh(tree, masks, np.ones(6), np.full(4, .25),
                                    cats, np.full(2, 0.5))
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_f32_close_to_f64(rng):
    tree = ref.random_binary_tree(rng, 8)
    seqs = ref.random_sequences(rng, 8, 100)
    kw = dict(states=4, n_rate_cats=4, alpha=0.9,
              subst_rates=rng.uniform(0.5, 2.0, 6), freqs=rng.dirichlet([5] * 4))
    p64 = create_partition(seqs, dtype=jnp.float64, **kw)
    p32 = create_partition(seqs, dtype=jnp.float32, **kw)
    l64 = float(tree_loglikelihood(p64, tree))
    l32 = float(tree_loglikelihood(p32, tree))
    np.testing.assert_allclose(l32, l64, rtol=2e-5)


def test_protein_likelihood(rng):
    """20-state path (random reversible matrix) vs brute force."""
    tree = ref.random_binary_tree(rng, 5)
    seqs = ref.random_sequences(rng, 5, 30, alphabet=charmap.AA_ORDER)
    nr = 190
    rates = rng.uniform(0.05, 3.0, size=nr)
    freqs = rng.dirichlet(np.full(20, 4.0))
    part = create_partition(seqs, states=20, n_rate_cats=4, alpha=0.6,
                            subst_rates=rates, freqs=freqs,
                            dtype=jnp.float64, compress=False)
    got = float(tree_loglikelihood(part, tree))
    cm = charmap.AA
    masks = np.stack([cm.table[np.frombuffer(s.encode(), np.uint8)]
                      for s in seqs])
    cats = ref.gamma_cats_mean(0.6, 4)
    want, _ = ref.brute_force_loglh(tree, masks, rates, freqs, cats,
                                    np.full(4, .25))
    np.testing.assert_allclose(got, want, atol=1e-7)
