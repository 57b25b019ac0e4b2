"""Ascertainment-bias correction tests (libpll PLL_ATTRIB_AB_FLAG,
Lewis 2001): lnL_asc = Σ w ln L_p − W·ln(1 − Σ_j L_const_j)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pllmod_tpu.ops.partition import create_partition, make_asc_partition
from pllmod_tpu.ops import engine
from pllmod_tpu.ops import charmap as cm
from tests import reference_impl as ref


def test_asc_matches_manual(rng):
    n, sites = 6, 80
    tree = ref.random_binary_tree(rng, n)
    # variable-only alignment (ASC assumes no constant columns observed)
    seqs = ref.random_sequences(rng, n, sites, gap_frac=0.0)
    part = create_partition(seqs, states=4, n_rate_cats=4, alpha=0.9,
                            compress=False, dtype=jnp.float64)
    ops, root_info = tree.traversal_ops()
    ri = tuple(int(x) for x in root_info)
    ops_j = jnp.asarray(ops)
    brl = jnp.asarray(tree.lengths)

    plain = float(engine.loglikelihood(part, ops_j, brl, ri))
    asc_part = make_asc_partition(part)
    corrected = float(engine.loglikelihood_asc(part, asc_part, ops_j, brl,
                                               ri))
    # manual: evaluate the 4 constant-site probabilities by brute force
    masks_const = np.zeros((n, 4), np.uint64)
    for j in range(4):
        masks_const[:, j] = np.uint64(1) << np.uint64(j)
    _, lnl_const = ref.brute_force_loglh(
        tree, masks_const, np.ones(6), np.full(4, 0.25),
        np.asarray(part.rate_cats), np.asarray(part.rate_weights))
    p_const = np.exp(lnl_const).sum()
    expect = plain - sites * np.log1p(-p_const)
    assert corrected == pytest.approx(expect, abs=1e-6)
    # correction always increases lnL (1 - p < 1)
    assert corrected > plain


def test_asc_gradient_flows(rng):
    import jax
    n = 5
    tree = ref.random_binary_tree(rng, n)
    seqs = ref.random_sequences(rng, n, 40, gap_frac=0.0)
    part = create_partition(seqs, states=4, n_rate_cats=2, alpha=1.0,
                            compress=False, dtype=jnp.float64)
    asc_part = make_asc_partition(part)
    ops, root_info = tree.traversal_ops()
    ri = tuple(int(x) for x in root_info)
    ops_j = jnp.asarray(ops)

    g = jax.grad(lambda b: engine.loglikelihood_asc(
        part, asc_part, ops_j, b, ri))(jnp.asarray(tree.lengths))
    assert np.all(np.isfinite(np.asarray(g)))
