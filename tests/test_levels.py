"""Kernel-equivalence: level-batched schedule vs serial scan schedule.

The direct analog of the reference's scalar-vs-SIMD golden equivalence
(SURVEY §4): both schedules must produce identical logL."""

import numpy as np
import jax.numpy as jnp
import pytest

from pllmod_tpu.ops.partition import create_partition
from pllmod_tpu.ops.engine import tree_loglikelihood
from pllmod_tpu.ops import clv as clv_mod
from tests import reference_impl as ref


@pytest.mark.parametrize("n_tips", [4, 8, 23, 50])
def test_levels_match_scan(rng, n_tips):
    tree = ref.random_binary_tree(rng, n_tips)
    seqs = ref.random_sequences(rng, n_tips, 90)
    part = create_partition(seqs, states=4, n_rate_cats=4, alpha=0.8,
                            prop_invar=0.1,
                            subst_rates=rng.uniform(0.5, 2, 6),
                            freqs=rng.dirichlet([5] * 4),
                            dtype=jnp.float64)
    l_scan = float(tree_loglikelihood(part, tree, schedule="scan"))
    l_lvl = float(tree_loglikelihood(part, tree, schedule="levels"))
    assert l_lvl == pytest.approx(l_scan, abs=1e-9)


def test_levels_match_brute_force(rng):
    tree = ref.random_binary_tree(rng, 9)
    seqs = ref.random_sequences(rng, 9, 60)
    part = create_partition(seqs, states=4, n_rate_cats=2, alpha=1.2,
                            compress=False, dtype=jnp.float64)
    from pllmod_tpu.ops import charmap as cm
    masks = cm.DNA.table[np.frombuffer(
        "".join(seqs).encode(), np.uint8)].reshape(9, -1)
    l_bf, _ = ref.brute_force_loglh(
        tree, masks, np.ones(6), np.full(4, 0.25),
        np.asarray(part.rate_cats), np.asarray(part.rate_weights))
    l_lvl = float(tree_loglikelihood(part, tree, schedule="levels"))
    assert l_lvl == pytest.approx(l_bf, abs=1e-6)


def test_compile_levels_structure(rng):
    tree = ref.random_binary_tree(rng, 16)
    ops, _ = tree.traversal_ops()
    lv = clv_mod.compile_levels(ops, 16)
    # every live op appears exactly once
    live = lv[lv[:, :, 0] >= 0]
    assert len(live) == (ops[:, 0] >= 0).sum()
    # each op's inner children live in strictly earlier levels
    slot_level = {}
    for L in range(lv.shape[0]):
        for row in lv[L]:
            if row[0] >= 0:
                slot_level[int(row[0])] = L
    for L in range(lv.shape[0]):
        for row in lv[L]:
            if row[0] < 0:
                continue
            for child in (int(row[1]), int(row[3])):
                if child >= 16:
                    assert slot_level[child - 16] < L
