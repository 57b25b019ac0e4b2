"""Grouped megakernel (consumer-targeted writes, pallas_grouped):
golden equivalence vs the XLA engines in interpret mode.

Reference framing: still `pll_update_partials` + edge logL
(pll.c partials/likelihood kernels; SURVEY §3.1) — same quantities, new
tiling. The kernel must be BIT-identical to the fused/scan paths (same
rescale semantics)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pllmod_tpu.ops.partition import create_partition
from pllmod_tpu.ops.engine import tree_loglikelihood
from pllmod_tpu.ops.pallas_grouped import (
    GroupedSchedule, loglikelihood_grouped, _pick_group,
)
from tests import reference_impl as ref


def _case(rng, n, sites, states=4, cats=4):
    tree = ref.random_binary_tree(rng, n)
    seqs = ref.random_sequences(rng, n, sites)
    part = create_partition(
        seqs, states=states, n_rate_cats=cats, alpha=0.7,
        subst_rates=rng.uniform(0.5, 2.0, states * (states - 1) // 2),
        freqs=rng.dirichlet([8] * states), dtype=jnp.float32)
    return part.cache_eigen(), tree


@pytest.mark.parametrize("n,sites", [(8, 96), (24, 200), (47, 384)])
def test_grouped_matches_engine(rng, n, sites):
    part, tree = _case(rng, n, sites)
    sched = GroupedSchedule(part, tree)
    lnl_g = float(loglikelihood_grouped(part, jnp.asarray(
        tree.lengths, jnp.float32), sched, True))
    lnl_ref = float(tree_loglikelihood(part, tree))
    assert lnl_g == pytest.approx(lnl_ref, abs=2e-2)


def test_grouped_all_fence_small_patterns(rng):
    """Ppad < 3 tiles exercises the all-fence mode."""
    part, tree = _case(rng, 12, 64)
    assert part.n_patterns_padded == 128
    sched = GroupedSchedule(part, tree)
    lnl_g = float(loglikelihood_grouped(part, jnp.asarray(
        tree.lengths, jnp.float32), sched, True))
    lnl_ref = float(tree_loglikelihood(part, tree))
    assert lnl_g == pytest.approx(lnl_ref, abs=2e-2)


def test_grouped_rooted_at_tip_edge(rng):
    """Root edge with a TIP endpoint: the landing buffer holds one CLV,
    the other ref resolves through the tip path."""
    part, tree = _case(rng, 10, 96)
    tip_edges = [e for e, (u, v) in enumerate(tree.edge_nodes)
                 if int(u) >= 0 and (tree.is_tip(int(u))
                                     or tree.is_tip(int(v)))]
    e = tip_edges[0]
    sched = GroupedSchedule(part, tree, root_edge=e)
    lnl_g = float(loglikelihood_grouped(part, jnp.asarray(
        tree.lengths, jnp.float32), sched, True))
    lnl_ref = float(tree_loglikelihood(part, tree, root_edge=e))
    assert lnl_g == pytest.approx(lnl_ref, abs=2e-2)


def test_grouped_no_gamma_g16(rng):
    """C=1, S=4 -> CS=4, G=16: the widest packing (64 children/step)."""
    assert _pick_group(4) == 16
    tree = ref.random_binary_tree(rng, 40)
    seqs = ref.random_sequences(rng, 40, 256)
    part = create_partition(seqs, states=4, n_rate_cats=1,
                            dtype=jnp.float32).cache_eigen()
    sched = GroupedSchedule(part, tree)
    assert sched.G == 16
    lnl_g = float(loglikelihood_grouped(part, jnp.asarray(
        tree.lengths, jnp.float32), sched, True))
    lnl_ref = float(tree_loglikelihood(part, tree))
    assert lnl_g == pytest.approx(lnl_ref, abs=2e-2)


def test_grouped_no_eigen_cache_path(rng):
    """Without a cached eigendecomposition the PQ pack runs off
    prob_matrices (the generic/non-reversible path)."""
    tree = ref.random_binary_tree(rng, 14)
    seqs = ref.random_sequences(rng, 14, 96)
    part_nc = create_partition(
        seqs, states=4, n_rate_cats=4, alpha=0.7,
        subst_rates=rng.uniform(0.5, 2.0, 6),
        freqs=rng.dirichlet([8] * 4), dtype=jnp.float32)
    assert part_nc.eigen_lam is None
    sched = GroupedSchedule(part_nc, tree)
    lnl_g = float(loglikelihood_grouped(part_nc, jnp.asarray(
        tree.lengths, jnp.float32), sched, True))
    lnl_ref = float(tree_loglikelihood(part_nc, tree))
    assert lnl_g == pytest.approx(lnl_ref, abs=2e-2)


def test_grouped_single_consumer_guard(rng):
    """Multi-consumer op tables must be rejected (directed-CLV tables
    keep the fused kernel)."""
    part, tree = _case(rng, 8, 64)
    ops, root_info = tree.traversal_ops()
    ops = np.asarray(ops)
    live = ops[ops[:, 0] >= 0].copy()
    # make one inner slot consumed twice
    inner_refs = np.nonzero(live[:, 1] >= part.n_tips)[0]
    donor = live[inner_refs[0], 1]
    live[-1, 3] = donor

    class FakeTree:
        def traversal_ops(self, root_edge=None):
            return live, root_info

    with pytest.raises(ValueError, match="single-consumer"):
        GroupedSchedule(part, FakeTree())
