"""Incremental (partial-traversal) likelihood in TreeInfo — the
reference's CLV-validity protocol (treeinfo.c:38-61, 872-944; VERDICT
round-1 item 6): brlen-only updates recompute only the path to the root,
asserted through profile.Counters."""

import numpy as np
import jax.numpy as jnp
import pytest

from pllmod_tpu.ops.partition import create_partition
from pllmod_tpu.tree.treeinfo import TreeInfo
from tests import reference_impl as ref


def _setup(rng, n=12, sites=100):
    tree = ref.random_binary_tree(rng, n)
    seqs = ref.random_sequences(rng, n, sites)
    part = create_partition(seqs, states=4, n_rate_cats=4, alpha=0.9,
                            dtype=jnp.float64)
    return part, tree


def test_incremental_matches_full(rng):
    part, tree = _setup(rng)
    ti = TreeInfo(tree, [part])
    l_full0 = ti.compute_loglh()
    l_inc0 = ti.compute_loglh(incremental=True)       # seeds the cache
    assert l_inc0 == pytest.approx(l_full0, abs=1e-9 * abs(l_full0))

    # change ONE branch length: incremental == full, fewer CLV ops
    edge = int(np.nonzero(tree.edge_nodes[:, 0] >= 0)[0][3])
    ti.set_branch_length(edge, float(tree.lengths[edge]) * 1.7)
    before = ti.counters.clv_updates
    l_inc = ti.compute_loglh(incremental=True)
    inc_ops = (ti.counters.clv_updates - before) // part.n_patterns_padded
    before = ti.counters.clv_updates
    l_full = ti.compute_loglh()
    full_ops = (ti.counters.clv_updates - before) // part.n_patterns_padded
    assert l_inc == pytest.approx(l_full, abs=1e-9 * abs(l_full))
    assert inc_ops < full_ops, (inc_ops, full_ops)


def test_incremental_no_change_is_free(rng):
    part, tree = _setup(rng)
    ti = TreeInfo(tree, [part])
    l0 = ti.compute_loglh(incremental=True)
    before = ti.counters.clv_updates
    l1 = ti.compute_loglh(incremental=True)
    assert ti.counters.clv_updates == before          # zero CLV ops
    assert l1 == pytest.approx(l0)


def test_incremental_invalidates_on_model_change(rng):
    part, tree = _setup(rng)
    ti = TreeInfo(tree, [part])
    ti.compute_loglh(incremental=True)
    # swap model params -> cache must fall back to a full traversal
    new = part.with_alpha(1.5)
    ti.set_partition(0, new)
    l_inc = ti.compute_loglh(incremental=True)
    l_full = ti.compute_loglh()
    assert l_inc == pytest.approx(l_full, abs=1e-9 * abs(l_full))


def test_incremental_invalidates_on_topology_change(rng):
    from pllmod_tpu.tree import moves
    part, tree = _setup(rng)
    ti = TreeInfo(tree, [part])
    ti.compute_loglh(incremental=True)
    # apply an NNI and verify the incremental path follows
    for e in np.nonzero(tree.edge_nodes[:, 0] >= 0)[0]:
        u, v = (int(x) for x in tree.edge_nodes[e])
        if not tree.is_tip(u) and not tree.is_tip(v):
            moves.nni(tree, int(e), moves.NNI_LEFT)
            break
    l_inc = ti.compute_loglh(incremental=True)
    l_full = ti.compute_loglh()
    assert l_inc == pytest.approx(l_full, abs=1e-9 * abs(l_full))


def test_incremental_multiple_sequential_updates(rng):
    """A Brent-style loop touching one edge repeatedly: every incremental
    result must track the full recompute."""
    part, tree = _setup(rng, n=9, sites=80)
    ti = TreeInfo(tree, [part])
    ti.compute_loglh(incremental=True)
    edges = np.nonzero(tree.edge_nodes[:, 0] >= 0)[0][:4]
    for k, e in enumerate(edges):
        ti.set_branch_length(int(e), 0.05 + 0.03 * k)
        l_inc = ti.compute_loglh(incremental=True)
        l_full = ti.compute_loglh()
        assert l_inc == pytest.approx(l_full, abs=1e-9 * abs(l_full)), k


def test_incremental_after_plain_eval_at_other_brlens(rng):
    """Regression: a plain (non-incremental) evaluation at different
    branch lengths between two incremental calls must not leak its logL
    into the incremental result when the brlens revert (rollback)."""
    part, tree = _setup(rng, n=9, sites=80)
    ti = TreeInfo(tree, [part])
    l0 = ti.compute_loglh(incremental=True)
    old = float(tree.lengths[1])
    ti.set_branch_length(1, old * 3.0)
    ti.compute_loglh()                       # plain eval at B1
    ti.set_branch_length(1, old)             # rollback to B0
    l_inc = ti.compute_loglh(incremental=True)
    assert l_inc == pytest.approx(l0, abs=1e-9 * abs(l0))


def test_incremental_fast_kernel_path(rng):
    """Incremental evaluation on the FUSED megakernel (VERDICT r3 item
    6): with the fast kernels forced (interpret mode), a brlen-only
    update runs ONLY the dirty rows through the kernel — prior buffers
    alias into the outputs — and matches the full fused evaluation."""
    from pllmod_tpu.ops import engine as engine_mod
    part, tree = _setup(rng, n=14, sites=600)
    part = part.replace(
        tip_states=part.tip_states,
    )
    # f32 partition for the kernel path
    import jax.numpy as jnp
    from pllmod_tpu.ops.partition import create_partition as _cp
    seqs = ref.random_sequences(rng, 14, 600)
    part = _cp(seqs, states=4, n_rate_cats=4, alpha=0.9,
               dtype=jnp.float32, pattern_pad=128)
    tree = ref.random_binary_tree(rng, 14)
    engine_mod.FORCE_FAST_KERNEL = True
    try:
        ti = TreeInfo(tree, [part])
        l_full0 = ti.compute_loglh()
        l_inc0 = ti.compute_loglh(incremental=True)   # seeds fast cache
        assert l_inc0 == pytest.approx(l_full0, rel=2e-6)

        edge = int(np.nonzero(tree.edge_nodes[:, 0] >= 0)[0][3])
        ti.set_branch_length(edge, float(tree.lengths[edge]) * 1.7)
        before = ti.counters.clv_updates
        l_inc = ti.compute_loglh(incremental=True)
        inc_ops = (ti.counters.clv_updates - before) \
            // part.n_patterns_padded
        l_full = ti.compute_loglh()
        assert l_inc == pytest.approx(l_full, rel=2e-6)
        n_inner = tree.n_tips - 2
        assert 0 < inc_ops < n_inner, (inc_ops, n_inner)

        # no-change call is free on the fast path too
        before = ti.counters.clv_updates
        l_again = ti.compute_loglh(incremental=True)
        assert ti.counters.clv_updates == before
        assert l_again == pytest.approx(l_inc, rel=1e-7)
    finally:
        engine_mod.FORCE_FAST_KERNEL = None
