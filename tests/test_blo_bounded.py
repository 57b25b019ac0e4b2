"""O(n log n) memory-bounded whole-tree BLO (round-5 item 1: the
reference's recomp_iterative O(n)-per-sweep regime,
pll_optimize.c:778-926, rebuilt as the heavy-path Euler-walk segmented
sweep on the fused megakernel)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pllmod_tpu.ops import engine as engine_mod
from pllmod_tpu.ops.partition import create_partition
from pllmod_tpu.optimize.blo_bounded import (BoundedSweepSchedule,
                                             validate_schedule,
                                             optimize_branch_lengths_bounded)
from tests import reference_impl as ref


def _parts(rng, n, sites, **kw):
    """Tree-signal data (sequences simulated ON the tree): random
    sequences have a degenerate likelihood surface whose saturated
    optima different correct ascent schemes resolve differently — see
    reference_impl.simulated_sequences."""
    tree = ref.random_binary_tree(rng, n, min_len=0.02, max_len=0.4)
    seqs = ref.simulated_sequences(rng, tree, sites, alpha=0.9)
    part = create_partition(seqs, states=4, n_rate_cats=4, alpha=0.9,
                            dtype=jnp.float32, pattern_pad=128, **kw)
    return part.cache_eigen(), tree


@pytest.mark.parametrize("n", [5, 12, 33, 80])
def test_schedule_structure(rng, n):
    """Every edge emitted exactly once; every emit is the edge's tip
    bipartition; slot count bounded by 2·depth + log2(n) + slack."""
    tree = ref.random_binary_tree(rng, n)
    sched = BoundedSweepSchedule(tree, seg_rows=16, seg_emits=4)
    validate_schedule(sched, tree)
    live_edges = sorted(
        int(e) for i in range(sched.seg_ops.shape[0])
        for j, e in enumerate(sched.seg_edges[i])
        if sched.seg_mask[i, j])
    expect = sorted(e for e, (u, v) in enumerate(tree.edge_nodes)
                    if int(u) >= 0)
    assert live_edges == expect                    # each edge ONCE
    # work bound: sum min(|a|,|b|) + 3n <= n log2 n + 3n
    assert sched.n_rows <= int(n * np.log2(n)) + 3 * n
    # memory bound: path outers + held inner + SU transient + deferrals
    depth = _tree_depth(tree)
    assert sched.n_slots <= 2 * depth + int(np.ceil(np.log2(n))) + 2 * 4 + 4


def _tree_depth(tree, root_tip=0):
    adj = tree.adjacency()
    (r, e0), = adj[root_tip]
    best = 0
    stack = [(r, root_tip, 0)]
    while stack:
        v, par, d = stack.pop()
        best = max(best, d)
        for nbr, e in adj[v]:
            if nbr != par:
                stack.append((nbr, v, d + 1))
    return best


def test_caterpillar_slots_scale_with_depth(rng):
    """The pathological deep tree: slots grow ~2·depth (documented
    trade; the chunked driver remains the fallback for such shapes)."""
    n = 32
    newick = "(t0:0.1," + "".join(
        f"(t{i}:0.1," for i in range(1, n - 1)) + f"t{n-1}:0.1" + \
        ")" * (n - 2) + ");"
    from pllmod_tpu.tree.topology import Tree
    tree = Tree.from_newick(newick)
    sched = BoundedSweepSchedule(tree, seg_rows=16, seg_emits=4)
    validate_schedule(sched, tree)
    assert sched.n_slots <= 2 * n        # linear in depth, not worse


@pytest.mark.parametrize("n,sites,segs,colored",
                         [(12, 160, (16, 4), True),
                          (12, 160, (16, 4), False),
                          (12, 160, (64, 16), True),
                          (60, 120, (64, 16), True)])
def test_bounded_blo_matches_full(rng, n, sites, segs, colored):
    """The segmented bounded sweep reaches the full directed-CLV
    driver's optimum (same bars as the chunked-BLO golden test); the
    (64, 16) cases exercise the PRODUCTION segment shape including
    multi-emit windows, and colored=False the cheap per-segment
    Gauss-Seidel mode."""
    from pllmod_tpu.optimize.blo import optimize_branch_lengths
    part, tree = _parts(rng, n, sites)
    tree.lengths = np.clip(tree.lengths * 2.5 + 0.03, 1e-4, 10.0)
    engine_mod.FORCE_FAST_KERNEL, saved = True, engine_mod.FORCE_FAST_KERNEL
    try:
        t_full = tree.copy()
        _, lnl_full = optimize_branch_lengths(part, t_full,
                                              tolerance=1e-7,
                                              max_sweeps=64)
        t_b = tree.copy()
        br_b, lnl_b = optimize_branch_lengths_bounded(
            part, t_b, seg_rows=segs[0], seg_emits=segs[1],
            tolerance=1e-7, max_sweeps=64, interpret=True,
            colored=colored)
    finally:
        engine_mod.FORCE_FAST_KERNEL = saved
    assert lnl_b >= lnl_full - 1e-2
    assert lnl_b == pytest.approx(lnl_full, abs=0.05)
    live = [e for e, (u, v) in enumerate(tree.edge_nodes) if int(u) >= 0]
    np.testing.assert_allclose(np.asarray(br_b)[live],
                               t_full.lengths[live], rtol=0.08, atol=3e-4)


def test_bounded_blo_monotone_and_improves(rng):
    """From perturbed lengths, each sweep's start-logL is monotone
    non-decreasing and the driver improves on the initial tree."""
    part, tree = _parts(rng, 17, 200)
    tree.lengths = tree.lengths * 3.0 + 0.05
    lnl_init = float(engine_mod.tree_loglikelihood(part, tree,
                                                   schedule="scan"))
    engine_mod.FORCE_FAST_KERNEL, saved = True, engine_mod.FORCE_FAST_KERNEL
    try:
        _, lnl_opt = optimize_branch_lengths_bounded(
            part, tree, seg_rows=16, seg_emits=4, interpret=True)
    finally:
        engine_mod.FORCE_FAST_KERNEL = saved
    assert lnl_opt > lnl_init + 1.0
    lnl_check = float(engine_mod.tree_loglikelihood(part, tree,
                                                    schedule="scan"))
    assert lnl_check == pytest.approx(lnl_opt, rel=2e-6)


def test_bounded_blo_padded_segments(rng):
    """pad_segments_to (the compile-once bucket for search use) is a
    no-op on the result."""
    part, tree = _parts(rng, 10, 120)
    engine_mod.FORCE_FAST_KERNEL, saved = True, engine_mod.FORCE_FAST_KERNEL
    try:
        t1, t2 = tree.copy(), tree.copy()
        _, l1 = optimize_branch_lengths_bounded(
            part, t1, seg_rows=16, seg_emits=4, interpret=True)
        _, l2 = optimize_branch_lengths_bounded(
            part, t2, seg_rows=16, seg_emits=4, interpret=True,
            pad_segments_to=8)
    finally:
        engine_mod.FORCE_FAST_KERNEL = saved
    assert l1 == pytest.approx(l2, abs=1e-3)
    np.testing.assert_allclose(t1.lengths, t2.lengths, rtol=1e-4,
                               atol=1e-7)


def test_auto_route_to_bounded(rng, monkeypatch):
    """optimize_branch_lengths transparently routes whole-tree smoothing
    to the bounded sweep past the directed-buffer memory budget (env
    PLLMOD_BLO_MEM_BUDGET shrunk to force it at test size), matching
    the full-buffer result."""
    from pllmod_tpu.optimize.blo import optimize_branch_lengths
    part, tree = _parts(rng, 14, 200)
    tree.lengths = np.clip(tree.lengths * 2.0 + 0.02, 1e-4, 5.0)
    engine_mod.FORCE_FAST_KERNEL, saved = True, engine_mod.FORCE_FAST_KERNEL
    try:
        t_full = tree.copy()
        _, l_full = optimize_branch_lengths(part, t_full,
                                            tolerance=1e-7)
        monkeypatch.setenv("PLLMOD_BLO_MEM_BUDGET", "1")
        t_b = tree.copy()
        _, l_b = optimize_branch_lengths(part, t_b, tolerance=1e-7)
    finally:
        engine_mod.FORCE_FAST_KERNEL = saved
    assert l_b == pytest.approx(l_full, abs=0.05)
