"""Fast-kernel wiring tests: the fused Pallas megakernel (forced on, CPU
interpret mode) must give the same results as the XLA engines through
every hot consumer — TreeInfo.compute_loglh, model-opt objectives, the
directed-CLV builds used by SPR scoring (VERDICT round-1 item 2)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pllmod_tpu.ops import clv as clv_mod
from pllmod_tpu.ops import engine as engine_mod
from pllmod_tpu.ops import pallas_clv
from pllmod_tpu.ops.partition import create_partition
from pllmod_tpu.tree.treeinfo import TreeInfo
from pllmod_tpu.optimize.blo import DirectedTraversal
from tests import reference_impl as ref


@pytest.fixture
def force_fast():
    engine_mod.FORCE_FAST_KERNEL = True
    yield
    engine_mod.FORCE_FAST_KERNEL = None


def _setup(rng, n=9, sites=120, **kw):
    tree = ref.random_binary_tree(rng, n)
    seqs = ref.random_sequences(rng, n, sites)
    part = create_partition(seqs, states=4, n_rate_cats=4, alpha=0.9,
                            dtype=jnp.float32, **kw)
    return part, tree


def test_fused_ops_generic_directed(rng, force_fast):
    """compile_fused_ops on a DirectedTraversal table (slot numbering
    preserved) must reproduce update_partials' buffers on live slots."""
    part, tree = _setup(rng)
    trav = DirectedTraversal(tree)
    brl = jnp.asarray(tree.lengths, part.dtype)
    P = part.prob_matrices(brl)
    ref_clvs, ref_sc = clv_mod.update_partials(part, P,
                                               jnp.asarray(trav.ops))
    idx8, e1, e2, n_slots = pallas_clv.compile_fused_ops(
        part, trav.ops, pad_to=len(trav.ops) + 5)
    clvs, sc = pallas_clv.update_partials_fused_std(
        part, P, idx8, e1, e2, n_slots, interpret=True)
    for slot in range(len(trav.ops)):
        np.testing.assert_allclose(np.asarray(clvs[slot]),
                                   np.asarray(ref_clvs[slot]),
                                   rtol=2e-6, atol=1e-7)
        np.testing.assert_array_equal(np.asarray(sc[slot]),
                                      np.asarray(ref_sc[slot]))


def test_treeinfo_fast_path(rng, force_fast):
    part, tree = _setup(rng)
    ti = TreeInfo(tree, [part])
    l_fast = ti.compute_loglh()
    engine_mod.FORCE_FAST_KERNEL = False
    l_scan = ti.compute_loglh()
    assert l_fast == pytest.approx(l_scan, abs=1e-3)


def test_tree_loglikelihood_fused_schedule(rng, force_fast):
    part, tree = _setup(rng)
    l_fused = float(engine_mod.tree_loglikelihood(part, tree,
                                                  schedule="fused"))
    l_scan = float(engine_mod.tree_loglikelihood(part, tree,
                                                 schedule="scan"))
    assert l_fused == pytest.approx(l_scan, abs=1e-3)


def test_opt_alpha_fast_path(rng, force_fast):
    from pllmod_tpu.algorithm.opt_model import opt_alpha
    part, tree = _setup(rng)
    ti = TreeInfo(tree, [part])
    l_fast = opt_alpha(ti)
    a_fast = float(ti.partitions[0].alpha)
    engine_mod.FORCE_FAST_KERNEL = False
    part2, _ = _setup(np.random.default_rng(0), 9, 120)
    # fresh state, same data: rebuild from same rng seed path
    ti2 = TreeInfo(tree, [part])
    l_scan = opt_alpha(ti2)
    a_scan = float(ti2.partitions[0].alpha)
    assert l_fast == pytest.approx(l_scan, abs=5e-3)
    assert a_fast == pytest.approx(a_scan, rel=1e-2)


def test_blo_fast_path(rng, force_fast):
    """BLO sweeps through the fused pipeline (megakernel directed CLVs +
    pallas sumtable/derivative kernels) must reach the XLA path's logL
    and report a logL consistent with an independent engine evaluation.
    (Branch-length vectors are NOT compared element-wise: random data
    saturates many branches and the two paths' ~1e-7 derivative rounding
    difference legitimately lands flat edges at different, equally-likely
    points — single-sweep math parity is pinned in test_pallas_deriv.)"""
    from pllmod_tpu.optimize.blo import (optimize_branch_lengths,
                                         optimize_branch_lengths_treeinfo)
    from pllmod_tpu.ops.engine import tree_loglikelihood
    part, tree = _setup(rng, n=8, sites=100)
    t_fast, t_scan = tree.copy(), tree.copy()
    b_f, l_f = optimize_branch_lengths(part, t_fast)
    engine_mod.FORCE_FAST_KERNEL = False
    b_s, l_s = optimize_branch_lengths(part, t_scan)
    assert l_f == pytest.approx(l_s, abs=1e-2)
    l_check = float(tree_loglikelihood(part, t_fast))
    assert abs(l_check - l_f) / abs(l_f) < 1e-5
    engine_mod.FORCE_FAST_KERNEL = True
    ti = TreeInfo(tree.copy(), [part, part])
    l_ti = optimize_branch_lengths_treeinfo(ti)
    engine_mod.FORCE_FAST_KERNEL = False
    ti2 = TreeInfo(tree.copy(), [part, part])
    l_ti2 = optimize_branch_lengths_treeinfo(ti2)
    # equal-quality optimum (paths may settle different flat-edge points)
    assert l_ti >= l_ti2 - 2e-2


def test_spr_round_fast_path(rng, force_fast):
    """spr_round with all CLV work forced through the fused kernel: must
    run end-to-end and not lose likelihood (fast mode, small tree)."""
    from pllmod_tpu.algorithm.spr import spr_round
    part, tree = _setup(rng, n=8, sites=80)
    ti = TreeInfo(tree, [part])
    l0 = ti.compute_loglh()
    l1, n_applied, _top = spr_round(ti, radius_min=1, radius_max=3,
                                    thorough=False)
    assert l1 >= l0 - 1e-6
    engine_mod.FORCE_FAST_KERNEL = None


def test_blo_split_mode(rng, force_fast):
    """BLO with split-storage directed CLVs (the real-TPU default of
    update_partials_fused_std) converges to the same optimum as the
    exact path — validates the SPLIT_CLV=True production configuration
    end to end on CPU interpret."""
    from pllmod_tpu.optimize.blo import optimize_branch_lengths
    part, tree = _setup(rng, n=8, sites=100)
    prev = engine_mod.SPLIT_CLV
    try:
        engine_mod.SPLIT_CLV = True
        b_sp, l_sp = optimize_branch_lengths(part, tree.copy())
        engine_mod.SPLIT_CLV = False
        b_ex, l_ex = optimize_branch_lengths(part, tree.copy())
    finally:
        engine_mod.SPLIT_CLV = prev
    assert l_sp == pytest.approx(l_ex, abs=1e-2)
    np.testing.assert_allclose(np.asarray(b_sp), np.asarray(b_ex),
                               rtol=5e-2, atol=1e-4)


def test_blo_ondevice_driver_fast_path(rng, force_fast):
    """The fused on-device BLO driver (whole smoothing loop as one
    program) must be bit-equal to the host driver when both run the
    fused pipeline (megakernel + pallas sumtable/Newton kernels,
    interpret mode on CPU)."""
    from pllmod_tpu.optimize.blo import optimize_branch_lengths
    part, tree = _setup(rng, n=8, sites=96)
    t1, t2 = tree.copy(), tree.copy()
    b1, l1 = optimize_branch_lengths(part, t1, on_device=False,
                                     max_sweeps=8)
    b2, l2 = optimize_branch_lengths(part, t2, on_device=True,
                                     max_sweeps=8)
    assert l1 == l2
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))


def test_opt_onedim_fused_kind(rng, force_fast):
    """opt_alpha/opt_pinv through the FUSED-megakernel kind of the cached
    whole-Brent programs (CS > RESIDENT_CS_MAX routes to
    loglikelihood_fused with static root refs) must match the scan
    engine's optimum."""
    from pllmod_tpu.algorithm.opt_model import opt_alpha, opt_pinv

    tree = ref.random_binary_tree(rng, 8)
    seqs = ref.random_sequences(rng, 8, 96)

    def mk():
        return create_partition(seqs, states=4, n_rate_cats=16, alpha=0.9,
                                prop_invar=0.2, dtype=jnp.float32)

    ti = TreeInfo(tree.copy(), [mk()])
    assert engine_mod.fast_eval_schedule(ti.partitions[0]) == "fused"
    opt_alpha(ti)
    l_fast = opt_pinv(ti)
    a_fast = float(ti.partitions[0].alpha)
    p_fast = float(ti.partitions[0].prop_invar[0])

    engine_mod.FORCE_FAST_KERNEL = False
    ti2 = TreeInfo(tree.copy(), [mk()])
    opt_alpha(ti2)
    l_scan = opt_pinv(ti2)
    assert l_fast == pytest.approx(l_scan, abs=5e-3)
    assert a_fast == pytest.approx(float(ti2.partitions[0].alpha), rel=1e-2)
    assert p_fast == pytest.approx(float(ti2.partitions[0].prop_invar[0]),
                                   abs=1e-2)


def test_opt_brlen_scalers_fast_path(rng, force_fast):
    """The scaler Brent family (SCALED linkage) through the fast kernels
    vs the scan engine."""
    from pllmod_tpu.algorithm.opt_model import opt_brlen_scalers
    from pllmod_tpu.common import BRLEN_SCALED

    part, tree = _setup(rng)
    part2 = create_partition(ref.random_sequences(rng, 9, 80), states=4,
                             n_rate_cats=2, alpha=1.3, dtype=jnp.float32)
    ti = TreeInfo(tree.copy(), [part, part2], brlen_linkage=BRLEN_SCALED)
    l_fast = opt_brlen_scalers(ti)
    s_fast = list(ti.brlen_scalers)

    engine_mod.FORCE_FAST_KERNEL = False
    ti2 = TreeInfo(tree.copy(), [part, part2], brlen_linkage=BRLEN_SCALED)
    l_scan = opt_brlen_scalers(ti2)
    assert l_fast == pytest.approx(l_scan, abs=5e-3)
    np.testing.assert_allclose(np.asarray(s_fast),
                               np.asarray(ti2.brlen_scalers), rtol=1e-2)


def test_brent_program_cache_reuse(rng, force_fast):
    """Two opt_alpha calls on DIFFERENT topologies of the same taxon
    count must share ONE cached Brent program (topology is a traced
    argument of the resident kind — the whole point of the cache; a
    per-call program was a fresh remote compile per ml_search round)."""
    import importlib
    om = importlib.import_module("pllmod_tpu.algorithm.opt_model")
    opt_alpha = om.opt_alpha

    om._BRENT_PROGRAMS.clear()
    part, tree = _setup(rng)
    ti = TreeInfo(tree, [part])
    l1 = opt_alpha(ti)
    tree2 = ref.random_binary_tree(np.random.default_rng(123), 9)
    ti2 = TreeInfo(tree2, [part])
    l2 = opt_alpha(ti2)
    assert np.isfinite(l1) and np.isfinite(l2)
    keys = [k for k in om._BRENT_PROGRAMS if k[0] == "alpha"]
    assert len(keys) == 1

    # fused kind (CS > RESIDENT_CS_MAX): dynamic root refs make it
    # topology-independent too — still one program across topologies
    om._BRENT_PROGRAMS.clear()
    seqs = ref.random_sequences(np.random.default_rng(5), 9, 96)
    pw = create_partition(seqs, states=4, n_rate_cats=16, alpha=0.9,
                          dtype=jnp.float32)
    opt_alpha(TreeInfo(tree.copy(), [pw]))
    opt_alpha(TreeInfo(tree2.copy(), [pw]))
    keys = [k for k in om._BRENT_PROGRAMS if k[0] == "alpha"]
    assert len(keys) == 1 and keys[0][1][0][0] == "fused"


def test_treeinfo_multi_partition_single_dispatch(rng, force_fast):
    """≥2 fast-kernel partitions evaluate through ONE combined device
    program (engine.multi_eval) — MIXED kinds (resident CS=16/8 +
    fused-dyn CS=64 lanes in the same program); per-partition logLs must
    match the scan engine, including across a topology change (the
    program is topology-traced)."""
    part, tree = _setup(rng)
    part2 = create_partition(ref.random_sequences(rng, 9, 80), states=4,
                             n_rate_cats=2, alpha=1.4, dtype=jnp.float32)
    part3 = create_partition(ref.random_sequences(rng, 9, 64), states=4,
                             n_rate_cats=16, alpha=0.7, dtype=jnp.float32)
    assert engine_mod.fast_eval_schedule(part3) == "fused"
    ti = TreeInfo(tree.copy(), [part, part2, part3])
    l_fast = ti.compute_loglh()
    per_fast = list(ti.partition_loglh)

    engine_mod.FORCE_FAST_KERNEL = False
    ti2 = TreeInfo(tree.copy(), [part, part2, part3])
    l_scan = ti2.compute_loglh()
    assert l_fast == pytest.approx(l_scan, abs=2e-3)
    np.testing.assert_allclose(per_fast, ti2.partition_loglh, rtol=1e-6)

    # topology change: same cached program, still correct
    engine_mod.FORCE_FAST_KERNEL = True
    tree3 = ref.random_binary_tree(np.random.default_rng(7), 9)
    ti3 = TreeInfo(tree3.copy(), [part, part2, part3])
    l3_fast = ti3.compute_loglh()
    engine_mod.FORCE_FAST_KERNEL = False
    ti4 = TreeInfo(tree3.copy(), [part, part2, part3])
    assert l3_fast == pytest.approx(ti4.compute_loglh(), abs=2e-3)


def test_persite_fused_matches_xla(rng, force_fast):
    """Per-site logL through the fused megakernel (fused-root epilogue,
    engine.loglikelihood_persite_fast) matches the XLA oracle per
    pattern, and TreeInfo.compute_loglh_persite auto-gates onto it for
    fast-kernel partitions (VERDICT r3 weak item 5)."""
    part, tree = _setup(rng, n=8, sites=96)
    ops, root_info = tree.traversal_ops()
    ri = tuple(int(x) for x in root_info)
    brl = jnp.asarray(tree.lengths, part.dtype)
    l_ref, site_ref = engine_mod.loglikelihood_persite(
        part, jnp.asarray(ops), brl, ri)
    l_fast, site_fast = engine_mod.loglikelihood_persite_fast(part, tree)
    np.testing.assert_allclose(float(l_fast), float(l_ref), rtol=2e-6)
    w = np.asarray(part.pattern_weights)
    live = w > 0
    np.testing.assert_allclose(np.asarray(site_fast)[live],
                               np.asarray(site_ref)[live], rtol=1e-5,
                               atol=1e-5)
    # weighted-sum identity: persite recovers the total
    assert abs(float((np.asarray(site_fast) * w).sum()) - float(l_fast)) \
        < 1e-3

    ti = TreeInfo(tree.copy(), [part])
    total, persite = ti.compute_loglh_persite()         # auto -> fused
    np.testing.assert_allclose(total, float(l_ref), rtol=2e-6)
    np.testing.assert_allclose(np.asarray(persite[0])[live],
                               np.asarray(site_ref)[live], rtol=1e-5,
                               atol=1e-5)
    total_xla, persite_xla = ti.compute_loglh_persite(fast=False)
    np.testing.assert_allclose(total_xla, float(l_ref), rtol=1e-6)
