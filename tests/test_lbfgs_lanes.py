"""Lock-step L-BFGS lanes (VERDICT r3 item 5): K selected partitions'
rates / freqs / alpha+pinv / rates+weights optimizations run as lanes of
ONE combined (value, grad) program — one dispatch per evaluation step —
with per-partition trajectories identical to standalone runs
(reference shape: pllmod_opt_minimize_lbfgsb_multi,
opt_algorithms.c:542-807)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pllmod_tpu import common
from pllmod_tpu.common import (PARAM_SUBST_RATES, PARAM_FREQUENCIES,
                               PARAM_ALPHA, PARAM_PINV, PARAM_FREE_RATES,
                               PARAM_RATE_WEIGHTS, BRLEN_UNLINKED)
from pllmod_tpu.ops.partition import create_partition
from pllmod_tpu.tree.treeinfo import TreeInfo
# the algorithm package re-exports the opt_model FUNCTION under the
# module's name; resolve the module itself for monkeypatching
import importlib
om = importlib.import_module("pllmod_tpu.algorithm.opt_model")
from tests import reference_impl as ref


def _make_parts(rng, tree, n_parts, n_sites=60, cats=4, alpha=True):
    """n_parts DNA partitions over one topology, different data + models."""
    parts = []
    for p in range(n_parts):
        seqs = ref.random_sequences(rng, tree.n_tips, n_sites + 10 * p,
                                    gap_frac=0.0)
        part = create_partition(
            seqs, states=4, n_rate_cats=cats,
            alpha=(0.5 + 0.4 * p) if alpha else None,
            subst_rates=rng.uniform(0.5, 2.0, 6), freqs=rng.dirichlet([5] * 4),
            compress=False, dtype=jnp.float64)
        parts.append(part)
    return parts


def _single_runs(tree, parts, driver, mask):
    """Run the driver on each partition in its OWN treeinfo (the serial
    baseline the lanes must reproduce)."""
    outs = []
    for part in parts:
        ti = TreeInfo(tree.copy(), [part], params_to_optimize=mask)
        driver(ti)
        outs.append(ti.partitions[0])
    return outs


@pytest.mark.parametrize("family,driver,mask,getter", [
    ("rates", lambda ti: om.opt_subst_rates(ti), PARAM_SUBST_RATES,
     lambda p: np.asarray(p.subst_rates)),
    ("freqs", lambda ti: om.opt_frequencies(ti), PARAM_FREQUENCIES,
     lambda p: np.asarray(p.freqs)),
    ("alpha_pinv", lambda ti: om.opt_alpha_pinv(ti),
     PARAM_ALPHA | PARAM_PINV,
     lambda p: np.array([float(p.alpha), float(p.pinv_mix())])),
])
def test_lane_trajectories_match_standalone(rng, family, driver, mask,
                                            getter):
    tree = ref.random_binary_tree(rng, 7)
    parts = _make_parts(rng, tree, 3)
    solo = _single_runs(tree, parts, driver, mask)

    ti = TreeInfo(tree.copy(), list(parts), params_to_optimize=mask)
    driver(ti)
    for k in range(len(parts)):
        np.testing.assert_array_equal(getter(ti.partitions[k]),
                                      getter(solo[k]),
                                      err_msg=f"lane {k} diverged ({family})")


def test_rates_weights_lanes_match_standalone(rng):
    """Free-rate lanes (round-major EM + L-BFGS alternation) reproduce
    standalone trajectories under UNLINKED linkage (each lane's Σwr=1
    factor goes into its own branch lengths only)."""
    tree = ref.random_binary_tree(rng, 6)
    parts = []
    for p in range(2):
        seqs = ref.random_sequences(rng, tree.n_tips, 50 + 10 * p,
                                    gap_frac=0.0)
        part = create_partition(
            seqs, states=4, n_rate_cats=3, alpha=None,
            subst_rates=rng.uniform(0.5, 2.0, 6),
            freqs=rng.dirichlet([5] * 4), compress=False,
            dtype=jnp.float64)
        parts.append(part)
    mask = PARAM_FREE_RATES | PARAM_RATE_WEIGHTS

    solo = []
    for part in parts:
        ti = TreeInfo(tree.copy(), [part], brlen_linkage=BRLEN_UNLINKED,
                      params_to_optimize=mask)
        om.opt_rates_weights(ti)
        solo.append((ti.partitions[0], ti.brlens[0].copy()))

    ti = TreeInfo(tree.copy(), list(parts), brlen_linkage=BRLEN_UNLINKED,
                  params_to_optimize=mask)
    om.opt_rates_weights(ti)
    for k in range(2):
        np.testing.assert_allclose(
            np.asarray(ti.partitions[k].rate_cats),
            np.asarray(solo[k][0].rate_cats), rtol=1e-12)
        np.testing.assert_allclose(
            np.asarray(ti.partitions[k].rate_weights),
            np.asarray(solo[k][0].rate_weights), rtol=1e-12)
        np.testing.assert_allclose(ti.brlens[k], solo[k][1], rtol=1e-12)


def test_lane_dispatch_count(rng, monkeypatch):
    """K lanes must cost ~max_k(evals_k) combined dispatches, not
    Σ_k evals_k: the measured dispatch count equals the lock-step
    iteration count (every step evaluates ALL lanes at once)."""
    tree = ref.random_binary_tree(rng, 7)
    parts = _make_parts(rng, tree, 4)

    calls = {"n": 0}
    orig = om._vg_lane_program

    def counting(family, statics):
        prog = orig(family, statics)

        def wrapped(*a, **kw):
            calls["n"] += 1
            return prog(*a, **kw)

        return wrapped

    monkeypatch.setattr(om, "_vg_lane_program", counting)

    ti = TreeInfo(tree.copy(), list(parts),
                  params_to_optimize=PARAM_ALPHA | PARAM_PINV)
    om.opt_alpha_pinv(ti)
    n_combined = calls["n"]

    # per-lane eval counts from standalone runs
    solo_evals = []
    for part in parts:
        calls["n"] = 0
        ti1 = TreeInfo(tree.copy(), [part],
                       params_to_optimize=PARAM_ALPHA | PARAM_PINV)
        om.opt_alpha_pinv(ti1)
        solo_evals.append(calls["n"])
    assert n_combined == max(solo_evals), (n_combined, solo_evals)
    assert n_combined < sum(solo_evals)


def test_opt_model_multi_partition_improves(rng):
    """opt_model over a 3-partition treeinfo with the laned families
    still monotonically improves the total logL."""
    tree = ref.random_binary_tree(rng, 6)
    parts = _make_parts(rng, tree, 3, n_sites=40)
    ti = TreeInfo(tree.copy(), list(parts),
                  params_to_optimize=(PARAM_SUBST_RATES | PARAM_FREQUENCIES
                                      | PARAM_ALPHA | PARAM_PINV))
    l0 = ti.compute_loglh()
    lnl = om.opt_model(ti)
    assert lnl >= l0 - 1e-9
    assert np.isfinite(lnl)


def test_edge_decomp_vg_matches_autodiff(rng):
    """The edge-decomposition (value, grad) objectives (fused-kernel
    CLVs as stop-gradient primal data + autodiff only through θ→P and
    the designated root term — opt_model._edge_decomp_neg_loglh) match
    full autodiff through the traversal for every L-BFGS family, to
    dtype precision. This is the production TPU model-opt gradient
    path (PERF: ~97% of a flagship search round was autodiff-through-
    the-serial-scan, tools/probe_search246_decomp.out)."""
    import importlib
    om = importlib.import_module("pllmod_tpu.algorithm.opt_model")
    from pllmod_tpu.ops import engine as engine_mod

    engine_mod.FORCE_FAST_KERNEL = True
    try:
        n = 9
        tree = ref.random_binary_tree(rng, n)
        part = create_partition(
            ref.random_sequences(rng, n, 256, gap_frac=0.0), states=4,
            n_rate_cats=4, alpha=0.8, prop_invar=0.1, dtype=jnp.float32,
            compress=False, pattern_pad=128)
        ti = TreeInfo(tree, [part],
                      params_to_optimize=common.PARAM_SUBST_RATES)
        ea = om._edge_vg_args(ti, 0)
        assert ea is not None
        ops, root_info = tree.traversal_ops()
        ri = tuple(int(x) for x in root_info)
        ops_j = jnp.asarray(ops)
        brl = ea["brl"]
        new_args = (brl, ea["idx8"], ea["e1"], ea["e2"], ea["eref"],
                    ea["swap"], ea["emask"], ea["e0"], ea["n_slots"],
                    ea["interp"])
        remap = jnp.asarray(np.arange(6, dtype=np.int32))
        cases = [
            (om._neg_rates_fn, om._neg_rates_fn_edge,
             np.array([1.1, 2.0, 0.7, 0.9, 3.0], np.float32),
             (part, remap, 5)),
            (om._neg_freqs_fn, om._neg_freqs_fn_edge,
             np.array([1.2, 0.8, 1.1], np.float32), (part,)),
            (om._neg_alpha_pinv_fn, om._neg_alpha_pinv_fn_edge,
             np.array([0.6, 0.15], np.float32), (part,)),
            (om._neg_cats_fn, om._neg_cats_fn_edge,
             np.array([0.2, 0.6, 1.2, 2.0], np.float32), (part,)),
        ]
        for fn_old, fn_new, x, pre in cases:
            xj = jnp.asarray(x)
            f_o, g_o = jax.value_and_grad(fn_old)(xj, *pre, ops_j, brl,
                                                  ri)
            f_n, g_n = jax.value_and_grad(fn_new)(xj, *pre, *new_args)
            assert abs(float(f_o - f_n)) <= 1e-6 * abs(float(f_o))
            np.testing.assert_allclose(
                np.asarray(g_n), np.asarray(g_o),
                rtol=5e-5, atol=5e-4 * float(np.max(np.abs(g_o))))
    finally:
        engine_mod.FORCE_FAST_KERNEL = None


def test_lbfgs_ondevice_matches_host(rng):
    """The whole-trajectory on-device L-BFGS (one device program per
    family — optimize/lbfgsb.py minimize_lbfgsb_multi_device) reproduces
    the host lock-step driver exactly through opt_model: same optimum,
    same parameter estimates (the state machine mirrors _lbfgsb_gen
    transition-for-transition; CPU f64 algebra both sides)."""
    import os
    import importlib
    om = importlib.import_module("pllmod_tpu.algorithm.opt_model")
    from pllmod_tpu.ops import engine as engine_mod

    engine_mod.FORCE_FAST_KERNEL = True
    res = {}
    try:
        n = 9
        tree = ref.random_binary_tree(rng, n)
        seqs = ref.random_sequences(rng, n, 300, gap_frac=0.0)
        masks = (common.PARAM_SUBST_RATES | common.PARAM_FREQUENCIES
                 | common.PARAM_ALPHA | common.PARAM_BRANCHES_ITERATIVE)
        for dev in ("0", "1"):
            os.environ["PLLMOD_LBFGS_ONDEVICE"] = dev
            try:
                part = create_partition(
                    seqs, states=4, n_rate_cats=4, alpha=0.6,
                    dtype=jnp.float32, compress=False, pattern_pad=128)
                ti = TreeInfo(tree.copy(), [part],
                              params_to_optimize=masks)
                lnl = om.opt_model(ti, tol=1e-3)
                res[dev] = (lnl,
                            np.asarray(ti.partitions[0].subst_rates[0]),
                            np.asarray(ti.partitions[0].freqs[0]))
            finally:
                del os.environ["PLLMOD_LBFGS_ONDEVICE"]
    finally:
        engine_mod.FORCE_FAST_KERNEL = None
    (lh, rh, fh), (ld, rd, fd) = res["0"], res["1"]
    assert abs(lh - ld) < max(1e-5 * abs(lh), 0.5)
    np.testing.assert_allclose(rd, rh, rtol=1e-3)
    np.testing.assert_allclose(fd, fh, rtol=1e-3)
