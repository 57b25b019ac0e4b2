"""Lock-step L-BFGS lanes (VERDICT r3 item 5): K selected partitions'
rates / freqs / alpha+pinv / rates+weights optimizations run as lanes of
ONE combined (value, grad) program — one dispatch per evaluation step —
with per-partition trajectories identical to standalone runs
(reference shape: pllmod_opt_minimize_lbfgsb_multi,
opt_algorithms.c:542-807)."""

import numpy as np
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
