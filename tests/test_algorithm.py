"""TreeInfo + model-parameter optimization + SPR round tests.

Mirrors the reference's algorithm-layer behavior: every optimizer must be
monotone in logL, recover known parameters on data simulated under them,
and the SPR round must recover a perturbed topology (reference
examples/spr-round semantics).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pllmod_tpu import common
from pllmod_tpu.ops.partition import create_partition
from pllmod_tpu.ops.engine import tree_loglikelihood
from pllmod_tpu.tree import Tree
from pllmod_tpu.tree import moves
from pllmod_tpu.tree.treeinfo import TreeInfo
from pllmod_tpu.algorithm import (opt_alpha, opt_pinv, opt_subst_rates,
                                  opt_frequencies, opt_brlen, opt_model,
                                  spr_round)
from tests import reference_impl as ref


def simulate(rng, tree, rates, freqs, alpha, n_sites, cats=4):
    """Simulate DNA sequences down the tree under GTR+Gamma."""
    from scipy.linalg import expm
    states = len(freqs)
    Q = ref.build_q(np.asarray(rates, float), np.asarray(freqs, float))
    cat_rates = ref.gamma_cats_mean(alpha, cats)
    site_cat = rng.choice(cats, size=n_sites)
    adj = tree.adjacency()
    # root at inner node, sample root states from freqs
    root = tree.n_tips
    seqs = {}

    def walk(node, parent, state):
        if node < tree.n_tips:
            seqs[node] = state
            return
        for nbr, e in adj[node]:
            if nbr == parent:
                continue
            P = {}
            child_state = np.empty(n_sites, np.int64)
            for c in range(cats):
                sel = site_cat == c
                if not sel.any():
                    continue
                Pc = expm(Q * tree.lengths[e] * cat_rates[c])
                cum = Pc.cumsum(axis=1)
                u = rng.random(sel.sum())
                child_state[sel] = np.array(
                    [np.searchsorted(cum[s], x) for s, x in
                     zip(state[sel], u)])
            walk(nbr, node, child_state)

    root_state = rng.choice(states, p=freqs, size=n_sites)
    walk_stack_ok = walk(root, -1, root_state)
    alphabet = "ACGT"
    return ["".join(alphabet[s] for s in seqs[t])
            for t in range(tree.n_tips)]


@pytest.fixture
def sim_case(rng):
    tree = ref.random_binary_tree(rng, 8, 0.05, 0.4)
    rates = np.array([1.5, 4.0, 0.9, 1.2, 5.0, 1.0])
    freqs = np.array([0.32, 0.18, 0.2, 0.3])
    alpha = 0.7
    seqs = simulate(rng, tree, rates, freqs, alpha, 2000)
    part = create_partition(seqs, states=4, n_rate_cats=4, alpha=1.0,
                            subst_rates=np.ones(6), freqs=freqs,
                            dtype=jnp.float64)
    return tree, part, rates, freqs, alpha


def test_treeinfo_loglh_matches_engine(rng):
    tree = ref.random_binary_tree(rng, 6, 0.05, 0.5)
    seqs = ref.random_sequences(rng, 6, 100)
    p1 = create_partition(seqs, states=4, n_rate_cats=4, alpha=0.8,
                          dtype=jnp.float64)
    p2 = create_partition(seqs, states=4, n_rate_cats=2, alpha=1.5,
                          dtype=jnp.float64)
    ti = TreeInfo(tree, [p1, p2])
    total = ti.compute_loglh()
    expect = (float(tree_loglikelihood(p1, tree))
              + float(tree_loglikelihood(p2, tree)))
    assert total == pytest.approx(expect, abs=1e-8)
    # active-partition scoping
    ti.set_active_partition(0)
    assert ti.compute_loglh() == pytest.approx(
        float(tree_loglikelihood(p1, tree)), abs=1e-8)
    ti.set_active_partition(-1)


def test_opt_alpha_recovers(sim_case):
    tree, part, rates, freqs, alpha = sim_case
    part = part.replace(subst_rates=jnp.asarray(rates)[None, :])
    ti = TreeInfo(tree, [part])
    l0 = ti.compute_loglh()
    lnl = opt_alpha(ti)
    assert lnl >= l0 - 1e-9
    est = float(ti.partitions[0].alpha)
    assert est == pytest.approx(alpha, rel=0.35)


def test_opt_subst_rates_recovers(sim_case):
    tree, part, rates, freqs, alpha = sim_case
    part = part.with_alpha(alpha)
    ti = TreeInfo(tree, [part])
    l0 = ti.compute_loglh()
    lnl = opt_subst_rates(ti)
    assert lnl > l0
    est = np.asarray(ti.partitions[0].subst_rates[0])
    # GT-normalized rates close to the generating ones
    np.testing.assert_allclose(est / est[-1], rates, rtol=0.35)


def test_opt_frequencies_improves(sim_case):
    tree, part, rates, freqs, alpha = sim_case
    part = part.with_alpha(alpha).replace(
        subst_rates=jnp.asarray(rates)[None, :],
        freqs=jnp.full((1, 4), 0.25))
    ti = TreeInfo(tree, [part])
    l0 = ti.compute_loglh()
    lnl = opt_frequencies(ti)
    assert lnl > l0
    est = np.asarray(ti.partitions[0].freqs[0])
    np.testing.assert_allclose(est, freqs, atol=0.05)


def test_opt_model_full_round(sim_case):
    tree, part, rates, freqs, alpha = sim_case
    ti = TreeInfo(tree, [part],
                  params_to_optimize=(common.PARAM_SUBST_RATES
                                      | common.PARAM_ALPHA
                                      | common.PARAM_FREQUENCIES
                                      | common.PARAM_BRANCHES_ITERATIVE))
    l0 = ti.compute_loglh()
    lnl = opt_model(ti)
    assert lnl > l0
    assert ti.compute_loglh() == pytest.approx(lnl, abs=1e-5)


def test_opt_pinv_improves(rng):
    tree = ref.random_binary_tree(rng, 6, 0.02, 0.2)
    # mostly-invariant alignment
    base = rng.choice(list("ACGT"), 300)
    seqs = []
    for t in range(6):
        s = base.copy()
        mut = rng.random(300) < 0.06
        s[mut] = rng.choice(list("ACGT"), mut.sum())
        seqs.append("".join(s))
    part = create_partition(seqs, states=4, n_rate_cats=4, alpha=1.0,
                            prop_invar=0.01, dtype=jnp.float64)
    ti = TreeInfo(tree, [part])
    l0 = ti.compute_loglh()
    lnl = opt_pinv(ti)
    assert lnl > l0
    assert float(ti.partitions[0].pinv_mix()) > 0.05


def test_spr_round_recovers_topology(rng):
    """Perturb a tree with random SPRs; the round must recover logL at or
    above the true-topology logL (examples/spr-round behavior)."""
    true_tree = ref.random_binary_tree(rng, 10, 0.05, 0.3)
    rates = np.array([1.0, 4.0, 1.0, 1.0, 4.0, 1.0])
    freqs = np.full(4, 0.25)
    seqs = simulate(rng, true_tree, rates, freqs, 1.0, 1500)
    part = create_partition(seqs, states=4, n_rate_cats=4, alpha=1.0,
                            subst_rates=rates, freqs=freqs,
                            dtype=jnp.float64)

    ti_true = TreeInfo(true_tree.copy(), [part])
    lnl_true = opt_brlen(ti_true)

    # perturb with random valid SPRs
    bad = true_tree.copy()
    n_moves = 0
    attempts = 0
    while n_moves < 3 and attempts < 200:
        attempts += 1
        e = int(rng.integers(len(bad.edge_nodes)))
        if bad.edge_nodes[e, 0] < 0:
            continue
        j = int(bad.edge_nodes[e, rng.integers(2)])
        if bad.is_tip(j):
            continue
        tgt = int(rng.integers(len(bad.edge_nodes)))
        try:
            moves.spr(bad, e, tgt, junction=j)
            n_moves += 1
        except Exception:
            continue
    ti = TreeInfo(bad, [part])
    l_bad = opt_brlen(ti)
    assert l_bad < lnl_true - 1.0  # perturbation hurt

    total_applied = 0
    for rnd in range(6):  # fast rounds, then thorough (RAxML-NG style)
        lnl, n_applied, toplist = spr_round(ti, radius_min=1, radius_max=8,
                                            thorough=(rnd >= 1))
        total_applied += n_applied
        if n_applied == 0 and rnd >= 1:
            break
    assert total_applied > 0
    assert lnl >= lnl_true - 1e-2


def test_spr_round_multipartition_thorough(rng):
    """Thorough SPR with two partitions: summed derivatives drive the
    triplet optimization; the round must improve a perturbed tree."""
    true_tree = ref.random_binary_tree(rng, 8, 0.05, 0.3)
    rates = np.array([1.0, 3.0, 1.0, 1.0, 3.0, 1.0])
    freqs = np.full(4, 0.25)
    seqs1 = simulate(rng, true_tree, rates, freqs, 1.0, 600)
    seqs2 = simulate(rng, true_tree, rates, freqs, 0.6, 400)
    p1 = create_partition(seqs1, states=4, n_rate_cats=2, alpha=1.0,
                          subst_rates=rates, freqs=freqs, dtype=jnp.float64)
    p2 = create_partition(seqs2, states=4, n_rate_cats=2, alpha=0.6,
                          subst_rates=rates, freqs=freqs, dtype=jnp.float64)

    bad = true_tree.copy()
    for _ in range(100):
        e = int(rng.integers(len(bad.edge_nodes)))
        if bad.edge_nodes[e, 0] < 0:
            continue
        j = int(bad.edge_nodes[e, rng.integers(2)])
        if bad.is_tip(j):
            continue
        try:
            moves.spr(bad, e, int(rng.integers(len(bad.edge_nodes))),
                      junction=j)
            break
        except Exception:
            continue
    ti = TreeInfo(bad, [p1, p2])
    from pllmod_tpu.algorithm import opt_brlen
    l_bad = opt_brlen(ti)
    lnl, n_applied, _ = spr_round(ti, radius_min=1, radius_max=6,
                                  thorough=True)
    assert lnl >= l_bad - 1e-6


def test_opt_onedim_custom(rng):
    """Public custom one-dim treeinfo optimization
    (pllmod_algo_opt_onedim_treeinfo_custom): user getter/setter drive
    the same Brent machinery — recover alpha through the custom hook."""
    from pllmod_tpu.algorithm import opt_onedim_custom
    tree = ref.random_binary_tree(rng, 8, 0.05, 0.4)
    seqs = ref.random_sequences(rng, 8, 300)
    part = create_partition(seqs, states=4, n_rate_cats=4, alpha=0.3,
                            dtype=jnp.float64)
    ti = TreeInfo(tree, [part], params_to_optimize=0)  # mask ignored
    l0 = ti.compute_loglh()
    lnl = opt_onedim_custom(
        ti, make_partition=lambda p, a: p.with_alpha(a),
        get_x0=lambda p: p.alpha, xmin=0.02, xmax=100.0)
    assert lnl > l0
    direct = TreeInfo(tree, [create_partition(
        seqs, states=4, n_rate_cats=4, alpha=0.3, dtype=jnp.float64)])
    from pllmod_tpu.algorithm import opt_alpha
    lnl2 = opt_alpha(direct)
    assert abs(lnl - lnl2) < 1e-6


def test_spr_full_clv_reuse_bit_identical(rng):
    """The dirty-node validity protocol for the full directed-CLV buffers
    (treeinfo.c:872-944 semantics applied to the directed table) must not
    change ANY spr_round output vs rebuilding after every applied move:
    same final logL, applied count, toplist, and topology."""
    from pllmod_tpu.algorithm import spr as spr_mod
    tree = ref.random_binary_tree(rng, 14, 0.02, 0.8)
    seqs = ref.random_sequences(rng, 14, 160)
    part = create_partition(seqs, states=4, n_rate_cats=4, alpha=0.8,
                            dtype=jnp.float64)
    out = {}
    old = spr_mod.FULL_CLV_REUSE
    try:
        for flag in (False, True):
            spr_mod.FULL_CLV_REUSE = flag
            ti = TreeInfo(tree.copy(), [part])
            lnl, n_applied, top = spr_mod.spr_round(
                ti, radius_min=1, radius_max=8, thorough=False)
            out[flag] = (lnl, n_applied,
                         [(t.lnl, t.prune_edge, t.regraft_edge)
                          for t in top],
                         ti.tree.to_newick())
    finally:
        spr_mod.FULL_CLV_REUSE = old
    assert out[False] == out[True]


def test_spr_adaptive_cutoff_skips(rng):
    """The adaptive cutoff (cutoff_info_t semantics) must actually skip
    prune candidates in the round after a big drop, save their scoring
    work, and never break the round's monotone best tracking."""
    from pllmod_tpu.algorithm import spr as spr_mod
    tree = ref.random_binary_tree(rng, 16, 0.02, 0.8)
    seqs = ref.random_sequences(rng, 16, 150)
    part = create_partition(seqs, states=4, n_rate_cats=4, alpha=0.8,
                            dtype=jnp.float64)
    ti = TreeInfo(tree.copy(), [part])
    state = {"sum": 0.0, "n": 0}
    calls = []
    orig = spr_mod._score_all_regrafts

    def counting(*a, **k):
        calls[-1] += 1
        return orig(*a, **k)

    spr_mod._score_all_regrafts = counting
    try:
        lnls = []
        for _ in range(3):
            calls.append(0)
            lnl, _, _ = spr_mod.spr_round(ti, radius_min=1, radius_max=8,
                                          thorough=False,
                                          subtree_cutoff=1.0,
                                          cutoff_state=state)
            lnls.append(lnl)
    finally:
        spr_mod._score_all_regrafts = orig
    assert state["n"] > 5 and state["drops"]
    # once statistics exist, later rounds skip some candidates (each
    # skip saves one scoring dispatch)
    assert state.get("skipped", 0) > 0, state
    # skipping never breaks monotonicity
    for a, b in zip(lnls, lnls[1:]):
        assert b >= a - 1e-6 * abs(a)
