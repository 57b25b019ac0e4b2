"""Fused sumtable/derivative Pallas kernels (ops.pallas_deriv).

Golden-equivalence vs the XLA formulation (ops.derivatives +
optimize.blo._edge_sumtables) in interpret mode, across DNA/protein,
p-inv mixtures, scaled trees, and the split-storage bf16x2 input layout;
plus end-to-end BLO wiring parity (the reference hot loop,
pll_optimize.c:1462-1475 / 1223-1287).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pllmod_tpu.ops import derivatives as deriv_mod
from pllmod_tpu.ops import engine as engine_mod
from pllmod_tpu.ops import pallas_clv, pallas_deriv
from pllmod_tpu.ops.partition import create_partition
from pllmod_tpu.ops.engine import tree_loglikelihood
from pllmod_tpu.optimize import blo as blo_mod
from tests import reference_impl as ref


@pytest.fixture
def force_fast():
    engine_mod.FORCE_FAST_KERNEL = True
    yield
    engine_mod.FORCE_FAST_KERNEL = None


def _case(rng, states, n_tips, n_sites, pinv=0.0):
    # long branches force nonzero scalers through the rescale path
    tree = ref.random_binary_tree(rng, n_tips, 0.02, 1.2)
    if states == 4:
        seqs = ref.random_sequences(rng, n_tips, n_sites)
        part = create_partition(seqs, states=4, n_rate_cats=4, alpha=0.8,
                                subst_rates=rng.uniform(0.5, 3.0, 6),
                                freqs=rng.dirichlet([8] * 4),
                                prop_invar=pinv, dtype=jnp.float32)
    else:
        aa = "ARNDCQEGHILKMFPSTWYV"
        seqs = ["".join(rng.choice(list(aa), n_sites))
                for _ in range(n_tips)]
        part = create_partition(seqs, states=20, n_rate_cats=4, alpha=0.8,
                                dtype=jnp.float32)
    return part.cache_eigen(), tree


def _xla_golden(part, tree, trav, brl):
    idx8, e1, e2, ns = pallas_clv.compile_fused_ops(part, trav.ops)
    P = part.prob_matrices(brl)
    clvs_std, sc_std = pallas_clv.update_partials_fused_std(
        part, P, idx8, e1, e2, ns, interpret=True, split=False)
    eigen = part.eigen()
    st, sc = blo_mod._edge_sumtables(part, clvs_std, sc_std,
                                     jnp.asarray(trav.edge_ref), eigen)
    return deriv_mod.edge_derivatives_batch(part, st, sc, brl, eigen)


@pytest.mark.parametrize("states,pinv", [(4, 0.0), (4, 0.25), (20, 0.0)])
def test_kernel_parity(rng, states, pinv):
    part, tree = _case(rng, states, 10 if states == 4 else 8,
                       256 if states == 4 else 128, pinv)
    trav = blo_mod.DirectedTraversal(tree)
    brl = jnp.asarray(tree.lengths, jnp.float32)
    idx8, e1, e2, ns = pallas_clv.compile_fused_ops(part, trav.ops)
    P = part.prob_matrices(brl)
    clvs, scalers = pallas_clv.update_partials_fused(
        part, P, idx8, e1, e2, ns, interpret=True, split=False)
    eref6 = pallas_deriv.compile_edge_refs(trav.edge_ref, trav.edge_mask,
                                           part.n_tips)
    st, sc = pallas_deriv.edge_sumtables_pallas(part, clvs, scalers, eref6,
                                                split=False, interpret=True)
    got = pallas_deriv.edge_derivatives_pallas(part, st, sc, brl,
                                               interpret=True)
    want = _xla_golden(part, tree, trav, brl)
    mask = trav.edge_mask
    for name, a, b in zip(("lnl", "df", "ddf"), got, want):
        a = np.asarray(a)[mask]
        b = np.asarray(b, np.float32)[mask]
        rel = np.max(np.abs(a - b) / np.maximum(np.abs(b), 1e-3))
        assert rel < 2e-5, (name, rel)


def test_kernel_parity_split_storage(rng):
    """Split bf16x2 directed buffers through the sumtable kernel: inside
    the derivative parity bar (the split error is ~2^-17 per CLV)."""
    part, tree = _case(rng, 4, 10, 256, pinv=0.2)
    trav = blo_mod.DirectedTraversal(tree)
    brl = jnp.asarray(tree.lengths, jnp.float32)
    idx8, e1, e2, ns = pallas_clv.compile_fused_ops(part, trav.ops)
    P = part.prob_matrices(brl)
    clvs, scalers = pallas_clv.update_partials_fused(
        part, P, idx8, e1, e2, ns, interpret=True, split=True)
    eref6 = pallas_deriv.compile_edge_refs(trav.edge_ref, trav.edge_mask,
                                           part.n_tips)
    st, sc = pallas_deriv.edge_sumtables_pallas(part, clvs, scalers, eref6,
                                                split=True, interpret=True)
    got = pallas_deriv.edge_derivatives_pallas(part, st, sc, brl,
                                               interpret=True)
    want = _xla_golden(part, tree, trav, brl)
    mask = trav.edge_mask
    for name, a, b in zip(("lnl", "df", "ddf"), got, want):
        a = np.asarray(a)[mask]
        b = np.asarray(b, np.float32)[mask]
        rel = np.max(np.abs(a - b) / np.maximum(np.abs(b), 1e-2))
        assert rel < 2e-4, (name, rel)


def test_blo_sweep_parity_fast_vs_xla(rng):
    """One multi-partition SCALED sweep: identical inputs, both paths —
    lnl0 and the Newton-optimized branch lengths must agree.

    Moderate branch lengths keep every edge's Newton well-conditioned
    (converged inside the iteration cap): on pathological edges the two
    paths may legitimately stop at different non-converged iterates (a
    1e-7 derivative difference reroutes the bracket dance) — that regime
    is covered by the end-to-end test below, which only requires equal
    final logL quality."""
    tree = ref.random_binary_tree(rng, 10, 0.05, 0.3)
    seqs = ref.random_sequences(rng, 10, 200)
    p1 = create_partition(seqs, states=4, n_rate_cats=4, alpha=0.8,
                          subst_rates=rng.uniform(0.5, 3.0, 6),
                          freqs=rng.dirichlet([8] * 4),
                          prop_invar=0.15,
                          dtype=jnp.float32).cache_eigen()
    seqs = ref.random_sequences(rng, 10, 200)
    p2 = create_partition(seqs, states=4, n_rate_cats=2, alpha=1.4,
                          dtype=jnp.float32).cache_eigen()
    parts, scalers = (p1, p2), (1.0, 1.7)
    trav = blo_mod.DirectedTraversal(tree)
    levels, offsets, eref_s, n_slots = trav.schedule()
    brl = jnp.asarray(np.clip(tree.lengths, 1e-4, 100.0), jnp.float32)
    args = (jnp.asarray(1e-4, jnp.float32), jnp.asarray(100.0, jnp.float32),
            jnp.asarray(1e-6, jnp.float32))
    mask = jnp.asarray(trav.edge_mask)
    nb_x, l0_x = blo_mod._blo_sweep_multi(parts, scalers, levels, offsets,
                                          eref_s, mask, brl, *args, n_slots)
    engine_mod.FORCE_FAST_KERNEL = True
    try:
        fargs = blo_mod._fused_args(p1, trav)
        assert "eref6" in fargs
        nb_f, l0_f = blo_mod._blo_sweep_multi(
            parts, scalers, levels, offsets, jnp.asarray(trav.edge_ref),
            mask, brl, *args, n_slots, **fargs)
    finally:
        engine_mod.FORCE_FAST_KERNEL = None
    assert abs(float(l0_x) - float(l0_f)) / abs(float(l0_x)) < 2e-6
    # the wiring under test is the multi-partition derivative
    # accumulation (chain rule df·s, ddf·s²) — compare it directly at the
    # shared input brlens (post-Newton iterates may diverge on flat edges)
    m = np.asarray(trav.edge_mask)
    df_x = ddf_x = df_f = ddf_f = 0.0
    for part, s in zip(parts, scalers):
        P = part.prob_matrices(brl * s)
        clvs, sclr = blo_mod._directed_clvs(part, P, levels, offsets,
                                            n_slots, None)
        eigen = part.eigen()
        st, sc = blo_mod._edge_sumtables(part, clvs, sclr, eref_s, eigen)
        _, df, ddf = deriv_mod.edge_derivatives_batch(part, st, sc,
                                                      brl * s, eigen)
        df_x = df_x + np.asarray(df) * s
        ddf_x = ddf_x + np.asarray(ddf) * s * s

        stf, scf, eigf, lnB = blo_mod._deriv_pipeline_fast(
            part, brl * s, fargs["fused_idx"], fargs["fused_nslots"],
            True, fargs["eref6"])
        _, df, ddf = pallas_deriv.edge_derivatives_pallas(
            part, stf, scf, brl * s, eigf, lnB, interpret=True)
        df_f = df_f + np.asarray(df) * s
        ddf_f = ddf_f + np.asarray(ddf) * s * s
    for a, b in ((df_f, df_x), (ddf_f, ddf_x)):
        rel = np.max(np.abs(a - b)[m] / np.maximum(np.abs(b), 1e-2)[m])
        assert rel < 2e-5, rel


def test_blo_end_to_end_fast(rng, force_fast):
    """Full optimize_branch_lengths through the fused pipeline: the
    reported logL must match an independent engine evaluation and at
    least match the XLA path's optimum."""
    part, tree = _case(rng, 4, 10, 200, pinv=0.15)
    engine_mod.FORCE_FAST_KERNEL = False
    t_ref = tree.copy()
    _, l_ref = blo_mod.optimize_branch_lengths(part, t_ref, max_sweeps=24,
                                               tolerance=1e-8)
    engine_mod.FORCE_FAST_KERNEL = True
    t_fast = tree.copy()
    _, l_fast = blo_mod.optimize_branch_lengths(part, t_fast,
                                                max_sweeps=24,
                                                tolerance=1e-8)
    assert l_fast >= l_ref - 1e-4 * abs(l_ref)
    engine_mod.FORCE_FAST_KERNEL = False
    l_check = float(tree_loglikelihood(part, t_fast))
    assert abs(l_check - l_fast) / abs(l_fast) < 1e-5


def test_kernel_fuzz_random_configs(rng):
    """Fuzz: random states/cats/pinv/branch regimes (incl. the odd-state
    padding path, blopt-5states analog) — pallas st+derivs must match the
    XLA formulation on every live edge."""
    from pllmod_tpu.ops import charmap

    for trial in range(4):
        states = int(rng.choice([4, 5, 8, 20]))
        cats = int(rng.choice([1, 2, 4]))
        n_tips = int(rng.integers(5, 12))
        n_sites = int(rng.choice([96, 160]))
        pinv = float(rng.choice([0.0, 0.3]))
        blmax = float(rng.choice([0.3, 2.0]))
        tree = ref.random_binary_tree(rng, n_tips, 0.01, blmax)
        cm = charmap.for_states(states)
        syms = charmap.MULTI_SYMBOLS[:states] if states != 4 else "ACGT"
        seqs = ["".join(rng.choice(list(syms), n_sites))
                for _ in range(n_tips)]
        nr = states * (states - 1) // 2
        part = create_partition(
            seqs, states=states, n_rate_cats=cats,
            alpha=float(rng.uniform(0.3, 2.0)),
            subst_rates=rng.uniform(0.5, 3.0, nr),
            freqs=rng.dirichlet([8] * states), prop_invar=pinv,
            dtype=jnp.float32).cache_eigen()
        trav = blo_mod.DirectedTraversal(tree)
        brl = jnp.asarray(tree.lengths, jnp.float32)
        idx8, e1, e2, ns = pallas_clv.compile_fused_ops(part, trav.ops)
        P = part.prob_matrices(brl)
        clvs, scalers = pallas_clv.update_partials_fused(
            part, P, idx8, e1, e2, ns, interpret=True, split=False)
        eref6 = pallas_deriv.compile_edge_refs(
            trav.edge_ref, trav.edge_mask, part.n_tips)
        st, sc = pallas_deriv.edge_sumtables_pallas(
            part, clvs, scalers, eref6, split=False, interpret=True)
        got = pallas_deriv.edge_derivatives_pallas(part, st, sc, brl,
                                                   interpret=True)
        want = _xla_golden(part, tree, trav, brl)
        mask = trav.edge_mask
        for name, a, b in zip(("lnl", "df", "ddf"), got, want):
            a = np.asarray(a)[mask]
            b = np.asarray(b, np.float32)[mask]
            rel = np.max(np.abs(a - b) / np.maximum(np.abs(b), 1e-2))
            assert rel < 5e-5, (trial, states, cats, pinv, name, rel)


@pytest.mark.parametrize("states,pinv", [(4, 0.25), (20, 0.0)])
def test_fused_newton_kernel_parity(rng, states, pinv):
    """Fused per-edge Newton kernel ≡ minimize_newton_multi driven by
    edge_derivatives_pallas on the SAME sumtables: with identical update
    rules and identical per-iteration derivatives, the iterates are the
    same sequence — t_opt must match to f32 roundoff, and lnl0 must equal
    the derivative kernel's logL at t0."""
    from pllmod_tpu.optimize.newton import minimize_newton_multi

    part, tree = _case(rng, states, 10 if states == 4 else 8,
                       256 if states == 4 else 128, pinv)
    trav = blo_mod.DirectedTraversal(tree)
    brl = jnp.asarray(np.clip(tree.lengths, 1e-4, 100.0), jnp.float32)
    idx8, e1, e2, ns = pallas_clv.compile_fused_ops(part, trav.ops)
    P = part.prob_matrices(brl)
    clvs, scalers = pallas_clv.update_partials_fused(
        part, P, idx8, e1, e2, ns, interpret=True, split=False)
    eref6 = pallas_deriv.compile_edge_refs(trav.edge_ref, trav.edge_mask,
                                           part.n_tips)
    st, sc = pallas_deriv.edge_sumtables_pallas(part, clvs, scalers, eref6,
                                                split=False, interpret=True)
    eigen = part.eigen()
    lnB = pallas_deriv.invar_log_plane(part)
    xmin, xmax, tol = 1e-4, 100.0, 1e-6
    t_got, lnl0_got = pallas_deriv.newton_edges_pallas(
        part, st, sc, brl, xmin, xmax, tol, 10, eigen, lnB, interpret=True)

    def deriv_fn(t):
        _, df, ddf = pallas_deriv.edge_derivatives_pallas(
            part, st, sc, t, eigen, lnB, interpret=True)
        return df, ddf

    t_want = minimize_newton_multi(deriv_fn, brl, xmin, xmax, tol=tol,
                                   max_iters=10)
    lnl0_want, _, _ = pallas_deriv.edge_derivatives_pallas(
        part, st, sc, brl, eigen, lnB, interpret=True)
    m = trav.edge_mask
    rel_t = np.max(np.abs(np.asarray(t_got) - np.asarray(t_want))[m] /
                   np.maximum(np.abs(np.asarray(t_want)), 1e-4)[m])
    assert rel_t < 5e-4, rel_t
    rel_l = np.max(np.abs(np.asarray(lnl0_got) - np.asarray(lnl0_want))[m] /
                   np.maximum(np.abs(np.asarray(lnl0_want)), 1e-2)[m])
    assert rel_l < 2e-6, rel_l


def test_fused_newton_static_flag_selected(rng, force_fast, monkeypatch):
    """_fused_args must decide fused_newton at CALL time (static jit arg):
    an env read inside the traced sweep is frozen into the first trace
    (the round-2 probe measured the iterative path twice because of
    exactly this)."""
    part, tree = _case(rng, 4, 8, 128)
    trav = blo_mod.DirectedTraversal(tree)
    monkeypatch.setenv("PLLMOD_FUSED_NEWTON", "1")
    assert blo_mod._fused_args(part, trav)["fused_newton"] is True
    monkeypatch.setenv("PLLMOD_FUSED_NEWTON", "0")
    assert blo_mod._fused_args(part, trav)["fused_newton"] is False


def test_fused_args_gates_on_all_partitions(rng, monkeypatch):
    """A single unsupported kernel shape among the treeinfo partitions
    must drop the WHOLE multi-partition sweep to the XLA path — the
    fused pipeline runs per partition and Mosaic rejects unsupported
    tilings at compile time (PERF_NOTES CS-crossover section)."""
    tree = ref.random_binary_tree(rng, 8, 0.05, 0.4)
    seqs = ref.random_sequences(rng, 8, 96)
    p4 = create_partition(seqs, states=4, n_rate_cats=4,
                          dtype=jnp.float32).cache_eigen()
    from pllmod_tpu.ops import charmap
    seqs5 = ["".join(rng.choice(list(charmap.MULTI_SYMBOLS[:5]), 96))
             for _ in range(8)]
    p5 = create_partition(seqs5, states=5, n_rate_cats=4,
                          dtype=jnp.float32).cache_eigen()
    trav = blo_mod.DirectedTraversal(tree)
    monkeypatch.setattr(engine_mod, "use_fast_kernel",
                        lambda p: p.states == 4)
    assert blo_mod._fused_args(p4, trav)
    assert blo_mod._fused_args(p4, trav, newton_parts=(p4, p5)) == {}


def test_fused_newton_blo_end_to_end(rng, force_fast, monkeypatch):
    """optimize_branch_lengths with the fused Newton kernel enabled vs
    disabled (iterative minimize_newton_multi on the same fused
    derivative pipeline): both must reach the same optimum quality, and
    the final logL must verify against an independent engine."""
    part, tree = _case(rng, 4, 10, 200, pinv=0.15)
    monkeypatch.setenv("PLLMOD_FUSED_NEWTON", "0")
    t_it = tree.copy()
    _, l_it = blo_mod.optimize_branch_lengths(part, t_it, max_sweeps=24,
                                              tolerance=1e-8)
    monkeypatch.setenv("PLLMOD_FUSED_NEWTON", "1")
    t_fn = tree.copy()
    _, l_fn = blo_mod.optimize_branch_lengths(part, t_fn, max_sweeps=24,
                                              tolerance=1e-8)
    assert l_fn >= l_it - 1e-4 * abs(l_it)
    engine_mod.FORCE_FAST_KERNEL = False
    l_check = float(tree_loglikelihood(part, t_fn))
    assert abs(l_check - l_fn) / abs(l_fn) < 1e-5


def test_fused_newton_multi_partition_scaled(rng):
    """Multi-partition SCALED fused Newton kernel ≡ minimize_newton_multi
    with per-iteration chain-rule accumulation (df·s, ddf·s²) over the
    same per-partition sumtables — the λr-folding must reproduce the
    reference's utree_derivative_func_multi semantics
    (pll_optimize.c:1223-1287) exactly."""
    from pllmod_tpu.optimize.newton import minimize_newton_multi

    tree = ref.random_binary_tree(rng, 9, 0.05, 0.4)
    seqs = ref.random_sequences(rng, 9, 192)
    p1 = create_partition(seqs, states=4, n_rate_cats=4, alpha=0.8,
                          subst_rates=rng.uniform(0.5, 3.0, 6),
                          freqs=rng.dirichlet([8] * 4), prop_invar=0.2,
                          dtype=jnp.float32).cache_eigen()
    seqs = ref.random_sequences(rng, 9, 192)
    p2 = create_partition(seqs, states=4, n_rate_cats=2, alpha=1.3,
                          dtype=jnp.float32).cache_eigen()
    parts, scalers = (p1, p2), (1.0, 1.7)
    trav = blo_mod.DirectedTraversal(tree)
    brl = jnp.asarray(np.clip(tree.lengths, 1e-4, 100.0), jnp.float32)
    eref6 = pallas_deriv.compile_edge_refs(trav.edge_ref, trav.edge_mask,
                                           p1.n_tips)
    sts, scs, eigs, lnbs = [], [], [], []
    for part, s in zip(parts, scalers):
        idx8, e1, e2, ns = pallas_clv.compile_fused_ops(part, trav.ops)
        st, sc, eigen, lnB = blo_mod._deriv_pipeline_fast(
            part, brl * s, (idx8, e1, e2), ns, True, eref6)
        sts.append(st)
        scs.append(sc)
        eigs.append(eigen)
        lnbs.append(lnB)
    xmin, xmax, tol = 1e-4, 100.0, 1e-6
    t_got, lnl0_got = pallas_deriv.newton_edges_pallas_multi(
        parts, sts, scs, brl, scalers, xmin, xmax, tol, 10, eigs, lnbs,
        interpret=True)

    def deriv_fn(t):
        df_tot = jnp.zeros_like(t)
        ddf_tot = jnp.zeros_like(t)
        for part, s, st, sc, eig, lnB in zip(parts, scalers, sts, scs,
                                             eigs, lnbs):
            _, df, ddf = pallas_deriv.edge_derivatives_pallas(
                part, st, sc, t * s, eig, lnB, interpret=True)
            df_tot = df_tot + df * s
            ddf_tot = ddf_tot + ddf * s * s
        return df_tot, ddf_tot

    t_want = minimize_newton_multi(deriv_fn, brl, xmin, xmax, tol=tol,
                                   max_iters=10)
    lnl0_want = 0.0
    for part, s, st, sc, eig, lnB in zip(parts, scalers, sts, scs, eigs,
                                         lnbs):
        l0, _, _ = pallas_deriv.edge_derivatives_pallas(
            part, st, sc, brl * s, eig, lnB, interpret=True)
        lnl0_want = lnl0_want + np.asarray(l0)
    m = trav.edge_mask
    rel_t = np.max(np.abs(np.asarray(t_got) - np.asarray(t_want))[m] /
                   np.maximum(np.abs(np.asarray(t_want)), 1e-4)[m])
    assert rel_t < 5e-4, rel_t
    rel_l = np.max(np.abs(np.asarray(lnl0_got) - lnl0_want)[m] /
                   np.maximum(np.abs(lnl0_want), 1e-2)[m])
    assert rel_l < 2e-6, rel_l


def test_fused_newton_treeinfo_scaled_end_to_end(rng, force_fast,
                                                 monkeypatch):
    """optimize_branch_lengths_treeinfo (SCALED, 2 partitions) through
    the multi-partition fused Newton path vs the iterative path: same
    optimum quality."""
    from pllmod_tpu.common import BRLEN_SCALED
    from pllmod_tpu.tree.treeinfo import TreeInfo

    tree = ref.random_binary_tree(rng, 9, 0.05, 0.4)
    seqs1 = ref.random_sequences(rng, 9, 160)
    seqs2 = ref.random_sequences(rng, 9, 160)
    p1 = create_partition(seqs1, states=4, n_rate_cats=4, alpha=0.8,
                          dtype=jnp.float32)
    p2 = create_partition(seqs2, states=4, n_rate_cats=2, alpha=1.3,
                          dtype=jnp.float32)

    def run():
        ti = TreeInfo(tree.copy(), [p1, p2], brlen_linkage=BRLEN_SCALED)
        ti.brlen_scalers[1] = 1.6
        return blo_mod.optimize_branch_lengths_treeinfo(
            ti, max_sweeps=16, tolerance=1e-7)

    monkeypatch.setenv("PLLMOD_FUSED_NEWTON", "0")
    l_it = run()
    monkeypatch.setenv("PLLMOD_FUSED_NEWTON", "1")
    l_fn = run()
    assert l_fn >= l_it - 1e-4 * abs(l_it)


def test_blo_no_retrace_across_topologies(rng, force_fast):
    """The fast BLO pipeline's jit cache key must be topology-INDEPENDENT
    (fixed-shape idx8/eref6 arrays; no level schedule): an SPR must not
    trigger a recompile of the sweep — the reference's per-move BLO cost
    is per-edge work, not a fresh program (measured round 2: 35 XLA
    recompiles / 129 s inside one 40-taxon spr_round before this fix)."""
    from pllmod_tpu.tree import moves
    tree = ref.random_binary_tree(rng, 10, 0.05, 0.3)
    seqs = ref.random_sequences(rng, 10, 150)
    part = create_partition(seqs, states=4, n_rate_cats=4, alpha=0.9,
                            dtype=jnp.float32)
    t1 = tree.copy()
    blo_mod.optimize_branch_lengths(part, t1, max_sweeps=2)
    n_sweep = blo_mod._blo_sweep._cache_size()
    n_lnl = blo_mod._lnl_at._cache_size()
    # a different topology, same size
    t2 = tree.copy()
    done = 0
    for _ in range(200):
        e = int(rng.integers(len(t2.edge_nodes)))
        r = int(rng.integers(len(t2.edge_nodes)))
        try:
            moves.spr(t2, e, r)
            done += 1
            if done == 2:
                break
        except Exception:
            continue
    assert done == 2
    blo_mod.optimize_branch_lengths(part, t2, max_sweeps=2)
    assert blo_mod._blo_sweep._cache_size() == n_sweep
    assert blo_mod._lnl_at._cache_size() == n_lnl
