"""Batched prune-candidate SPR scoring (VERDICT r3 item 3): K prune
candidates' whole regraft sets score in ONE device program
(concatenated remainder-tree traversals, offset slots), with the
adaptive driver serial-equivalent to the one-candidate-per-dispatch
round-3 loop (reference framing: the per-subnode queue at
algo_search.c:901-1022)."""

import importlib

import numpy as np
import jax.numpy as jnp
import pytest

from pllmod_tpu.common import PARAM_BRANCHES_ITERATIVE
from pllmod_tpu.ops.partition import create_partition
from pllmod_tpu.ops import engine as engine_mod
from pllmod_tpu.tree.treeinfo import TreeInfo
from tests import reference_impl as ref

spr_mod = importlib.import_module("pllmod_tpu.algorithm.spr")


def _case(rng, n_tips=9, n_sites=150, dtype=jnp.float64, **kw):
    tree = ref.random_binary_tree(rng, n_tips)
    seqs = ref.random_sequences(rng, n_tips, n_sites, gap_frac=0.0)
    part = create_partition(seqs, states=4, n_rate_cats=4, alpha=0.8,
                            subst_rates=rng.uniform(0.5, 2, 6),
                            freqs=rng.dirichlet([5] * 4),
                            compress=False, dtype=dtype, **kw)
    return tree, part


def _run_round(tree, part, batch_max, **kw):
    old = spr_mod.SPR_BATCH_MAX
    spr_mod.SPR_BATCH_MAX = batch_max
    try:
        ti = TreeInfo(tree.copy(), [part],
                      params_to_optimize=PARAM_BRANCHES_ITERATIVE)
        lnl, napp, toplist = spr_mod.spr_round(ti, radius_min=1,
                                               radius_max=6, **kw)
    finally:
        spr_mod.SPR_BATCH_MAX = old
    return ti, lnl, napp, toplist


def test_batched_round_matches_serial(rng):
    """A/B pin: the adaptive batched driver applies the SAME move
    sequence and reaches the same logL as the serial (batch=1) driver
    on the f64 XLA path."""
    tree, part = _case(rng)
    ti_1, l_1, napp_1, top_1 = _run_round(tree, part, 1)
    ti_8, l_8, napp_8, top_8 = _run_round(tree, part, 8)
    assert napp_8 == napp_1
    assert l_8 == pytest.approx(l_1, abs=1e-8)
    from pllmod_tpu.tree.splits import rf_distance
    assert rf_distance(ti_1.tree, ti_8.tree) == 0
    assert [(t.prune_edge, t.junction, t.regraft_edge) for t in top_8] == \
        [(t.prune_edge, t.junction, t.regraft_edge) for t in top_1]


def test_batched_round_matches_serial_fast_kernels(rng):
    """Same A/B under the Pallas fast kernels (interpret mode, f32)."""
    tree, part = _case(rng, n_tips=8, n_sites=600, dtype=jnp.float32,
                       pattern_pad=128)
    engine_mod.FORCE_FAST_KERNEL = True
    try:
        ti_1, l_1, napp_1, _ = _run_round(tree, part, 1)
        ti_8, l_8, napp_8, _ = _run_round(tree, part, 8)
    finally:
        engine_mod.FORCE_FAST_KERNEL = None
    assert abs(napp_8 - napp_1) <= 1      # f32 eps can flip a boundary
    assert l_8 == pytest.approx(l_1, abs=0.5)


def test_batch_scorer_matches_single_dispatch(rng):
    """_score_regrafts_batch's per-candidate scores equal the
    single-candidate scorer's on every live edge (f64 XLA path)."""
    from pllmod_tpu.optimize.blo import DirectedTraversal
    from pllmod_tpu.tree import moves

    tree, part = _case(rng, n_tips=8)
    part = part.cache_eigen()
    n_tips = tree.n_tips
    E = len(tree.edge_nodes)
    n_ops_full = 3 * (n_tips - 2)
    stride = n_ops_full + 2
    trav_full = DirectedTraversal(tree)
    levels_f, offsets_f, _er, n_slots_f = trav_full.schedule()
    from pllmod_tpu.algorithm.spr import (_directed_clvs_sched,
                                          _prob_matrices_jit)
    brl_full = jnp.asarray(np.asarray(tree.lengths, np.float64))
    P_full = _prob_matrices_jit(part, brl_full)
    clvs_f, scalers_f = _directed_clvs_sched(part, P_full, levels_f,
                                             offsets_f, n_slots_f)

    builds = []
    for prune_edge, junction in spr_mod._prune_candidates(tree)[:3]:
        u, v = (int(x) for x in tree.edge_nodes[prune_edge])
        sub_root = u if junction == v else v
        nbrs = [(n, e) for n, e in tree.neighbors(junction)
                if e != prune_edge]
        if len(nbrs) != 2:
            continue
        (a, _), (b, _) = nbrs
        sub_nodes = moves.subtree_nodes(tree, prune_edge, sub_root)
        R = tree.copy()
        moves.prune(R, junction, keep_edge=prune_edge)
        R.edge_nodes[prune_edge] = (-1, -1)
        sub_arr = np.fromiter(sub_nodes, np.int64, len(sub_nodes))
        en = R.edge_nodes
        drop = ((en[:, 0] >= 0) & np.isin(en[:, 0], sub_arr)
                & np.isin(en[:, 1], sub_arr))
        en[drop] = -1
        R.invalidate()
        root_tip = next(t for t in range(R.n_tips)
                        if t not in sub_nodes and R.adjacency()[t])
        mask = spr_mod._radius_mask(R, a, b, 1, 10, E)
        mask &= R.edge_nodes[:, 0] >= 0
        trav_R = DirectedTraversal(R, root_tip=root_tip)
        mask &= trav_R.edge_mask
        builds.append(dict(prune_edge=prune_edge, junction=junction,
                           sub_root=sub_root, R=R, mask=mask,
                           trav_R=trav_R))

    K = len(builds)
    assert K >= 2
    # ---- single-candidate scores (round-3 scorer, sched numbering) ----
    singles = []
    for bld in builds:
        tr = bld["trav_R"]
        ops_R = np.full_like(trav_full.ops, -1)
        ops_R[:len(tr.ops)] = tr.ops
        if tree.is_tip(bld["sub_root"]):
            cS, sS = spr_mod._subtree_clv_tip(
                part, jnp.asarray(bld["sub_root"], jnp.int32))
        else:
            slot = trav_full.sched_slot(bld["sub_root"], bld["junction"])
            cS, sS = spr_mod._subtree_clv_slot(
                clvs_f, scalers_f, jnp.asarray(slot, jnp.int32))
        R = bld["R"]
        brl_R = jnp.asarray(np.where(R.edge_nodes[:, 0] >= 0,
                                     R.lengths, 0.1))
        s = spr_mod._score_all_regrafts(
            part, jnp.asarray(ops_R), brl_R, cS, sS,
            jnp.asarray(float(tree.lengths[bld["prune_edge"]])),
            jnp.asarray(tr.edge_ref), jnp.asarray(bld["mask"]),
            jnp.asarray(R.lengths / 2.0))
        singles.append(np.asarray(s))

    # ---- batched scores ----
    ops_cat = np.full((K * n_ops_full, 5), -1, np.int32)
    eref_cat = np.zeros((K * E, 2), np.int64)
    mask_b = np.zeros((K, E), bool)
    brl_cat = np.full(K * E, 0.1)
    half_cat = np.full(K * E, 0.05)
    t_s_b = np.zeros(K)
    refs_S = []
    for k, bld in enumerate(builds):
        tr = bld["trav_R"]
        ops_k = tr.ops.astype(np.int64).copy()
        ops_k[:, 0] += k * stride
        for col in (1, 3):
            inner = ops_k[:, col] >= n_tips
            ops_k[inner, col] += k * stride
        ops_k[:, 2] += k * E
        ops_k[:, 4] += k * E
        ops_cat[k * n_ops_full:k * n_ops_full + len(ops_k)] = ops_k
        er = tr.edge_ref.astype(np.int64).copy()
        er[er >= n_tips] += k * stride
        eref_cat[k * E:(k + 1) * E] = er
        mask_b[k] = bld["mask"]
        R = bld["R"]
        brl_cat[k * E:(k + 1) * E] = np.where(R.edge_nodes[:, 0] >= 0,
                                              R.lengths, 0.1)
        half_cat[k * E:(k + 1) * E] = R.lengths / 2.0
        t_s_b[k] = tree.lengths[bld["prune_edge"]]
        if tree.is_tip(bld["sub_root"]):
            refs_S.append(bld["sub_root"])
        else:
            refs_S.append(n_tips + trav_full.sched_slot(
                bld["sub_root"], bld["junction"]))
    cSb, sSb = spr_mod._gather_subtree_clvs(
        part, clvs_f, scalers_f, jnp.asarray(np.asarray(refs_S, np.int32)))
    scores_b = np.asarray(spr_mod._score_regrafts_batch(
        part, jnp.asarray(ops_cat), jnp.asarray(brl_cat),
        cSb, sSb, jnp.asarray(t_s_b),
        jnp.asarray(eref_cat.astype(np.int32)), jnp.asarray(mask_b),
        jnp.asarray(half_cat), stride))

    for k in range(K):
        live = np.isfinite(singles[k])
        np.testing.assert_array_equal(live, np.isfinite(scores_b[k]))
        np.testing.assert_allclose(scores_b[k][live], singles[k][live],
                                   rtol=1e-9, atol=1e-9)
