"""Score-exactness check at the oscillating scale (64 taxa x 4096 f32):
for sampled (prune, regraft) candidates, the batched scorer's value must
equal the true logL of the post-move tree at the same branch lengths.
Writes tools/probe_spr_sanity.out.
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import jax.numpy as jnp

OUT = open("/root/repo/tools/probe_spr_sanity.out", "w")


def p(*a):
    print(*a, file=OUT, flush=True)
    print(*a, flush=True)


def main():
    from pllmod_tpu.ops.partition import create_partition
    from pllmod_tpu.ops.charmap import DNA
    from pllmod_tpu.ops.engine import tree_loglikelihood
    from pllmod_tpu.tree.treeinfo import TreeInfo
    from pllmod_tpu.tree.starting import parsimony_stepwise
    from pllmod_tpu.tree import moves
    from pllmod_tpu.algorithm import spr as spr_mod
    from pllmod_tpu.ops import engine as engine_mod
    from tests import reference_impl as ref

    rng = np.random.default_rng(11)
    n_tips, n_sites = 64, 4096
    true_tree = ref.random_binary_tree(rng, n_tips, 0.02, 0.6)
    seqs = ref.random_sequences(rng, n_tips, n_sites)
    part = create_partition(seqs, states=4, n_rate_cats=4, alpha=0.8,
                            dtype=jnp.float32).cache_eigen()
    start, _ = parsimony_stepwise(true_tree.labels, seqs, DNA, seed=3)
    ti = TreeInfo(start, [part])
    # take the tree into the oscillating regime: 2 fast rounds
    for r in range(2):
        lnl, n_app, _ = spr_mod.spr_round(ti, radius_min=1, radius_max=10,
                                          thorough=False)
        p(f"warm round {r}: lnl {lnl:.2f} applied {n_app}")
    tree = ti.tree
    part = ti.partitions[0]

    from pllmod_tpu.ops import pallas_clv
    trav_full = spr_mod.DirectedTraversal(tree)
    fi, fe1, fe2, fns = pallas_clv.compile_fused_ops(part, trav_full.ops)
    brl = jnp.asarray(np.asarray(tree.lengths, part.dtype))
    clvs_f, scalers_f = spr_mod._fused_clvs_brl(
        part, brl, fi, fe1, fe2, fns, engine_mod.fast_kernel_interpret())

    n_edge_slots = len(tree.edge_nodes)
    rngc = np.random.default_rng(0)
    cands = spr_mod._prune_candidates(tree)
    worst = 0.0
    checked = 0
    for idx in rngc.permutation(len(cands)):
        pe, junction = cands[int(idx)]
        u, v = (int(x) for x in tree.edge_nodes[pe])
        if u < 0 or junction not in (u, v):
            continue
        sub_root = u if junction == v else v
        nbrs = [(n, e) for n, e in tree.neighbors(junction) if e != pe]
        if len(nbrs) != 2:
            continue
        (a, _ea), (b, _eb) = nbrs
        sub_nodes = moves.subtree_nodes(tree, pe, sub_root)
        R = tree.copy()
        moves.prune(R, junction, keep_edge=pe)
        R.edge_nodes[pe] = (-1, -1)
        sub_arr = np.fromiter(sub_nodes, np.int64, len(sub_nodes))
        en = R.edge_nodes
        drop = ((en[:, 0] >= 0) & np.isin(en[:, 0], sub_arr)
                & np.isin(en[:, 1], sub_arr))
        en[drop] = -1
        R.invalidate()
        root_tip = next((t for t in range(R.n_tips)
                         if t not in sub_nodes and R.adjacency()[t]), None)
        if root_tip is None:
            continue
        mask = spr_mod._radius_mask(R, a, b, 1, 10, n_edge_slots)
        mask &= R.edge_nodes[:, 0] >= 0
        if not mask.any():
            continue
        trav_R = spr_mod.DirectedTraversal(R, root_tip=root_tip)
        ops_R = np.full_like(trav_full.ops, -1)
        ops_R[:len(trav_R.ops)] = trav_R.ops
        mask &= trav_R.edge_mask
        if tree.is_tip(sub_root):
            cS, sS = spr_mod._subtree_clv_tip(
                part, jnp.asarray(sub_root, jnp.int32))
        else:
            slot = trav_full.slot_of[(sub_root, junction)]
            cS, sS = spr_mod._subtree_clv_slot(clvs_f, scalers_f,
                                               jnp.asarray(slot, jnp.int32))
        dtype0 = part.dtype
        brl_R = jnp.asarray(np.asarray(
            np.where(R.edge_nodes[:, 0] >= 0, R.lengths, 0.1), dtype0))
        t_s0 = jnp.asarray(np.asarray(tree.lengths[pe], dtype0))
        halves = jnp.asarray(np.asarray(R.lengths / 2.0, dtype0))
        fargs = spr_mod._fused_R_args(part, ops_R, trav_full)
        scores = np.array(spr_mod._score_all_regrafts(
            part, jnp.asarray(ops_R), brl_R, cS, sS, t_s0,
            jnp.asarray(trav_R.edge_ref), jnp.asarray(mask), halves,
            **fargs), np.float64)
        live = np.nonzero(np.isfinite(scores))[0]
        if not len(live):
            continue
        re = int(rngc.choice(live))
        t2 = tree.copy()
        try:
            moves.spr(t2, pe, re, junction=junction)
        except Exception:
            continue
        truth_fast = float(tree_loglikelihood(part, t2))
        truth_xla = float(tree_loglikelihood(part, t2, schedule="levels"))
        d_fast = scores[re] - truth_fast
        d_xla = scores[re] - truth_xla
        flag = " <-- MISMATCH" if abs(d_xla) > 1.0 else ""
        p(f"pe={pe:3d} re={re:3d} score={scores[re]:.3f} "
          f"truth={truth_xla:.3f} d_xla={d_xla:+.4f} "
          f"d_fast={d_fast:+.4f}{flag}")
        worst = max(worst, abs(d_xla))
        checked += 1
        if checked >= 20:
            break
    p(f"checked {checked}, worst |score - truth| = {worst:.4f}")


main()
