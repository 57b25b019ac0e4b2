"""Where does spr_round wall time go at a realistic size?

Times the phases of spr_round (48 taxa x 2048 patterns GTR+G4 f32):
fast mode twice (warm steady state), then thorough once. Instruments
scoring dispatch, the np.array sync, directed-CLV rebuilds, and the
host R-building segments. Staged flush prints to
tools/probe_spr_profile.out; run on the TPU (default axon platform).
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

OUT = open("/root/repo/tools/probe_spr_profile.out", "w")


def p(*a):
    print(*a, file=OUT, flush=True)
    print(*a, flush=True)


ACC = {}


def wrap(mod, name, key, sync=False):
    fn = getattr(mod, name)

    def wrapped(*a, **k):
        t0 = time.perf_counter()
        out = fn(*a, **k)
        if sync:
            jax.block_until_ready(out)
        ACC[key] = ACC.get(key, 0.0) + (time.perf_counter() - t0)
        ACC[key + "_n"] = ACC.get(key + "_n", 0) + 1
        return out

    setattr(mod, name, wrapped)
    return fn


def main():
    from pllmod_tpu.ops.partition import create_partition
    from pllmod_tpu.ops.engine import tree_loglikelihood
    from pllmod_tpu.tree.treeinfo import TreeInfo
    from pllmod_tpu.algorithm import spr as spr_mod
    from pllmod_tpu.optimize import blo as blo_mod
    from pllmod_tpu.tree import moves as moves_mod
    from tests import reference_impl as ref

    p("platform:", jax.devices()[0].platform)
    rng = np.random.default_rng(7)
    n_tips, n_sites = 48, 2048
    tree = ref.random_binary_tree(rng, n_tips, 0.02, 0.8)
    seqs = ref.random_sequences(rng, n_tips, n_sites)
    part = create_partition(seqs, states=4, n_rate_cats=4, alpha=0.8,
                            dtype=jnp.float32)

    t0 = time.perf_counter()
    l0 = float(tree_loglikelihood(part, tree))
    p(f"initial logL {l0:.3f} ({time.perf_counter()-t0:.1f}s incl compile)")

    wrap(spr_mod, "_score_all_regrafts", "score_fast+sync", sync=True)
    wrap(spr_mod, "_score_all_regrafts_thorough", "score_thor+sync",
         sync=True)
    wrap(spr_mod, "_fused_clvs_std", "full_clvs", sync=True)
    wrap(spr_mod, "_directed_clvs_sched", "full_clvs", sync=True)
    wrap(spr_mod, "DirectedTraversal", "trav_host")
    wrap(spr_mod, "_fused_R_args", "fused_args_host")
    wrap(spr_mod, "_radius_mask", "radius_mask_host")
    wrap(moves_mod, "subtree_nodes", "subtree_nodes_host")
    wrap(spr_mod, "optimize_branch_lengths_treeinfo", "blo")

    from pllmod_tpu.tree.treeinfo import TreeInfo as TI
    wrap(TI, "compute_loglh", "treeinfo_loglh")
    runs = [("fast/cold", False), ("fast/warm", False)]
    for label, mode in runs:
        ACC.clear()
        ti = TreeInfo(tree.copy(), [part])
        t0 = time.perf_counter()
        lnl, n_applied, top = spr_mod.spr_round(
            ti, radius_min=1, radius_max=10, thorough=mode,
            ntopol_keep=20)
        wall = time.perf_counter() - t0
        p(f"\n== spr_round {label}: logL {lnl:.3f} "
          f"applied={n_applied} wall {wall:.1f}s")
        acc_sum = 0.0
        for k in sorted(ACC):
            if k.endswith("_n"):
                continue
            p(f"   {k:20s} {ACC[k]:8.2f}s  x{ACC.get(k + '_n', 0)}")
            acc_sum += ACC[k]
        p(f"   {'unaccounted':20s} {wall - acc_sum:8.2f}s "
          f"(R copy/edge loops, ops padding, apply/rollback, misc)")


main()
