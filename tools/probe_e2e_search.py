"""On-chip end-to-end timings: model-param optimization round + SPR
round + ml_search at 24 taxa x 1024 patterns (GTR+G4 f32) — the
composition the reference leaves to RAxML-NG. Updates the PERF_NOTES
"End-to-end on the chip" numbers after the fused-Newton BLO landed.

Run with the default (axon) platform; staged flush prints to
tools/probe_e2e_search.out.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

OUT = open("/root/repo/tools/probe_e2e_search.out", "w")


def p(*a):
    print(*a, file=OUT, flush=True)
    print(*a, flush=True)


def main():
    from pllmod_tpu.ops.partition import create_partition
    from pllmod_tpu.ops.engine import tree_loglikelihood
    from pllmod_tpu.tree.treeinfo import TreeInfo
    from pllmod_tpu.algorithm.opt_model import opt_model as run_opt_model
    from pllmod_tpu.algorithm.spr import spr_round
    from pllmod_tpu.algorithm.search import ml_search
    from tests import reference_impl as ref

    p("platform:", jax.devices()[0].platform)
    rng = np.random.default_rng(5)
    n_tips, n_sites = 24, 1024
    tree = ref.random_binary_tree(rng, n_tips, 0.02, 0.8)
    seqs = ref.random_sequences(rng, n_tips, n_sites)
    part = create_partition(seqs, states=4, n_rate_cats=4, alpha=0.8,
                            dtype=jnp.float32)

    t0 = time.perf_counter()
    l0 = float(tree_loglikelihood(part, tree))
    p(f"initial logL {l0:.3f}  ({time.perf_counter()-t0:.1f}s incl compile)")

    ti = TreeInfo(tree.copy(), [part])
    t0 = time.perf_counter()
    lnl = run_opt_model(ti)
    p(f"opt_model round: logL {lnl:.3f}  wall {time.perf_counter()-t0:.1f}s")

    t0 = time.perf_counter()
    lnl2, n_applied, _ = spr_round(ti, radius_min=1, radius_max=5,
                                       ntopol_keep=10, thorough=True)
    p(f"spr_round (thorough): logL {lnl2:.3f}  applied {n_applied}  "
      f"wall {time.perf_counter()-t0:.1f}s")

    ti2 = TreeInfo(tree.copy(), [part])
    t0 = time.perf_counter()
    res = ml_search(ti2, radius_max=5, max_rounds=8)
    p(f"ml_search: logL {res.loglh:.3f}  wall {time.perf_counter()-t0:.1f}s")
    p("DONE")


if __name__ == "__main__":
    main()
