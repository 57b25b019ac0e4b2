"""A/B the adaptive speculative scoring driver on a CONVERGED round
(48 taxa x 2048): round 1 is apply-heavy (serial mode), round 2+3 on the
already-improved tree have few applies — where speculation overlaps the
score sync with the next host build. Writes
tools/probe_spr_pipeline.out.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax.numpy as jnp

OUT = open("/root/repo/tools/probe_spr_pipeline.out", "w")


def p(*a):
    print(*a, file=OUT, flush=True)
    print(*a, flush=True)


def main():
    from pllmod_tpu.ops.partition import create_partition
    from pllmod_tpu.tree.treeinfo import TreeInfo
    from pllmod_tpu.algorithm import spr as spr_mod
    from tests import reference_impl as ref

    rng = np.random.default_rng(7)
    tree = ref.random_binary_tree(rng, 48, 0.02, 0.8)
    seqs = ref.random_sequences(rng, 48, 2048)
    part = create_partition(seqs, states=4, n_rate_cats=4, alpha=0.8,
                            dtype=jnp.float32)
    ti = TreeInfo(tree.copy(), [part])
    # warm all compiles + converge the tree
    for r in range(4):
        t0 = time.perf_counter()
        lnl, n_app, _ = spr_mod.spr_round(ti, radius_min=1, radius_max=10,
                                          thorough=False)
        p(f"warmup round {r}: lnl {lnl:.3f} applied {n_app} "
          f"wall {time.perf_counter()-t0:.1f}s")
    # timed converged rounds, speculation ON vs OFF (results identical)
    for spec in (True, False, True):
        spr_mod.SPR_SPECULATE = spec
        for r in range(2):
            t0 = time.perf_counter()
            lnl, n_app, _ = spr_mod.spr_round(ti, radius_min=1,
                                              radius_max=10, thorough=False)
            p(f"converged spec={spec} round {r}: lnl {lnl:.3f} "
              f"applied {n_app} wall {time.perf_counter()-t0:.1f}s")


main()
