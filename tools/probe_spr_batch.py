"""A/B the BATCHED prune-candidate scoring driver on converged rounds
(48 taxa x 2048, the round-3 benchmark shape): round 1 is apply-heavy,
rounds on the converged tree have few applies — where the batch grows
geometrically and collapses the per-candidate dispatch stream. Writes
tools/probe_spr_batch.out. Run ON-CHIP (axon) in the background with a
generous timeout; compiles for each batch-size bucket (1,2,4,8,16) are
paid once in the warmup rounds.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax.numpy as jnp

OUT = open("/root/repo/tools/probe_spr_batch.out", "w")


def p(*a):
    print(*a, file=OUT, flush=True)
    print(*a, flush=True)


def main():
    import jax
    from pllmod_tpu.ops.partition import create_partition
    from pllmod_tpu.tree.treeinfo import TreeInfo
    from pllmod_tpu.algorithm import spr as spr_mod
    from tests import reference_impl as ref

    p("devices:", jax.devices())
    rng = np.random.default_rng(7)
    tree = ref.random_binary_tree(rng, 48, 0.02, 0.8)
    seqs = ref.random_sequences(rng, 48, 2048)
    part = create_partition(seqs, states=4, n_rate_cats=4, alpha=0.8,
                            dtype=jnp.float32)
    ti = TreeInfo(tree.copy(), [part])
    # warm all compiles + converge the tree (batched driver by default —
    # the warmups pay each batch-bucket compile)
    for r in range(4):
        t0 = time.perf_counter()
        lnl, n_app, _ = spr_mod.spr_round(ti, radius_min=1, radius_max=10,
                                          thorough=False)
        p(f"warmup round {r}: lnl {lnl:.3f} applied {n_app} "
          f"wall {time.perf_counter()-t0:.1f}s")
    # timed converged rounds: serial (round-3 driver) vs batched (auto)
    for bmax in (1, None, 1, None):
        spr_mod.SPR_BATCH_MAX = bmax
        for r in range(2):
            t0 = time.perf_counter()
            lnl, n_app, _ = spr_mod.spr_round(ti, radius_min=1,
                                              radius_max=10, thorough=False)
            p(f"converged batch_max={bmax} round {r}: lnl {lnl:.3f} "
              f"applied {n_app} wall {time.perf_counter()-t0:.1f}s")
    # PURE-SCORING rounds (epsilon=1e9 -> no candidate ever applies):
    # isolates the per-candidate scoring dispatch stream, the true
    # steady state of a converged search
    for bmax in (1, None, 1, None):
        spr_mod.SPR_BATCH_MAX = bmax
        t0 = time.perf_counter()
        lnl, n_app, _ = spr_mod.spr_round(ti, radius_min=1, radius_max=10,
                                          thorough=False, epsilon=1e9)
        p(f"pure-scoring batch_max={bmax}: lnl {lnl:.3f} "
          f"applied {n_app} wall {time.perf_counter()-t0:.1f}s")
    spr_mod.SPR_BATCH_MAX = None


main()
