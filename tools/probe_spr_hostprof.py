"""cProfile of a WARM fast spr_round on the TPU (second round in the
process): where does the residual host time go? Writes
tools/probe_spr_hostprof.out.
"""
import sys
import time
import cProfile
import pstats
import io

import numpy as np

sys.path.insert(0, "/root/repo")
import jax.numpy as jnp

OUT = open("/root/repo/tools/probe_spr_hostprof.out", "w")


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
    t0 = time.perf_counter()
    spr_mod.spr_round(ti, radius_min=1, radius_max=10, thorough=False)
    print(f"cold round {time.perf_counter()-t0:.1f}s", file=OUT, flush=True)

    ti = TreeInfo(tree.copy(), [part])
    pr = cProfile.Profile()
    t0 = time.perf_counter()
    pr.enable()
    spr_mod.spr_round(ti, radius_min=1, radius_max=10, thorough=False)
    pr.disable()
    print(f"warm round {time.perf_counter()-t0:.1f}s", file=OUT, flush=True)
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("tottime").print_stats(25)
    print(s.getvalue(), file=OUT, flush=True)


main()
