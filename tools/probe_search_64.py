"""Round-3 headline e2e: ml_search at 64 taxa x 4096 patterns GTR+G4 f32
from a parsimony starting tree, on the TPU. Staged flush prints to
tools/probe_search_64.out.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

OUT = open("/root/repo/tools/probe_search_64.out", "w")


def p(*a):
    print(*a, file=OUT, flush=True)
    print(*a, flush=True)


def main():
    from pllmod_tpu.ops.partition import create_partition
    from pllmod_tpu.ops.charmap import DNA
    from pllmod_tpu.tree.treeinfo import TreeInfo
    from pllmod_tpu.tree.starting import parsimony_stepwise
    from pllmod_tpu.algorithm.search import ml_search
    from tests import reference_impl as ref

    p("platform:", jax.devices()[0].platform)
    rng = np.random.default_rng(11)
    n_tips, n_sites = 64, 4096
    true_tree = ref.random_binary_tree(rng, n_tips, 0.02, 0.6)
    seqs = ref.random_sequences(rng, n_tips, n_sites)
    part = create_partition(seqs, states=4, n_rate_cats=4, alpha=0.8,
                            dtype=jnp.float32)

    t0 = time.perf_counter()
    start, steps = parsimony_stepwise([f"t{i}" for i in range(n_tips)]
                                      if true_tree.labels is None
                                      else true_tree.labels,
                                      seqs, DNA, seed=3)
    p(f"parsimony start: {steps} steps ({time.perf_counter()-t0:.1f}s)")

    ti = TreeInfo(start, [part])
    t0 = time.perf_counter()
    res = ml_search(
        ti, radius_step=5, radius_max=15, lh_epsilon=0.1,
        on_round=lambda r: p(f"  [{r.mode:8s}] radius={r.radius:2d} "
                             f"applied={r.n_applied:3d} "
                             f"logL={r.loglh:.2f} "
                             f"({time.perf_counter()-t0:.0f}s)"))
    p(f"ml_search: logL {res.loglh:.3f} in {res.n_rounds} rounds, "
      f"wall {time.perf_counter()-t0:.1f}s (incl all compiles)")


main()
