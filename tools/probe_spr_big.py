"""One SPR round + one bounded whole-tree BLO at 4k-10k taxa (round-5
item 3 tail): the reference's top driver exercised at 4-40x its own
flagship taxon count on one chip. 4096 x 4096 runs the production fast
spr_round (full directed CLV buffers fit: 3n slots x CS16 x 4k pat =
3.2 GB) + optimize_branch_lengths_bounded; 10000 x 2048 repeats both at
the north-star taxon count. Writes tools/probe_spr_big.out."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

OUT = (open("/root/repo/tools/probe_spr_big.out", "w")
       if __name__ == "__main__" else sys.stderr)
T0 = time.perf_counter()


def p(*a):
    print(f"[{time.perf_counter()-T0:8.1f}s]", *a, file=OUT, flush=True)
    print(*a, flush=True)


def run(n_taxa, n_sites):
    import jax.numpy as jnp
    import pllmod_tpu.algorithm.spr as spr_mod
    from pllmod_tpu.ops.partition import create_partition
    from pllmod_tpu.tree.treeinfo import TreeInfo
    from pllmod_tpu.tree import starting
    from pllmod_tpu.ops import charmap as charmap_mod
    from pllmod_tpu.common import PARAM_BRANCHES_ITERATIVE
    from pllmod_tpu.optimize.blo_bounded import \
        optimize_branch_lengths_bounded
    from tests import reference_impl as ref
    sys.path.insert(0, "/root/repo/tools")
    from probe_search246 import simulate

    rng = np.random.default_rng(n_taxa)
    true_tree = ref.random_binary_tree(rng, n_taxa, 0.02, 0.5)
    rates = rng.uniform(0.5, 2.5, 6)
    freqs = rng.dirichlet([12, 9, 9, 12])
    t0 = time.perf_counter()
    seqs = simulate(rng, true_tree, rates, freqs, 0.9, n_sites)
    p(f"simulated {n_taxa}x{n_sites} in {time.perf_counter()-t0:.0f}s")
    t0 = time.perf_counter()
    part = create_partition(seqs, states=4, n_rate_cats=4, alpha=0.9,
                            dtype=jnp.float32)
    p(f"partition {part.n_patterns_padded} patterns "
      f"({time.perf_counter()-t0:.0f}s)")
    t0 = time.perf_counter()
    labels = [f"t{i}" for i in range(n_taxa)]
    import os
    from pllmod_tpu.tree.topology import Tree
    cache = f"/tmp/spr_big_start_{n_taxa}x{n_sites}.nwk"
    if os.path.exists(cache):
        start_tree = Tree.from_newick(open(cache).read())
        p("parsimony start (cached)")
    else:
        start_tree, pscore = starting.parsimony_stepwise(
            labels, seqs, charmap_mod.DNA, seed=1)
        open(cache, "w").write(start_tree.to_newick())
        p(f"parsimony start in {time.perf_counter()-t0:.1f}s")
    ti = TreeInfo(start_tree, [part],
                  params_to_optimize=PARAM_BRANCHES_ITERATIVE)

    # one bounded whole-tree BLO first (the start tree has default
    # parsimony lengths)
    t0 = time.perf_counter()
    _, lnl_blo = optimize_branch_lengths_bounded(
        part.cache_eigen(), ti.tree, max_sweeps=8)
    p(f"bounded whole-tree BLO: lnl={lnl_blo:.2f} "
      f"({time.perf_counter()-t0:.0f}s incl. compiles)")

    # one fast SPR round
    spr_mod.HOST_BUILD_SECONDS = 0.0
    t0 = time.perf_counter()
    lnl, napp, _ = spr_mod.spr_round(ti, radius_min=1, radius_max=5)
    dt = time.perf_counter() - t0
    p(f"spr_round(fast, r<=5): lnl={lnl:.2f} applied={napp} "
      f"({dt:.0f}s incl. compiles; host_build "
      f"{spr_mod.HOST_BUILD_SECONDS:.1f}s = "
      f"{100*spr_mod.HOST_BUILD_SECONDS/dt:.0f}%)")
    # a second round is fully warm
    spr_mod.HOST_BUILD_SECONDS = 0.0
    t0 = time.perf_counter()
    lnl2, napp2, _ = spr_mod.spr_round(ti, radius_min=1, radius_max=5)
    dt = time.perf_counter() - t0
    p(f"spr_round warm:        lnl={lnl2:.2f} applied={napp2} "
      f"({dt:.0f}s; host_build {spr_mod.HOST_BUILD_SECONDS:.1f}s = "
      f"{100*spr_mod.HOST_BUILD_SECONDS/dt:.0f}%)")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "4k"
    p(f"=== {which} ===")
    if which == "4k":
        run(4096, 4096)
    else:
        run(10_000, 2048)


if __name__ == "__main__":
    main()
