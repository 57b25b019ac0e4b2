"""Score the GENERATING tree of the 1k-taxa search dataset (same data
as tools/probe_search1k_full.py: seed 1024, 1024 taxa x 2048 sites
GTR+G4) with model + branch lengths optimized on the TRUE topology.

Purpose: interpret the search result's RF distance. At 2 sites/taxon-
pair of signal the ML tree is not expected to equal the generating
tree; the search is doing its job iff its final logL matches or beats
the generating topology's own optimized logL (the search can only be
blamed for logL it failed to find, not for data the alignment does not
contain). Writes tools/probe_true_tree_lnl.out."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax.numpy as jnp

OUT = (open("/root/repo/tools/probe_true_tree_lnl.out", "w")
       if __name__ == "__main__" else sys.stderr)
T0 = time.perf_counter()

SEARCH_FINAL_LNL = -1894367.750   # tools/probe_search1k_full.out


def p(*a):
    print(f"[{time.perf_counter()-T0:8.1f}s]", *a, file=OUT, flush=True)
    print(*a, flush=True)


def main():
    import jax
    from pllmod_tpu.ops.partition import create_partition
    from pllmod_tpu.tree.treeinfo import TreeInfo
    from pllmod_tpu.algorithm.opt_model import opt_model
    from pllmod_tpu.common import (PARAM_SUBST_RATES, PARAM_FREQUENCIES,
                                   PARAM_ALPHA, PARAM_BRANCHES_ITERATIVE)
    from tests import reference_impl as ref
    sys.path.insert(0, "/root/repo/tools")
    from probe_search246 import simulate

    p("devices:", jax.devices())
    rng = np.random.default_rng(1024)
    n_taxa, n_sites = 1024, 2048
    true_tree = ref.random_binary_tree(rng, n_taxa, 0.02, 0.5)
    rates = rng.uniform(0.5, 2.5, 6)
    freqs = rng.dirichlet([12, 9, 9, 12])
    seqs = simulate(rng, true_tree, rates, freqs, 0.9, n_sites)
    part = create_partition(seqs, states=4, n_rate_cats=4, alpha=0.5,
                            dtype=jnp.float32)
    ti = TreeInfo(true_tree, [part],
                  params_to_optimize=(PARAM_SUBST_RATES | PARAM_FREQUENCIES
                                      | PARAM_ALPHA
                                      | PARAM_BRANCHES_ITERATIVE))
    lnl0 = ti.compute_loglh()
    p(f"true tree, generating params + brlens: logL {lnl0:.3f}")
    prev = -np.inf
    for it in range(8):
        t0 = time.perf_counter()
        lnl = float(opt_model(ti, tol=1e-3))
        p(f"opt_model pass {it}: logL {lnl:.3f} "
          f"({time.perf_counter()-t0:.0f}s)")
        if lnl - prev < 0.1:
            break
        prev = lnl
    p(f"true-topology optimized logL: {lnl:.3f}")
    p(f"search final logL:            {SEARCH_FINAL_LNL:.3f}")
    d = SEARCH_FINAL_LNL - lnl
    p(f"search - true = {d:+.3f} logL "
      f"({'search tree is BETTER than' if d > 0 else 'search tree is '
         'behind'} the generating topology on this data)")


if __name__ == "__main__":
    main()
