"""End-to-end ML tree search: MSA -> parsimony starting tree -> ml_search.

The full pipeline a reference user assembles from pll-modules + RAxML-NG:
parse sequences, compress site patterns (create_partition does this),
build a parsimony starting tree (pll_tree.c:987-1105), then alternate
model optimization with SPR rounds until the likelihood is stationary
(algo_search.c:1052 composed the RAxML-NG way).

Run: python examples/ml_search_demo.py
"""

import sys

sys.path.insert(0, ".")

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")  # demo-sized; CPU is fine
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from pllmod_tpu import common  # noqa: E402
from pllmod_tpu.ops import charmap  # noqa: E402
from pllmod_tpu.ops.partition import create_partition  # noqa: E402
from pllmod_tpu.tree.starting import parsimony_stepwise  # noqa: E402
from pllmod_tpu.tree.treeinfo import TreeInfo  # noqa: E402
from pllmod_tpu.algorithm import ml_search  # noqa: E402


def main():
    # simulate a small dataset (stand-in for a FASTA read via msa.io)
    rng = np.random.default_rng(7)
    from tests import reference_impl as ref
    from tests.test_algorithm import simulate

    n_taxa, n_sites = 12, 1000
    true_tree = ref.random_binary_tree(rng, n_taxa, 0.05, 0.3)
    rates = np.array([1.2, 3.5, 0.8, 1.1, 4.2, 1.0])
    freqs = np.array([0.3, 0.2, 0.2, 0.3])
    seqs = simulate(rng, true_tree, rates, freqs, 0.8, n_sites)
    labels = [f"t{i}" for i in range(n_taxa)]

    # parsimony starting tree (pllmod_utree_create_parsimony analog)
    start, psteps = parsimony_stepwise(labels, seqs, charmap.DNA, seed=42)
    print(f"parsimony starting tree: {psteps} steps")

    part = create_partition(seqs, states=4, n_rate_cats=4, alpha=1.0,
                            subst_rates=np.ones(6), freqs=freqs,
                            dtype=jnp.float64)
    ti = TreeInfo(start, [part],
                  params_to_optimize=(common.PARAM_SUBST_RATES
                                      | common.PARAM_ALPHA
                                      | common.PARAM_BRANCHES_ITERATIVE))

    res = ml_search(
        ti, radius_step=4, radius_max=8, lh_epsilon=0.05,
        on_round=lambda r: print(
            f"  [{r.mode:8s}] radius={r.radius:2d} "
            f"applied={r.n_applied:2d} logL={r.loglh:.4f}"))

    print(f"search: {res.n_rounds} rounds, "
          f"logL {res.start_loglh:.4f} -> {res.loglh:.4f}")
    print(f"final alpha={float(ti.partitions[0].alpha):.3f}")
    print("final tree:", ti.tree.to_newick()[:120], "...")


if __name__ == "__main__":
    main()
