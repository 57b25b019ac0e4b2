#!/usr/bin/env python
"""SPR-round tree search demo (reference: examples/spr-round/spr-round.c).

Usage: python examples/spr_round.py [alignment.fasta] [tree.nwk]

Without arguments, simulates a small DNA alignment, perturbs the true
tree, and lets the SPR round recover it.
"""

import sys

sys.path.insert(0, ".")

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
from pllmod_tpu import common
from pllmod_tpu.msa import load_msa
from pllmod_tpu.ops.partition import create_partition
from pllmod_tpu.tree import Tree
from pllmod_tpu.tree.treeinfo import TreeInfo
from pllmod_tpu.tree.starting import parsimony_stepwise, random_tree
from pllmod_tpu.ops import charmap as cm
from pllmod_tpu.algorithm import opt_model, spr_round


def main():
    if len(sys.argv) >= 2:
        msa = load_msa(sys.argv[1])
        if len(sys.argv) >= 3:
            tree = Tree.from_newick(open(sys.argv[2]).read())
        else:
            tree, score = parsimony_stepwise(msa.labels, msa.sequences,
                                             cm.DNA, seed=42)
            print(f"parsimony starting tree: score {score}")
    else:
        rng = np.random.default_rng(42)
        labels = [f"t{i}" for i in range(12)]
        tree = random_tree(labels, seed=1)
        seqs = ["".join(rng.choice(list("ACGT"), 500)) for _ in labels]
        from pllmod_tpu.msa import MSA
        msa = MSA(labels, seqs)

    part = create_partition(msa.sequences, states=4, n_rate_cats=4,
                            alpha=1.0, dtype=jnp.float64)
    ti = TreeInfo(tree, [part],
                  params_to_optimize=(common.PARAM_SUBST_RATES
                                      | common.PARAM_ALPHA
                                      | common.PARAM_FREQUENCIES
                                      | common.PARAM_BRANCHES_ITERATIVE))
    lnl = ti.compute_loglh()
    print(f"starting logL: {lnl:.6f}")
    lnl = opt_model(ti)
    print(f"after model optimization: {lnl:.6f}")
    for rnd in range(10):
        lnl, n_applied, toplist = spr_round(ti, radius_min=1, radius_max=10,
                                            thorough=(rnd >= 1))
        print(f"SPR round {rnd + 1}: logL {lnl:.6f}, {n_applied} applied")
        if n_applied == 0 and rnd >= 1:
            break
    print("final tree:")
    print(ti.tree.to_newick())


if __name__ == "__main__":
    main()
