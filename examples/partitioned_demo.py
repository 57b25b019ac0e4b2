#!/usr/bin/env python
"""Partitioned analysis demo (BASELINE.json config 5, single-host form):
mixed DNA+AA partitions with per-partition models over one topology,
model optimization, bootstrap supports, RF distances and a consensus.
"""

import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp
from pllmod_tpu import common
from pllmod_tpu.msa import MSA
from pllmod_tpu.ops import charmap as cm
from pllmod_tpu.ops.partition import create_partition
from pllmod_tpu.tree.treeinfo import TreeInfo
from pllmod_tpu.tree.starting import parsimony_tree_multi
from pllmod_tpu.tree import moves
from pllmod_tpu.tree.splits import rf_distance
from pllmod_tpu.tree.consensus import consensus
from pllmod_tpu.tree.tbe import tbe_support, fbp_support
from pllmod_tpu.tree.utils import newick_with_support
from pllmod_tpu.utils import model_info
from pllmod_tpu.algorithm import opt_model


def main():
    rng = np.random.default_rng(11)
    n = 10
    labels = [f"sp{i}" for i in range(n)]
    dna = ["".join(rng.choice(list("ACGT"), 400)) for _ in range(n)]
    aa = ["".join(rng.choice(list("ARNDCQEGHILKMFPSTWYV"), 150))
          for _ in range(n)]

    # multi-partition parsimony starting tree
    tree, pscore = parsimony_tree_multi(
        labels, [(dna, cm.DNA, None), (aa, cm.AA, None)], seed=4)
    print(f"parsimony starting tree: score {pscore}")

    lg = model_info("LG")
    p_dna = create_partition(dna, states=4, n_rate_cats=4, alpha=1.0,
                             dtype=jnp.float64)
    p_aa = create_partition(aa, states=20, n_rate_cats=4, alpha=1.0,
                            subst_rates=lg.rates, freqs=lg.freqs,
                            dtype=jnp.float64)
    ti = TreeInfo(tree, [p_dna, p_aa], brlen_linkage=common.BRLEN_SCALED,
                  params_to_optimize=[
                      common.PARAM_SUBST_RATES | common.PARAM_ALPHA
                      | common.PARAM_BRANCHES_ITERATIVE,
                      common.PARAM_ALPHA | common.PARAM_BRANCHES_ITERATIVE])
    print(f"start logL: {ti.compute_loglh():.4f}")
    lnl = opt_model(ti)
    print(f"optimized logL: {lnl:.4f}  (scalers: {ti.brlen_scalers})")
    print(ti.counters.report())

    # toy bootstrap: site-resampled DNA partition, parsimony trees
    boots = []
    from pllmod_tpu.tree.starting import parsimony_stepwise
    for b in range(10):
        cols = rng.integers(0, 400, 400)
        bs = ["".join(s[c] for c in cols) for s in dna]
        bt, _ = parsimony_stepwise(labels, bs, cm.DNA, seed=100 + b)
        boots.append(bt)

    fbp = fbp_support(ti.tree, boots)
    tbe = tbe_support(ti.tree, boots)
    print("FBP supports:", {e: round(v, 2) for e, v in fbp.items()})
    print("TBE supports:", {e: round(v, 2) for e, v in tbe.items()})
    print("ML tree with TBE support:")
    print(newick_with_support(ti.tree, tbe, as_fraction=True))

    cons, supp = consensus(boots, threshold=0.5)
    print(f"bootstrap majority consensus ({len(supp)} splits):")
    print(cons.to_newick())
    print("RF(ML, consensus) =", rf_distance(ti.tree, cons))


if __name__ == "__main__":
    main()
