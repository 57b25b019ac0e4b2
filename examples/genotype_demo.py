#!/usr/bin/env python
"""Genotype-model demo (reference: examples/genotype): likelihood + model
optimization on an unphased-genotype alignment with the GT10 model family.
"""

import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp
from pllmod_tpu import common
from pllmod_tpu.msa import MSA, read_phylip
from pllmod_tpu.ops import charmap as cm
from pllmod_tpu.ops.partition import create_partition
from pllmod_tpu.tree.treeinfo import TreeInfo
from pllmod_tpu.tree.starting import parsimony_stepwise
from pllmod_tpu.utils import model_info
from pllmod_tpu.algorithm import opt_model

# a small unphased-genotype alignment (IUPAC het codes M R W S Y K)
DEMO_PHY = """6 20
g1  AMRGGTTACSTAYKAACGGT
g2  AMRGGTAACSTAYKAACGGT
g3  CMRGGTAACGTAYKAACGGT
g4  CARGGTAACGTACKAACGGT
g5  CARGGTAACGTACKATCGGT
g6  CARGCTAACGTACKATCGGT
"""


def main():
    msa = read_phylip(sys.argv[1]) if len(sys.argv) >= 2 else \
        read_phylip(DEMO_PHY)
    model = model_info("GT10")          # GTGTR4 alias family
    print(f"model {model.name}: {model.states} states, "
          f"{model.n_free_rates} free rates")
    tree, pscore = parsimony_stepwise(msa.labels, msa.sequences, cm.GT10,
                                      seed=1)
    print(f"parsimony starting tree score: {pscore}")
    part = create_partition(msa.sequences, charmap=cm.GT10, n_rate_cats=4,
                            alpha=1.0, dtype=jnp.float64)
    ti = TreeInfo(tree, [part],
                  params_to_optimize=(common.PARAM_SUBST_RATES
                                      | common.PARAM_ALPHA
                                      | common.PARAM_BRANCHES_ITERATIVE))
    print(f"starting logL: {ti.compute_loglh():.6f}")
    lnl = opt_model(ti, symmetries=[model.rate_sym])
    print(f"optimized logL: {lnl:.6f}")
    print(ti.tree.to_newick())


if __name__ == "__main__":
    main()
